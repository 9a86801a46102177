"""Synthetic-scene fixtures: analytically known meshes, poses and cameras.

The reference has no test assets; these fixtures make GT generation
assertable (SURVEY.md §4).
"""

import numpy as np

from epos_tpu.data.renderer import Renderer
from epos_tpu.ops import fragment as fragment_lib
from epos_tpu.ops import geometry


def box_mesh(sx=60.0, sy=40.0, sz=30.0):
  """Axis-aligned box centered at origin, 12 triangles, mm units."""
  hx, hy, hz = sx / 2, sy / 2, sz / 2
  corners = np.array([
      [-hx, -hy, -hz], [hx, -hy, -hz], [hx, hy, -hz], [-hx, hy, -hz],
      [-hx, -hy, hz], [hx, -hy, hz], [hx, hy, hz], [-hx, hy, hz]])
  faces = np.array([
      [0, 2, 1], [0, 3, 2],  # -z
      [4, 5, 6], [4, 6, 7],  # +z
      [0, 1, 5], [0, 5, 4],  # -y
      [2, 3, 7], [2, 7, 6],  # +y
      [1, 2, 6], [1, 6, 5],  # +x
      [0, 4, 7], [0, 7, 3],  # -x
  ])
  colors = np.full((8, 3), 180)
  return {'pts': corners.astype(np.float64), 'faces': faces,
          'colors': colors}


def dense_box_mesh(n=6, **kw):
  """Box with subdivided faces (more vertices for fragmentation)."""
  base = box_mesh(**kw)
  # Subdivide by sampling a grid on each face.
  hx, hy, hz = [kw.get(k, d) / 2 for k, d in
                (('sx', 60.0), ('sy', 40.0), ('sz', 30.0))]
  pts = []
  u = np.linspace(-1, 1, n)
  for a in u:
    for b in u:
      pts += [[hx, a * hy, b * hz], [-hx, a * hy, b * hz],
              [a * hx, hy, b * hz], [a * hx, -hy, b * hz],
              [a * hx, b * hy, hz], [a * hx, b * hy, -hz]]
  pts = np.unique(np.round(np.array(pts), 6), axis=0)
  return {'pts': pts, 'faces': base['faces'],
          'verts_corner': base['pts']}


def box_mesh_subdivided(sx=60.0, sy=40.0, sz=30.0, n=6, color_variant=0):
  """Box with each face triangulated into an (n-1)^2 grid and per-vertex
  POSITION-CODED colors (RGB = normalized xyz).

  The flat-shading rasterizer colors each triangle by its vertex average,
  so the subdivision turns the position code into a coarse texture
  gradient across every face — giving dense-prediction training a real
  visual signal (plain boxes with one constant color are nearly
  textureless and unlearnable beyond the silhouette).

  color_variant: per-object palette (channel permutation + inversion).
  Because the position code is normalized by each box's half-size, two
  boxes of variant 0 have IDENTICAL face color patterns and per-pixel
  object classification is intrinsically ambiguous (measured in round 3:
  40-80% of correspondences landed on the other object, destroying the
  fitted poses). Real BOP objects are visually distinct; distinct palettes
  restore that property."""
  hx, hy, hz = sx / 2, sy / 2, sz / 2
  pts, faces = [], []
  u = np.linspace(-1, 1, n)

  def add_face(origin, du, dv):
    base = len(pts)
    for a in u:
      for b in u:
        pts.append(origin + a * du + b * dv)
    for i in range(n - 1):
      for j in range(n - 1):
        p0 = base + i * n + j
        p1 = base + i * n + j + 1
        p2 = base + (i + 1) * n + j
        p3 = base + (i + 1) * n + j + 1
        faces.append([p0, p1, p3])
        faces.append([p0, p3, p2])

  ex, ey, ez = (np.array([hx, 0, 0]), np.array([0, hy, 0]),
                np.array([0, 0, hz]))
  add_face(ex, ey, ez)
  add_face(-ex, ey, ez)
  add_face(ey, ex, ez)
  add_face(-ey, ex, ez)
  add_face(ez, ex, ey)
  add_face(-ez, ex, ey)
  pts = np.asarray(pts, np.float64)
  half = np.array([hx, hy, hz])
  code = np.clip((pts / half + 1.0) * 127.5, 0, 255)
  perms = [(0, 1, 2), (2, 0, 1), (1, 2, 0), (0, 2, 1), (2, 1, 0), (1, 0, 2)]
  code = code[:, perms[color_variant % 6]]
  # Identity hue band (dataset v2): the position code compresses to 7 bits
  # and each object gets +128 on its OWN dominant channel (variant 0 -> R,
  # 1 -> B, 2 -> G), so PER-PIXEL object identity is readable everywhere as
  # a channel-ratio — invariant to the rasterizer's flat shading, which
  # scales all channels equally (a brightness band is NOT: shade spans
  # 0.4-1.0, folding a bright object's dark faces onto a dark object's lit
  # ones). Pure channel-permuted codes left local patches of different
  # objects look-alike: the round-3 diagnosis measured 25-80% of extracted
  # correspondences landing on the OTHER object even after 30k steps
  # (confidently mislabeled — raising tau_a did not help), destroying the
  # fitted poses. Real BOP objects are visually distinct; the band restores
  # that property while keeping all three position gradients for
  # localization.
  colors = code // 2
  colors[:, (2 * (color_variant % 3)) % 3] += 128
  colors = colors.astype(np.uint8)
  return {'pts': pts, 'faces': np.asarray(faces, np.int32),
          'colors': colors}


DEFAULT_K = np.array([[300.0, 0, 80.0], [0, 300.0, 60.0], [0, 0, 1.0]])


def simple_scene(width=160, height=120, obj_id=1, z=800.0):
  """One box in front of the camera. Returns dict with everything a GT test
  needs."""
  mesh = box_mesh()
  renderer = Renderer()
  renderer.init(width, height)
  renderer.add_object(obj_id, mesh)
  q = np.array([0.9, 0.1, 0.3, 0.2])
  q /= np.linalg.norm(q)
  R = geometry.quaternion_matrix(q)
  t = np.array([5.0, -10.0, z])
  return {
      'mesh': mesh, 'renderer': renderer, 'obj_id': obj_id,
      'K': DEFAULT_K.copy(), 'q': q, 'R': R, 't': t,
      'width': width, 'height': height,
  }


def fragmented_store(mesh, num_frags=8, obj_id=1):
  """Fragment a mesh; returns (frag_centers dict, frag_sizes dict)."""
  # Use a denser sampling of the surface for FPS.
  dense = dense_box_mesh(n=8)
  centers, ids = fragment_lib.fragmentation_fps(dense['pts'], num_frags)
  sizes = fragment_lib.fragment_sizes(dense['pts'], ids, num_frags)
  return {obj_id: centers}, {obj_id: sizes}


def _zrot(angle):
  c, s = np.cos(angle), np.sin(angle)
  return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])


def synthbox_meshes(num_objs=2, symmetric_first=False):
  """The dataset's box meshes (subdivided, position-color-coded). With
  symmetric_first, object 1 is a square cuboid (sx == sy) — a 4-fold
  rotational symmetry about z plus the 180-degree flips (D4). Note the
  position-coded colors are symmetric too only up to the color code; the
  GEOMETRY is what the BOP symmetry annotations describe."""
  meshes, denses, infos = {}, {}, {}
  for obj_id in range(1, num_objs + 1):
    if symmetric_first and obj_id == 1:
      sx = sy = 55.0
      sz = 25.0
    else:
      sx, sy, sz = 50.0 + 10 * obj_id, 35.0 + 5 * obj_id, 25.0
    mesh = box_mesh_subdivided(sx, sy, sz, n=6, color_variant=obj_id - 1)
    dense = dense_box_mesh(n=8, sx=sx, sy=sy, sz=sz)
    meshes[obj_id] = mesh
    denses[obj_id] = dense
    diameter = float(np.sqrt(sx ** 2 + sy ** 2 + sz ** 2))
    info = {'diameter': diameter, 'size_x': sx, 'size_y': sy, 'size_z': sz}
    if symmetric_first and obj_id == 1:
      syms = []
      for k in range(1, 4):                      # 90/180/270 about z
        T = np.eye(4)
        T[:3, :3] = _zrot(np.pi / 2 * k)
        syms.append(T.flatten().tolist())
      T = np.eye(4)                              # 180 about x (top-bottom)
      T[:3, :3] = np.diag([1.0, -1.0, -1.0])
      syms.append(T.flatten().tolist())
      info['symmetries_discrete'] = syms
    infos[obj_id] = info
  return meshes, denses, infos


def make_bop_dataset(root, dataset_name='synthbox', num_scenes=1,
                     ims_per_scene=3, im_size=(160, 120), num_objs=2,
                     split='test', instances_per_obj=1,
                     symmetric_first=False, crowded=False, seed_base=100,
                     z_range=None, instance_count_range=None):
  """Creates a miniature BOP-layout dataset on disk with analytic GT.

  Returns (dataset_root, split_name). Objects are boxes of different sizes;
  images are flat-shaded renders; masks/scene_gt/scene_camera are written in
  the BOP format so the full create-records -> Dataset -> DataLoader path
  can run against it.

  Options for accuracy-evidence scenes (VERDICT r1 #10):
    instances_per_obj > 1: multiple instances of each object per image.
    crowded: instances placed close together -> real occlusion.
    symmetric_first: object 1 is a D4-symmetric square cuboid; its
      symmetries land in models_info.json for symmetry-aware evaluation.
    split: 'test' or 'train' (distinct seeds per split).
    instance_count_range: optional (lo, hi) — each object's instance count
      per image is drawn uniformly from [lo, hi] instead of the fixed
      instances_per_obj; lo=0 yields images with ABSENT objects, the
      DETECTION-mode regime (unknown counts, phantom-pose exposure).
  """
  import os
  import json
  import cv2
  from epos_tpu.data import bop as bop_lib

  w, h = im_size
  # Focal scales with resolution (220px at the 160-width default) so the
  # field of view — and the objects' fraction of the frame — is the same
  # at every im_size.
  f = 220.0 * (w / 160.0)
  K = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1.0]])
  ds_dir = os.path.join(root, dataset_name)
  models_dir = os.path.join(ds_dir, 'models')
  models_eval_dir = os.path.join(ds_dir, 'models_eval')
  os.makedirs(models_dir, exist_ok=True)
  os.makedirs(models_eval_dir, exist_ok=True)

  meshes, denses, model_infos = synthbox_meshes(num_objs, symmetric_first)
  for obj_id, mesh in meshes.items():
    for d in (models_dir, models_eval_dir):
      bop_lib.save_ply(
          os.path.join(d, f'obj_{obj_id:06d}.ply'),
          np.concatenate([mesh['pts'], denses[obj_id]['pts']]),
          colors=np.concatenate([
              mesh['colors'],
              np.full((len(denses[obj_id]['pts']), 3), 180, np.uint8)]),
          faces=mesh['faces'])
  for d in (models_dir, models_eval_dir):
    with open(os.path.join(d, 'models_info.json'), 'w') as f:
      json.dump({str(k): v for k, v in model_infos.items()}, f)

  renderer = Renderer()
  renderer.init(w, h)
  for obj_id, mesh in meshes.items():
    renderer.add_object(obj_id, mesh)

  # Distinct seed blocks per split. 'train_holdout' draws NEW poses from the
  # SAME distribution as 'train' — the train-distribution eval split that
  # separates pipeline correctness from small-data generalization.
  split_seed = {'test': 0, 'train': 77000,
                'train_holdout': 231000}.get(split, 154000)
  split_dir = os.path.join(ds_dir, split)
  for scene_id in range(1, num_scenes + 1):
    sdir = os.path.join(split_dir, f'{scene_id:06d}')
    os.makedirs(os.path.join(sdir, 'rgb'), exist_ok=True)
    os.makedirs(os.path.join(sdir, 'depth'), exist_ok=True)
    os.makedirs(os.path.join(sdir, 'mask_visib'), exist_ok=True)
    scene_gt, scene_camera, scene_gt_info = {}, {}, {}
    for im_id in range(ims_per_scene):
      rnd = np.random.default_rng(
          split_seed + seed_base * scene_id + im_id)
      # Draw all poses first so every full mask is available for the
      # z-buffered visibility resolution.
      draws = []
      for obj_id in range(1, num_objs + 1):
        n_inst = instances_per_obj
        if instance_count_range is not None:
          lo, hi = instance_count_range
          n_inst = int(rnd.integers(lo, hi + 1))
        for inst in range(n_inst):
          q = rnd.normal(size=4)
          q /= np.linalg.norm(q)
          R = geometry.quaternion_matrix(q)
          if crowded:
            # Cluster placements -> overlapping silhouettes (occlusion).
            z_lo, z_hi = z_range or (480, 620)
            t = np.array([rnd.uniform(-25, 25), rnd.uniform(-18, 18),
                          rnd.uniform(z_lo, z_hi)])
          else:
            z_lo, z_hi = z_range or (500, 700)
            t = np.array([rnd.uniform(-40, 40), rnd.uniform(-30, 30),
                          rnd.uniform(z_lo, z_hi)])
          draws.append((obj_id, q, R, t))
      depths, colors = [], []
      for obj_id, q, R, t in draws:
        renderer.render_object(obj_id, R.flatten(), t,
                               K[0, 0], K[1, 1], K[0, 2], K[1, 2])
        depths.append(renderer.get_depth_image(obj_id).copy())
        colors.append(renderer.get_color_image(obj_id).copy())
      if depths:
        depth_stack = np.stack([np.where(d > 0, d, np.inf) for d in depths])
      else:
        # Zero instances in this image (instance_count_range lo=0): an
        # empty background frame with no GT is a legitimate DETECTION
        # sample (everything emitted for it is a phantom).
        depth_stack = np.full((1, h, w), np.inf)
      winner = np.argmin(depth_stack, axis=0)
      any_hit = np.isfinite(depth_stack.min(axis=0))

      img = np.zeros((h, w, 3), np.uint8)
      gts, infos = [], []
      for gt_id, (obj_id, q, R, t) in enumerate(draws):
        m_full = depths[gt_id] > 0
        vis = m_full & any_hit & (winner == gt_id)
        img[vis] = colors[gt_id][vis]
        cv2.imwrite(os.path.join(
            sdir, 'mask_visib', f'{im_id:06d}_{gt_id:06d}.png'),
            vis.astype(np.uint8) * 255)
        gts.append({'obj_id': obj_id,
                    'cam_R_m2c': R.flatten().tolist(),
                    'cam_t_m2c': t.tolist()})
        infos.append({'visib_fract':
                      float(vis.sum() / max(m_full.sum(), 1))})
      cv2.imwrite(os.path.join(sdir, 'rgb', f'{im_id:06d}.png'),
                  cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
      # Real scene depth (occlusion-resolved z-buffer) in the BOP uint16
      # format — lets VSD evaluate against true visibility instead of the
      # unoccluded GT-render assumption. depth_scale 0.1 -> 0.1mm units.
      depth_scale = 0.1
      scene_depth = np.where(any_hit, depth_stack.min(axis=0), 0.0)
      cv2.imwrite(os.path.join(sdir, 'depth', f'{im_id:06d}.png'),
                  np.round(scene_depth / depth_scale).astype(np.uint16))
      scene_gt[str(im_id)] = gts
      scene_camera[str(im_id)] = {'cam_K': K.flatten().tolist(),
                                  'depth_scale': depth_scale}
      scene_gt_info[str(im_id)] = infos
    with open(os.path.join(sdir, 'scene_gt.json'), 'w') as f:
      json.dump(scene_gt, f)
    with open(os.path.join(sdir, 'scene_camera.json'), 'w') as f:
      json.dump(scene_camera, f)
    with open(os.path.join(sdir, 'scene_gt_info.json'), 'w') as f:
      json.dump(scene_gt_info, f)
  return root, split
