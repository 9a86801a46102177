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


def make_bop_dataset(root, dataset_name='synthbox', num_scenes=1,
                     ims_per_scene=3, im_size=(160, 120), num_objs=2):
  """Creates a miniature BOP-layout dataset on disk with analytic GT.

  Returns (dataset_root, split_name). Objects are boxes of different sizes;
  images are flat-shaded renders; masks/scene_gt/scene_camera are written in
  the BOP format so the full create-records -> Dataset -> DataLoader path
  can run against it.
  """
  import os
  import json
  import cv2
  from epos_tpu.data import bop as bop_lib

  w, h = im_size
  K = np.array([[220.0, 0, w / 2], [0, 220.0, h / 2], [0, 0, 1.0]])
  ds_dir = os.path.join(root, dataset_name)
  models_dir = os.path.join(ds_dir, 'models')
  models_eval_dir = os.path.join(ds_dir, 'models_eval')
  os.makedirs(models_dir, exist_ok=True)
  os.makedirs(models_eval_dir, exist_ok=True)

  meshes = {}
  rng = np.random.default_rng(7)
  for obj_id in range(1, num_objs + 1):
    mesh = box_mesh(50.0 + 10 * obj_id, 35.0 + 5 * obj_id, 25.0)
    # Denser vertex sampling so FPS fragmentation has enough points.
    dense = dense_box_mesh(n=8, sx=50.0 + 10 * obj_id,
                           sy=35.0 + 5 * obj_id, sz=25.0)
    meshes[obj_id] = mesh
    for d in (models_dir, models_eval_dir):
      bop_lib.save_ply(
          os.path.join(d, f'obj_{obj_id:06d}.ply'),
          np.concatenate([mesh['pts'], dense['pts']]),
          faces=mesh['faces'])

  renderer = Renderer()
  renderer.init(w, h)
  for obj_id, mesh in meshes.items():
    renderer.add_object(obj_id, mesh)

  split_dir = os.path.join(ds_dir, 'test')
  for scene_id in range(1, num_scenes + 1):
    sdir = os.path.join(split_dir, f'{scene_id:06d}')
    os.makedirs(os.path.join(sdir, 'rgb'), exist_ok=True)
    os.makedirs(os.path.join(sdir, 'mask_visib'), exist_ok=True)
    scene_gt, scene_camera, scene_gt_info = {}, {}, {}
    for im_id in range(ims_per_scene):
      img = np.zeros((h, w, 3), np.uint8)
      gts, infos = [], []
      depth_full = np.full((h, w), np.inf)
      rnd = np.random.default_rng(100 * scene_id + im_id)
      for gt_id, obj_id in enumerate(range(1, num_objs + 1)):
        q = rnd.normal(size=4)
        q /= np.linalg.norm(q)
        R = geometry.quaternion_matrix(q)
        t = np.array([rnd.uniform(-40, 40), rnd.uniform(-30, 30),
                      rnd.uniform(500, 700)])
        renderer.render_object(obj_id, R.flatten(), t,
                               K[0, 0], K[1, 1], K[0, 2], K[1, 2])
        depth = renderer.get_depth_image(obj_id)
        color = renderer.get_color_image(obj_id)
        m_full = depth > 0
        vis = m_full & ((depth < depth_full) | ~np.isfinite(depth_full))
        depth_full = np.where(vis, depth, depth_full)
        img[vis] = color[vis]
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
      scene_gt[str(im_id)] = gts
      scene_camera[str(im_id)] = {'cam_K': K.flatten().tolist(),
                                  'depth_scale': 1.0}
      scene_gt_info[str(im_id)] = infos
    with open(os.path.join(sdir, 'scene_gt.json'), 'w') as f:
      json.dump(scene_gt, f)
    with open(os.path.join(sdir, 'scene_camera.json'), 'w') as f:
      json.dump(scene_camera, f)
    with open(os.path.join(sdir, 'scene_gt_info.json'), 'w') as f:
      json.dump(scene_gt_info, f)
  return root, 'test'
