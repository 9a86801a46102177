"""Visualization suite (mirror of epos_lib/vis.py).

Colormaps, tile grids, label/XYZ colorization, pose-rendering overlays and
fragment-field visualization. Host-side numpy + the thread-safe rasterizer.
"""

import os

import numpy as np

from epos_tpu.ops import geometry


def ade20k_colormap(n=256):
  """Deterministic label colormap (vis.py:18-50 uses the ADE20K map; this
  reproduces its bit-shuffle construction)."""
  cmap = np.zeros((n, 3), np.uint8)
  for i in range(n):
    r = g = b = 0
    c = i
    for j in range(8):
      r |= ((c >> 0) & 1) << (7 - j)
      g |= ((c >> 1) & 1) << (7 - j)
      b |= ((c >> 2) & 1) << (7 - j)
      c >>= 3
    cmap[i] = [r, g, b]
  cmap[0] = [0, 0, 0]
  return cmap


def colorize_label_map(label_map, cmap=None):
  """[h, w] int labels -> [h, w, 3] uint8 (vis.py:79-92)."""
  if cmap is None:
    cmap = ade20k_colormap()
  return cmap[np.clip(label_map, 0, len(cmap) - 1)]


def colorize_xyz(xyz, extent=None):
  """Object-local XYZ -> RGB in [0, 255] (vis.py:95-108)."""
  if extent is None:
    extent = np.abs(xyz).max() + 1e-9
  return np.clip((xyz / extent + 1.0) * 127.5, 0, 255).astype(np.uint8)


def build_grid(tiles, tile_size=None, cols=None):
  """Tiles a list of HxWx3 images into one grid image (vis.py:53-76)."""
  import cv2
  if not tiles:
    return np.zeros((1, 1, 3), np.uint8)
  if tile_size is not None:
    tiles = [cv2.resize(t, tile_size) for t in tiles]
  h, w = tiles[0].shape[:2]
  n = len(tiles)
  if cols is None:
    cols = int(np.ceil(np.sqrt(n)))
  rows = int(np.ceil(n / cols))
  grid = np.zeros((rows * h, cols * w, 3), np.uint8)
  for i, t in enumerate(tiles):
    r, c = divmod(i, cols)
    if t.ndim == 2:
      t = np.stack([t] * 3, -1)
    grid[r * h:(r + 1) * h, c * w:(c + 1) * w] = t
  return grid


def draw_frame(im, K, R, t, length=50.0, thickness=2):
  """Draws the object coordinate frame (vis.py:111-138)."""
  import cv2
  im = im.copy()
  pts = np.array([[0, 0, 0], [length, 0, 0], [0, length, 0], [0, 0, length]],
                 np.float64)
  uv = geometry.project_pts(pts, K, R, t).astype(int)
  colors = [(255, 0, 0), (0, 255, 0), (0, 0, 255)]
  for i, c in enumerate(colors):
    cv2.line(im, tuple(uv[0]), tuple(uv[i + 1]), c, thickness)
  return im


def render_pose_overlay(im, renderer, obj_id, K, R, t, alpha=0.7):
  """Blends a rendered pose over the image: 0.3*im + 0.7*render on the
  silhouette (vis.py:141-176)."""
  renderer.render_object(obj_id, np.asarray(R).flatten(),
                         np.asarray(t).flatten(),
                         K[0, 0], K[1, 1], K[0, 2], K[1, 2])
  color = renderer.get_color_image(obj_id)
  depth = renderer.get_depth_image(obj_id)
  import cv2
  if color.shape[:2] != im.shape[:2]:
    color = cv2.resize(color, (im.shape[1], im.shape[0]),
                       interpolation=cv2.INTER_NEAREST)
    depth = cv2.resize(depth, (im.shape[1], im.shape[0]),
                       interpolation=cv2.INTER_NEAREST)
  mask = depth > 0
  out = im.copy().astype(np.float32)
  out[mask] = (1 - alpha) * out[mask] + alpha * color[mask].astype(np.float32)
  return out.astype(np.uint8)


def visualize_frag_fields(frag_ids, frag_coords, obj_label, frag_centers,
                          frag_sizes, num_frags):
  """GT/pred fragment-field visualization: fragment label colors + the
  reconstructed XYZ = center + size * offset (vis.py:179-319)."""
  h, w = frag_ids.shape[:2]
  cmap = ade20k_colormap(max(num_frags + 1, 256))
  label_vis = cmap[np.clip(frag_ids[..., 0] + 1, 0, 255)]
  label_vis[obj_label == 0] = 0

  xyz = np.zeros((h, w, 3), np.float32)
  for obj_id in np.unique(obj_label):
    if obj_id == 0 or obj_id == 255 or obj_id not in frag_centers:
      continue
    m = obj_label == obj_id
    ids = frag_ids[m][:, 0]
    xyz[m] = (frag_centers[obj_id][ids] +
              frag_coords[m][:, 0] * frag_sizes[obj_id][ids][:, None])
  xyz_vis = colorize_xyz(xyz)
  xyz_vis[obj_label == 0] = 0
  return label_vis, xyz_vis


def visualize_object_poses(im, K, poses, renderer):
  """Overlays all poses onto the image (vis.py:141-176 surface used at
  infer.py:214-227). poses: list of {'obj_id', 'R', 't'}."""
  out = im
  for p in poses:
    out = render_pose_overlay(out, renderer, p['obj_id'], K, p['R'], p['t'])
  return out


def visualize_obj_conf_tiles(obj_confs, tile_size=None):
  """Per-class grayscale confidence tiles with a 'cls: <i>' caption
  (reference infer.py:253-265)."""
  import cv2
  tiles = []
  for cls in range(obj_confs.shape[-1]):
    conf = np.clip(obj_confs[:, :, cls] * 255.0, 0, 255).astype(np.uint8)
    conf = np.dstack([conf, conf, conf])
    if tile_size is not None:
      conf = cv2.resize(conf, tile_size, interpolation=cv2.INTER_LINEAR)
    tiles.append(write_text_on_image(
        conf, [{'name': 'cls', 'val': cls, 'fmt': ':d'}]))
  return tiles


def _norm01(x):
  x = x - x.min()
  m = x.max()
  return x / m if m > 0 else x


def visualize_gt_frag(gt_obj_ids, gt_obj_masks, gt_frag_labels,
                      gt_frag_weights, gt_frag_coords, frag_centers,
                      frag_sizes, vis_prefix, vis_dir):
  """Saves GT fragment-field visualizations: centers / scaled coords /
  reconstructed XYZ / weights (reference vis.py:179-249).

  gt_obj_ids: [n] object ids; gt_obj_masks: [n, h, w] bool;
  gt_frag_labels: [h, w, knn]; gt_frag_weights: [h, w, knn];
  gt_frag_coords: [h, w, knn, 3] normalized offsets.
  frag_centers/frag_sizes: dicts keyed by obj_id.
  """
  frag_ind = 0  # The closest fragment (vis.py:196).
  h, w = gt_frag_labels.shape[:2]
  centers_vis = np.zeros((h, w, 3), np.float64)
  coords_vis = np.zeros((h, w, 3), np.float64)
  for gt_id, obj_id in enumerate(gt_obj_ids):
    obj_id = int(obj_id)
    if obj_id not in frag_centers:
      continue
    m = gt_obj_masks[gt_id].astype(bool)
    labels = gt_frag_labels[m][:, frag_ind]
    centers_vis[m] = frag_centers[obj_id][labels]
    scales = frag_sizes[obj_id][labels]
    coords_vis[m] = gt_frag_coords[m][:, frag_ind, :] * scales[:, None]
  xyz_vis = centers_vis + coords_vis
  weights_vis = gt_frag_weights[:, :, frag_ind].astype(np.float64)
  if weights_vis.max() > 0:
    weights_vis = weights_vis / weights_vis.max()

  for name, vis in (('gt_frag_labels', _norm01(centers_vis)),
                    ('gt_frag_coords', _norm01(coords_vis)),
                    ('gt_frag_reconst', _norm01(xyz_vis)),
                    ('gt_frag_weights', weights_vis)):
    save_image(os.path.join(vis_dir, f'{vis_prefix}_{name}.png'),
               (255.0 * np.atleast_3d(vis)).astype(np.uint8))


def visualize_pred_frag(frag_confs, frag_coords, frag_centers, frag_sizes,
                        vis_prefix, vis_dir, vis_ext='jpg'):
  """Saves predicted fragment-field grids: per-object top-fragment centers /
  scaled coords / reconstructed XYZ (reference vis.py:253-319).

  frag_confs: [h, w, num_objs, F] softmax; frag_coords: [h, w, num_objs, F,
  3] normalized offsets. frag_centers/frag_sizes: dicts keyed by obj_id.
  """
  h, w, num_objs, num_frags = frag_confs.shape
  tiles_centers, tiles_coords, tiles_reconst = [], [], []
  for obj_id in range(1, num_objs + 1):
    if obj_id not in frag_centers:
      continue
    conf_obj = frag_confs[:, :, obj_id - 1, :]
    top = np.argmax(conf_obj, axis=2).flatten()
    top_centers = frag_centers[obj_id][top].reshape(h, w, 3)
    coords_obj = frag_coords[:, :, obj_id - 1, :, :].reshape(-1, num_frags, 3)
    top_rel = coords_obj[np.arange(top.size), top]
    top_coords = (top_rel * frag_sizes[obj_id][top][:, None]).reshape(h, w, 3)
    top_reconst = top_centers + top_coords
    txt = [{'name': 'cls', 'val': obj_id, 'fmt': ':d'}]
    tiles_centers.append(write_text_on_image(colorize_xyz(top_centers), txt))
    tiles_coords.append(write_text_on_image(colorize_xyz(top_coords), txt))
    tiles_reconst.append(write_text_on_image(colorize_xyz(top_reconst), txt))

  for name, tiles in (('pred_frag_centers', tiles_centers),
                      ('pred_frag_coords', tiles_coords),
                      ('pred_frag_reconst', tiles_reconst)):
    save_image(os.path.join(vis_dir, f'{vis_prefix}_{name}.{vis_ext}'),
               build_grid(tiles))


def write_text_on_image(im, txt_list, loc=(3, 12), color=(255, 255, 255),
                        size=0.4):
  """Writes lines of text onto an image (bop_toolkit
  visualization.write_text_on_image surface, used at infer.py:196-259).

  txt_list: list of dicts {'name': str, 'val': float, 'fmt': str} or strings.
  """
  import cv2
  im = np.ascontiguousarray(im.copy())
  x, y = loc
  for item in txt_list:
    if isinstance(item, dict):
      txt = '{}: {}'.format(item.get('name', ''),
                            ('{' + item.get('fmt', ':.3f') + '}').format(
                                item.get('val', '')))
    else:
      txt = str(item)
    cv2.putText(im, txt, (x, y), cv2.FONT_HERSHEY_SIMPLEX, size,
                tuple(int(c) for c in color), 1, cv2.LINE_AA)
    y += int(22 * size / 0.4)
  return im


def save_image(path, im):
  import cv2
  os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
  cv2.imwrite(path, cv2.cvtColor(np.asarray(im, np.uint8),
                                 cv2.COLOR_RGB2BGR))
