"""Ground-truth field generation: fragment labels, 3D offsets, weights.

Host-side equivalent of the reference's FragmentFieldGenerator + mask
exclusivity (epos_lib/datagen_utils.py:49-98,143-260), built on the
thread-safe rasterizer. Produces, per image at the output stride:

  - obj label map       [h, w] int32 (0 = background)
  - frag label field    [h, w, knn] int32
  - frag coord field    [h, w, knn, 3] float32 (offsets normalized by
                        fragment size)
  - frag weight field   [h, w, knn] float32

The numerical contract (the reference's own oracle,
scripts/check_train_input.py:55-99): reconstructing
XYZ = frag_center[label] + frag_size[label] * coord and projecting with
(K, R, t) must land on the pixel center.
"""

import numpy as np

from epos_tpu.ops import fragment as fragment_lib
from epos_tpu.ops import geometry


class FragmentFieldGenerator:
  """Generates GT fields with fragment labels and 3D fragment coordinates."""

  def __init__(self, frag_centers, frag_sizes, renderer, knn_frags=1):
    """Args mirror datagen_utils.FragmentFieldGenerator.__init__ (143-159).

    frag_centers: {obj_id: [num_frags, 3]}; frag_sizes: {obj_id: [num_frags]}.
    """
    self.frag_centers = frag_centers
    self.frag_sizes = frag_sizes
    self.renderer = renderer
    self.knn_frags = knn_frags

  def assign_to_frags(self, obj_id, xyz):
    """Vectorized kNN fragment assignment (datagen_utils.py:161-199)."""
    return fragment_lib.assign_points_to_frags(
        xyz, self.frag_centers[obj_id], self.frag_sizes[obj_id],
        knn=self.knn_frags)

  def construct_frag_fields(self, width, height, K, gt_obj_ids, gt_obj_quats,
                            gt_obj_trans, gt_obj_masks):
    """Builds the dense fragment fields (datagen_utils.py:201-232).

    Masks are assumed mutually exclusive. Returns (ids, coords, weights).
    """
    knn = self.knn_frags
    frag_ids = np.zeros((height, width, knn), np.int32)
    frag_coords = np.zeros((height, width, knn, 3), np.float32)
    frag_weights = np.zeros((height, width, knn), np.float32)
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]

    for gt_id, obj_id in enumerate(gt_obj_ids):
      obj_mask = gt_obj_masks[gt_id].astype(bool)
      if not obj_mask.any():
        continue
      R = geometry.quaternion_matrix(gt_obj_quats[gt_id])
      t = np.asarray(gt_obj_trans[gt_id], np.float64)
      self.renderer.render_object(obj_id, R.flatten(), t, fx, fy, cx, cy,
                                  want_rgb=False)
      xyz = self.renderer.get_local_pos_image(obj_id).astype(np.float32)
      pts = xyz[obj_mask]
      # Pixels inside the mask but with no rendered surface keep zeros from
      # the renderer; the reference behaves the same (get_local_pos_image
      # returns 0 outside the model silhouette).
      ids, coords, w = self.assign_to_frags(obj_id, pts)
      frag_ids[obj_mask] = ids
      frag_coords[obj_mask] = coords
      frag_weights[obj_mask] = w

    return frag_ids, frag_coords, frag_weights


def make_masks_exclusive(gt_obj_masks, gt_obj_ids, gt_obj_quats, gt_obj_trans,
                         K, renderer):
  """Resolves overlapping instance masks (datagen_utils.py:49-98).

  Processes in REVERSE order; a pixel is kept in the latest (highest index)
  mask, and only where the re-rendered depth is > 0.
  """
  masks = np.array(gt_obj_masks, dtype=bool, copy=True)
  if masks.size == 0:
    return masks
  num_gts, height, width = masks.shape
  fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
  avail = np.ones((height, width), bool)
  for gt_id in range(num_gts)[::-1]:
    R = geometry.quaternion_matrix(gt_obj_quats[gt_id])
    renderer.render_object(gt_obj_ids[gt_id], R.flatten(),
                           np.asarray(gt_obj_trans[gt_id]),
                           fx, fy, cx, cy, want_xyz=False, want_rgb=False)
    depth = renderer.get_depth_image(gt_obj_ids[gt_id])
    obj_mask = masks[gt_id] & avail & (depth > 0)
    avail &= ~obj_mask
    masks[gt_id] = obj_mask
  return masks


def construct_seg_mask(masks, obj_ids, height, width):
  """Merges exclusive instance masks into a label map
  (datagen_utils.py:101-115): later instances overwrite earlier ones."""
  seg = np.zeros((height, width), np.int32)
  for gt_id in range(len(obj_ids)):
    seg[masks[gt_id].astype(bool)] = obj_ids[gt_id]
  return seg


def check_gt_frag_reprojection(frag_ids, frag_coords, obj_label, K,
                               gt_obj_ids, gt_obj_quats, gt_obj_trans,
                               frag_centers, frag_sizes, gt_obj_masks):
  """The data-pipeline numerical oracle (scripts/check_train_input.py:55-99).

  Reconstructs XYZ from the fragment fields, projects with the GT pose, and
  returns the mean pixel error vs the pixel centers. Expected ~0.
  """
  errs = []
  for gt_id, obj_id in enumerate(gt_obj_ids):
    mask = gt_obj_masks[gt_id].astype(bool)
    ys, xs = np.nonzero(mask)
    if len(ys) == 0:
      continue
    ids = frag_ids[ys, xs, 0]
    coords = frag_coords[ys, xs, 0]
    xyz = frag_centers[obj_id][ids] + \
        coords * frag_sizes[obj_id][ids][:, None]
    R = geometry.quaternion_matrix(gt_obj_quats[gt_id])
    t = np.asarray(gt_obj_trans[gt_id])
    uv = geometry.project_pts(xyz, K, R, t)
    centers = np.stack([xs + 0.5, ys + 0.5], axis=1)
    errs.append(np.linalg.norm(uv - centers, axis=1))
  if not errs:
    return 0.0
  return float(np.concatenate(errs).mean())
