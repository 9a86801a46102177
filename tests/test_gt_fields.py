import numpy as np

from epos_tpu.data import gt_fields
from tests import synthetic


def make_scene_fields(knn=1):
  s = synthetic.simple_scene()
  frag_centers, frag_sizes = synthetic.fragmented_store(
      s['mesh'], num_frags=8, obj_id=s['obj_id'])
  gen = gt_fields.FragmentFieldGenerator(
      frag_centers, frag_sizes, s['renderer'], knn_frags=knn)
  K = s['K']
  # Render to derive the GT mask (as the dataset's mask_visib would).
  s['renderer'].render_object(
      s['obj_id'], s['R'].flatten(), s['t'],
      K[0, 0], K[1, 1], K[0, 2], K[1, 2])
  mask = s['renderer'].get_depth_image(s['obj_id']) > 0
  ids, coords, weights = gen.construct_frag_fields(
      s['width'], s['height'], K, [s['obj_id']], [s['q']], [s['t']],
      [mask])
  return s, frag_centers, frag_sizes, mask, ids, coords, weights


def test_fields_shapes_and_coverage():
  s, fc, fs, mask, ids, coords, weights = make_scene_fields()
  assert ids.shape == (120, 160, 1)
  assert coords.shape == (120, 160, 1, 3)
  assert weights.shape == (120, 160, 1)
  # Weights are 1 inside the mask, 0 outside.
  np.testing.assert_array_equal(weights[..., 0] > 0, mask)


def test_reprojection_oracle():
  """The reference's own pipeline oracle (check_train_input.py:55-99):
  XYZ reconstructed from the fragment fields must reproject onto the pixel
  centers with ~0 error."""
  s, fc, fs, mask, ids, coords, weights = make_scene_fields()
  err = gt_fields.check_gt_frag_reprojection(
      ids, coords, None, s['K'], [s['obj_id']], [s['q']], [s['t']],
      fc, fs, [mask])
  assert err < 0.05, f'mean reprojection error {err} px'


def test_offsets_normalized():
  s, fc, fs, mask, ids, coords, weights = make_scene_fields()
  # Normalized offsets should be bounded by ~mesh_extent / frag_size.
  m = np.abs(coords[mask]).max()
  assert m < 5.0


def test_knn3_first_is_nearest():
  s, fc, fs, mask, ids, coords, weights = make_scene_fields(knn=3)
  assert ids.shape[-1] == 3
  ys, xs = np.nonzero(mask)
  sel = (ys[::37], xs[::37])
  xyz = s['renderer'].get_local_pos_image(s['obj_id'])[sel]
  centers = fc[s['obj_id']]
  d = np.linalg.norm(xyz[:, None] - centers[ids[sel]], axis=-1)
  assert np.all(np.diff(d, axis=1) >= -1e-6)


def test_make_masks_exclusive():
  """Overlapping boxes: the later mask (higher index) keeps the overlap
  (datagen_utils.py:49-98)."""
  s = synthetic.simple_scene()
  r = s['renderer']
  r.add_object(2, s['mesh'])
  K = s['K']
  q1 = np.array([1.0, 0, 0, 0])
  t1 = np.array([0.0, 0.0, 900.0])
  q2 = np.array([1.0, 0, 0, 0])
  t2 = np.array([8.0, 0.0, 700.0])  # Nearer, shifted.
  # Full (amodal-ish) masks from renders.
  masks = []
  for oid, q, t in [(1, q1, t1), (2, q2, t2)]:
    r.render_object(oid, np.eye(3).flatten(), t, K[0, 0], K[1, 1],
                    K[0, 2], K[1, 2])
    masks.append(r.get_depth_image(oid) > 0)
  masks = np.array(masks)
  overlap = masks[0] & masks[1]
  assert overlap.any()
  out = gt_fields.make_masks_exclusive(
      masks, [1, 2], [q1, q2], [t1, t2], K, r)
  assert not (out[0] & out[1]).any()
  # Overlap assigned to the LATER instance.
  assert (out[1] & overlap).sum() == overlap.sum()
  assert (out[0] & overlap).sum() == 0


def test_seg_mask_merge():
  masks = np.zeros((2, 4, 4), bool)
  masks[0, :2] = True
  masks[1, 1:3] = True
  seg = gt_fields.construct_seg_mask(masks, [5, 7], 4, 4)
  assert seg[0, 0] == 5
  assert seg[1, 0] == 7  # Later instance wins (datagen_utils.py:101-115).
  assert seg[3, 0] == 0
