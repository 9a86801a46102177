"""Unit tests for scripts/eval_poses.py GT loading: MSPD width sourcing and
the BOP19 test-targets denominator (bop_toolkit eval_calc_scores semantics)."""

import json
import os

import numpy as np

from epos_tpu.data import bop
import scripts.eval_poses as ep


def _write_split(root, dataset='fakeds', split='test', scene_id=1,
                 im_ids=(0, 1), cx=100.0, depth_width=None):
  """Minimal on-disk BOP split: scene_gt + scene_camera (+ optional depth)."""
  scene_dir = os.path.join(root, dataset, split, f'{scene_id:06d}')
  os.makedirs(scene_dir, exist_ok=True)
  R = np.eye(3).flatten().tolist()
  gt = {str(i): [{'cam_R_m2c': R, 'cam_t_m2c': [0, 0, 500.0], 'obj_id': 1}]
        for i in im_ids}
  K = [300.0, 0.0, cx, 0.0, 300.0, 80.0, 0.0, 0.0, 1.0]
  cam = {str(i): {'cam_K': K, 'depth_scale': 0.1} for i in im_ids}
  with open(os.path.join(scene_dir, 'scene_gt.json'), 'w') as f:
    json.dump(gt, f)
  with open(os.path.join(scene_dir, 'scene_camera.json'), 'w') as f:
    json.dump(cam, f)
  if depth_width is not None:
    import cv2
    os.makedirs(os.path.join(scene_dir, 'depth'), exist_ok=True)
    d = np.full((120, depth_width), 5000, np.uint16)
    for i in im_ids:
      cv2.imwrite(os.path.join(scene_dir, 'depth', f'{i:06d}.png'), d)
  return bop.get_split_params(root, dataset, split)


def test_mspd_width_from_split_not_principal_point(tmp_path):
  # Off-center principal point (cx=100): the old 2*cx heuristic would give
  # width 200; the split's nominal size (640 for unknown datasets) is right.
  sp = _write_split(str(tmp_path), cx=100.0)
  gt, Ks, widths, depths = ep.load_split_gt(
      sp, models_pts={1: np.zeros((4, 3))}, dataset='fakeds', split='test',
      bop_path=str(tmp_path))
  assert set(gt) == {(1, 0), (1, 1)}
  assert all(w == 640.0 for w in widths.values())
  assert not depths


def test_mspd_width_from_depth_image(tmp_path):
  # When the split ships depth, the actual per-image width wins over the
  # nominal table (synthetic sets are not in _DATASET_IM_SIZE).
  sp = _write_split(str(tmp_path), cx=160.0, depth_width=320)
  gt, Ks, widths, depths = ep.load_split_gt(
      sp, models_pts={1: np.zeros((4, 3))}, dataset='fakeds', split='test',
      bop_path=str(tmp_path))
  assert all(w == 320.0 for w in widths.values())
  assert set(depths) == {(1, 0), (1, 1)}


def test_targets_file_restricts_denominator(tmp_path):
  # With test_targets_bop19.json present, untargeted images' GT must not
  # count as misses (bop_toolkit evaluates only the target list).
  sp = _write_split(str(tmp_path), im_ids=(0, 1, 2))
  with open(os.path.join(str(tmp_path), 'fakeds',
                         'test_targets_bop19.json'), 'w') as f:
    json.dump([{'scene_id': 1, 'im_id': 0, 'obj_id': 1, 'inst_count': 1},
               {'scene_id': 1, 'im_id': 2, 'obj_id': 1, 'inst_count': 1}], f)
  gt, Ks, widths, _ = ep.load_split_gt(
      sp, models_pts={1: np.zeros((4, 3))}, dataset='fakeds', split='test',
      bop_path=str(tmp_path))
  assert set(gt) == {(1, 0), (1, 2)}
  assert set(Ks) == {(1, 0), (1, 2)}
  # Non-test splits ignore the targets file.
  sp_train = _write_split(str(tmp_path), split='train', im_ids=(0, 1, 2))
  gt_tr, _, _, _ = ep.load_split_gt(
      sp_train, models_pts={1: np.zeros((4, 3))}, dataset='fakeds',
      split='train', bop_path=str(tmp_path))
  assert set(gt_tr) == {(1, 0), (1, 1), (1, 2)}
