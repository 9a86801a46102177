import numpy as np

from epos_tpu.train import pose_eval
from epos_tpu.ops import geometry
from tests import synthetic


def box_pts(n=200, seed=0):
  r = np.random.default_rng(seed)
  return r.uniform(-1, 1, (n, 3)) * np.array([30, 20, 15])


def test_add_zero_for_identical_pose():
  pts = box_pts()
  R = geometry.quaternion_matrix(np.array([0.9, 0.1, 0.2, 0.3]) / 1.0)
  t = np.array([1, 2, 500.0])
  assert pose_eval.add_error(pts, R, t, R, t) == 0.0
  assert pose_eval.mssd_error(pts, R, t, R, t) == 0.0


def test_add_translation_offset():
  pts = box_pts()
  R = np.eye(3)
  t = np.zeros(3)
  t2 = np.array([3.0, 4.0, 0.0])
  assert abs(pose_eval.add_error(pts, R, t2, R, t) - 5.0) < 1e-9
  assert abs(pose_eval.mssd_error(pts, R, t2, R, t) - 5.0) < 1e-9


def test_adi_symmetric_tolerance():
  # A dense ring: 180-deg rotation about z has ~0 ADI but large ADD.
  ang = np.linspace(0, 2 * np.pi, 720, endpoint=False)
  pts = np.stack([np.cos(ang) * 50, np.sin(ang) * 50, np.zeros_like(ang)], 1)
  Rz = geometry.quaternion_matrix(np.array([0.0, 0, 0, 1.0]))
  t = np.zeros(3)
  add = pose_eval.add_error(pts, Rz, t, np.eye(3), t)
  adi = pose_eval.adi_error(pts, Rz, t, np.eye(3), t)
  assert add > 50
  assert adi < 0.5


def test_mssd_with_symmetry():
  pts = box_pts()
  Rz = geometry.quaternion_matrix(np.array([0.0, 0, 0, 1.0]))  # 180 deg z.
  syms = [{'R': Rz, 't': np.zeros(3)}]
  err_nosym = pose_eval.mssd_error(pts, Rz, np.zeros(3), np.eye(3),
                                   np.zeros(3))
  err_sym = pose_eval.mssd_error(pts, Rz, np.zeros(3), np.eye(3),
                                 np.zeros(3), syms)
  assert err_nosym > 10
  assert err_sym < 1e-5


def test_continuous_sym_discretization():
  syms = pose_eval.continuous_syms_to_discrete([0, 0, 1], n=8)
  assert len(syms) == 7
  for s in syms:
    R = s['R']
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-9)
    np.testing.assert_allclose(R @ np.array([0, 0, 1.0]), [0, 0, 1],
                               atol=1e-9)


def test_vsd_zero_and_one():
  s = synthetic.simple_scene()
  K, R, t = s['K'], s['R'], s['t']
  errs = pose_eval.vsd_error(s['renderer'], s['obj_id'], K, R, t, R, t,
                             diameter=70.0)
  assert max(errs) == 0.0
  # Far-away estimate: error ~1.
  errs_bad = pose_eval.vsd_error(
      s['renderer'], s['obj_id'], K, R, t + np.array([500.0, 0, 0]), R, t,
      diameter=70.0)
  assert min(errs_bad) > 0.9


def test_average_recall_and_matching():
  pts = box_pts()
  R = np.eye(3)
  gt_per_image = {(1, 0): [{'obj_id': 1, 'R': R, 't': np.zeros(3)}],
                  (1, 1): [{'obj_id': 1, 'R': R, 't': np.zeros(3)}]}
  K = np.array([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]])
  results = [
      # Perfect estimate for im 0.
      {'scene_id': 1, 'im_id': 0, 'obj_id': 1, 'R': R,
       't': np.array([0, 0, 0.0]), 'score': 1.0},
      # No estimate for im 1 -> counted as a miss.
  ]
  out = pose_eval.evaluate_localization(
      results, gt_per_image, {1: pts}, {1: 70.0},
      {(1, 0): K, (1, 1): K})
  assert out['ar_mssd'] == 0.5
  assert out['ar_mspd'] == 0.5
  assert out['ar'] == 0.5


def test_matched_translation_error_decomposition():
  """matches_terr reports |dt_z| (depth) vs ||dt_xy|| (lateral) of the
  ADI-matched pair — the round-3 depth-error diagnosis as a tracked
  output."""
  pts = box_pts()
  R = np.eye(3)
  t_gt = np.array([10.0, 20.0, 400.0])
  gt_per_image = {(1, 0): [{'obj_id': 1, 'R': R, 't': t_gt}]}
  K = np.array([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]])
  results = [{'scene_id': 1, 'im_id': 0, 'obj_id': 1, 'R': R,
              't': t_gt + np.array([3.0, 4.0, 12.0]), 'score': 1.0}]
  out = pose_eval.evaluate_localization(
      results, gt_per_image, {1: pts}, {1: 70.0}, {(1, 0): K})
  (obj, depth, lateral, norm, signed), = out['matches_terr']
  assert obj == 1
  np.testing.assert_allclose(depth, 12.0)
  np.testing.assert_allclose(lateral, 5.0)
  np.testing.assert_allclose(norm, 13.0)
  np.testing.assert_allclose(signed, 12.0)  # + = pushed away from camera
  # An unmatched GT contributes nothing (no estimates for this image).
  out2 = pose_eval.evaluate_localization(
      [], gt_per_image, {1: pts}, {1: 70.0}, {(1, 0): K})
  assert out2['matches_terr'] == []


def test_matched_count_score_order_beats_fixed_assignment():
  """bop_toolkit matching is per-threshold and score-ordered: est0 (higher
  score) takes gt0 at err 0.1, est1 then takes gt1 at err 0.3 — both match
  at threshold 0.35. A fixed global min-error assignment would pair
  est1->gt0 (err 0.08) and leave gt1 unmatched (inf), losing one recall."""
  err = np.array([[0.1, 0.08],     # gt0 vs [est0, est1]
                  [np.inf, 0.3]])  # gt1
  assert pose_eval.matched_count(err, 0.35) == 2
  assert pose_eval.matched_count(err, 0.2) == 1   # only gt0 reachable
  assert pose_eval.matched_count(err, 0.05) == 0
  assert pose_eval.matched_count(np.zeros((2, 0)), 0.5) == 0
