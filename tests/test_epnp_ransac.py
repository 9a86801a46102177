import jax
import jax.numpy as jnp
import numpy as np

from epos_tpu.ops import corresp as corresp_lib
from epos_tpu.ops import epnp, geometry, ransac

K = np.array([[572.4, 0, 325.3], [0, 573.6, 242.0], [0, 0, 1.0]])


def random_pose(seed=0):
  r = np.random.default_rng(seed)
  q = r.normal(size=4)
  q /= np.linalg.norm(q)
  R = geometry.quaternion_matrix(q)
  t = np.array([r.uniform(-50, 50), r.uniform(-50, 50), r.uniform(600, 1200)])
  return R, t


def make_corrs(n=40, seed=0, noise=0.0):
  r = np.random.default_rng(seed)
  R, t = random_pose(seed + 1)
  pts = r.uniform(-60, 60, size=(n, 3))
  uv = np.asarray(geometry.project_pts(pts, K, R, t))
  uv += r.normal(scale=noise, size=uv.shape)
  return pts, uv, R, t


def pose_errors(R_est, t_est, R, t):
  dR = np.asarray(R_est) @ R.T
  ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
  dt = np.linalg.norm(np.asarray(t_est) - t)
  return ang, dt


def test_epnp_exact():
  pts, uv, R, t = make_corrs(30, seed=3)
  R_est, t_est = epnp.solve_epnp(
      jnp.asarray(pts), jnp.asarray(uv), jnp.asarray(K), jnp.ones(30))
  ang, dt = pose_errors(R_est, t_est, R, t)
  assert ang < 0.1, f'rotation error {ang} deg'
  assert dt < 1.0, f'translation error {dt} mm'


def test_epnp_noise_robust():
  pts, uv, R, t = make_corrs(100, seed=4, noise=0.5)
  R_est, t_est = epnp.solve_epnp(
      jnp.asarray(pts), jnp.asarray(uv), jnp.asarray(K), jnp.ones(100))
  ang, dt = pose_errors(R_est, t_est, R, t)
  assert ang < 2.0
  assert dt < 10.0


def test_epnp_weights_mask_outliers():
  pts, uv, R, t = make_corrs(30, seed=5)
  # Append garbage rows with zero weight.
  pts_aug = np.concatenate([pts, np.random.default_rng(9).uniform(
      -500, 500, (10, 3))])
  uv_aug = np.concatenate([uv, np.random.default_rng(10).uniform(
      0, 640, (10, 2))])
  w = np.concatenate([np.ones(30), np.zeros(10)])
  R_est, t_est = epnp.solve_epnp(
      jnp.asarray(pts_aug), jnp.asarray(uv_aug), jnp.asarray(K),
      jnp.asarray(w))
  ang, dt = pose_errors(R_est, t_est, R, t)
  assert ang < 0.1 and dt < 1.0


def test_epnp_vmap_jit():
  pts, uv, R, t = make_corrs(24, seed=6)
  batch_pts = jnp.tile(jnp.asarray(pts)[None], (8, 1, 1))
  batch_uv = jnp.tile(jnp.asarray(uv)[None], (8, 1, 1))
  f = jax.jit(jax.vmap(
      lambda p, u: epnp.solve_epnp(p, u, jnp.asarray(K), jnp.ones(24))))
  R_b, t_b = f(batch_pts, batch_uv)
  assert R_b.shape == (8, 3, 3)
  ang, dt = pose_errors(R_b[3], t_b[3], R, t)
  assert ang < 0.1 and dt < 1.0


def test_reprojection_errors():
  pts, uv, R, t = make_corrs(10, seed=7)
  e = epnp.reprojection_errors(
      jnp.asarray(pts), jnp.asarray(uv), jnp.asarray(K),
      jnp.asarray(R), jnp.asarray(t))
  assert float(jnp.max(e)) < 1e-3


def _np_establish(obj_confs, frag_confs, frag_coords, frag_centers,
                  frag_sizes, output_scale, tau_a, tau_b):
  """Direct numpy port of the reference semantics (corresp.py:9-101) used as
  the parity oracle for the fused device implementation."""
  out = {}
  num_objs = frag_confs.shape[2]
  for o in range(num_objs):
    obj_id = o + 1
    obj_conf = obj_confs[:, :, obj_id]
    obj_mask = obj_conf > tau_a
    if not np.any(obj_mask):
      continue
    yx = np.stack(np.nonzero(obj_mask), 0).T
    im_coords = (np.flip(yx, 1).astype(np.float64) + 0.5) / output_scale
    fconf = frag_confs[obj_mask][:, o, :]
    fmax = fconf.max(1, keepdims=True)
    fmask = fconf > fmax * tau_b
    finds = np.stack(np.nonzero(fmask), 0).T
    c2d = im_coords[finds[:, 0]]
    c3d = frag_centers[o][finds[:, 1]] + \
        frag_coords[obj_mask][:, o][fmask] * \
        frag_sizes[o][finds[:, 1]][:, None]
    conf = obj_conf[obj_mask][finds[:, 0]] * fconf[fmask]
    out[obj_id] = {'coord_2d': c2d, 'coord_3d': c3d, 'conf': conf}
  return out


def test_corresp_matches_reference_semantics():
  r = np.random.default_rng(11)
  h, w, O, F = 12, 16, 3, 5
  obj_logits = r.normal(size=(h, w, O + 1)) * 2
  obj_confs = np.asarray(jax.nn.softmax(jnp.asarray(obj_logits), -1))
  frag_logits = r.normal(size=(h, w, O, F)) * 2
  frag_confs = np.asarray(jax.nn.softmax(jnp.asarray(frag_logits), -1))
  frag_coords = r.normal(size=(h, w, O, F, 3)).astype(np.float32)
  centers = r.uniform(-40, 40, (O, F, 3))
  sizes = r.uniform(5, 30, (O, F))

  got = corresp_lib.establish_many_to_many(
      jnp.asarray(obj_confs), jnp.asarray(frag_confs),
      jnp.asarray(frag_coords), jnp.asarray(centers), jnp.asarray(sizes),
      output_scale=0.25, capacity=h * w * F)
  want = _np_establish(obj_confs, frag_confs, frag_coords, centers, sizes,
                       0.25, 0.1, 0.5)

  for o in range(O):
    cnt = int(got.count[o])
    if o + 1 not in want:
      assert cnt == 0
      continue
    exp = want[o + 1]
    assert cnt == exp['coord_2d'].shape[0]
    # Compare as sets sorted by confidence.
    gi = np.argsort(-np.asarray(got.conf[o][:cnt]))
    ei = np.argsort(-exp['conf'])
    np.testing.assert_allclose(np.asarray(got.conf[o][:cnt])[gi],
                               exp['conf'][ei], rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got.coord_2d[o][:cnt])[gi],
                               exp['coord_2d'][ei], rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got.coord_3d[o][:cnt])[gi],
                               exp['coord_3d'][ei], rtol=1e-3, atol=1e-3)


def test_corresp_symmetric_object_unbounded_frags():
  """Regression (VERDICT r1 #5): a symmetric object where 8+ fragments pass
  tau_b at every object pixel (e.g. a T-LESS cylinder with ambiguous
  fragments) must keep ALL of them — the extracted set matches the
  reference oracle with the DEFAULT extraction config (no per-pixel cap)."""
  r = np.random.default_rng(17)
  h, w, O, F = 12, 16, 2, 16
  S = 9  # fragments tied per pixel (> the old frags_per_pixel=4 cap)
  obj_logits = r.normal(size=(h, w, O + 1)) * 2
  obj_confs = np.asarray(jax.nn.softmax(jnp.asarray(obj_logits), -1))
  # Fragment confidences: S near-equal winners, the rest far below tau_b.
  frag_logits = np.full((h, w, O, F), -6.0)
  winners = np.stack([r.permutation(F)[:S] for _ in range(h * w * O)])
  winners = winners.reshape(h, w, O, S)
  jitter = r.uniform(-0.05, 0.05, winners.shape)
  np.put_along_axis(frag_logits, winners, 2.0 + jitter, axis=-1)
  frag_confs = np.asarray(jax.nn.softmax(jnp.asarray(frag_logits), -1))
  frag_coords = r.normal(size=(h, w, O, F, 3)).astype(np.float32)
  centers = r.uniform(-40, 40, (O, F, 3))
  sizes = r.uniform(5, 30, (O, F))

  want = _np_establish(obj_confs, frag_confs, frag_coords, centers, sizes,
                       0.25, 0.1, 0.5)
  # The fixture really exceeds the old cap: some pixel has > 4 survivors.
  max_survivors = max(
      int((frag_confs[y, x, o] >
           frag_confs[y, x, o].max() * 0.5).sum())
      for y in range(h) for x in range(w) for o in range(O))
  assert max_survivors > 4, max_survivors

  got = corresp_lib.establish_many_to_many(
      jnp.asarray(obj_confs), jnp.asarray(frag_confs),
      jnp.asarray(frag_coords), jnp.asarray(centers), jnp.asarray(sizes),
      output_scale=0.25, capacity=2048)
  for o in range(O):
    cnt = int(got.count[o])
    exp = want.get(o + 1)
    if exp is None:
      assert cnt == 0
      continue
    assert cnt == min(exp['conf'].shape[0], 2048)
    gi = np.argsort(-np.asarray(got.conf[o][:cnt]))
    ei = np.argsort(-exp['conf'])[:cnt]
    np.testing.assert_allclose(np.asarray(got.conf[o][:cnt])[gi],
                               exp['conf'][ei], rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got.coord_3d[o][:cnt])[gi],
                               exp['coord_3d'][ei], rtol=1e-3, atol=1e-3)


def test_ransac_with_outliers():
  pts, uv, R, t = make_corrs(120, seed=12, noise=0.3)
  r = np.random.default_rng(13)
  n_out = 60
  pts_all = np.concatenate([pts, r.uniform(-60, 60, (n_out, 3))])
  uv_all = np.concatenate([uv, r.uniform(0, 640, (n_out, 2))])
  conf = np.concatenate([np.ones(120), np.ones(n_out) * 0.5])
  px = np.arange(180)
  valid = np.ones(180, bool)

  res = ransac.fit_instances(
      jnp.asarray(uv_all, jnp.float32),
      jnp.asarray(pts_all, jnp.float32),
      jnp.asarray(conf, jnp.float32), jnp.asarray(px, jnp.int32),
      jnp.asarray(valid), jnp.asarray(K, jnp.float32), npx=256,
      rng=jax.random.PRNGKey(0), num_hypotheses=128,
      inlier_thresh=4.0, max_instances=1, num_instances=1,
      min_quality=0.3)
  assert bool(res.valid[0])
  ang, dt = pose_errors(res.R[0], res.t[0], R, t)
  assert ang < 2.0, f'rotation err {ang}'
  assert dt < 15.0, f'translation err {dt}'
  assert int(res.num_inliers[0]) > 100


def test_ransac_two_instances():
  pts1, uv1, R1, t1 = make_corrs(80, seed=14, noise=0.2)
  pts2, uv2, R2, t2 = make_corrs(80, seed=15, noise=0.2)
  pts_all = np.concatenate([pts1, pts2]).astype(np.float32)
  uv_all = np.concatenate([uv1, uv2]).astype(np.float32)
  conf = np.ones(160, np.float32)
  px = np.arange(160)
  res = ransac.fit_instances(
      jnp.asarray(uv_all), jnp.asarray(pts_all), jnp.asarray(conf),
      jnp.asarray(px, jnp.int32), jnp.ones(160, bool),
      jnp.asarray(K, jnp.float32), npx=256, rng=jax.random.PRNGKey(1),
      num_hypotheses=256, inlier_thresh=4.0, max_instances=2,
      num_instances=2, min_quality=0.5)
  assert bool(res.valid[0]) and bool(res.valid[1])
  errs = []
  for i in range(2):
    e1 = pose_errors(res.R[i], res.t[i], R1, t1)
    e2 = pose_errors(res.R[i], res.t[i], R2, t2)
    errs.append(min(e1[0], e2[0]))
  assert max(errs) < 3.0, errs
  # The two poses must differ (found both instances).
  ang01 = pose_errors(res.R[0], np.asarray(res.t[0]),
                      np.asarray(res.R[1]), np.asarray(res.t[1]))[0]
  assert ang01 > 5.0


def test_ransac_three_instances_default_quality():
  """Regression (VERDICT r1 #3): 3 instances of ONE object must all be
  recovered at the DEFAULT min_hypothesis_quality=0.5 — quality is relative
  to the best accepted instance, not to the object's full correspondence
  pool (where each of N instances would cap near 1/N).

  Mirrors pyprogressivex.find6DPoses multi-model behavior
  (reference scripts/infer.py:470-503)."""
  from epos_tpu.config import Config
  default_tau_q = Config().min_hypothesis_quality
  assert default_tau_q == 0.5

  poses, chunks = [], []
  for i in range(3):
    pts, uv, R, t = make_corrs(60, seed=30 + i, noise=0.2)
    poses.append((R, t))
    chunks.append((pts, uv))
  pts_all = np.concatenate([c[0] for c in chunks]).astype(np.float32)
  uv_all = np.concatenate([c[1] for c in chunks]).astype(np.float32)
  n = 180
  res = ransac.fit_instances(
      jnp.asarray(uv_all), jnp.asarray(pts_all), jnp.ones(n, jnp.float32),
      jnp.arange(n, dtype=jnp.int32), jnp.ones(n, bool),
      jnp.asarray(K, jnp.float32), npx=256, rng=jax.random.PRNGKey(2),
      num_hypotheses=256, inlier_thresh=4.0, max_instances=3,
      num_instances=3, min_quality=default_tau_q)
  assert bool(res.valid.all()), np.asarray(res.valid)
  # Every GT pose matched by exactly one estimate.
  matched = set()
  for i in range(3):
    errs = [pose_errors(res.R[i], res.t[i], R, t)[0] for R, t in poses]
    j = int(np.argmin(errs))
    assert errs[j] < 3.0, errs
    matched.add(j)
  assert matched == {0, 1, 2}


def test_ransac_rejects_spurious_small_cluster():
  """2 real instances + a small random-outlier cloud: with capacity for 3,
  only the 2 real instances are accepted at default tau_q=0.5, and inliers
  of rejected rounds are not consumed."""
  pts1, uv1, R1, t1 = make_corrs(80, seed=40, noise=0.2)
  pts2, uv2, R2, t2 = make_corrs(80, seed=41, noise=0.2)
  r = np.random.default_rng(42)
  n_out = 20
  pts_all = np.concatenate(
      [pts1, pts2, r.uniform(-60, 60, (n_out, 3))]).astype(np.float32)
  uv_all = np.concatenate(
      [uv1, uv2, r.uniform(0, 640, (n_out, 2))]).astype(np.float32)
  n = 180
  res = ransac.fit_instances(
      jnp.asarray(uv_all), jnp.asarray(pts_all), jnp.ones(n, jnp.float32),
      jnp.arange(n, dtype=jnp.int32), jnp.ones(n, bool),
      jnp.asarray(K, jnp.float32), npx=256, rng=jax.random.PRNGKey(5),
      num_hypotheses=256, inlier_thresh=4.0, max_instances=3,
      num_instances=3, min_quality=0.5)
  assert bool(res.valid[0]) and bool(res.valid[1])
  assert not bool(res.valid[2]), 'outlier cloud must not form an instance'
  for i in range(2):
    e1 = pose_errors(res.R[i], res.t[i], R1, t1)[0]
    e2 = pose_errors(res.R[i], res.t[i], R2, t2)[0]
    assert min(e1, e2) < 3.0


def test_detection_rejects_spurious_absent_object():
  """Regression (VERDICT r2 #3): in DETECTION mode every object is enabled,
  so an ABSENT object whose few spurious tau_a pixels happen to admit a
  6-point fit must NOT emit a pose. The absolute acceptance floor
  (min_inlier_mass, mirroring pyprogressivex's absolute min_coverage role,
  reference infer.py:84-86,482) rejects it: the instance-relative tau_q
  criteria alone auto-pass the first instance. A PRESENT object with the
  same settings must still be recovered."""
  from epos_tpu.config import Config
  cfg = Config()

  # Absent object: 12 scattered spurious correspondences at near-threshold
  # confidence (the obj-conf head leaks a little probability mass).
  r = np.random.default_rng(50)
  n_sp = 12
  pts_sp = r.uniform(-60, 60, (n_sp, 3)).astype(np.float32)
  uv_sp = r.uniform(0, 640, (n_sp, 2)).astype(np.float32)
  conf_sp = r.uniform(0.12, 0.35, n_sp).astype(np.float32)
  res = ransac.fit_instances(
      jnp.asarray(uv_sp), jnp.asarray(pts_sp), jnp.asarray(conf_sp),
      jnp.arange(n_sp, dtype=jnp.int32), jnp.ones(n_sp, bool),
      jnp.asarray(K, jnp.float32), npx=256, rng=jax.random.PRNGKey(7),
      num_hypotheses=256, inlier_thresh=cfg.inlier_thresh,
      max_instances=2, num_instances=2,
      min_quality=cfg.min_hypothesis_quality,
      min_inlier_mass=cfg.min_inlier_mass)
  assert not bool(np.asarray(res.valid).any()), (
      'absent object emitted a pose: %s' % np.asarray(res.valid))

  # Present object at realistic confidences: still recovered at the same
  # default settings.
  pts, uv, R, t = make_corrs(100, seed=51, noise=0.2)
  conf = r.uniform(0.5, 1.0, 100).astype(np.float32)
  res = ransac.fit_instances(
      jnp.asarray(uv, jnp.float32), jnp.asarray(pts, jnp.float32),
      jnp.asarray(conf), jnp.arange(100, dtype=jnp.int32),
      jnp.ones(100, bool), jnp.asarray(K, jnp.float32), npx=256,
      rng=jax.random.PRNGKey(8), num_hypotheses=256,
      inlier_thresh=cfg.inlier_thresh, max_instances=2, num_instances=2,
      min_quality=cfg.min_hypothesis_quality,
      min_inlier_mass=cfg.min_inlier_mass)
  assert bool(res.valid[0])
  ang, dt = pose_errors(res.R[0], res.t[0], R, t)
  assert ang < 2.0 and dt < 15.0, (ang, dt)


def test_prosac_shuffled_buffer_order():
  """Regression (VERDICT r2 #8): PROSAC must rank by the `conf` values, not
  by buffer position — a shuffled (non-confidence-sorted) buffer must still
  recover the pose with use_prosac=True."""
  pts, uv, R, t = make_corrs(120, seed=60, noise=0.2)
  r = np.random.default_rng(61)
  n_out = 60
  pts_all = np.concatenate([pts, r.uniform(-60, 60, (n_out, 3))])
  uv_all = np.concatenate([uv, r.uniform(0, 640, (n_out, 2))])
  conf = np.concatenate([r.uniform(0.7, 1.0, 120),
                         r.uniform(0.1, 0.3, n_out)])
  perm = r.permutation(180)  # inliers and outliers interleaved
  res = ransac.fit_instances(
      jnp.asarray(uv_all[perm], jnp.float32),
      jnp.asarray(pts_all[perm], jnp.float32),
      jnp.asarray(conf[perm], jnp.float32),
      jnp.arange(180, dtype=jnp.int32), jnp.ones(180, bool),
      jnp.asarray(K, jnp.float32), npx=256, rng=jax.random.PRNGKey(9),
      num_hypotheses=128, inlier_thresh=4.0, max_instances=1,
      num_instances=1, min_quality=0.3, use_prosac=True)
  assert bool(res.valid[0])
  ang, dt = pose_errors(res.R[0], res.t[0], R, t)
  assert ang < 2.0, f'rotation err {ang}'
  assert dt < 15.0, f'translation err {dt}'


def test_refine_pose_gn_converges():
  pts, uv, R, t = make_corrs(60, seed=21, noise=0.0)
  # Perturb the pose and refine back.
  dR = geometry.quaternion_matrix(np.array([0.999, 0.03, -0.02, 0.01]) /
                                  np.linalg.norm([0.999, 0.03, -0.02, 0.01]))
  R0 = dR @ R
  t0 = t + np.array([5.0, -4.0, 20.0])
  R1, t1 = epnp.refine_pose_gn(
      jnp.asarray(pts, jnp.float32), jnp.asarray(uv, jnp.float32),
      jnp.asarray(K, jnp.float32), jnp.ones(60),
      jnp.asarray(R0, jnp.float32), jnp.asarray(t0, jnp.float32), iters=8)
  ang, dt = pose_errors(R1, t1, R, t)
  assert ang < 0.05, ang
  assert dt < 0.5, dt


def test_ransac_corrupted_fragment_confs():
  """Regression for the verification finding: 40% of correspondences are
  wrong-fragment outliers with plausible confidences — MSAC scoring must
  still pick the true pose."""
  pts, uv, R, t = make_corrs(150, seed=22, noise=0.2)
  r = np.random.default_rng(23)
  n_bad = 100
  # Outliers: 2D points from the true projection set, 3D from random
  # fragments (mimics wrong fragment classification).
  bad_uv = uv[r.integers(0, 150, n_bad)]
  bad_pts = r.uniform(-60, 60, (n_bad, 3))
  pts_all = np.concatenate([pts, bad_pts]).astype(np.float32)
  uv_all = np.concatenate([uv, bad_uv]).astype(np.float32)
  conf = np.concatenate([np.full(150, 0.8), np.full(n_bad, 0.9)]).astype(
      np.float32)
  px = np.concatenate([np.arange(150), r.integers(0, 150, n_bad)])
  res = ransac.fit_instances(
      jnp.asarray(uv_all), jnp.asarray(pts_all), jnp.asarray(conf),
      jnp.asarray(px, jnp.int32), jnp.ones(250, bool),
      jnp.asarray(K, jnp.float32), npx=256, rng=jax.random.PRNGKey(3),
      num_hypotheses=256, inlier_thresh=4.0, max_instances=1,
      num_instances=1, min_quality=0.2)
  assert bool(res.valid[0])
  ang, dt = pose_errors(res.R[0], res.t[0], R, t)
  assert ang < 2.0, f'rotation err {ang}'
  assert dt < 15.0, f'translation err {dt}'


def test_fused_corresp_matches_unfused():
  """Pallas-fused extraction (interpret mode on CPU) must match the XLA
  reference path on identical inputs."""
  r = np.random.default_rng(30)
  h, w, O, F = 12, 16, 3, 8
  obj_logits = r.normal(size=(h, w, O + 1)) * 2
  obj_confs = jnp.asarray(jax.nn.softmax(jnp.asarray(obj_logits), -1))
  frag_logits = jnp.asarray(r.normal(size=(h, w, O, F)) * 2, jnp.float32)
  frag_confs = jax.nn.softmax(frag_logits, -1)
  frag_coords = jnp.asarray(r.normal(size=(h, w, O, F, 3)), jnp.float32)
  centers = jnp.asarray(r.uniform(-40, 40, (O, F, 3)), jnp.float32)
  sizes = jnp.asarray(r.uniform(5, 30, (O, F)), jnp.float32)

  a = corresp_lib.establish_many_to_many(
      obj_confs, frag_confs, frag_coords, centers, sizes, 0.25,
      capacity=256)
  b = corresp_lib.establish_many_to_many_fused(
      obj_confs, frag_logits, frag_coords, centers, sizes, 0.25,
      capacity=256)
  np.testing.assert_array_equal(np.asarray(a.count), np.asarray(b.count))
  for o in range(O):
    n = int(a.count[o])
    ga = np.argsort(-np.asarray(a.conf[o][:n]))
    gb = np.argsort(-np.asarray(b.conf[o][:n]))
    np.testing.assert_allclose(np.asarray(a.conf[o][:n])[ga],
                               np.asarray(b.conf[o][:n])[gb], rtol=1e-4)
    np.testing.assert_allclose(np.asarray(a.coord_3d[o][:n])[ga],
                               np.asarray(b.coord_3d[o][:n])[gb],
                               rtol=1e-3, atol=1e-3)


def test_approx_topk_selection_overlaps_exact():
  """approx_topk routes selection through lax.approx_max_k (recall 0.95
  on TPU; exact fallback on CPU). The kept-correspondence confidence MASS
  must cover >= 90% of the exact selection's mass — the property that
  makes the tail loss immaterial to the confidence-weighted RANSAC."""
  r = np.random.default_rng(31)
  h, w, O, F = 24, 32, 3, 8
  obj_confs = jnp.asarray(jax.nn.softmax(
      jnp.asarray(r.normal(size=(h, w, O + 1)) * 2), -1))
  frag_confs = jax.nn.softmax(
      jnp.asarray(r.normal(size=(h, w, O, F)) * 2, jnp.float32), -1)
  frag_coords = jnp.asarray(r.normal(size=(h, w, O, F, 3)), jnp.float32)
  centers = jnp.asarray(r.uniform(-40, 40, (O, F, 3)), jnp.float32)
  sizes = jnp.asarray(r.uniform(5, 30, (O, F)), jnp.float32)

  kw = dict(output_scale=0.25, capacity=128)
  exact = corresp_lib.establish_many_to_many(
      obj_confs, frag_confs, frag_coords, centers, sizes, **kw)
  approx = corresp_lib.establish_many_to_many(
      obj_confs, frag_confs, frag_coords, centers, sizes,
      approx_topk=True, **kw)
  for o in range(O):
    ne, na = int(exact.count[o]), int(approx.count[o])
    mass_e = float(jnp.sum(exact.conf[o][:ne]))
    mass_a = float(jnp.sum(approx.conf[o][:na]))
    if mass_e == 0.0:
      assert mass_a == 0.0
      continue
    assert mass_a >= 0.9 * mass_e, (o, mass_a, mass_e)
    # Every kept correspondence is a genuine survivor (subset property:
    # approx may DROP entries, never invent them).
    sel_a = {(int(p), int(f)) for p, f, v in zip(
        np.asarray(approx.px_id[o]), np.asarray(approx.frag_id[o]),
        np.asarray(approx.valid[o])) if v}
    sel_e = {(int(p), int(f)) for p, f, v in zip(
        np.asarray(exact.px_id[o]), np.asarray(exact.frag_id[o]),
        np.asarray(exact.valid[o])) if v}
    assert sel_a <= sel_e or len(sel_a - sel_e) <= max(1, len(sel_a) // 10)


def test_epnp_planar_points():
  """Near-planar point sets (object showing one face) — the classic EPnP
  N=1 degeneracy. Regression for the synthetic end-to-end failure."""
  r = np.random.default_rng(40)
  R, t = random_pose(41)
  # Points on a plane with tiny jitter (one box face).
  pts = np.stack([r.uniform(-30, 30, 40), r.uniform(-20, 20, 40),
                  np.full(40, 15.0) + r.normal(scale=0.2, size=40)], 1)
  uv = np.asarray(geometry.project_pts(pts, K, R, t))
  R_est, t_est = epnp.solve_epnp(
      jnp.asarray(pts, jnp.float32), jnp.asarray(uv, jnp.float32),
      jnp.asarray(K, jnp.float32), jnp.ones(40), num_basis=4)
  ang, dt = pose_errors(R_est, t_est, R, t)
  assert ang < 3.0, f'planar rotation error {ang} deg'
  assert dt < 20.0, f'planar translation error {dt} mm'


def test_ransac_small_clustered_set():
  """Few clustered correspondences from a small object at low resolution —
  mirrors the real synthetic-scene failure (12-30 corrs, 1-2 visible
  faces)."""
  r = np.random.default_rng(42)
  R, t = random_pose(43)
  pts = np.stack([r.uniform(-25, 25, 18), r.uniform(-18, 18, 18),
                  np.full(18, 12.5)], 1)  # one face
  uv = np.asarray(geometry.project_pts(pts, K, R, t))
  uv += r.normal(scale=1.0, size=uv.shape)  # stride-4 pixel-center noise
  # A couple of wrong-fragment outliers.
  pts_all = np.concatenate([pts, r.uniform(-25, 25, (3, 3))])
  uv_all = np.concatenate([uv, uv[r.integers(0, 18, 3)]])
  res = ransac.fit_instances(
      jnp.asarray(uv_all, jnp.float32), jnp.asarray(pts_all, jnp.float32),
      jnp.ones(21, jnp.float32), jnp.asarray(np.arange(21), jnp.int32),
      jnp.ones(21, bool), jnp.asarray(K, jnp.float32), npx=256,
      rng=jax.random.PRNGKey(5), num_hypotheses=128, inlier_thresh=4.0,
      max_instances=1, num_instances=1, min_quality=0.3)
  assert bool(res.valid[0])
  ang, dt = pose_errors(res.R[0], res.t[0], R, t)
  assert ang < 10.0, f'rotation err {ang}'
  # Depth along the viewing ray is weakly constrained by a single noisy
  # face; bound loosely.
  assert dt < 60.0, f'translation err {dt}'


def test_min_triangle_area_rejects_degenerate_samples():
  """tau_t (min_triangle_area): with a huge threshold every minimal sample
  is degenerate-by-definition and only the full-set hypothesis survives;
  with the default 0 the behavior is unchanged (reference infer.py:93-95)."""
  pts, uv, R, t = make_corrs(100, seed=50, noise=0.2)
  args = (jnp.asarray(uv, jnp.float32), jnp.asarray(pts, jnp.float32),
          jnp.ones(100, jnp.float32), jnp.arange(100, dtype=jnp.int32),
          jnp.ones(100, bool), jnp.asarray(K, jnp.float32))
  res0 = ransac.fit_instances(*args, npx=256, rng=jax.random.PRNGKey(0),
                              num_hypotheses=64, inlier_thresh=4.0,
                              max_instances=1, num_instances=1,
                              min_quality=0.3, min_triangle_area=0.0)
  res1 = ransac.fit_instances(*args, npx=256, rng=jax.random.PRNGKey(0),
                              num_hypotheses=64, inlier_thresh=4.0,
                              max_instances=1, num_instances=1,
                              min_quality=0.3, min_triangle_area=5.0)
  # Clean data: both find the pose (non-degenerate samples pass tau_t).
  for res in (res0, res1):
    assert bool(res.valid[0])
    ang, dt = pose_errors(res.R[0], res.t[0], R, t)
    assert ang < 2.0 and dt < 15.0


def test_project_to_model_vertices():
  """--project_to_surface: predicted 3D points snap to the nearest model
  vertex on device (reference corresp.py:87-88)."""
  r = np.random.default_rng(60)
  O, C, V = 2, 32, 50
  verts = r.uniform(-40, 40, (O, V, 3)).astype(np.float32)
  counts = np.array([V, 20], np.int32)
  verts[1, 20:] = 0  # padding beyond count
  c3d = r.uniform(-45, 45, (O, C, 3)).astype(np.float32)
  valid = np.ones((O, C), bool)
  valid[0, -5:] = False
  corrs = corresp_lib.Correspondences(
      coord_2d=jnp.zeros((O, C, 2)), coord_3d=jnp.asarray(c3d),
      conf=jnp.ones((O, C)), conf_obj=jnp.ones((O, C)),
      conf_frag=jnp.ones((O, C)), px_id=jnp.zeros((O, C), jnp.int32),
      frag_id=jnp.zeros((O, C), jnp.int32), valid=jnp.asarray(valid),
      count=jnp.asarray([C, C], jnp.int32))
  out = jax.jit(lambda c: corresp_lib.project_to_model_vertices(
      c, jnp.asarray(verts), jnp.asarray(counts), chunk=8))(corrs)
  got = np.asarray(out.coord_3d)
  for o in range(O):
    vs = verts[o, :counts[o]]
    for i in range(C):
      if not valid[o, i]:
        np.testing.assert_array_equal(got[o, i], 0)
        continue
      d = np.linalg.norm(vs - c3d[o, i], axis=1)
      np.testing.assert_allclose(got[o, i], vs[np.argmin(d)], atol=1e-5)


def test_sym_eigh3_degenerate_isotropic():
  """Regression (round-2 review): an isotropic/zero covariance (e.g. a
  minimal sample of identical points from consumed/padded entries) must
  still yield an ORTHONORMAL eigenvector frame, not zero columns."""
  for A in (2.0 * np.eye(3), np.zeros((3, 3)),
            np.diag([3.0, 3.0, 3.0]), np.diag([2.0, 2.0, 5.0])):
    ev, EV = epnp.sym_eigh3(jnp.asarray(A, jnp.float32))
    EV = np.asarray(EV)
    np.testing.assert_allclose(EV.T @ EV, np.eye(3), atol=1e-5,
                               err_msg=str(A))
  # And EPnP on a degenerate identical-point sample stays finite.
  pts = jnp.zeros((6, 3), jnp.float32)
  uv = jnp.full((6, 2), 100.0, jnp.float32)
  R, t = epnp.solve_epnp(pts, uv, jnp.asarray(K, jnp.float32),
                         jnp.ones(6), num_basis=4)
  assert np.all(np.isfinite(np.asarray(R)))
  assert np.all(np.isfinite(np.asarray(t)))


def test_prosac_sampling_recovers_pose():
  """--use_prosac: progressive confidence-sorted sampling finds the pose
  when inliers carry high confidence (conf-sorted input, as extraction
  emits)."""
  pts, uv, R, t = make_corrs(80, seed=70, noise=0.2)
  r = np.random.default_rng(71)
  n_out = 120
  pts_all = np.concatenate([pts, r.uniform(-60, 60, (n_out, 3))])
  uv_all = np.concatenate([uv, r.uniform(0, 640, (n_out, 2))])
  conf = np.concatenate([np.linspace(0.95, 0.8, 80),
                         np.linspace(0.4, 0.1, n_out)])  # sorted desc
  n = 200
  res = ransac.fit_instances(
      jnp.asarray(uv_all, jnp.float32), jnp.asarray(pts_all, jnp.float32),
      jnp.asarray(conf, jnp.float32), jnp.arange(n, dtype=jnp.int32),
      jnp.ones(n, bool), jnp.asarray(K, jnp.float32), npx=256,
      rng=jax.random.PRNGKey(8), num_hypotheses=128, inlier_thresh=4.0,
      max_instances=1, num_instances=1, min_quality=0.3, use_prosac=True)
  assert bool(res.valid[0])
  ang, dt = pose_errors(res.R[0], res.t[0], R, t)
  assert ang < 2.0 and dt < 15.0, (ang, dt)


def test_pearl_reassignment_recovers_stolen_points():
  """PEARL re-optimization (reference scripts/infer.py:101-111): with two
  noisy overlapping instances, the greedy first-come consumption can leave
  instance 2 fitted on a depleted set. The PEARL pass (joint assignment +
  refit) must keep both instances valid and accurate, with the spatial
  coherence term active on a real pixel grid."""
  pts1, uv1, R1, t1 = make_corrs(70, seed=60, noise=0.8)
  pts2, uv2, R2, t2 = make_corrs(70, seed=61, noise=0.8)
  r = np.random.default_rng(62)
  n_out = 16
  pts_all = np.concatenate(
      [pts1, pts2, r.uniform(-60, 60, (n_out, 3))]).astype(np.float32)
  uv_all = np.concatenate(
      [uv1, uv2, r.uniform(0, 640, (n_out, 2))]).astype(np.float32)
  n = 156
  grid_w = 16
  npx = 256  # 16x16 grid: the spatial term's neighbour votes are real.
  px = r.integers(0, npx, n).astype(np.int32)
  for pearl_iters in (0, 2):
    res = ransac.fit_instances(
        jnp.asarray(uv_all), jnp.asarray(pts_all), jnp.ones(n, jnp.float32),
        jnp.asarray(px), jnp.ones(n, bool), jnp.asarray(K, jnp.float32),
        npx=npx, rng=jax.random.PRNGKey(7), num_hypotheses=256,
        inlier_thresh=4.0, max_instances=2, num_instances=2,
        min_quality=0.5, pearl_iters=pearl_iters, spatial_weight=0.1,
        grid_w=grid_w)
    assert bool(res.valid[0]) and bool(res.valid[1]), pearl_iters
    errs = []
    for i in range(2):
      e1 = pose_errors(res.R[i], res.t[i], R1, t1)
      e2 = pose_errors(res.R[i], res.t[i], R2, t2)
      errs.append(min(e1[0], e2[0]))
    assert max(errs) < 3.0, (pearl_iters, errs)


def test_pearl_drops_depleted_phantom():
  """A third 'instance' accepted off shared noise must be REJECTED by
  PEARL's final support check once the two real instances reclaim their
  points (pyprogressivex model-rejection step)."""
  pts1, uv1, R1, t1 = make_corrs(80, seed=70, noise=0.2)
  pts2, uv2, R2, t2 = make_corrs(80, seed=71, noise=0.2)
  pts_all = np.concatenate([pts1, pts2]).astype(np.float32)
  uv_all = np.concatenate([uv1, uv2]).astype(np.float32)
  n = 160
  res = ransac.fit_instances(
      jnp.asarray(uv_all), jnp.asarray(pts_all), jnp.ones(n, jnp.float32),
      jnp.arange(n, dtype=jnp.int32), jnp.ones(n, bool),
      jnp.asarray(K, jnp.float32), npx=256, rng=jax.random.PRNGKey(3),
      num_hypotheses=256, inlier_thresh=4.0, max_instances=3,
      num_instances=3, min_quality=0.5, pearl_iters=2)
  assert int(jnp.sum(res.valid)) == 2


def test_exact_counts_recovers_unequal_instance():
  """LOCALIZATION exact-count semantics: with the true instance count
  known, the fitter searches with absolute floors only (the reference fits
  all models and keeps the top-n by quality, infer.py:497-503) — a small
  occluded instance whose coverage fails the relative tau_q gates must
  still be emitted. In the gated (DETECTION) mode the same instance is
  dropped; measured on the crowded-scene ablation this is the difference
  between k=4 recall 0.31 and 0.53 (scripts/ablate_fitting.py)."""
  from epos_tpu.config import Config
  cfg = Config()
  r = np.random.default_rng(60)
  pts_a, uv_a, R_a, t_a = make_corrs(300, seed=61, noise=0.2)
  pts_b, uv_b, R_b, t_b = make_corrs(40, seed=62, noise=0.2)
  n_out = 150
  pts_o = r.uniform(-60, 60, (n_out, 3))
  uv_o = r.uniform(0, 640, (n_out, 2))
  pts = np.concatenate([pts_a, pts_b, pts_o]).astype(np.float32)
  uv = np.concatenate([uv_a, uv_b, uv_o]).astype(np.float32)
  conf = np.ones(len(pts), np.float32)
  px = jnp.arange(len(pts), dtype=jnp.int32)   # distinct pixels

  def run(exact):
    return ransac.fit_instances(
        jnp.asarray(uv), jnp.asarray(pts), jnp.asarray(conf), px,
        jnp.ones(len(pts), bool), jnp.asarray(K, jnp.float32), npx=1024,
        rng=jax.random.PRNGKey(9), num_hypotheses=512,
        inlier_thresh=cfg.inlier_thresh, max_instances=2, num_instances=2,
        min_quality=cfg.min_hypothesis_quality,
        min_inlier_mass=cfg.min_inlier_mass, exact_counts=exact)

  res = run(True)
  assert int(np.asarray(res.valid).sum()) == 2, np.asarray(res.valid)
  # One pose near each GT (order: big instance first).
  ang_a, dt_a = pose_errors(res.R[0], res.t[0], R_a, t_a)
  ang_b, dt_b = pose_errors(res.R[1], res.t[1], R_b, t_b)
  assert ang_a < 3 and dt_a < 20, (ang_a, dt_a)
  assert ang_b < 5 and dt_b < 30, (ang_b, dt_b)

  res_gated = run(False)
  assert int(np.asarray(res_gated.valid).sum()) == 1, (
      'relative tau_q gate unexpectedly accepted the small instance — '
      'if intended, update this test and the ablation claims')


def test_interpenetrating_instances_no_nan_poisoning():
  """Regression (round 4): on a crowded pool of two interpenetrating
  same-object instances, the deterministic full-set hypothesis (weighted
  EPnP over the WHOLE mixed pool + GN) can diverge; its non-finite score
  then won argmax every round (NaN propagates through max), so the fitter
  emitted ZERO poses despite both instances having ~40 clean inliers.
  Guards: refine_pose_gn keeps the last finite iterate, and non-finite
  hypothesis scores lose. Both instances must be recovered."""
  r = np.random.default_rng(5)
  # Two poses of one box-sized cloud, nearly identical z and close xy —
  # silhouettes interleave like the renderer-made crowded scenes.
  Ra = geometry.quaternion_matrix(np.array([0.9, 0.1, 0.2, 0.3])
                                  / np.linalg.norm([0.9, 0.1, 0.2, 0.3]))
  Rb = geometry.quaternion_matrix(np.array([0.2, 0.8, -0.3, 0.4])
                                  / np.linalg.norm([0.2, 0.8, -0.3, 0.4]))
  ta = np.array([-15.0, -50.0, 740.0])
  tb = np.array([-38.0, -24.0, 730.0])
  pts_a = r.uniform(-30, 30, (45, 3)) * np.array([1, 1, 0.45])
  pts_b = r.uniform(-30, 30, (45, 3)) * np.array([1, 1, 0.45])
  uv_a = np.asarray(geometry.project_pts(pts_a, K, Ra, ta))
  uv_b = np.asarray(geometry.project_pts(pts_b, K, Rb, tb))
  n_out = 20
  pts_o = r.uniform(-30, 30, (n_out, 3))
  uv_o = r.uniform(200, 450, (n_out, 2))
  pts = np.concatenate([pts_a, pts_b, pts_o]).astype(np.float32)
  uv = (np.concatenate([uv_a, uv_b, uv_o])
        + r.normal(scale=0.5, size=(110, 2))).astype(np.float32)
  res = ransac.fit_instances(
      jnp.asarray(uv), jnp.asarray(pts), jnp.ones(110, jnp.float32),
      jnp.arange(110, dtype=jnp.int32), jnp.ones(110, bool),
      jnp.asarray(K, jnp.float32), npx=1024, rng=jax.random.PRNGKey(2),
      num_hypotheses=400, inlier_thresh=4.0, max_instances=2,
      num_instances=2, min_inlier_mass=6.0, exact_counts=True,
      pearl_iters=2)
  assert np.isfinite(np.asarray(res.R)).all()
  assert np.isfinite(np.asarray(res.t)).all()
  assert int(np.asarray(res.valid).sum()) == 2, np.asarray(res.valid)
  # One emitted pose near each GT.
  errs = []
  for i in range(2):
    ea = pose_errors(res.R[i], res.t[i], Ra, ta)
    eb = pose_errors(res.R[i], res.t[i], Rb, tb)
    errs.append((ea, eb))
  got_a = any(e[0][0] < 5 and e[0][1] < 30 for e in errs)
  got_b = any(e[1][0] < 5 and e[1][1] < 30 for e in errs)
  assert got_a and got_b, errs


def test_refine_pose_gn_stays_finite_on_degenerate_set():
  """The GN divergence guard: a refinement started far off on a hopeless
  mixed set must return SOME finite pose (callers reject by support), not
  NaN (which poisoned round scoring before the guard)."""
  pts, uv, R, t = make_corrs(60, seed=8, noise=0.3)
  pts2, uv2, _, _ = make_corrs(60, seed=9, noise=0.3)
  pts_m = jnp.asarray(np.concatenate([pts, pts2]), jnp.float32)
  uv_m = jnp.asarray(np.concatenate([uv, uv2]), jnp.float32)
  w = jnp.ones(120, jnp.float32)
  R0 = jnp.eye(3)
  t0 = jnp.asarray([30.0, 29.0, 4250.0])  # far-off init (observed case)
  R1, t1 = epnp.refine_pose_gn(pts_m, uv_m, jnp.asarray(K, jnp.float32),
                               w, R0, t0, iters=6)
  assert bool(jnp.isfinite(R1).all()), np.asarray(R1)
  assert bool(jnp.isfinite(t1).all()), np.asarray(t1)


_FIT_DEBIAS_JITS = {}


def _fit_debias_jitted(strength):
  """Module-cached jitted fit for the depth-debias tests (config matches
  test_ransac_with_outliers). Jit — not eager — and shared between the
  two tests: see test_depth_debias_reduces_eiv_depth_bias's docstring."""
  f = _FIT_DEBIAS_JITS.get(strength)
  if f is None:
    def fit(uv, xyz, conf, px, val, k_mat, key):
      return ransac.fit_instances(
          uv, xyz, conf, px, val, k_mat, npx=256, rng=key,
          num_hypotheses=128, inlier_thresh=4.0, max_instances=1,
          num_instances=1, min_quality=0.3, depth_debias=strength)
    f = _FIT_DEBIAS_JITS[strength] = jax.jit(fit)
  return f


def test_depth_debias_reduces_eiv_depth_bias():
  """3D-noise (errors-in-variables) depth bias and its correction.

  EPOS correspondences carry exact 2D pixels and noisy predicted 3D
  points; reprojection least squares then overestimates depth (the
  apparent 3D spread is inflated by the noise — no reference analogue,
  the Prog-X+EPnP pipeline of infer.py:470-503 carries the same bias).
  depth_debias estimates the noise from a truncation-robust Rayleigh
  quantile match of the inlier residuals and shrinks t.

  The fits run through `_fit_debias_jitted` — a module-cached jax.jit —
  NOT eagerly: XLA:CPU segfaults compiling large RANSAC while-loop
  executables through the EAGER dispatch path (`apply_primitive`) late in
  a long test process. Five consecutive suite runs died at exactly this
  test (crash stacks all route through dispatch.apply_primitive ->
  backend_compile_and_load, or cache deserialization of the same
  executable), while the same loop compiles fine eagerly EARLY in a
  process and compiles fine at ANY point through the jit/pjit path (the
  slow-suite inference-pipeline tests jit-compile bigger fit programs
  late in the full suite and have always passed).
  """
  C = 180
  raw_depth, cor_depth = [], []
  for seed in range(6):
    r = np.random.default_rng(seed)
    R, t = random_pose(seed + 50)
    pts = r.uniform(-30, 30, size=(C, 3)).astype(np.float32)
    uv = np.asarray(geometry.project_pts(pts, K, R, t), np.float32)
    xyz = (pts + r.normal(scale=4.0, size=pts.shape)).astype(np.float32)
    px = np.arange(C, dtype=np.int32)
    d = t / np.linalg.norm(t)
    for strength, acc in ((0.0, raw_depth), (1.0, cor_depth)):
      res = _fit_debias_jitted(strength)(
          jnp.asarray(uv), jnp.asarray(xyz), jnp.ones((C,), jnp.float32),
          jnp.asarray(px), jnp.ones((C,), bool), jnp.asarray(K, jnp.float32),
          jax.random.PRNGKey(seed))
      assert bool(res.valid[0])
      acc.append(float((np.asarray(res.t[0]) - t) @ d))
  # The EIV effect is a BIAS: every raw fit lands beyond the GT depth
  # (measured +8.8..+90.9 mm over these seeds), while corrected errors are
  # mixed-sign. Assert on the mean — a bias correction removes the
  # systematic component, not per-fit variance (measured raw mean +50.8,
  # corrected mean -6.3 on this exact config/jaxlib).
  assert all(v > 0 for v in raw_depth), raw_depth
  raw_mean = float(np.mean(raw_depth))
  cor_mean = float(np.mean(cor_depth))
  assert raw_mean > 8.0, raw_depth
  assert abs(cor_mean) < 0.5 * raw_mean, (raw_depth, cor_depth)


def test_depth_debias_noop_on_exact_correspondences():
  # Shares _fit_debias_jitted(1.0) with the bias test above — exact-input
  # fits must stay exact (the estimated sigma collapses, scale -> 1).
  C = 180
  R, t = random_pose(7)
  r = np.random.default_rng(7)
  pts = r.uniform(-30, 30, size=(C, 3)).astype(np.float32)
  uv = np.asarray(geometry.project_pts(pts, K, R, t), np.float32)
  px = np.arange(C, dtype=np.int32)
  res = _fit_debias_jitted(1.0)(
      jnp.asarray(uv), jnp.asarray(pts), jnp.ones((C,), jnp.float32),
      jnp.asarray(px), jnp.ones((C,), bool), jnp.asarray(K, jnp.float32),
      jax.random.PRNGKey(0))
  assert bool(res.valid[0])
  _, dt = pose_errors(res.R[0], res.t[0], R, t)
  assert dt < 1.0, dt
