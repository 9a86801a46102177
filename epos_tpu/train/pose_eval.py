"""Pose-error metrics and BOP19 Average Recall.

The reference computes BOP AR with the external bop_toolkit evaluation
scripts (SURVEY.md §4, infer.py:751-760 cites the format only). EPOS-TPU
ships the evaluation so accuracy parity is measurable in-repo:

- MSSD: maximum symmetry-aware surface distance (BOP19).
- MSPD: maximum symmetry-aware projection distance (BOP19).
- VSD:  visible surface discrepancy, computed with the framework's own
  rasterizer (depth-test based, delta/tau per BOP19).
- ADD/ADI: classic Hinterstoisser metrics (for quick checks).
- AR: mean recall over the BOP19 threshold grids, averaged over the three
  errors — the leaderboard's AR_core per dataset.
"""

import numpy as np

from epos_tpu.ops import geometry


def _transform(pts, R, t):
  return pts @ np.asarray(R).T + np.asarray(t).reshape(1, 3)


def add_error(pts, R_est, t_est, R_gt, t_gt):
  """Average distance of model points (ADD)."""
  return float(np.linalg.norm(
      _transform(pts, R_est, t_est) - _transform(pts, R_gt, t_gt),
      axis=1).mean())


def adi_error(pts, R_est, t_est, R_gt, t_gt):
  """ADD for indistinguishable views (nearest-point matching)."""
  a = _transform(pts, R_est, t_est)
  b = _transform(pts, R_gt, t_gt)
  # Chunked nearest neighbors to bound memory.
  total = 0.0
  chunk = max(1, int(2e7) // max(len(b), 1))
  for s in range(0, len(a), chunk):
    d2 = ((a[s:s + chunk, None] - b[None]) ** 2).sum(-1)
    total += np.sqrt(d2.min(axis=1)).sum()
  return float(total / len(a))


def mssd_error(pts, R_est, t_est, R_gt, t_gt, syms=None):
  """Max symmetry-aware surface distance (BOP19)."""
  est = _transform(pts, R_est, t_est)
  best = np.inf
  for R_s, t_s in _sym_list(syms):
    gt = _transform(_transform(pts, R_s, t_s), R_gt, t_gt)
    best = min(best, float(np.linalg.norm(est - gt, axis=1).max()))
  return best


def mspd_error(pts, K, R_est, t_est, R_gt, t_gt, syms=None):
  """Max symmetry-aware projection distance (BOP19)."""
  est = np.asarray(geometry.project_pts(pts, K, R_est, t_est))
  best = np.inf
  for R_s, t_s in _sym_list(syms):
    gt = np.asarray(geometry.project_pts(
        _transform(pts, R_s, t_s), K, R_gt, t_gt))
    best = min(best, float(np.linalg.norm(est - gt, axis=1).max()))
  return best


def vsd_error(renderer, obj_id, K, R_est, t_est, R_gt, t_gt, diameter,
              depth_im=None, delta=15.0, tau_fracs=None):
  """Visible surface discrepancy (BOP19), via the framework rasterizer.

  tau is swept over {5%, ..., 50%} of the object diameter (BOP19 protocol);
  delta = 15 mm visibility tolerance. Without a real scene depth image the
  GT render serves as the scene depth (unoccluded assumption, as in
  synthetic evaluation).
  Returns one error per tau.
  """
  if tau_fracs is None:
    tau_fracs = list(np.arange(0.05, 0.51, 0.05))
  fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
  renderer.render_object(obj_id, np.asarray(R_est).flatten(),
                         np.asarray(t_est).flatten(), fx, fy, cx, cy,
                         want_rgb=False)
  d_est = renderer.get_depth_image(obj_id).copy()
  renderer.render_object(obj_id, np.asarray(R_gt).flatten(),
                         np.asarray(t_gt).flatten(), fx, fy, cx, cy,
                         want_rgb=False)
  d_gt = renderer.get_depth_image(obj_id).copy()
  if depth_im is None:
    depth_im = d_gt

  # Visibility masks (bop_toolkit visib.estimate_visib_mask_* semantics,
  # tolerance delta against the scene depth).
  visib_gt = (d_gt > 0) & (d_gt <= depth_im + delta)
  visib_est = (d_est > 0) & ((depth_im == 0) | (d_est <= depth_im + delta))
  visib_inter = visib_gt & visib_est
  n_union = (visib_gt | visib_est).sum()
  if n_union == 0:
    return [1.0 for _ in tau_fracs]
  dist = np.abs(d_gt - d_est)[visib_inter]
  errs = []
  for frac in tau_fracs:
    ok = (dist <= frac * diameter).sum()
    errs.append(float((n_union - ok) / n_union))
  return errs


def _sym_list(syms):
  """Discretized symmetry transforms; identity always included."""
  out = [(np.eye(3), np.zeros(3))]
  for s in (syms or []):
    out.append((np.asarray(s['R']), np.asarray(s.get('t', np.zeros(3)))))
  return out


def continuous_syms_to_discrete(axis, n=36):
  """Discretizes a continuous rotational symmetry axis (bop_toolkit
  misc.get_symmetry_transformations behavior)."""
  axis = np.asarray(axis, np.float64)
  axis = axis / np.linalg.norm(axis)
  out = []
  for k in range(1, n):
    angle = 2 * np.pi * k / n
    K_ = np.array([[0, -axis[2], axis[1]],
                   [axis[2], 0, -axis[0]],
                   [-axis[1], axis[0], 0]])
    R = np.eye(3) + np.sin(angle) * K_ + (1 - np.cos(angle)) * (K_ @ K_)
    out.append({'R': R, 't': np.zeros(3)})
  return out


def bop19_average_recall(matches_mssd, matches_mspd, diameters):
  """AR over the BOP19 threshold grids.

  Args:
    matches_mssd: list of (obj_id, mssd_error) per GT instance, err=inf if
      unmatched.
    matches_mspd: list of (obj_id, mspd_error) per GT instance (pixels,
      already scaled by the image-size normalizer if desired).
    diameters: {obj_id: diameter_mm}.
  Returns dict with ar_mssd, ar_mspd, ar (mean of the two; add VSD
  externally when depth is available).
  """
  rec_mssd = []
  for thr_frac in np.arange(0.05, 0.51, 0.05):
    ok = [err < thr_frac * diameters[obj] for obj, err in matches_mssd]
    rec_mssd.append(np.mean(ok) if ok else 0.0)
  rec_mspd = []
  for thr in np.arange(5, 51, 5):
    ok = [err < thr for obj, err in matches_mspd]
    rec_mspd.append(np.mean(ok) if ok else 0.0)
  ar_mssd = float(np.mean(rec_mssd))
  ar_mspd = float(np.mean(rec_mspd))
  return {'ar_mssd': ar_mssd, 'ar_mspd': ar_mspd,
          'ar': (ar_mssd + ar_mspd) / 2.0}


def evaluate_localization(results, gt_per_image, models_pts, diameters,
                          Ks, syms=None, im_widths=None):
  """Greedy matching of estimates to GT per image (LOCALIZATION protocol):
  per (scene, im, obj), each GT instance consumes the highest-score unmatched
  estimate. Returns bop19_average_recall output + per-metric details.

  Args:
    results: list of pose dicts (scene_id, im_id, obj_id, R, t, score).
    gt_per_image: {(scene_id, im_id): [{'obj_id', 'R', 't'}]}.
    models_pts: {obj_id: [n, 3] points}.
    diameters: {obj_id: mm}.
    Ks: {(scene_id, im_id): K}.
    im_widths: optional {(scene_id, im_id): width_px} — MSPD errors are
      normalized by 640/width (BOP19: the threshold grid is defined at VGA
      scale; bop_toolkit pose_error.mspd multiplies by r = 640/w).
  """
  syms = syms or {}
  by_key = {}
  for r in results:
    by_key.setdefault((r['scene_id'], r['im_id'], r['obj_id']), []).append(r)
  for v in by_key.values():
    v.sort(key=lambda r: -r.get('score', 0.0))

  m_mssd, m_mspd, m_adi = [], [], []
  for (scene_id, im_id), gts in gt_per_image.items():
    used = set()
    for gt in gts:
      obj = gt['obj_id']
      ests = by_key.get((scene_id, im_id, obj), [])
      best = None
      for i, e in enumerate(ests):
        if i not in used:
          best = (i, e)
          break
      if best is None:
        m_mssd.append((obj, np.inf))
        m_mspd.append((obj, np.inf))
        m_adi.append((obj, np.inf))
        continue
      used.add(best[0])
      e = best[1]
      pts = models_pts[obj]
      K = Ks[(scene_id, im_id)]
      m_mssd.append((obj, mssd_error(
          pts, e['R'], e['t'], gt['R'], gt['t'], syms.get(obj))))
      r_norm = 1.0
      if im_widths is not None:
        r_norm = 640.0 / im_widths[(scene_id, im_id)]
      m_mspd.append((obj, r_norm * mspd_error(
          pts, K, e['R'], e['t'], gt['R'], gt['t'], syms.get(obj))))
      m_adi.append((obj, adi_error(
          pts, e['R'], e['t'], gt['R'], gt['t'])))
  out = bop19_average_recall(m_mssd, m_mspd, diameters)
  out['matches_mssd'] = m_mssd
  out['matches_mspd'] = m_mspd
  # Classic Hinterstoisser ADI recall at 10% of the diameter — coarser
  # than the BOP grids, useful as a wider-dynamic-range tracking signal.
  ok = [err < 0.1 * diameters[obj] for obj, err in m_adi]
  out['adi01_recall'] = float(np.mean(ok)) if ok else 0.0
  out['matches_adi'] = m_adi
  return out
