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
  d_est = render_pose_depth(renderer, obj_id, K, R_est, t_est)
  d_gt = render_pose_depth(renderer, obj_id, K, R_gt, t_gt)
  return vsd_error_from_depths(d_est, d_gt, diameter, depth_im=depth_im,
                               delta=delta, tau_fracs=tau_fracs)


def render_pose_depth(renderer, obj_id, K, R, t):
  """One rasterized depth map of the object at a pose — cacheable so a
  [n_gt, n_est] VSD matrix costs n_gt + n_est renders, not 2*n_gt*n_est
  (the host has one CPU core; rendering dominated the eval wall-clock)."""
  renderer.render_object(obj_id, np.asarray(R).flatten(),
                         np.asarray(t).flatten(),
                         K[0, 0], K[1, 1], K[0, 2], K[1, 2], want_rgb=False)
  return renderer.get_depth_image(obj_id).copy()


def vsd_error_from_depths(d_est, d_gt, diameter, depth_im=None, delta=15.0,
                          tau_fracs=None):
  """VSD from precomputed per-pose depth renders (see vsd_error)."""
  if tau_fracs is None:
    tau_fracs = list(np.arange(0.05, 0.51, 0.05))
  if depth_im is None:
    depth_im = d_gt

  # Visibility masks — exact bop_toolkit 'bop19' semantics
  # (visibility.estimate_visib_mask_gt/_est): a rendered pixel is visible
  # when within delta of the scene depth OR the scene depth is missing
  # there (d_test == 0); the est mask additionally inherits GT-visible
  # pixels the estimate also renders.
  visib_gt = (d_gt > 0) & ((d_gt <= depth_im + delta) | (depth_im == 0))
  visib_est = (d_est > 0) & ((d_est <= depth_im + delta) | (depth_im == 0))
  visib_est = visib_est | (visib_gt & (d_est > 0))
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


def matched_count(err, thr):
  """bop_toolkit pose_matching.match_poses semantics AT ONE correctness
  threshold: estimates in score-DESC column order each claim the still-
  unmatched GT with the smallest error, if that error is below the
  threshold; the match set is recomputed per threshold (a fixed global
  min-error assignment can lose a recall point when a high-score
  estimate's best GT was taken by a lower-score one). err: [n_gt, n_est]
  with columns in decreasing estimate score."""
  err = np.asarray(err, np.float64)
  if err.size == 0:
    return 0
  matched = np.zeros(err.shape[0], bool)
  n = 0
  for ei in range(err.shape[1]):
    cand = np.where(~matched & (err[:, ei] < thr))[0]
    if len(cand):
      matched[cand[np.argmin(err[cand, ei])]] = True
      n += 1
  return n


def evaluate_localization(results, gt_per_image, models_pts, diameters,
                          Ks, syms=None, im_widths=None, vsd_renderer=None,
                          depth_ims=None):
  """Greedy min-error matching of estimates to GT per image (LOCALIZATION
  protocol, bop_toolkit pose_matching semantics): per (scene, im, obj) and
  per error function, (gt, est) pairs are matched smallest-error-first.
  Returns AR over the BOP19 threshold grids + per-metric details.

  Args:
    results: list of pose dicts (scene_id, im_id, obj_id, R, t, score).
    gt_per_image: {(scene_id, im_id): [{'obj_id', 'R', 't'}]}.
    models_pts: {obj_id: [n, 3] points}.
    diameters: {obj_id: mm}.
    Ks: {(scene_id, im_id): K}.
    im_widths: optional {(scene_id, im_id): width_px} — MSPD errors are
      normalized by 640/width (BOP19: the threshold grid is defined at VGA
      scale; bop_toolkit pose_error.mspd multiplies by r = 640/w).
    vsd_renderer: optional Renderer with the eval models loaded, sized to
      the images — enables VSD and makes the returned 'ar' the BOP19
      three-error mean.
    depth_ims: optional {(scene_id, im_id): HxW float mm} real scene depth
      for VSD visibility; GT render is the fallback (unoccluded assumption,
      exact for synthetic single-object visibility only).
  """
  syms = syms or {}
  by_key = {}
  for r in results:
    by_key.setdefault((r['scene_id'], r['im_id'], r['obj_id']), []).append(r)
  for v in by_key.values():
    v.sort(key=lambda r: -r.get('score', 0.0))

  def _greedy_match(err_mat):
    """Global min-error assignment — DIAGNOSTIC ONLY (per-GT matched-error
    lists in the output). The reported recalls use matched_count,
    which implements bop_toolkit's threshold-dependent matching."""
    err = np.array(err_mat, np.float64)
    n_gt, n_est = err.shape
    assign = np.full(n_gt, -1, np.int64)
    for _ in range(min(n_gt, n_est)):
      gi, ei = np.unravel_index(np.argmin(err), err.shape)
      if not np.isfinite(err[gi, ei]):
        break
      assign[gi] = ei
      err[gi, :] = np.inf
      err[:, ei] = np.inf
    return assign


  m_mssd, m_mspd, m_adi = [], [], []
  # Translation-error decomposition of ADI-matched pairs — the round-3
  # accuracy diagnosis found matched poses carried ~40 mm MEDIAN depth
  # error (weak PnP depth observability on single-face views) while
  # lateral error was small; tracking the split keeps that lever visible.
  m_terr = []  # (obj_id, |dt_z| mm, ||dt_xy|| mm, ||dt|| mm)
  m_vsd = [] if vsd_renderer is not None else None
  groups = []   # (obj, [n_gt,n_est] err matrices per metric), est score-desc
  for (scene_id, im_id), gts in gt_per_image.items():
    K = Ks[(scene_id, im_id)]
    r_norm = 1.0
    if im_widths is not None:
      r_norm = 640.0 / im_widths[(scene_id, im_id)]
    # Group this image's GTs by object; estimates are per-object lists.
    gt_by_obj = {}
    for gt in gts:
      gt_by_obj.setdefault(gt['obj_id'], []).append(gt)
    for obj, gts_o in gt_by_obj.items():
      # BOP19 top-n cap (bop_toolkit eval_calc_errors n_top=-1 semantics):
      # with n GT instances of an object in the image, only the n
      # highest-score estimates enter the matching — extra submissions
      # cannot be rescued by a lucky greedy match.
      ests = by_key.get((scene_id, im_id, obj), [])[:len(gts_o)]
      pts = models_pts[obj]
      # Error matrices [n_gt, n_est] per metric; each metric is matched
      # independently (as bop_toolkit evaluates each error function with
      # its own matching).
      mat_mssd = [[mssd_error(pts, e['R'], e['t'], g['R'], g['t'],
                              syms.get(obj)) for e in ests] for g in gts_o]
      mat_mspd = [[r_norm * mspd_error(pts, K, e['R'], e['t'], g['R'],
                                       g['t'], syms.get(obj))
                   for e in ests] for g in gts_o]
      mat_adi = [[adi_error(pts, e['R'], e['t'], g['R'], g['t'])
                  for e in ests] for g in gts_o]
      for mat, out_list in ((mat_mssd, m_mssd), (mat_mspd, m_mspd),
                            (mat_adi, m_adi)):
        if ests:
          assign = _greedy_match(mat)
        else:
          assign = np.full(len(gts_o), -1, np.int64)
        for gi in range(len(gts_o)):
          out_list.append(
              (obj, mat[gi][assign[gi]] if assign[gi] >= 0 else np.inf))
        if mat is mat_adi:
          for gi in range(len(gts_o)):
            if assign[gi] < 0:
              continue
            dt = (np.asarray(ests[assign[gi]]['t']).reshape(3)
                  - np.asarray(gts_o[gi]['t']).reshape(3))
            m_terr.append((obj, float(abs(dt[2])),
                           float(np.hypot(dt[0], dt[1])),
                           float(np.linalg.norm(dt)),
                           # SIGNED depth: + = estimated farther than GT.
                           # The EIV inflation bias (ops/ransac.py
                           # _depth_debias) predicts a positive median on
                           # healthy models; a negative one indicates
                           # collapsed fragment predictions instead.
                           float(dt[2])))
      mat_vsd = None
      if m_vsd is not None:
        depth_im = (depth_ims or {}).get((scene_id, im_id))
        # Depth renders cached per pose: n_gt + n_est rasterizations per
        # group instead of 2 * n_gt * n_est.
        d_gts = [render_pose_depth(vsd_renderer, obj, K, g['R'], g['t'])
                 for g in gts_o]
        d_ests = [render_pose_depth(vsd_renderer, obj, K, e['R'], e['t'])
                  for e in ests]
        mat_vsd = [[vsd_error_from_depths(
            d_e, d_g, diameters[obj], depth_im=depth_im)
            for d_e in d_ests] for d_g in d_gts]
        if ests:
          assign = _greedy_match(
              [[float(np.mean(v)) for v in row] for row in mat_vsd])
        else:
          assign = np.full(len(gts_o), -1, np.int64)
        for gi in range(len(gts_o)):
          m_vsd.append(
              (obj, mat_vsd[gi][assign[gi]] if assign[gi] >= 0
               else [np.inf] * 10))
      groups.append((obj, np.array(mat_mssd, np.float64).reshape(
          len(gts_o), len(ests)),
          np.array(mat_mspd, np.float64).reshape(len(gts_o), len(ests)),
          np.array(mat_adi, np.float64).reshape(len(gts_o), len(ests)),
          (np.array(mat_vsd, np.float64).reshape(len(gts_o), len(ests), 10)
           if mat_vsd is not None and ests
           else np.zeros((len(gts_o), 0, 10))
           if mat_vsd is not None else None)))

  # Recalls with per-threshold matching over the BOP19 grids.
  total_gt = sum(g[1].shape[0] for g in groups)
  fracs = np.arange(0.05, 0.51, 0.05)          # MSSD: fraction of diameter
  px_grid = np.arange(5, 51, 5)                # MSPD: px at VGA scale
  rec_mssd = [sum(matched_count(g[1], f * diameters[g[0]])
                  for g in groups) / max(total_gt, 1) for f in fracs]
  rec_mspd = [sum(matched_count(g[2], thr) for g in groups)
              / max(total_gt, 1) for thr in px_grid]
  out = {'ar_mssd': float(np.mean(rec_mssd)),
         'ar_mspd': float(np.mean(rec_mspd))}
  parts = [out['ar_mssd'], out['ar_mspd']]
  if m_vsd is not None:
    rec_vsd = []
    for ti in range(10):                       # tau index
      for theta in fracs:                      # correctness threshold
        rec_vsd.append(sum(
            matched_count(g[4][:, :, ti], theta) if g[4] is not None
            else 0 for g in groups) / max(total_gt, 1))
    out['ar_vsd'] = float(np.mean(rec_vsd))
    parts.append(out['ar_vsd'])
  out['ar'] = float(np.mean(parts))
  out['matches_mssd'] = m_mssd
  out['matches_mspd'] = m_mspd
  if m_vsd is not None:
    out['matches_vsd'] = m_vsd
  # Classic Hinterstoisser ADI recall at 10% of the diameter — coarser
  # than the BOP grids, useful as a wider-dynamic-range tracking signal.
  out['adi01_recall'] = float(sum(
      matched_count(g[3], 0.1 * diameters[g[0]]) for g in groups)
      / max(total_gt, 1))
  out['matches_adi'] = m_adi
  out['matches_terr'] = m_terr
  return out
