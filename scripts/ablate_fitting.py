#!/usr/bin/env python3
"""Fitter ablation on crowded synthetic scenes (VERDICT r2 #6).

Quantifies what replacing Progressive-X's spatial-coherence graph cut +
PEARL re-optimization (reference scripts/infer.py:101-111,470-503) with the
on-device batched RANSAC (Morton-local sampling + greedy inlier
consumption, ops/ransac.py) costs on multi-instance scenes.

Protocol: ONE object, k = 1..4 instances per crowded scene, correspondences
derived from GT renders (pixel grid at output stride 4, model-frame XYZ
from the rasterizer) with Gaussian 2D noise and a uniform outlier fraction
— isolating the FITTER from CNN quality. Compared:
  - 'own':    ops/ransac.fit_instances (the framework fitter).
  - 'opencv': cv2.solvePnPRansac EPnP inside the same greedy progressive
              scheme (fit, consume inliers, repeat) — the scheme the EPOS
              paper used for its OpenCV baseline (Table 3 note,
              reference infer.py:505-511).
An instance counts as recovered when ADI < 0.1 x diameter against an
unmatched GT pose. Prints one JSON line per (k, method).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np


def _recovered(poses, gt_poses, pts, diameter):
  """Greedy matching of estimates to GT by ADI; returns #recovered."""
  from epos_tpu.train import pose_eval
  n = 0
  used = set()
  for R, t in poses:
    best, bi = np.inf, None
    for i, (Rg, tg) in enumerate(gt_poses):
      if i in used:
        continue
      e = pose_eval.adi_error(pts, R, t, Rg, tg)
      if e < best:
        best, bi = e, i
    if bi is not None and best < 0.1 * diameter:
      used.add(bi)
      n += 1
  return n


def main(args=None):
  p = argparse.ArgumentParser()
  p.add_argument('--scenes', type=int, default=8)
  p.add_argument('--max_instances', type=int, default=4)
  p.add_argument('--noise_px', type=float, default=0.5)
  p.add_argument('--outlier_frac', type=float, default=0.2)
  p.add_argument('--num_hypotheses', type=int, default=400)
  p.add_argument('--min_quality', type=float, default=0.5)
  p.add_argument('--seed', type=int, default=0)
  # Production fit configuration (engine parity, VERDICT r3 #8): PEARL with
  # the spatial-coherence ICM term runs in the ablation exactly as the
  # InferenceEngine ships it; --spatial_weight 0 ablates the term.
  p.add_argument('--pearl_iters', type=int, default=2)
  p.add_argument('--spatial_weight', type=float, default=None,
                 help='Spatial-coherence weight (default: cfg default).')
  p.add_argument('--refine_iters', type=int, default=None)
  p.add_argument('--local_frac', type=float, default=None,
                 help='Fraction of spatially-local minimal samples '
                      '(default: fitter default).')
  p.add_argument('--min_inlier_mass', type=float, default=None,
                 help='Absolute acceptance floor override '
                      '(default: cfg default).')
  p.add_argument('--reject_patience', type=int, default=None)
  # The ablation models LOCALIZATION (k is the known GT count), where the
  # engine runs the fitter with exact_counts=True; pass False to measure
  # the DETECTION-gated variant.
  p.add_argument(
      '--exact_counts', default=True,
      type=lambda s: s.lower() not in ('false', '0', 'no', 'off'))
  ns = p.parse_args(args)

  # sitecustomize forces the axon TPU platform; this ablation is CPU-sized
  # and must not contend for the single TPU claim.
  import jax
  jax.config.update('jax_platforms', 'cpu')
  import jax.numpy as jnp
  import cv2
  from epos_tpu.data.renderer import Renderer
  from epos_tpu.ops import geometry, ransac
  from tests import synthetic

  w, h, stride = 160, 120, 4
  f = 220.0
  K = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1.0]])
  mesh = synthetic.box_mesh_subdivided(55.0, 55.0, 25.0, n=6)
  diameter = float(np.linalg.norm([55.0, 55.0, 25.0]))
  pts_eval = mesh['pts']
  renderer = Renderer()
  renderer.init(w, h)
  renderer.add_object(1, mesh)

  def make_scene(rnd, k):
    """k crowded instances -> (correspondences, gt_poses)."""
    draws = []
    for _ in range(k):
      q = rnd.normal(size=4)
      q /= np.linalg.norm(q)
      R = geometry.quaternion_matrix(q)
      t = np.array([rnd.uniform(-25, 25), rnd.uniform(-18, 18),
                    rnd.uniform(360, 500)])
      draws.append((R, t))
    depths, xyzs = [], []
    for R, t in draws:
      renderer.render_object(1, R.flatten(), t, f, f, w / 2, h / 2,
                             want_rgb=False)
      depths.append(renderer.get_depth_image(1).copy())
      xyzs.append(renderer.get_local_pos_image(1).copy())
    st = np.stack([np.where(d > 0, d, np.inf) for d in depths])
    win = np.argmin(st, 0)
    anyhit = np.isfinite(st.min(0))
    # Visible-surface correspondences on the output-stride pixel grid.
    ys, xs = np.mgrid[stride // 2:h:stride, stride // 2:w:stride]
    vis = anyhit[ys, xs]
    uv = np.stack([xs[vis] + 0.5, ys[vis] + 0.5], 1).astype(np.float64)
    gidx = win[ys, xs][vis]
    xyz = np.stack([xyzs[g][y, x] for g, y, x in
                    zip(gidx, ys[vis], xs[vis])]).astype(np.float64)
    uv += rnd.normal(scale=ns.noise_px, size=uv.shape)
    n_out = int(len(uv) * ns.outlier_frac)
    if n_out:
      uv = np.concatenate([uv, rnd.uniform((0, 0), (w, h), (n_out, 2))])
      lo = pts_eval.min(0)
      hi = pts_eval.max(0)
      xyz = np.concatenate([xyz, rnd.uniform(lo, hi, (n_out, 3))])
    return uv, xyz, draws

  # ONE jitted program for every (scene, k): fixed-shape pad to CAP and
  # pass num_instances/key as dynamic args — eager fit_instances dispatches
  # op-by-op on the 1-core host and is ~100x slower (CLAUDE.md hazard 3).
  CAP = 2048
  npx_s = (w // stride) * (h // stride)

  # Production fit configuration (engine parity, VERDICT r3 #8): the same
  # kwargs the InferenceEngine ships with — PEARL + spatial-coherence ICM
  # on the output-stride grid — with the ablation's CLI overrides on top.
  from epos_tpu.config import Config
  from epos_tpu import inference as inference_lib
  fit_kw = inference_lib.production_fit_kwargs(
      Config(), ns.max_instances, w // stride,
      task_type='localization' if ns.exact_counts else 'detection')
  fit_kw.update(num_hypotheses=ns.num_hypotheses, inlier_thresh=4.0,
                min_quality=ns.min_quality, pearl_iters=ns.pearl_iters)
  if ns.spatial_weight is not None:
    fit_kw['spatial_weight'] = ns.spatial_weight
  if ns.refine_iters is not None:
    fit_kw['refine_iters'] = ns.refine_iters
  if ns.local_frac is not None:
    fit_kw['local_sample_frac'] = ns.local_frac
  if ns.min_inlier_mass is not None:
    fit_kw['min_inlier_mass'] = ns.min_inlier_mass
  if ns.reject_patience is not None:
    fit_kw['reject_patience'] = ns.reject_patience
  fit_kw.pop('max_instances')

  @jax.jit
  def _fit_jit(uv, xyz, val, px, k, key):
    return ransac.fit_instances(
        uv, xyz, val.astype(jnp.float32), px, val,
        jnp.asarray(K, jnp.float32), npx=npx_s, rng=key,
        max_instances=ns.max_instances, num_instances=k, **fit_kw)

  def fit_own(uv, xyz, k, key):
    n = min(len(uv), CAP)
    uvp = np.zeros((CAP, 2), np.float32)
    xyzp = np.zeros((CAP, 3), np.float32)
    uvp[:n] = uv[:n]
    xyzp[:n] = xyz[:n]
    val = np.arange(CAP) < n
    px = (uvp[:, 1].astype(int) // stride) * (w // stride) \
        + (uvp[:, 0].astype(int) // stride)
    res = _fit_jit(
        jnp.asarray(uvp), jnp.asarray(xyzp), jnp.asarray(val),
        jnp.asarray(np.clip(px, 0, npx_s - 1), jnp.int32),
        jnp.asarray(k, jnp.int32), key)
    return [(np.asarray(res.R[i]), np.asarray(res.t[i]))
            for i in range(ns.max_instances) if bool(res.valid[i])]

  def fit_opencv(uv, xyz, k):
    """cv2 EPnP-RANSAC in the greedy progressive scheme."""
    poses = []
    avail = np.ones(len(uv), bool)
    for _ in range(k):
      if avail.sum() < 6:
        break
      ok, rvec, tvec, inl = cv2.solvePnPRansac(
          objectPoints=np.ascontiguousarray(xyz[avail]),
          imagePoints=np.ascontiguousarray(uv[avail]),
          cameraMatrix=K, distCoeffs=None,
          iterationsCount=ns.num_hypotheses, reprojectionError=4.0,
          confidence=0.99, flags=cv2.SOLVEPNP_EPNP)
      if not ok or inl is None or len(inl) < 6:
        break
      poses.append((cv2.Rodrigues(rvec)[0], tvec.flatten()))
      idx = np.where(avail)[0]
      avail[idx[inl.flatten()]] = False
    return poses

  rng = jax.random.PRNGKey(ns.seed)
  results = []
  for k in range(1, ns.max_instances + 1):
    rec = {'own': 0, 'opencv': 0}
    est = {'own': 0, 'opencv': 0}
    total = 0
    for s in range(ns.scenes):
      rnd = np.random.default_rng(1000 * ns.seed + 10 * k + s)
      uv, xyz, gt_poses = make_scene(rnd, k)
      total += k
      key = jax.random.fold_in(rng, 100 * k + s)
      for name, poses in (('own', fit_own(uv, xyz, k, key)),
                          ('opencv', fit_opencv(uv, xyz, k))):
        est[name] += len(poses)
        rec[name] += _recovered(poses, gt_poses, pts_eval, diameter)
    for name in ('own', 'opencv'):
      row = {'instances': k, 'method': name,
             'recovered': rec[name], 'total_gt': total,
             'estimates': est[name],
             'recall': round(rec[name] / total, 4)}
      results.append(row)
      print(json.dumps(row))
  return results


if __name__ == '__main__':
  main()
