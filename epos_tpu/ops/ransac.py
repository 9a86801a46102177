"""On-device multi-instance PnP-RANSAC pose fitting.

TPU-native replacement for the Progressive-X / GC-RANSAC / OpenCV-RANSAC
stack the reference calls on host per object (scripts/infer.py:457-528;
SURVEY.md §2.3). Redesigned for XLA:

- All hypotheses are generated and scored in ONE batched pass (vmap over
  hypotheses), instead of a sequential RANSAC loop: `max_fitting_iterations`
  (reference default 400, infer.py:118-120) becomes the hypothesis batch size.
- Minimal 6-point samples (min_point_number=6, infer.py:482): half drawn
  uniformly over available correspondences (rank-LUT sampling), half
  spatially local via a Morton-order window around a random seed (the
  GC-RANSAC neighborhood-graph role, tau_d); with use_prosac, true PROSAC
  progressive sampling from a growing confidence-sorted head
  (infer.py:98-100). Degenerate samples are gated by tau_t
  (min_triangle_area).
- Multi-instance estimation follows the Progressive-X philosophy: fit the
  best instance, consume its inliers, repeat (a lax.while_loop with a fixed
  instance capacity and an early exit once a round fails) — replacing
  PEARL's alternating optimization with greedy sequential coverage.
- Acceptance (tau_q = min_hypothesis_quality, infer.py:84-86) is
  *instance-relative*: a pose is kept, given >= min_corrs inliers, if its
  inlier pixel coverage reaches tau_q x the largest accepted instance's
  coverage (the first instance trivially passes) OR tau_q x the coverage
  of the correspondences still available this round (an occluded or
  distant instance is small next to the best one, but once earlier
  instances consumed their pixels it explains most of what remains). An
  absolute denominator (all of the object's correspondences) would cap
  the i-th instance of one object near 1/N and make crowded scenes
  unfittable at the default tau_q=0.5; the disjunction keeps same-scale
  crowds AND unequal occluded instances while rejecting small spurious
  clusters, matching Progressive-X's behavior of returning all
  well-supported models (infer.py:459-466: num_instances=-1 returns "all
  found poses"). Inliers of REJECTED hypotheses are never consumed, so
  one bad round cannot starve later instances.
- Everything is fixed-shape: consumed-correspondence masks instead of
  shrinking arrays. Accepted instances have disjoint inlier sets by
  construction (consumed correspondences leave the pool), which subsumes
  the reference's Tanimoto-similarity dedup (max_tanimoto_similarity).

The per-pose refinement runs iterated weighted EPnP on the inlier set
(re-estimating inliers between iterations) — the counterpart of GC-RANSAC's
local optimization.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from epos_tpu.ops import epnp


class FitResult(NamedTuple):
  R: jnp.ndarray        # [max_inst, 3, 3]
  t: jnp.ndarray        # [max_inst, 3]
  quality: jnp.ndarray  # [max_inst] coverage quality in [0, 1]
  score: jnp.ndarray    # [max_inst] sum of inlier confidences
  num_inliers: jnp.ndarray  # [max_inst] int32
  valid: jnp.ndarray    # [max_inst] bool


def _sample_minimal_prosac(rng, avail_f, conf, num_hyps, sample_size):
  """PROSAC sampling: hypothesis h draws uniformly from the top-m(h)
  correspondences by CONFIDENCE, with m growing from a small head to the
  full set across the hypothesis batch (Chum & Matas; --use_prosac,
  reference infer.py:98-100 sorts by confidence before fitting).

  Ranks come from an explicit argsort of `conf` over the available entries
  — correct for ANY buffer ordering (the extraction currently emits
  confidence-sorted buffers, but PROSAC must not silently depend on that).
  """
  C = avail_f.shape[0]
  avail_i = avail_f > 0
  n_avail = jnp.maximum(jnp.sum(avail_i), 1)
  # order[r] = index of the r-th most confident AVAILABLE correspondence
  # (unavailable entries sort to the tail).
  order = jnp.argsort(jnp.where(avail_i, -conf, jnp.inf)).astype(jnp.int32)
  # Pool size per hypothesis: linear growth from 3x the sample size to the
  # full available set.
  h = jnp.arange(num_hyps, dtype=jnp.float32) / max(num_hyps - 1, 1)
  m = jnp.minimum(
      n_avail,
      (3 * sample_size + h * (C - 3 * sample_size)).astype(jnp.int32))
  m = jnp.maximum(m, jnp.minimum(n_avail, sample_size))
  u = jax.random.uniform(rng, (num_hyps, sample_size))
  draw = (u * m[:, None].astype(jnp.float32)).astype(jnp.int32)
  return order[jnp.minimum(draw, C - 1)]


def _morton_key(xy, scale=1.0):
  """Interleaves the bits of quantized (x, y) -> space-filling curve key.

  Points adjacent along the Morton curve are spatially close, so a window
  in Morton RANK space approximates a spatial neighborhood ball — the
  fixed-shape stand-in for GC-RANSAC's neighborhood graph (tau_d =
  neighbour_max_dist, reference infer.py:80-82)."""
  x = jnp.clip((xy[:, 0] / scale), 0, 1023).astype(jnp.uint32)
  y = jnp.clip((xy[:, 1] / scale), 0, 1023).astype(jnp.uint32)

  def spread(v):  # 10 bits -> 20 bits with zeros interleaved.
    v = (v | (v << 8)) & jnp.uint32(0x00FF00FF)
    v = (v | (v << 4)) & jnp.uint32(0x0F0F0F0F)
    v = (v | (v << 2)) & jnp.uint32(0x33333333)
    v = (v | (v << 1)) & jnp.uint32(0x55555555)
    return v
  return (spread(x) | (spread(y) << 1)).astype(jnp.int32)


def _sample_minimal_local(rng, avail_f, coord_2d, num_hyps, sample_size,
                          neighbour_px=20.0, cell_px=8.0):
  """Spatially-local minimal samples: a seed drawn uniformly from the
  available correspondences plus (sample_size - 1) entries from a window
  around the seed in Morton order.

  Local sampling is what makes multi-instance scenes tractable: a uniform
  6-point sample over N same-object instances is single-instance-pure with
  probability ~ N^-5, while a spatial neighborhood nearly always lies on
  one instance (the role of GC-RANSAC's neighborhood graph / NAPSAC
  sampling in Progressive-X, infer.py:80-86)."""
  C = avail_f.shape[0]
  # Morton-rank window covering ~ the tau_d-radius disk:
  # pi * (tau_d/cell)^2 cells, at least 8.
  window = max(8, int(3.1416 * (neighbour_px / cell_px) ** 2 / 2))
  key = jnp.where(avail_f > 0, _morton_key(coord_2d, cell_px),
                  jnp.iinfo(jnp.int32).max)
  order = jnp.argsort(key)                       # avail entries first-ish
  inv = jnp.zeros((C,), jnp.int32).at[order].set(
      jnp.arange(C, dtype=jnp.int32))
  k_seed, k_off = jax.random.split(rng)
  seeds = _sample_minimal_uniform(k_seed, avail_f, num_hyps, 1)[:, 0]
  pos = inv[seeds]                               # [H] rank of each seed
  offs = jax.random.randint(k_off, (num_hyps, sample_size - 1),
                            -window, window + 1)
  picks = order[jnp.clip(pos[:, None] + offs, 0, C - 1)]
  return jnp.concatenate([seeds[:, None], picks], axis=1)


def _sample_minimal_uniform(rng, avail_f, num_hyps, sample_size):
  """[num_hyps, sample_size] uniform draws over available entries via
  inverse-CDF (cumsum + searchsorted).

  Orders of magnitude cheaper than Gumbel top-k, which generates
  num_hyps * C randoms and sorts each row (~17M randoms per object at
  the 400x2048 flagship settings). Uniformity comes from a rank->index
  lookup table (one O(C) scatter) instead of searchsorted, which XLA
  lowers as a broadcast compare (num_draws x C). Duplicates within a
  sample are possible but rare and harmless: a duplicated point reduces
  the effective minimal sample by one, and weighted EPnP (num_basis=4)
  remains well-posed at 5 points — the hypothesis simply scores low,
  as in any RANSAC with an occasional degenerate draw."""
  C = avail_f.shape[0]
  avail_i = avail_f > 0
  ranks = jnp.cumsum(avail_i) - 1                    # rank of each avail entry
  n_avail = jnp.maximum(ranks[-1] + 1, 1)
  # lut[rank] = index; non-avail entries write to a spare slot.
  lut = jnp.zeros((C + 1,), jnp.int32).at[
      jnp.where(avail_i, ranks, C)].set(jnp.arange(C, dtype=jnp.int32))
  draw = jax.random.randint(rng, (num_hyps, sample_size), 0, n_avail)
  return lut[jnp.minimum(draw, C - 1)]


def _coverage(px_id, flags, npx):
  """Number of distinct pixels among flagged correspondences."""
  buf = jnp.zeros((npx,), jnp.float32)
  buf = buf.at[px_id].max(flags.astype(jnp.float32))
  return jnp.sum(buf)


def _depth_debias(out, coord_2d, coord_3d, valid, K, inlier_thresh,
                  strength, min_corrs):
  """Errors-in-variables depth correction of fitted poses.

  EPOS correspondences have EXACT 2D coordinates (pixel centers) and noisy
  predicted 3D points; least-squares reprojection then sees an INFLATED
  apparent 3D spread (E[s_hat^2] = s^2 + 2*sigma^2 per in-plane axis) and
  systematically overestimates depth: z_hat ~ z * (1 + sigma^2 / s^2).
  Measured on the controlled-noise probe (box object, z~430 mm, f=320):
  median signed depth error +6.9 mm at sigma=2 mm, +38 mm at 5 mm,
  +150 mm at 10 mm — every trial biased AWAY — while lateral error stays
  20-40x smaller. The reference's Progressive-X + OpenCV EPnP pipeline
  minimizes the same objective and carries the same bias (no analogue of
  this correction exists there; cite scripts/infer.py:470-503).

  The correction, per valid instance:
  - inliers owned by the instance (nearest-pose assignment, tau_r gate);
  - sigma_2d from a truncation-robust Rayleigh quantile match: rho =
    n(r < tau/2) / n(r < tau) depends only on residuals BELOW the inlier
    threshold, so the tau_r truncation cannot bias it (a plain RMS of
    inlier residuals underestimates sigma ~2x at sigma=5 mm);
  - sigma_3d = sigma_2d * z / f;  s^2 = per-axis in-plane spread of the
    inlier 3D points (camera frame, perpendicular to the translation ray);
  - t *= 1 / (1 + strength * sigma_3d^2 / max(s^2 - 2 sigma_3d^2, s^2/4)).

  Probe validation (40 poses/config): bias +6.9 -> -0.3 at sigma=2,
  +38 -> +1.1 at sigma=5; sigma=0.5 and exact inputs unchanged.
  """
  tau = inlier_thresh
  errs = epnp.reprojection_errors(coord_3d, coord_2d, K, out.R, out.t)
  errs = jnp.where(out.valid[:, None], errs, jnp.inf)          # [M, C]
  owner = jnp.argmin(errs, axis=0)                             # [C]
  f = 0.5 * (K[0, 0] + K[1, 1])

  def one(R, t, e, slot, is_valid):
    mine = valid & (owner == slot)
    inl = (e < tau) & mine
    n2 = jnp.sum(inl)
    n1 = jnp.sum((e < 0.5 * tau) & mine)
    rho = n1 / jnp.maximum(n2, 1).astype(jnp.float32)

    def body(_, lohi):
      lo, hi = lohi
      mid = 0.5 * (lo + hi)
      q = ((1.0 - jnp.exp(-tau ** 2 / (8.0 * mid ** 2)))
           / (1.0 - jnp.exp(-tau ** 2 / (2.0 * mid ** 2))))
      too_small = q > rho          # q falls as sigma grows
      return (jnp.where(too_small, mid, lo), jnp.where(too_small, hi, mid))

    lo, hi = jax.lax.fori_loop(
        0, 25, body, (jnp.float32(0.02), jnp.float32(4.0 * tau)))
    s2d = 0.5 * (lo + hi)
    cam = epnp.mat3_apply(R, coord_3d) + t
    w = inl.astype(jnp.float32)
    nw = jnp.maximum(jnp.sum(w), 1.0)
    zc = jnp.sum(cam[:, 2] * w) / nw
    sig3 = s2d * zc / f
    d = t / jnp.maximum(jnp.linalg.norm(t), 1e-6)
    mu = jnp.sum(cam * w[:, None], 0) / nw
    rel = cam - mu
    proj = rel - (rel @ d)[:, None] * d[None, :]
    s2 = jnp.sum(jnp.sum(proj ** 2, 1) * w) / nw / 2.0
    s2_true = jnp.maximum(s2 - 2.0 * sig3 ** 2, 0.25 * s2)
    beta = sig3 ** 2 / jnp.maximum(s2_true, 1e-6)
    ok = is_valid & (n2 >= min_corrs)
    scale = jnp.where(ok, 1.0 / (1.0 + strength * beta), 1.0)
    return t * scale

  slots = jnp.arange(out.t.shape[0], dtype=jnp.int32)
  t_new = jax.vmap(one)(out.R, out.t, errs, slots, out.valid)
  return out._replace(t=t_new)


def pearl_refine(out, coord_2d, coord_3d, conf, px_id, valid, K, npx,
                 inlier_thresh, min_corrs, min_inlier_mass, iters=2,
                 spatial_weight=0.1, grid_w=0):
  """PEARL-style joint re-optimization of the accepted instances.

  The greedy proposal loop in fit_instances assigns each correspondence to
  the FIRST accepted instance that claims it; with overlapping instances an
  earlier pose can steal boundary points from a later one. Progressive-X
  fixes this with PEARL (reference scripts/infer.py:101-111: alternating
  alpha-expansion over the Potts energy + model refitting). TPU-native
  counterpart: alternate
    1. assignment — each correspondence takes the label (instance id or
       outlier) minimizing a truncated-quadratic data cost, minus
       `spatial_weight` x the fraction of its 8 pixel-grid neighbours
       voting for that label (one ICM sweep of the same spatial-coherence
       Potts term the graph cut optimizes; grid_w=0 drops the term);
    2. refit — weighted Gauss-Newton on each instance's assigned set.
  Everything is fixed-shape: [M, C] cost matrices, one-hot scatters onto
  the prediction grid for the neighbour votes.

  Returns (FitResult, labels [C] int32 in [0..M], M = outlier).
  """
  M = out.R.shape[0]
  tau = inlier_thresh

  def data_cost(R, t):
    e = epnp.reprojection_errors(coord_3d, coord_2d, K, R, t)  # [M, C]
    return jnp.minimum(e / tau, 1.0) ** 2

  def assign(cost):
    # cost [M, C]; invalid instances never win; outlier label costs 1
    # (the truncation value — an inlier of any instance beats it).
    cost = jnp.where(out.valid[:, None], cost, jnp.inf)
    # Outlier cost epsilon-below the truncation value: a point at or past
    # tau under EVERY model ties all model costs at 1.0, and argmin would
    # hand it to model 0, whose least-squares refit it then corrupts.
    full = jnp.concatenate(
        [cost, jnp.full((1, cost.shape[1]), 1.0 - 1e-6)], axis=0)
    if spatial_weight > 0.0 and grid_w > 0:
      votes = jnp.zeros((npx, M + 1), jnp.float32)
      lab0 = jnp.argmin(full, axis=0)
      onehot = jax.nn.one_hot(lab0, M + 1) * valid[:, None]
      votes = votes.at[px_id].add(onehot)
      g = votes.reshape(npx // grid_w, grid_w, M + 1)
      # 3x3 neighbour sum (minus self) via separable shifts.
      gp = jnp.pad(g, ((1, 1), (1, 1), (0, 0)))
      row = gp[:-2] + gp[1:-1] + gp[2:]
      nb = (row[:, :-2] + row[:, 1:-1] + row[:, 2:]) - g
      nb = nb.reshape(npx, M + 1)[px_id]                    # [C, M+1]
      frac = nb / jnp.maximum(jnp.sum(nb, axis=1, keepdims=True), 1e-6)
      full = full - spatial_weight * frac.T
    lab = jnp.argmin(full, axis=0)
    return jnp.where(valid, lab, M)

  def refit(labels, R, t):
    def one(m, Rm, tm):
      # The spatial term may hand a geometrically-saturated point (e >=
      # tau under every model) to a model whose neighbours dominate its
      # cell — correct for the LABELING, but such a point must not enter
      # the least-squares refit at full weight (a handful of gross
      # outliers visibly drags Gauss-Newton). Gate on geometric
      # inlier-ness wrt the current pose.
      e_m = epnp.reprojection_errors(coord_3d, coord_2d, K, Rm, tm)
      w = conf * (labels == m) * valid * (e_m < tau)
      ok = jnp.sum(w > 0) >= min_corrs
      R2, t2 = epnp.refine_pose_gn(coord_3d, coord_2d, K, w, Rm, tm,
                                   iters=2)
      return jnp.where(ok, R2, Rm), jnp.where(ok, t2, tm)
    return jax.vmap(one)(jnp.arange(M), R, t)

  def body(_, carry):
    R, t = carry
    labels = assign(data_cost(R, t))
    return refit(labels, R, t)

  R, t = jax.lax.fori_loop(0, iters, body, (out.R, out.t))

  # Final assignment -> per-instance support statistics; instances whose
  # reassigned support falls below the acceptance floors are dropped
  # (PEARL's model-rejection step).
  e = epnp.reprojection_errors(coord_3d, coord_2d, K, R, t)
  labels = assign(jnp.minimum(e / tau, 1.0) ** 2)
  inl = (labels[None, :] == jnp.arange(M)[:, None]) & (e < tau)
  n_in = jnp.sum(inl, axis=1).astype(jnp.int32)
  score = jnp.sum(inl * conf[None, :], axis=1)
  cov = jax.vmap(lambda f: _coverage(px_id, f, npx))(inl)
  keep = out.valid & (n_in >= min_corrs) & (score >= min_inlier_mass)
  return FitResult(R=R, t=t, quality=jnp.where(keep, cov, 0.0),
                   score=jnp.where(keep, score, 0.0),
                   num_inliers=jnp.where(keep, n_in, 0),
                   valid=keep), labels


def fit_instances(coord_2d, coord_3d, conf, px_id, valid, K, npx,
                  rng, num_hypotheses=400, inlier_thresh=4.0,
                  max_instances=1, num_instances=1,
                  min_quality=0.5, use_prosac=False, refine_iters=6,
                  min_corrs=6, min_triangle_area=0.0, neighbour_px=20.0,
                  min_inlier_mass=8.0, pearl_iters=2, spatial_weight=0.1,
                  grid_w=0, refine_anneal=1.0, reject_patience=2,
                  pearl_max_models=5, exact_counts=False,
                  local_sample_frac=0.5, depth_debias=0.0):
  """Fits up to `num_instances` poses of one object.

  Args:
    coord_2d: [C, 2]; coord_3d: [C, 3]; conf/valid/px_id: [C].
    K: [3, 3] intrinsics.
    npx: static int, number of pixels in the prediction map (for coverage).
    num_instances: dynamic int32 — instances to search (LOCALIZATION: count
      of GT annotations of this object, infer.py:462-466).
    max_instances: static capacity of the output.
    local_sample_frac: static fraction of minimal samples drawn spatially
      local (Morton window); the rest are global uniform. Higher values
      favor crowded multi-instance separation, lower values wide-baseline
      single instances.

  Returns FitResult with fixed shapes.
  """
  C = coord_2d.shape[0]

  def fit_one(avail, key):
    """One RANSAC round on the available correspondences."""
    avail_f = avail.astype(jnp.float32)
    if use_prosac:
      idx = _sample_minimal_prosac(key, avail_f, conf, num_hypotheses,
                                   min_corrs)
    else:
      # Global uniform samples (single wide-baseline instances) +
      # spatially-local samples (multi-instance separation).
      k1, k2 = jax.random.split(key)
      n_loc = int(num_hypotheses * local_sample_frac)
      idx_g = _sample_minimal_uniform(
          k1, avail_f, num_hypotheses - n_loc, min_corrs)
      idx_l = _sample_minimal_local(
          k2, avail_f, coord_2d, n_loc, min_corrs,
          neighbour_px=neighbour_px)
      idx = jnp.concatenate([idx_g, idx_l], axis=0)

    pts_h = coord_3d[idx]            # [H, 6, 3]
    uv_h = coord_2d[idx]             # [H, 6, 2]
    w_h = avail_f[idx]               # [H, 6] zero if an unavailable slipped in

    # num_basis=4: eigh-free fast path robust to near-planar minimal
    # samples (objects showing a single face produce coplanar points —
    # the classic EPnP N=1 degeneracy needs the multi-beta cases).
    solve = jax.vmap(
        lambda p, u, w: epnp.solve_epnp(p, u, K, w, num_basis=4))
    R_h, t_h = solve(pts_h, uv_h, w_h)

    # Extra hypothesis: weighted EPnP over ALL available correspondences +
    # Gauss-Newton — with a majority of inliers this often lands directly
    # on the solution (the reference gets the same effect from GC-RANSAC's
    # local optimization with large samples).
    w_all = avail_f * conf
    R_f, t_f = epnp.solve_epnp(coord_3d, coord_2d, K, w_all, num_basis=4)
    R_f, t_f = epnp.refine_pose_gn(coord_3d, coord_2d, K, w_all, R_f, t_f,
                                   iters=3)
    R_h = jnp.concatenate([R_h, R_f[None]], axis=0)
    t_h = jnp.concatenate([t_h, t_f[None]], axis=0)

    errs = epnp.reprojection_errors(coord_3d, coord_2d, K, R_h, t_h)  # [H, C]
    # MSAC scoring: truncated-quadratic gain, confidence weighted — a
    # near-miss hypothesis scores below one with tight inliers, which makes
    # the selection robust to clustered outliers (e.g. wrong-fragment
    # correspondences from symmetric objects).
    gain = jnp.maximum(0.0, 1.0 - (errs / inlier_thresh) ** 2)
    scores = jnp.sum(gain * (conf * avail.astype(jnp.float32))[None, :],
                     axis=1)
    # A degenerate solve can still emit a non-finite pose -> NaN score;
    # NaN wins argmax and would poison the round (observed: a crowded
    # two-instance pool whose deterministic full-set hypothesis diverged
    # made EVERY round select the NaN and emit nothing). Non-finite
    # hypotheses must lose, never win.
    scores = jnp.where(jnp.isfinite(scores), scores, -1.0)
    if min_triangle_area > 0.0:
      # tau_t (reference infer.py:93-95 / pyprogressivex min_triangle_area):
      # degenerate minimal samples — 2D points spanning (almost) no area —
      # are discarded. Here: the largest triangle over the sample's first
      # three point pairs must exceed tau_t px^2.
      p = coord_2d[idx]                                # [H, S, 2]
      e1 = p[:, 1] - p[:, 0]
      e2 = p[:, 2] - p[:, 0]
      e3 = p[:, 3] - p[:, 0]
      areas = 0.5 * jnp.maximum(
          jnp.abs(e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0]),
          jnp.abs(e1[:, 0] * e3[:, 1] - e1[:, 1] * e3[:, 0]))
      ok_area = jnp.concatenate(
          [areas >= min_triangle_area, jnp.ones((1,), bool)])  # full-set hyp
      scores = jnp.where(ok_area, scores, -1.0)
    best = jnp.argmax(scores)
    R_b, t_b = R_h[best], t_h[best]

    # Local optimization: Gauss-Newton on the weighted reprojection error of
    # the inlier set, re-estimating inliers between rounds with the threshold
    # annealed tau_r -> refine_anneal*tau_r: the wide first round captures
    # the basin; a tighter last round keeps far-but-within-tau_r points from
    # biasing the final pose (plays GC-RANSAC local optimization's role in
    # the reference's proposal engine, infer.py:470-488). refine_anneal=1
    # (no annealing) is the config default: CNN-predicted inlier noise
    # fills the whole tau_r band, and tightening discards real support
    # (config.py refine_anneal cites the measured sweep).
    def refine(it, carry):
      R, t = carry
      frac = it.astype(jnp.float32) / jnp.maximum(refine_iters - 1, 1)
      thr = inlier_thresh * (1.0 - (1.0 - refine_anneal) * frac)
      e = epnp.reprojection_errors(coord_3d, coord_2d, K, R, t)
      w = ((e < thr) & avail).astype(jnp.float32) * conf
      ok = jnp.sum(w > 0) >= min_corrs
      R2, t2 = epnp.refine_pose_gn(coord_3d, coord_2d, K, w, R, t, iters=2)
      return (jnp.where(ok, R2, R), jnp.where(ok, t2, t))

    R_b, t_b = jax.lax.fori_loop(0, refine_iters, refine, (R_b, t_b))

    e = epnp.reprojection_errors(coord_3d, coord_2d, K, R_b, t_b)
    inliers = (e < inlier_thresh) & avail
    score = jnp.sum(inliers * conf)
    cov_in = _coverage(px_id, inliers, npx)
    return R_b, t_b, inliers, score, cov_in

  # Proposal rounds: a rejected round consumes nothing and is retried with
  # fresh sampling randomness (Progressive-X proposes repeatedly; a single
  # unlucky minimal-sample draw for an occluded instance should not end the
  # search). The search stops after `reject_patience` CONSECUTIVE
  # rejections, when `num_instances` poses are accepted, or at the hard
  # round budget. The budget allows every instance slot its full reject
  # patience: with a total-rounds budget of max_instances + reject_patience,
  # an interleaved accept/reject sequence (A,R,A,R,...) could exhaust the
  # budget before n_acc reached num_instances even though consecutive
  # rejects never hit the patience — under exact_counts an under-emitted
  # slot is a guaranteed recall miss.
  round_budget = max_instances * (1 + reject_patience)

  def cond(carry):
    i, n_acc, _, _, rejects = carry
    return ((n_acc < jnp.minimum(num_instances, max_instances))
            & (rejects < reject_patience) & (i < round_budget))

  def body(carry):
    i, n_acc, consumed, out, rejects = carry
    avail = valid & ~consumed
    enough = jnp.sum(avail) >= min_corrs
    want = n_acc < num_instances
    key = jax.random.fold_in(rng, i)
    R, t, inliers, score, cov_in = fit_one(avail, key)
    n_in = jnp.sum(inliers)
    # Instance-relative quality: coverage vs the best accepted instance so
    # far (first instance compares against itself, i.e. passes tau_q), or
    # vs the correspondences still available this round (small-but-real
    # occluded instances).
    best_cov = jnp.max(out.quality * out.valid, initial=0.0)
    cov_avail = _coverage(px_id, avail, npx)
    q_best = cov_in / jnp.maximum(jnp.maximum(best_cov, cov_in), 1.0)
    # Floor the shrinking-pool denominator at a fraction of the best
    # instance: without it the acceptance bar collapses as rounds consume
    # the pool and a small residual noise cluster covering most of the
    # leftovers would pass as a phantom instance.
    q_avail = cov_in / jnp.maximum(
        jnp.maximum(cov_avail, 0.25 * best_cov), 1.0)
    quality = jnp.maximum(q_best, q_avail)
    # Absolute acceptance floor (pyprogressivex min_coverage's role,
    # reference infer.py:84-86,482): the instance-relative criteria above
    # auto-pass the FIRST instance (q_best compares it to itself), so
    # without an absolute bar any enabled object with >= min_corrs inliers
    # emits a pose — in DETECTION mode a few spurious tau_a pixels of an
    # absent object would become a false positive. A real instance carries
    # inlier confidence mass of tens-to-hundreds; spurious clusters sit
    # near min_corrs entries at near-threshold confidence.
    abs_ok = score >= min_inlier_mass
    # With exact per-instance counts (LOCALIZATION: the GT annotation list
    # gives the true count, reference infer.py:462-466) the relative
    # quality gate is NOT applied during the search. This is a deliberate,
    # ablation-justified DEVIATION from the reference, which passes
    # min_coverage=min_hypothesis_quality to pyprogressivex unconditionally
    # even in LOCALIZATION (infer.py:497-503 then keeps the top-`counts`
    # poses by quality): when the count is known, an under-emitted slot is
    # a guaranteed miss while a weak extra pose is capped away by BOP19
    # top-n, so gating during the search only loses recall. The absolute
    # floors (min_corrs inliers, min_inlier_mass confidence mass) still
    # apply. In DETECTION the count is only an upper bound, so the
    # relative gate stays — it is what rejects spurious clusters of
    # absent objects. Measured on the crowded-scene ablation
    # (scripts/ablate_fitting.py): k=4 recall 0.31 -> see commit.
    q_ok = jnp.asarray(True) if exact_counts else (quality >= min_quality)
    accept = enough & want & q_ok & (n_in >= min_corrs) & abs_ok
    # Only accepted poses consume their inliers; a rejected round cannot
    # starve later instances of this object.
    consumed = consumed | (inliers & accept)
    # Accepted poses pack into slot n_acc; a rejected round writes inert
    # values into the same (still-unused) slot, which a later accept
    # overwrites.
    out = FitResult(
        R=out.R.at[n_acc].set(jnp.where(accept, R, jnp.eye(3))),
        t=out.t.at[n_acc].set(jnp.where(accept, t, 0.0)),
        # quality stores the inlier PIXEL COVERAGE of the instance; valid
        # poses of one object are mutually comparable through it.
        quality=out.quality.at[n_acc].set(jnp.where(accept, cov_in, 0.0)),
        score=out.score.at[n_acc].set(jnp.where(accept, score, 0.0)),
        num_inliers=out.num_inliers.at[n_acc].set(
            jnp.where(accept, n_in, 0).astype(jnp.int32)),
        valid=out.valid.at[n_acc].set(accept))
    n_acc = n_acc + accept.astype(jnp.int32)
    # A round rejected for lack of correspondences (`enough` false) cannot
    # succeed on retry — fresh sampling randomness does not create points.
    # Exhaust the patience immediately so empty/disabled objects stop after
    # one round (fit_all_objects vmaps this loop over objects; every object
    # pays for the slowest lane's round count).
    rejects = jnp.where(accept, 0,
                        jnp.where(enough, rejects + 1, reject_patience))
    return i + 1, n_acc, consumed, out, rejects

  init = FitResult(
      R=jnp.tile(jnp.eye(3)[None], (max_instances, 1, 1)),
      t=jnp.zeros((max_instances, 3)),
      quality=jnp.zeros((max_instances,)),
      score=jnp.zeros((max_instances,)),
      num_inliers=jnp.zeros((max_instances,), jnp.int32),
      valid=jnp.zeros((max_instances,), bool))
  _, _, _, out, _ = jax.lax.while_loop(
      cond, body,
      (jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32),
       jnp.zeros((C,), bool), init, jnp.asarray(0, jnp.int32)))
  # PEARL re-optimization (reference infer.py:101-111) — only meaningful
  # with several instances in play; the single-instance path already ends
  # in the annealed local refinement above. The reference's
  # max_model_number_for_pearl gate counts ACTUAL instances, not the
  # static output capacity, so the selection is dynamic: compute the
  # PEARL result and keep it only where 1 < n_accepted <= pearl_max_models.
  if pearl_iters > 0 and max_instances > 1:
    pearl_out, _ = pearl_refine(
        out, coord_2d, coord_3d, conf, px_id, valid, K, npx,
        inlier_thresh, min_corrs, min_inlier_mass, iters=pearl_iters,
        spatial_weight=spatial_weight, grid_w=grid_w)
    n_val = jnp.sum(out.valid)
    use = (n_val > 1) & (n_val <= pearl_max_models)
    out = FitResult(*(jnp.where(use, pn, po)
                      for pn, po in zip(pearl_out, out)))
  if depth_debias:
    out = _depth_debias(out, coord_2d, coord_3d, valid, K, inlier_thresh,
                        depth_debias, min_corrs)
  # Normalize reported quality to [0, 1]: coverage fraction of the object's
  # full correspondence pixel footprint (the reference's pose_qualities are
  # per-object comparable scores, infer.py:497-503).
  cov_all = _coverage(px_id, valid, npx)
  out = out._replace(quality=out.quality / jnp.maximum(cov_all, 1.0))
  return out


def fit_all_objects(corrs, K, npx, rng, instance_counts, num_hypotheses=400,
                    inlier_thresh=4.0, max_instances=1, min_quality=0.5,
                    use_prosac=False, refine_iters=6, min_triangle_area=0.0,
                    neighbour_px=20.0, min_inlier_mass=8.0, pearl_iters=2,
                    spatial_weight=0.1, grid_w=0, refine_anneal=1.0,
                    pearl_max_models=5, exact_counts=False,
                    local_sample_frac=0.5, depth_debias=0.0):
  """vmap of fit_instances over the object axis of a Correspondences batch.

  corrs: epos_tpu.ops.corresp.Correspondences ([O, C, ...] arrays).
  instance_counts: [O] int32.
  Returns FitResult with leading [O] axis.
  """
  num_objs = corrs.coord_2d.shape[0]
  keys = jax.random.split(rng, num_objs)

  def per_obj(c2d, c3d, conf, px, val, n_inst, key):
    return fit_instances(
        c2d, c3d, conf, px, val, K, npx, key,
        num_hypotheses=num_hypotheses, inlier_thresh=inlier_thresh,
        max_instances=max_instances, num_instances=n_inst,
        min_quality=min_quality, use_prosac=use_prosac,
        refine_iters=refine_iters, min_triangle_area=min_triangle_area,
        neighbour_px=neighbour_px, min_inlier_mass=min_inlier_mass,
        pearl_iters=pearl_iters, spatial_weight=spatial_weight,
        grid_w=grid_w, refine_anneal=refine_anneal,
        pearl_max_models=pearl_max_models, exact_counts=exact_counts,
        local_sample_frac=local_sample_frac, depth_debias=depth_debias)

  return jax.vmap(per_obj)(
      corrs.coord_2d, corrs.coord_3d, corrs.conf, corrs.px_id, corrs.valid,
      instance_counts, keys)
