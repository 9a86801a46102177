"""Pallas TPU kernel for fused correspondence candidate selection.

Fuses, in one pass over the fragment-confidence LOGITS (epos_lib/corresp.py
semantics, SURVEY.md §7.6):
  - softmax over fragments (per pixel, per object),
  - the object-confidence threshold tau_a,
  - the relative fragment threshold tau_b (conf > tau_b * per-pixel max),
  - confidence product P(frag|obj) * P(obj),
  - per-pixel top-T fragment selection,
without materializing the [h, w, O, F] softmax tensor in HBM (~100 MB for
the YCB-V f64 flagship): the kernel reads logits once and writes only the
compact [h*w, O, T] candidate buffers. The final global top-K compaction
stays in XLA (tiny input).

Grid: (num_objs, pixel_tiles). Each program handles a [TILE_PX, F] logit
block in VMEM.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_PX = 512


def _select_kernel(obj_conf_ref, frag_logits_ref, conf_ref, idx_ref, *,
                   num_frags, top_t, min_obj_conf, min_frag_rel_conf):
  """One (object, pixel-tile) program.

  obj_conf_ref:    [TILE_PX, 1]  P(obj) at each pixel (softmaxed outside).
  frag_logits_ref: [TILE_PX, F]  fragment logits for this object.
  conf_ref:        [TILE_PX, top_t] output confidences (0 = invalid).
  idx_ref:         [TILE_PX, top_t] output fragment ids.
  """
  logits = frag_logits_ref[0].astype(jnp.float32)       # [TILE_PX, F]
  obj_conf = obj_conf_ref[0].astype(jnp.float32)          # [TILE_PX, 1]

  # Softmax over fragments (lanes).
  m = jnp.max(logits, axis=1, keepdims=True)
  e = jnp.exp(logits - m)
  denom = jnp.sum(e, axis=1, keepdims=True)
  probs = e / denom                                        # [TILE_PX, F]

  # Thresholds: tau_a on the object, tau_b relative on fragments
  # (corresp.py:47,63-64).
  pmax = jnp.max(probs, axis=1, keepdims=True)
  ok = (probs > pmax * min_frag_rel_conf) & (obj_conf > min_obj_conf)
  scores = jnp.where(ok, probs * obj_conf, 0.0)

  lane_ids = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
  # Iterative top-T: T passes of (max, first-argmax, mask).
  for t in range(top_t):
    best = jnp.max(scores, axis=1, keepdims=True)          # [TILE_PX, 1]
    is_best = scores == best
    # First index among ties.
    best_idx = jnp.min(jnp.where(is_best, lane_ids, num_frags), axis=1,
                       keepdims=True)
    conf_ref[0, :, t] = best[:, 0]
    idx_ref[0, :, t] = best_idx[:, 0]
    scores = jnp.where(lane_ids == best_idx, 0.0, scores)


@functools.partial(jax.jit, static_argnames=(
    'top_t', 'min_obj_conf', 'min_frag_rel_conf'))
def select_candidates(obj_confs, frag_logits, top_t=4, min_obj_conf=0.1,
                      min_frag_rel_conf=0.5):
  """Runs the fused selection kernel.

  Args:
    obj_confs: [h, w, num_objs + 1] softmax object confidences.
    frag_logits: [h, w, num_objs, num_frags] RAW fragment logits.
  Returns:
    (conf [num_objs, h*w, top_t], frag_idx [num_objs, h*w, top_t]).
  """
  h, w, num_objs, num_frags = frag_logits.shape
  npx = h * w
  # Prefer a tile that divides npx exactly (no pad/slice copies of the
  # ~100MB logits): largest multiple-of-8 divisor <= 2048 (the kernel's
  # live intermediates are ~6x the block -> stay under the 16MB VMEM), else
  # fall back to padding with TILE_PX.
  tile = 0
  for cand in range(min(2048, npx), 7, -1):
    if npx % cand == 0 and cand % 8 == 0:
      tile = cand
      break
  tile = tile or TILE_PX
  npx_pad = ((npx + tile - 1) // tile) * tile

  # [O, npx, F]: TPU Pallas needs the lane dim (F) to equal the array's
  # last dim; the natural [npx, O*F] layout cannot be lane-sliced per
  # object (o*F offsets aren't 128-aligned), so transpose once here.
  obj = obj_confs.reshape(npx, num_objs + 1)[:, 1:]
  fl = frag_logits.reshape(npx, num_objs, num_frags).transpose(1, 0, 2)
  obj_t = obj.T.reshape(num_objs, npx, 1)
  if npx_pad != npx:
    # Padding pixels get zero object confidence -> fail tau_a -> conf 0.
    fl = jnp.pad(fl, ((0, 0), (0, npx_pad - npx), (0, 0)))
    obj_t = jnp.pad(obj_t, ((0, 0), (0, npx_pad - npx), (0, 0)))
  out_slice = (slice(None), slice(0, npx)) if npx_pad != npx else \
      (slice(None), slice(None))

  kernel = functools.partial(
      _select_kernel, num_frags=num_frags, top_t=top_t,
      min_obj_conf=min_obj_conf, min_frag_rel_conf=min_frag_rel_conf)

  grid = (num_objs, npx_pad // tile)
  interpret = jax.devices()[0].platform != 'tpu'
  conf, idx = pl.pallas_call(
      kernel,
      grid=grid,
      in_specs=[
          pl.BlockSpec((1, tile, 1), lambda o, p: (o, p, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, tile, num_frags), lambda o, p: (o, p, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=[
          pl.BlockSpec((1, tile, top_t), lambda o, p: (o, p, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, tile, top_t), lambda o, p: (o, p, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_shape=[
          jax.ShapeDtypeStruct((num_objs, npx_pad, top_t), jnp.float32),
          jax.ShapeDtypeStruct((num_objs, npx_pad, top_t), jnp.int32),
      ],
      interpret=interpret,
  )(obj_t, fl)
  return conf[out_slice], idx[out_slice]
