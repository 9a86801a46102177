"""Pallas TPU kernel for fused correspondence candidate selection.

Fuses, in one pass over the fragment-confidence LOGITS (epos_lib/corresp.py
semantics, SURVEY.md §7.6):
  - softmax over fragments (per pixel, per object),
  - the object-confidence threshold tau_a,
  - the per-pixel BEST survivor score P(best frag | obj) * P(obj),
without materializing the [h, w, O, F] softmax tensor in HBM (~100 MB for
the YCB-V f64 flagship): the kernel reads logits once and writes only a
compact [O, h*w] best-score map.

The best score upper-bounds every tau_b survivor at that pixel (the argmax
fragment always passes the relative threshold against itself), so the
top-`capacity` pixels by best score provably contain all global
top-`capacity` correspondences — the caller re-scores only those pixels'
full fragment rows in XLA (a sparse [capacity, F] gather), keeping EXACT
reference semantics with an unbounded number of fragments per pixel
(epos_lib/corresp.py:63-67, the symmetric-object mechanism).

Grid: (num_objs, pixel_tiles). Each program handles a [TILE_PX, F] logit
block in VMEM.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_PX = 512


def _best_score_kernel(obj_conf_ref, frag_logits_ref, best_ref, *,
                       min_obj_conf):
  """One (object, pixel-tile) program.

  obj_conf_ref:    [TILE_PX, 1]  P(obj) at each pixel (softmaxed outside).
  frag_logits_ref: [TILE_PX, F]  fragment logits for this object.
  best_ref:        [TILE_PX, 1]  output best survivor score (0 = no
                                 survivor / tau_a failed).
  """
  logits = frag_logits_ref[0].astype(jnp.float32)          # [TILE_PX, F]
  obj_conf = obj_conf_ref[0].astype(jnp.float32)           # [TILE_PX, 1]

  # max softmax prob == exp(max - max) / sum(exp(l - max)) = 1 / denom.
  m = jnp.max(logits, axis=1, keepdims=True)
  denom = jnp.sum(jnp.exp(logits - m), axis=1, keepdims=True)
  pmax = 1.0 / denom                                       # [TILE_PX, 1]

  ok = obj_conf > min_obj_conf
  best_ref[0] = jnp.where(ok, pmax * obj_conf, 0.0)


@functools.partial(jax.jit, static_argnames=('min_obj_conf',))
def best_scores(obj_confs, frag_logits, min_obj_conf=0.1):
  """Runs the fused best-score kernel.

  Args:
    obj_confs: [h, w, num_objs + 1] softmax object confidences.
    frag_logits: [h, w, num_objs, num_frags] RAW fragment logits.
  Returns:
    best [num_objs, h*w] float32 — per-pixel best survivor score.
  """
  h, w, num_objs, num_frags = frag_logits.shape
  npx = h * w
  # Prefer a tile that divides npx exactly (no pad/slice copies of the
  # ~100MB logits): largest multiple-of-8 divisor <= 2048 (the kernel's
  # live intermediates are ~4x the block -> stay under the 16MB VMEM), else
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

  kernel = functools.partial(_best_score_kernel, min_obj_conf=min_obj_conf)

  grid = (num_objs, npx_pad // tile)
  interpret = jax.devices()[0].platform != 'tpu'
  best = pl.pallas_call(
      kernel,
      grid=grid,
      in_specs=[
          pl.BlockSpec((1, tile, 1), lambda o, p: (o, p, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, tile, num_frags), lambda o, p: (o, p, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((1, tile, 1), lambda o, p: (o, p, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((num_objs, npx_pad, 1), jnp.float32),
      interpret=interpret,
  )(obj_t, fl)
  return best[:, :npx, 0]
