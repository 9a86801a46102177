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

Layout: PIXELS ride the lane (minor) axis in 128-multiple tiles and the
fragment axis rides the sublanes — the [O*F, npx] view keeps every vector
register full. (A [pixels, F] layout with F=64 lanes or scalar outputs
leaves registers half-empty and measured ~20x slower.)

Grid: (num_objs, pixel_tiles). Each program reduces a [F, TILE_PX] logit
block over the fragment axis in VMEM.
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

  obj_conf_ref:    [num_objs, TILE_PX]  P(obj) for ALL objects (full-dim
                                        block — sublane blocks of 1 are not
                                        lowerable; this object's row is
                                        loaded dynamically).
  frag_logits_ref: [F, TILE_PX]  fragment logits for this object.
  best_ref:        [1, 8, TILE_PX]  output best survivor score broadcast
                                    over 8 sublanes (minimum tile height).
  """
  o = pl.program_id(0)
  logits = frag_logits_ref[...].astype(jnp.float32)        # [F, TILE_PX]
  obj_conf = obj_conf_ref[pl.dslice(o, 1), :].astype(jnp.float32)

  # max softmax prob == 1 / sum(exp(l - max)) — reduced over sublanes (F).
  m = jnp.max(logits, axis=0, keepdims=True)
  denom = jnp.sum(jnp.exp(logits - m), axis=0, keepdims=True)
  pmax = 1.0 / denom                                       # [1, TILE_PX]

  ok = obj_conf > min_obj_conf
  best = jnp.where(ok, pmax * obj_conf, 0.0)               # [1, TILE_PX]
  best_ref[0] = jnp.broadcast_to(best, (8,) + best.shape[1:])


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
  # Lane tiles must be 128-multiples; prefer one that divides npx exactly
  # (no pad/slice copies of the ~100MB logits).
  tile = 0
  for cand in range(min(2048, npx), 127, -128):
    if npx % cand == 0 and cand % 128 == 0:
      tile = cand
      break
  tile = tile or TILE_PX
  npx_pad = ((npx + tile - 1) // tile) * tile

  # [O*F, npx]: fragments on sublanes, pixels on lanes.
  fl = frag_logits.reshape(npx, num_objs * num_frags).T
  obj = obj_confs.reshape(npx, num_objs + 1)[:, 1:].T      # [O, npx]
  if npx_pad != npx:
    # Padding pixels get zero object confidence -> fail tau_a -> conf 0.
    fl = jnp.pad(fl, ((0, 0), (0, npx_pad - npx)))
    obj = jnp.pad(obj, ((0, 0), (0, npx_pad - npx)))

  kernel = functools.partial(_best_score_kernel, min_obj_conf=min_obj_conf)

  grid = (num_objs, npx_pad // tile)
  interpret = jax.devices()[0].platform != 'tpu'
  best = pl.pallas_call(
      kernel,
      grid=grid,
      in_specs=[
          pl.BlockSpec((num_objs, tile), lambda o, p: (0, p),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((num_frags, tile), lambda o, p: (o, p),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((1, 8, tile), lambda o, p: (o, 0, p),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((num_objs, 8, npx_pad), jnp.float32),
      interpret=interpret,
  )(obj, fl)
  return best[:, 0, :npx]
