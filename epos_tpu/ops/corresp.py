"""Many-to-many 2D-3D correspondence extraction, fully on device.

TPU-native re-design of epos_lib/corresp.py:9-101. The reference runs a
per-object numpy boolean-masking pass on host (dynamic shapes, host round
trip — timed as 'establish_corr' in infer.py). Here extraction is one jitted
pass over the dense prediction maps, emitting fixed-capacity top-K buffers
(padding + validity masks instead of dynamic shapes), which also implements
the --max_correspondences cap (infer.py:431-440) for free.

Semantics per object id o (1-based; channel 0 is background):
  obj_mask  = obj_conf[:, :, o] > tau_a                 (corresp.py:47)
  frag_max  = max over frags of frag_conf at the pixel  (corresp.py:63)
  frag_mask = frag_conf > tau_b * frag_max              (corresp.py:64)
  2D        = (px + 0.5) / output_scale                 (corresp.py:55-57)
  3D        = frag_center + frag_size * pred_offset     (corresp.py:70-78)
  conf      = P(frag | obj) * P(obj)                    (corresp.py:80-84)
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Correspondences(NamedTuple):
  """Fixed-capacity correspondence buffers, per object.

  All arrays lead with [num_objs, capacity]. Entries beyond `count` are
  zero-padded and have valid == False.
  """
  coord_2d: jnp.ndarray   # [O, C, 2] image coordinates (input resolution).
  coord_3d: jnp.ndarray   # [O, C, 3] model coordinates (mm).
  conf: jnp.ndarray       # [O, C] P(frag, obj).
  conf_obj: jnp.ndarray   # [O, C] P(obj).
  conf_frag: jnp.ndarray  # [O, C] P(frag | obj).
  px_id: jnp.ndarray      # [O, C] flat pixel index (y * w + x).
  frag_id: jnp.ndarray    # [O, C].
  valid: jnp.ndarray      # [O, C] bool.
  count: jnp.ndarray      # [O] int32.


def establish_many_to_many(obj_confs, frag_confs, frag_coords, frag_centers,
                           frag_sizes, output_scale, capacity=2048,
                           min_obj_conf=0.1, min_frag_rel_conf=0.5,
                           obj_mask_enable=None, frags_per_pixel=4):
  """Extracts correspondences for every object in one fused device pass.

  Args:
    obj_confs: [h, w, num_objs + 1] softmax object confidences.
    frag_confs: [h, w, num_objs, num_frags] softmax fragment confidences.
    frag_coords: [h, w, num_objs, num_frags, 3] predicted offsets (normalized).
    frag_centers: [num_objs, num_frags, 3] fragment centers (model frame).
    frag_sizes: [num_objs, num_frags] fragment sizes.
    output_scale: output / input resolution ratio (e.g. 0.25 for stride 4).
    capacity: max correspondences kept per object (top-K by confidence).
    min_obj_conf: tau_a.
    min_frag_rel_conf: tau_b.
    obj_mask_enable: optional [num_objs] bool — objects to consider
      (LOCALIZATION mode restricts to annotated ids, corresp.py:42).

  Returns:
    Correspondences (see class doc). Jittable; vmapped over objects.
  """
  h, w, num_objs, num_frags = frag_confs.shape
  if obj_mask_enable is None:
    obj_mask_enable = jnp.ones((num_objs,), bool)

  # Pixel-center image coordinates at input resolution (misc.py:14-26).
  ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / output_scale
  xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / output_scale
  px_flat = jnp.arange(h * w, dtype=jnp.int32)

  # Selection is two-stage for TPU efficiency: a single top_k over the full
  # [h*w*F] score array is O(n log n)-ish over 1.2M elements per object;
  # instead take the top `frags_per_pixel` fragments per pixel first (the
  # relative threshold tau_b rarely passes more — it requires conf above
  # half the per-pixel max), then top-K over the [h*w * T] survivors.
  T = min(frags_per_pixel, num_frags)

  def per_object(o):
    obj_conf = obj_confs[:, :, o + 1]                 # [h, w]
    obj_ok = (obj_conf > min_obj_conf) & obj_mask_enable[o]
    fconf = frag_confs[:, :, o, :]                    # [h, w, F]
    fmax = jnp.max(fconf, axis=-1, keepdims=True)
    frag_ok = fconf > (fmax * min_frag_rel_conf)
    ok = obj_ok[..., None] & frag_ok                  # [h, w, F]

    conf_frag = fconf
    conf = obj_conf[..., None] * conf_frag            # [h, w, F]
    score = jnp.where(ok, conf, 0.0)                  # [h, w, F]

    # Stage 1: top-T fragments per pixel.
    s1_conf, s1_frag = jax.lax.top_k(score, T)        # [h, w, T]
    # Stage 2: top-K over all (pixel, slot) survivors.
    top_conf, flat_idx = jax.lax.top_k(s1_conf.reshape(-1), capacity)
    valid = top_conf > 0.0
    pix = (flat_idx // T).astype(jnp.int32)
    frag = s1_frag.reshape(-1)[flat_idx].astype(jnp.int32)
    yy = pix // w
    xx = pix % w

    c2d = jnp.stack([xs[xx], ys[yy]], axis=1)         # [C, 2]
    offsets = frag_coords[yy, xx, o, frag]            # [C, 3]
    centers = frag_centers[o, frag]
    sizes = frag_sizes[o, frag][:, None]
    c3d = centers + offsets * sizes
    cobj = obj_conf[yy, xx]
    cfrag = conf_frag[yy, xx, frag]

    zero = lambda x: jnp.where(valid.reshape((-1,) + (1,) * (x.ndim - 1)),
                               x, 0)
    return (zero(c2d), zero(c3d), zero(top_conf), zero(cobj), zero(cfrag),
            jnp.where(valid, pix, 0), jnp.where(valid, frag, 0), valid,
            jnp.sum(valid).astype(jnp.int32))

  outs = jax.vmap(per_object)(jnp.arange(num_objs))
  return Correspondences(*outs)


def establish_many_to_many_fused(obj_confs, frag_logits, frag_coords,
                                 frag_centers, frag_sizes, output_scale,
                                 capacity=2048, min_obj_conf=0.1,
                                 min_frag_rel_conf=0.5, obj_mask_enable=None,
                                 frags_per_pixel=4):
  """Pallas-fused variant: candidate selection runs as a TPU kernel over the
  RAW fragment logits (softmax+thresholds+top-T fused, no [h,w,O,F] conf
  tensor in HBM — ops/corresp_pallas.py); compaction and 3D reconstruction
  stay in XLA. Semantics identical to establish_many_to_many.

  Args differ from the unfused version in one place: frag_logits are the
  pre-softmax fragment logits [h, w, num_objs, num_frags].
  """
  from epos_tpu.ops import corresp_pallas

  h, w, num_objs, num_frags = frag_logits.shape
  T = min(frags_per_pixel, num_frags)
  npx = h * w

  conf_t, frag_t = corresp_pallas.select_candidates(
      obj_confs, frag_logits, top_t=T, min_obj_conf=min_obj_conf,
      min_frag_rel_conf=min_frag_rel_conf)          # [O, npx, T] each
  if obj_mask_enable is not None:
    conf_t = conf_t * obj_mask_enable[:, None, None]

  ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / output_scale
  xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / output_scale
  obj_flat = obj_confs.reshape(npx, num_objs + 1)

  def per_object(o, conf_o, frag_o):
    top_conf, flat_idx = jax.lax.top_k(conf_o.reshape(-1), capacity)
    valid = top_conf > 0.0
    pix = (flat_idx // T).astype(jnp.int32)
    frag = frag_o.reshape(-1)[flat_idx].astype(jnp.int32)
    frag = jnp.clip(frag, 0, num_frags - 1)
    yy = pix // w
    xx = pix % w
    c2d = jnp.stack([xs[xx], ys[yy]], axis=1)
    offsets = frag_coords[yy, xx, o, frag]
    c3d = frag_centers[o, frag] + offsets * frag_sizes[o, frag][:, None]
    cobj = obj_flat[pix, o + 1]
    cfrag = top_conf / jnp.maximum(cobj, 1e-12)
    zero = lambda x: jnp.where(valid.reshape((-1,) + (1,) * (x.ndim - 1)),
                               x, 0)
    return (zero(c2d), zero(c3d), zero(top_conf), zero(cobj), zero(cfrag),
            jnp.where(valid, pix, 0), jnp.where(valid, frag, 0), valid,
            jnp.sum(valid).astype(jnp.int32))

  outs = jax.vmap(per_object)(jnp.arange(num_objs), conf_t, frag_t)
  return Correspondences(*outs)
