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


def _top_k(scores, k, approx):
  """Exact lax.top_k, or the TPU PartialReduce approx_max_k path.

  approx_max_k lowers to a single O(n) partial-reduction on TPU instead of
  a full sort; the two selection top-Ks sit inside the extract stage that
  PROFILE_r05.json measures as the largest single cost of the inference
  pipeline. Measured on-chip A/B (scripts/profile_infer.py --approx_topk,
  quiet chip, flagship config): extract 12.86 -> 10.90 ms/img, and the
  tracked 90k holdout poses are bit-identical to the exact path (AR
  0.3647 both ways). recall_target=0.95 bounds any tail loss to the
  lowest-confidence ~5% of kept correspondences; the RANSAC stage weights
  by confidence, so the affected tail carries the least influence
  (test_approx_topk_selection_overlaps_exact asserts >= 90% confidence-
  mass overlap). On CPU approx_max_k falls back to the exact sort.
  """
  if not approx:
    return jax.lax.top_k(scores, k)
  vals, idx = jax.lax.approx_max_k(scores, k, recall_target=0.95)
  return vals, idx.astype(jnp.int32)


def establish_many_to_many(obj_confs, frag_confs, frag_coords, frag_centers,
                           frag_sizes, output_scale, capacity=2048,
                           min_obj_conf=0.1, min_frag_rel_conf=0.5,
                           obj_mask_enable=None, approx_topk=False):
  """Extracts correspondences for every object in one fused device pass.

  EXACT reference semantics: every fragment passing tau_b contributes
  (epos_lib/corresp.py:63-67 keeps an unbounded number of fragments per
  pixel — the mechanism EPOS uses for symmetric objects), truncated only by
  the global per-object top-`capacity` by confidence (--max_correspondences,
  infer.py:431-440).

  Selection is two-stage for TPU efficiency, WITHOUT approximation: a
  pixel's best survivor score (obj_conf * max frag conf — the argmax
  fragment always passes tau_b against itself) upper-bounds all of that
  pixel's survivors, so if a pixel is not among the top-`capacity` pixels
  by best score, none of its correspondences can reach the global
  top-`capacity` (there are already `capacity` distinct-pixel entries at or
  above its bound). Stage 1 therefore takes the top-`capacity` pixels by
  best score; stage 2 re-scores only those pixels' full fragment rows.

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
  P = h * w
  if obj_mask_enable is None:
    obj_mask_enable = jnp.ones((num_objs,), bool)

  # Pixel-center image coordinates at input resolution (misc.py:14-26).
  ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / output_scale
  xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / output_scale
  n_pix = min(capacity, P)

  def per_object(o):
    obj_conf = obj_confs[:, :, o + 1].reshape(-1)     # [P]
    obj_ok = (obj_conf > min_obj_conf) & obj_mask_enable[o]
    fconf = frag_confs[:, :, o, :].reshape(P, num_frags)
    fmax = jnp.max(fconf, axis=-1)                    # [P]
    pix_best = jnp.where(obj_ok, obj_conf * fmax, 0.0)

    # Stage 1: top pixels by their best survivor score (exactness bound;
    # with approx_topk the bound holds for the ~95% recalled pixels).
    best_conf, pix_sel = _top_k(pix_best, n_pix, approx_topk)
    rows = fconf[pix_sel]                             # [n_pix, F]
    rmax = jnp.max(rows, axis=-1, keepdims=True)
    rok = (rows > rmax * min_frag_rel_conf) & (best_conf > 0.0)[:, None]
    rscore = jnp.where(rok, obj_conf[pix_sel][:, None] * rows, 0.0)

    # Stage 2: global top-K over the selected pixels' survivors. At tiny
    # resolutions the candidate pool can be smaller than the capacity —
    # clamp k and zero-pad back to the fixed output shape.
    k2 = min(capacity, n_pix * num_frags)
    top_conf, flat_idx = _top_k(rscore.reshape(-1), k2, approx_topk)
    if k2 < capacity:
      top_conf = jnp.pad(top_conf, (0, capacity - k2))
      flat_idx = jnp.pad(flat_idx, (0, capacity - k2))
    valid = top_conf > 0.0
    sel = (flat_idx // num_frags).astype(jnp.int32)
    frag = (flat_idx % num_frags).astype(jnp.int32)
    pix = pix_sel[sel].astype(jnp.int32)
    yy = pix // w
    xx = pix % w

    c2d = jnp.stack([xs[xx], ys[yy]], axis=1)         # [C, 2]
    offsets = frag_coords[yy, xx, o, frag]            # [C, 3]
    centers = frag_centers[o, frag]
    sizes = frag_sizes[o, frag][:, None]
    c3d = centers + offsets * sizes
    cobj = obj_conf[pix]
    cfrag = rows[sel, frag]

    zero = lambda x: jnp.where(valid.reshape((-1,) + (1,) * (x.ndim - 1)),
                               x, 0)
    return (zero(c2d), zero(c3d), zero(top_conf), zero(cobj), zero(cfrag),
            jnp.where(valid, pix, 0), jnp.where(valid, frag, 0), valid,
            jnp.sum(valid).astype(jnp.int32))

  outs = jax.vmap(per_object)(jnp.arange(num_objs))
  return Correspondences(*outs)


def project_to_model_vertices(corrs, model_verts, vert_counts,
                              chunk=256):
  """Projects coord_3d onto the nearest model vertex on device.

  The --project_to_surface path (reference epos_lib/corresp.py:87-88
  projects through an igl AABB tree on host; the nearest-vertex
  approximation is adequate on the dense BOP eval models and keeps the
  whole inference jitted).

  Args:
    corrs: Correspondences ([O, C, ...]).
    model_verts: [O, Vmax, 3] zero-padded vertex arrays.
    vert_counts: [O] int32 valid-vertex counts.
    chunk: correspondence chunk size bounding the [chunk, Vmax] distance
      matrix (full [C, Vmax] would be ~0.5GB at flagship sizes).
  Returns Correspondences with snapped coord_3d.
  """
  O, C, _ = corrs.coord_3d.shape
  Vmax = model_verts.shape[1]
  pad = (-C) % chunk
  n_chunks = (C + pad) // chunk

  def per_obj(c3d, verts, n):
    vmask = jnp.arange(Vmax) < n
    c3d_p = jnp.pad(c3d, ((0, pad), (0, 0))).reshape(n_chunks, chunk, 3)

    def one_chunk(pts):
      d2 = jnp.sum((pts[:, None, :] - verts[None]) ** 2, axis=-1)
      d2 = jnp.where(vmask[None], d2, jnp.inf)
      return verts[jnp.argmin(d2, axis=1)]

    snapped = jax.lax.map(one_chunk, c3d_p).reshape(-1, 3)[:C]
    return snapped

  new3d = jax.vmap(per_obj)(corrs.coord_3d, model_verts, vert_counts)
  new3d = jnp.where(corrs.valid[..., None], new3d, 0.0)
  return corrs._replace(coord_3d=new3d)


def establish_many_to_many_fused(obj_confs, frag_logits, frag_coords,
                                 frag_centers, frag_sizes, output_scale,
                                 capacity=2048, min_obj_conf=0.1,
                                 min_frag_rel_conf=0.5, obj_mask_enable=None,
                                 approx_topk=False):
  """Pallas-fused variant: per-pixel best-score selection runs as a TPU
  kernel over the RAW fragment logits (softmax max + tau_a fused, no
  [h,w,O,F] conf tensor in HBM — ops/corresp_pallas.py); the exact stage-2
  re-scoring of the selected pixels' fragment rows (softmax + tau_b +
  top-K) and 3D reconstruction stay in XLA on a sparse [capacity, F]
  gather. Semantics identical to establish_many_to_many (exact, unbounded
  fragments per pixel).

  Args differ from the unfused version in one place: frag_logits are the
  pre-softmax fragment logits [h, w, num_objs, num_frags].
  """
  from epos_tpu.ops import corresp_pallas

  h, w, num_objs, num_frags = frag_logits.shape
  npx = h * w
  n_pix = min(capacity, npx)

  best = corresp_pallas.best_scores(
      obj_confs, frag_logits, min_obj_conf=min_obj_conf)   # [O, npx]
  if obj_mask_enable is not None:
    best = best * obj_mask_enable[:, None]

  ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / output_scale
  xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / output_scale
  obj_flat = obj_confs.reshape(npx, num_objs + 1)
  logits_flat = frag_logits.reshape(npx, num_objs, num_frags)

  def per_object(o, best_o):
    best_conf, pix_sel = _top_k(best_o, n_pix, approx_topk)  # [n_pix]
    rows = jax.nn.softmax(
        logits_flat[pix_sel, o].astype(jnp.float32), axis=-1)
    rmax = jnp.max(rows, axis=-1, keepdims=True)
    rok = (rows > rmax * min_frag_rel_conf) & (best_conf > 0.0)[:, None]
    cobj_sel = obj_flat[pix_sel, o + 1]
    rscore = jnp.where(rok, cobj_sel[:, None] * rows, 0.0)

    k2 = min(capacity, n_pix * num_frags)
    top_conf, flat_idx = _top_k(rscore.reshape(-1), k2, approx_topk)
    if k2 < capacity:
      top_conf = jnp.pad(top_conf, (0, capacity - k2))
      flat_idx = jnp.pad(flat_idx, (0, capacity - k2))
    valid = top_conf > 0.0
    sel = (flat_idx // num_frags).astype(jnp.int32)
    frag = (flat_idx % num_frags).astype(jnp.int32)
    pix = pix_sel[sel].astype(jnp.int32)
    yy = pix // w
    xx = pix % w
    c2d = jnp.stack([xs[xx], ys[yy]], axis=1)
    offsets = frag_coords[yy, xx, o, frag]
    c3d = frag_centers[o, frag] + offsets * frag_sizes[o, frag][:, None]
    cobj = cobj_sel[sel]
    cfrag = rows[sel, frag]
    zero = lambda x: jnp.where(valid.reshape((-1,) + (1,) * (x.ndim - 1)),
                               x, 0)
    return (zero(c2d), zero(c3d), zero(top_conf), zero(cobj), zero(cfrag),
            jnp.where(valid, pix, 0), jnp.where(valid, frag, 0), valid,
            jnp.sum(valid).astype(jnp.int32))

  outs = jax.vmap(per_object)(jnp.arange(num_objs), best)
  return Correspondences(*outs)
