"""EPOS training losses, re-designed dense for TPU.

The reference gathers foreground pixels into a dynamic [N, 4] index list and
runs sparse scatter ops (epos_lib/loss.py:23-303) — shapes depend on data,
which XLA cannot compile efficiently. Here every loss is computed densely over
the full [B, h, w] map and masked, which is mathematically identical:

- obj_cls  : softmax CE over num_objs+1 at every pixel, pixels with the
             ignore label (255) weighted 0, MEAN over all pixels
             (loss.py:99-150 — the reference also averages over all pixels,
             with ignored pixels contributing zero).
- frag_cls : for foreground pixels only, CE between the per-object fragment
             logits (selected at the pixel's GT object) and the kNN target
             distribution. With the reference's unit weights each of the
             top_k rows is a one-hot (the sparse row normalizes to 1 —
             loss.py:196-210), so the loss is the mean over (num_fg * top_k)
             rows of -log softmax at the target fragment (loss.py:153-229).
- frag_loc : Huber (delta=1) on the 3D offset predicted for the GT fragment,
             weighted by the fragment weight, mean over (num_fg * top_k * 3)
             elements (loss.py:232-303).

All means divide by the *actual* number of foreground rows, with a zero guard
when no foreground pixel exists (loss.py:227,301).
"""

import jax
import jax.numpy as jnp

from epos_tpu import common


def _fg_mask_and_cls(obj_label, ignore_label, class_agnostic):
  """Foreground mask and per-pixel class index (loss.py:69-96)."""
  fg = (obj_label != 0) & (obj_label != ignore_label)
  if class_agnostic:
    cls_idx = jnp.zeros_like(obj_label)
  else:
    cls_idx = jnp.maximum(obj_label - 1, 0)  # First fg class -> 0.
  return fg, cls_idx


def obj_cls_loss(logits, targets, ignore_label=common.IGNORE_OBJ_LABEL,
                 loss_weight=1.0):
  """Object classification loss.

  Args:
    logits: [B, h, w, num_objs+1] float32.
    targets: [B, h, w] int labels in {0..num_objs} U {ignore_label}.
  """
  num_classes = logits.shape[-1]
  valid = (targets != ignore_label)
  safe_targets = jnp.where(valid, targets, 0)
  logp = jax.nn.log_softmax(logits, axis=-1)
  ce = -jnp.take_along_axis(logp, safe_targets[..., None], axis=-1)[..., 0]
  ce = jnp.where(valid, ce, 0.0)
  # Reference reduces with tf.reduce_mean over ALL pixels (loss.py:149).
  return loss_weight * jnp.mean(ce)


def frag_cls_loss(logits, frag_targets, frag_weights, obj_label,
                  num_objs, num_frags, class_agnostic=False,
                  ignore_label=common.IGNORE_OBJ_LABEL, loss_weight=1.0):
  """Fragment classification loss.

  Args:
    logits: [B, h, w, n_cls*num_frags] float32 (n_cls = 1 if agnostic).
    frag_targets: [B, h, w, top_k] int fragment ids.
    frag_weights: [B, h, w, top_k] float weights (build the target
      distribution rows; each row normalizes to one-hot — see module doc).
    obj_label: [B, h, w] int object label map.
  """
  b, h, w, _ = logits.shape
  top_k = frag_targets.shape[-1]
  n_cls = 1 if class_agnostic else num_objs
  fg, cls_idx = _fg_mask_and_cls(obj_label, ignore_label, class_agnostic)

  logits = logits.reshape(b, h, w, n_cls, num_frags)
  # Select each pixel's GT-object logits: [B, h, w, num_frags].
  sel = jnp.take_along_axis(
      logits, cls_idx[..., None, None], axis=3)[..., 0, :]
  logp = jax.nn.log_softmax(sel, axis=-1)
  # Gather log-prob of each of the top_k target fragments: [B, h, w, top_k].
  tgt_logp = jnp.take_along_axis(logp, frag_targets, axis=-1)

  # Rows with zero weight would be dropped by the reference's normalization
  # only if ALL entries were zero; unit weights are the practical case.
  row_valid = fg[..., None] & (frag_weights > 0)
  num_rows = jnp.sum(row_valid)
  loss = -jnp.sum(jnp.where(row_valid, tgt_logp, 0.0))
  loss = jnp.where(num_rows > 0, loss / jnp.maximum(num_rows, 1), 0.0)
  return loss_weight * loss


def huber(x, delta=1.0):
  """tf.losses.huber_loss elementwise: 0.5x^2 if |x|<=d else d(|x|-0.5d)."""
  abs_x = jnp.abs(x)
  quad = jnp.minimum(abs_x, delta)
  lin = abs_x - quad
  return 0.5 * quad * quad + delta * lin


def frag_loc_loss(logits, frag_targets, frag_weights, frag_loc_targets,
                  obj_label, num_objs, num_frags, class_agnostic=False,
                  ignore_label=common.IGNORE_OBJ_LABEL, loss_weight=1.0):
  """Fragment localization (3D offset) loss.

  Args:
    logits: [B, h, w, n_cls*num_frags*3] float32.
    frag_targets: [B, h, w, top_k] int GT fragment ids.
    frag_weights: [B, h, w, top_k] float weights (multiply the Huber rows,
      loss.py:296-297).
    frag_loc_targets: [B, h, w, top_k, 3] normalized GT offsets.
    obj_label: [B, h, w] int object label map.
  """
  b, h, w, _ = logits.shape
  top_k = frag_targets.shape[-1]
  n_cls = 1 if class_agnostic else num_objs
  fg, cls_idx = _fg_mask_and_cls(obj_label, ignore_label, class_agnostic)

  logits = logits.reshape(b, h, w, n_cls, num_frags, 3)
  # Select GT object: [B, h, w, num_frags, 3].
  sel = jnp.take_along_axis(
      logits, cls_idx[..., None, None, None], axis=3)[..., 0, :, :]
  # Select GT fragment per top_k: [B, h, w, top_k, 3].
  pred = jnp.take_along_axis(sel, frag_targets[..., None], axis=3)

  err = huber(pred - frag_loc_targets)          # [B, h, w, top_k, 3]
  err = err * frag_weights[..., None]
  row_valid = fg[..., None]                      # [B, h, w, 1]
  err = jnp.where(row_valid[..., None], err, 0.0)
  # Mean over (num_fg * top_k * 3) elements (loss.py:298).
  num_el = jnp.sum(row_valid) * top_k * 3
  loss = jnp.where(num_el > 0, jnp.sum(err) / jnp.maximum(num_el, 1), 0.0)
  return loss_weight * loss


def total_loss(logits, sample, num_objs, num_frags, cfg):
  """Sum of the three losses with configured weights (train.py:198-235).

  Returns (total, dict of individual losses).
  """
  losses = {
      'obj_cls_loss': obj_cls_loss(
          logits[common.PRED_OBJ_CONF], sample[common.GT_OBJ_LABEL],
          loss_weight=cfg.obj_cls_loss_weight),
      'frag_cls_loss': frag_cls_loss(
          logits[common.PRED_FRAG_CONF], sample[common.GT_FRAG_LABEL],
          sample[common.GT_FRAG_WEIGHT], sample[common.GT_OBJ_LABEL],
          num_objs, num_frags, cfg.frag_cls_agnostic,
          loss_weight=cfg.frag_cls_loss_weight),
      'frag_loc_loss': frag_loc_loss(
          logits[common.PRED_FRAG_LOC], sample[common.GT_FRAG_LABEL],
          sample[common.GT_FRAG_WEIGHT], sample[common.GT_FRAG_LOC],
          sample[common.GT_OBJ_LABEL], num_objs, num_frags,
          cfg.frag_loc_agnostic, loss_weight=cfg.frag_loc_loss_weight),
  }
  return sum(losses.values()), losses
