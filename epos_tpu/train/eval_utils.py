"""Segmentation evaluation: confusion matrix + mIoU.

Mirror of epos_lib/eval_utils.py:16-115 (EvalHook): accumulates a per-pixel
object-segmentation confusion matrix over batches, then writes a tabulated
text file and returns mIoU over all classes and over foreground classes.
The accumulation itself is a jitted device op (bincount over class pairs).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from epos_tpu import common


@jax.jit
def confusion_matrix_update(cm, gt_labels, pred_labels):
  """Adds the batch's pixel pairs to cm [C, C] (rows=GT, cols=pred)."""
  num_classes = cm.shape[0]
  valid = gt_labels != common.IGNORE_OBJ_LABEL
  gt = jnp.where(valid, gt_labels, 0)
  pairs = gt.reshape(-1) * num_classes + pred_labels.reshape(-1)
  upd = jnp.bincount(
      jnp.where(valid.reshape(-1), pairs, num_classes * num_classes),
      length=num_classes * num_classes + 1)[:-1]
  return cm + upd.reshape(num_classes, num_classes)


class SegEvaluator:
  """Accumulates mIoU over predictions (EvalHook, eval_utils.py:16-115)."""

  def __init__(self, num_classes):
    self.num_classes = num_classes
    self.cm = jnp.zeros((num_classes, num_classes), jnp.int32)

  def update(self, gt_labels, pred_labels):
    self.cm = confusion_matrix_update(
        self.cm, jnp.asarray(gt_labels), jnp.asarray(pred_labels))

  def result(self):
    cm = np.asarray(self.cm).astype(np.float64)
    tp = np.diag(cm)
    fp = cm.sum(0) - tp
    fn = cm.sum(1) - tp
    denom = tp + fp + fn
    with np.errstate(divide='ignore', invalid='ignore'):
      iou = np.where(denom > 0, tp / np.maximum(denom, 1), np.nan)
    miou_all = float(np.nanmean(iou))
    miou_fg = float(np.nanmean(iou[1:])) if self.num_classes > 1 else miou_all
    return {'iou': iou, 'miou_all': miou_all, 'miou_fg': miou_fg,
            'cm': np.asarray(self.cm)}

  def write_report(self, out_dir, step):
    """cm_<step>.txt with a tabulated matrix (eval_utils.py:78-101)."""
    import pandas as pd
    from tabulate import tabulate
    res = self.result()
    os.makedirs(out_dir, exist_ok=True)
    df = pd.DataFrame(res['cm'])
    path = os.path.join(out_dir, f'cm_{step}.txt')
    with open(path, 'w') as f:
      f.write(tabulate(df, headers='keys', tablefmt='psql'))
      f.write('\nmIoU (all classes): {:.4f}\n'.format(res['miou_all']))
      f.write('mIoU (fg classes): {:.4f}\n'.format(res['miou_fg']))
    return path
