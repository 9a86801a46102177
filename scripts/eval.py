#!/usr/bin/env python3
"""Continuous segmentation-only evaluation (mirror of reference
scripts/eval.py): evaluates the newest checkpoint's object segmentation
(mIoU + confusion matrix), with a re-eval guard via last_evaluation.json
(eval.py:74-91).
"""

import json
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp
import numpy as np

from epos_tpu import common
from epos_tpu.config import config_from_args
from epos_tpu.data.dataset import Dataset
from epos_tpu.data.pipeline import DataLoader
from epos_tpu.models import epos_model
from epos_tpu.train import checkpoints, eval_utils

logging.basicConfig(level=logging.INFO, format='%(asctime)s %(message)s', force=True)
logging.getLogger('absl').setLevel(logging.WARNING)  # quiet orbax internals
log = logging.getLogger('eval')


def main(args=None):
  # Script-local flag (reference eval.py:43-45): minimum seconds between
  # evaluations; paired with the checkpoint re-eval guard below.
  import argparse
  import time as time_lib
  local = argparse.ArgumentParser(add_help=False)
  local.add_argument('--eval_interval_secs', type=int, default=0)
  ns, rest = local.parse_known_args(args)
  cfg = config_from_args(rest, 'EPOS-TPU segmentation eval')
  model_dir = cfg.model_dir
  ckpt_dir = os.path.join(model_dir, 'checkpoints')
  eval_dir = os.path.join(model_dir, 'eval')
  os.makedirs(eval_dir, exist_ok=True)

  step = checkpoints.latest_step(ckpt_dir)
  if step is None:
    log.info('No checkpoint to evaluate.')
    return None

  # Re-eval guard (eval.py:74-91): skip when this checkpoint was already
  # evaluated OR not enough time passed since the last evaluation.
  guard_path = os.path.join(eval_dir, 'last_evaluation.json')
  if os.path.exists(guard_path):
    with open(guard_path) as f:
      last = json.load(f)
    if last.get('step') == step:
      log.info('Checkpoint step %d already evaluated; skipping.', step)
      return None
    since = time_lib.time() - last.get('time', 0.0)
    if since < ns.eval_interval_secs:
      log.info('Skipping evaluation (only %.0f s from the last one).',
               since)
      return None

  crop = tuple(cfg.eval_crop_size)
  stride = min(cfg.decoder_output_stride) if cfg.decoder_output_stride else \
      cfg.encoder_output_stride
  dataset = Dataset(
      cfg, cfg.dataset, cfg.eval_tfrecord_names, model_dir,
      batch_size=1, max_height_before_crop=cfg.eval_max_height_before_crop,
      crop_size=crop, is_training=False, return_gt_orig=False,
      return_gt_maps=True, output_stride=stride)
  num_objs = dataset.num_objs

  model = epos_model.build_model(cfg, num_objs)
  init_vars = model.init(
      jax.random.PRNGKey(0),
      jnp.zeros((1, crop[1], crop[0], 3), jnp.float32), train=False)
  payload, step = checkpoints.restore_params(
      ckpt_dir, init_vars['params'], init_vars.get('batch_stats'))
  variables = {'params': payload['params'],
               'batch_stats': payload.get(
                   'batch_stats', init_vars.get('batch_stats', {}))}

  predict = jax.jit(lambda im: epos_model.predict(
      model, variables, im, image_pyramid=cfg.image_pyramid,
      merge_method=cfg.merge_method)[common.PRED_OBJ_LABEL])

  evaluator = eval_utils.SegEvaluator(num_objs + 1)
  loader = DataLoader(dataset, batch_size=1, shuffle=False, repeat=False)
  n = 0
  for sample in loader:
    pred = predict(jnp.asarray(sample[common.IMAGE]))
    evaluator.update(sample[common.GT_OBJ_LABEL], pred)
    n += 1
  res = evaluator.result()
  path = evaluator.write_report(eval_dir, step)
  # TB summaries (reference eval writes mIoU scalars, eval_utils.py:102-115).
  from epos_tpu.utils.summary import SummaryWriter
  writer = SummaryWriter(os.path.join(model_dir, 'tb_eval'))
  writer.scalars(step, {'miou_all': res['miou_all'],
                        'miou_fg': res['miou_fg']})
  writer.close()
  log.info('Evaluated %d images at step %d: mIoU(all)=%.4f mIoU(fg)=%.4f '
           '(%s)', n, step, res['miou_all'], res['miou_fg'], path)

  with open(guard_path, 'w') as f:
    json.dump({'step': step, 'time': time_lib.time(),
               'miou_all': res['miou_all'],
               'miou_fg': res['miou_fg']}, f)
  return res


if __name__ == '__main__':
  main()
