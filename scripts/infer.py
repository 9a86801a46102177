#!/usr/bin/env python3
"""Inference driver -> BOP19 CSV. CLI-compatible with reference
scripts/infer.py.

The per-image path (CNN forward, correspondence extraction, multi-instance
RANSAC over all objects) is one fused jitted function — no host round trips
(epos_tpu/inference.py). Stage timing bookkeeping mirrors the reference,
including the first-image time replaced by the running average to hide
compile cost (infer.py:741-749).
"""

import logging
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import numpy as np

from epos_tpu import common, config as config_epos
from epos_tpu.config import config_from_args
from epos_tpu.data import bop
from epos_tpu.data.dataset import Dataset
from epos_tpu.data.pipeline import DataLoader
from epos_tpu.inference import InferenceEngine
from epos_tpu.models import epos_model
from epos_tpu.train import checkpoints

logging.basicConfig(level=logging.INFO, format='%(asctime)s %(message)s', force=True)
logging.getLogger('absl').setLevel(logging.WARNING)  # quiet orbax internals
log = logging.getLogger('infer')


def main(args=None, time_stages=False):
  cfg = config_from_args(args, 'EPOS-TPU inference')
  model_dir = cfg.model_dir
  if model_dir is None:
    raise ValueError('--model is required')

  crop = tuple(cfg.infer_crop_size)
  stride = min(cfg.decoder_output_stride) if cfg.decoder_output_stride else \
      cfg.encoder_output_stride
  dataset = Dataset(
      cfg, cfg.dataset, cfg.infer_tfrecord_names, model_dir,
      batch_size=1, max_height_before_crop=cfg.infer_max_height_before_crop,
      crop_size=crop, is_training=False,
      return_gt_orig=(cfg.task_type == common.LOCALIZATION),
      return_gt_maps=False, output_stride=stride)
  num_objs = dataset.num_objs

  model = epos_model.build_model(cfg, num_objs)
  import jax.numpy as jnp
  init_vars = model.init(
      jax.random.PRNGKey(0),
      jnp.zeros((1, crop[1], crop[0], 3), jnp.float32), train=False)
  ckpt_dir = os.path.join(model_dir, 'checkpoints')
  step = None
  restored = checkpoints.restore_params(
      ckpt_dir, init_vars['params'], init_vars.get('batch_stats'),
      step=int(cfg.checkpoint_name.split('-')[-1])
      if cfg.checkpoint_name else None)
  if restored is not None:
    payload, step = restored
    variables = {'params': payload['params'],
                 'batch_stats': payload.get(
                     'batch_stats', init_vars.get('batch_stats', {}))}
    log.info('Loaded checkpoint step %s', step)
  else:
    variables = init_vars
    log.warning('No checkpoint found in %s — using random init.', ckpt_dir)

  engine = InferenceEngine(cfg, model, variables, dataset.model_store,
                           num_objs, crop_size=crop,
                           time_stages=time_stages)

  loader = DataLoader(dataset, batch_size=1, shuffle=False, repeat=False,
                      num_workers=cfg.num_pipeline_workers)

  all_poses = []
  all_times = []
  rng = jax.random.PRNGKey(0)
  for im_ind, sample in enumerate(loader):
    poses, run_times, _ = engine.process_image(
        sample, rng=jax.random.fold_in(rng, im_ind))
    all_poses.append(poses)
    all_times.append(run_times)
    log.info('image %d (scene %d, im %d): %d poses, %.3fs',
             im_ind, int(sample[common.SCENE_ID][0]),
             int(sample[common.IM_ID][0]), len(poses), run_times['total'])

  # First-image time (jit compile) replaced by the average of the rest
  # (infer.py:741-749).
  if len(all_times) > 1:
    mean_t = float(np.mean([t['total'] for t in all_times[1:]]))
    for pose in all_poses[0]:
      pose['time'] = mean_t
    all_times[0]['total'] = mean_t

  flat_poses = [p for poses in all_poses for p in poses]
  if cfg.save_estimates:
    suffix = f'_{cfg.infer_name}' if cfg.infer_name else ''
    out_path = os.path.join(
        model_dir, f'infer{suffix}',
        'estimated-poses.csv')
    bop.save_bop_results(out_path, flat_poses)
    log.info('Saved %d poses to %s', len(flat_poses), out_path)

  if all_times:
    log.info('Mean total time/image: %.3fs (excl. first: %.3fs)',
             float(np.mean([t['total'] for t in all_times])),
             float(np.mean([t['total'] for t in all_times[1:]]))
             if len(all_times) > 1 else float(all_times[0]['total']))
  return flat_poses, all_times


if __name__ == '__main__':
  main()
