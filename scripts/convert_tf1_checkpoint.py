#!/usr/bin/env python3
"""Converts a reference TF1 checkpoint into an Orbax checkpoint.

The reference ships TF1-slim checkpoints of the released models
(/root/reference/README.md:168-191). This CLI turns an exported .npz
(or a .ckpt when TensorFlow is importable — see
epos_tpu/utils/tf1_convert.py:load_tf1_weights) into a step-0 Orbax
checkpoint inside the model dir, directly loadable by scripts/infer.py
(restore_params) and scripts/train.py (resume / --initial_checkpoint
warm start).

Usage:
  python scripts/convert_tf1_checkpoint.py --model=ycbv-bop20-xc65-f64 \
      --tf1_checkpoint=/path/to/weights.npz [--num_objs=21] [--out_dir=...]

Reads <TF_MODELS_PATH>/<model>/params.yml for the architecture flags
(model_variant, num_frags, ...). num_objs comes from --num_objs or the
BOP dataset table (epos_tpu/data/bop.py) for cfg.dataset.
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp

from epos_tpu import config as config_epos
from epos_tpu.config import build_parser
from epos_tpu.train import checkpoints, trainer
from epos_tpu.utils import tf1_convert

logging.basicConfig(level=logging.INFO, format='%(asctime)s %(message)s',
                    force=True)
log = logging.getLogger('convert_tf1_checkpoint')


def main(args=None):
  parser = build_parser('Convert a TF1-slim EPOS checkpoint to Orbax')
  parser.add_argument('--tf1_checkpoint', required=True,
                      help='.npz export or TF .ckpt prefix')
  parser.add_argument('--num_objs', type=int, default=None)
  parser.add_argument('--out_dir', default=None,
                      help='Checkpoint dir (default <model_dir>/checkpoints)')
  parser.add_argument('--strict', type=lambda s: s.lower() != 'false',
                      default=True,
                      help='Fail if any model variable is missing from the '
                           'TF checkpoint (train_utils.py:31-81 contract)')
  ns, rest = parser.parse_known_args(args)

  from epos_tpu.config import config_from_args
  cfg = config_from_args(args, 'convert')
  if cfg.model is None:
    raise ValueError('--model is required')

  num_objs = ns.num_objs
  if num_objs is None:
    if cfg.dataset is None:
      raise ValueError('Pass --num_objs or set dataset in params.yml')
    from epos_tpu.data import bop
    dp = bop.get_model_params(config_epos.BOP_PATH, cfg.dataset)
    num_objs = len(dp['obj_ids'])
  log.info('Model %s: variant=%s num_frags=%d num_objs=%d',
           cfg.model, cfg.model_variant, cfg.num_frags, num_objs)

  tf_vars = tf1_convert.load_tf1_weights(ns.tf1_checkpoint)
  log.info('Loaded %d TF variables from %s', len(tf_vars),
           ns.tf1_checkpoint)

  crop_w, crop_h = cfg.train_crop_size
  state = trainer.create_train_state(
      cfg, num_objs, jax.random.PRNGKey(0),
      jnp.zeros((1, crop_h, crop_w, 3), jnp.float32))
  params, batch_stats, report = tf1_convert.convert_tf1_weights(
      state.params, state.batch_stats, tf_vars, cfg.model_variant,
      strict=ns.strict)
  log.info('Converted %d variables, %d missing', report['converted'],
           len(report['missing']))
  for path, tf_name in report['missing'][:10]:
    log.warning('  missing: %s (expected TF var %s)', path, tf_name)

  state = state.replace(params=params, batch_stats=batch_stats)
  out_dir = ns.out_dir or os.path.join(cfg.model_dir, 'checkpoints')
  checkpoints.save_checkpoint(out_dir, state,
                              max_to_keep=cfg.max_checkpoints_to_keep)
  log.info('Saved step-0 Orbax checkpoint to %s', out_dir)
  return out_dir, report


if __name__ == '__main__':
  main()
