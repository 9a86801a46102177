#!/usr/bin/env python3
"""GT sanity checker (mirror of reference scripts/check_train_input.py):
runs the data pipeline for N batches, saves visualizations, and computes the
fragment-field reprojection oracle — reconstructed XYZ must reproject onto
the pixel centers (check_train_input.py:55-99). Unlike the reference, the
oracle here is an assert, not just a log line.
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np

from epos_tpu import common
from epos_tpu.config import config_from_args, build_parser
from epos_tpu.data import gt_fields
from epos_tpu.data.dataset import Dataset
from epos_tpu.data.pipeline import DataLoader

logging.basicConfig(level=logging.INFO, format='%(asctime)s %(message)s', force=True)
log = logging.getLogger('check_train_input')


def main(args=None, num_batches=None, max_err_px=1.0):
  # Script-local flags (reference check_train_input.py:30-37).
  local = argparse.ArgumentParser(add_help=False)
  local.add_argument('--num_batches_to_check', type=int, default=5)
  local.add_argument('--print_shapes', action='store_true',
                     help='Print shapes of the input tensors.')
  ns, rest = local.parse_known_args(args)
  if num_batches is None:
    num_batches = ns.num_batches_to_check
  cfg = config_from_args(rest, 'EPOS-TPU train-input checker')
  crop = tuple(cfg.train_crop_size)
  stride = min(cfg.decoder_output_stride) if cfg.decoder_output_stride else \
      cfg.encoder_output_stride
  dataset = Dataset(
      cfg, cfg.dataset, cfg.train_tfrecord_names, cfg.model_dir,
      batch_size=1, max_height_before_crop=cfg.train_max_height_before_crop,
      crop_size=crop, is_training=True, return_gt_orig=True,
      return_gt_maps=True, output_stride=stride)

  fc = dataset.model_store.frag_centers
  fs = dataset.model_store.frag_sizes

  loader = DataLoader(dataset, batch_size=1, shuffle=False, repeat=False)
  errs = []
  for i, b in enumerate(loader):
    if i >= num_batches:
      break
    if ns.print_shapes:
      for k in sorted(b):
        v = np.asarray(b[k])
        log.info('  %s: %s %s', k, v.shape, v.dtype)
    n = int(b[common.GT_NUM][0])
    K = b[common.K][0].copy()
    K[:2] /= stride
    err = gt_fields.check_gt_frag_reprojection(
        b[common.GT_FRAG_LABEL][0], b[common.GT_FRAG_LOC][0], None, K,
        b[common.GT_OBJ_IDS][0][:n], b[common.GT_OBJ_QUATS][0][:n],
        b[common.GT_OBJ_TRANS][0][:n], fc, fs, b[common.GT_OBJ_MASKS][0][:n])
    errs.append(err)
    log.info('batch %d: %d GT instances, mean reprojection err %.4f px',
             i, n, err)

  mean_err = float(np.mean(errs)) if errs else 0.0
  log.info('Mean reprojection error over %d batches: %.4f px', len(errs),
           mean_err)
  if mean_err > max_err_px:
    raise AssertionError(
        f'GT fragment fields inconsistent: {mean_err:.3f} px > '
        f'{max_err_px} px')
  log.info('GT pipeline check PASSED.')
  return mean_err


if __name__ == '__main__':
  main()
