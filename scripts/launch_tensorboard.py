#!/usr/bin/env python3
"""Launches TensorBoard over one or more model dirs (mirror of reference
scripts/launch_tensorboard.py). Summaries are written by
epos_tpu/utils/summary.py in native TB event format."""

import argparse
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from epos_tpu import config as config_epos


def main(args=None):
  p = argparse.ArgumentParser()
  p.add_argument('--models', required=True, help='Comma-separated names.')
  p.add_argument('--port', type=int, default=6006)
  ns = p.parse_args(args)

  logdirs = []
  for name in ns.models.split(','):
    logdirs.append('{}:{}'.format(
        name, os.path.join(config_epos.TF_MODELS_PATH, name, 'tb')))
  cmd = ['tensorboard', '--logdir_spec' if len(logdirs) > 1 else '--logdir',
         ','.join(logdirs), '--port', str(ns.port)]
  print(' '.join(cmd))
  subprocess.run(cmd)


if __name__ == '__main__':
  main()
