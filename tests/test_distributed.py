"""Multi-host training test: a real 2-process jax.distributed CPU cluster.

Covers the replacement for the reference's PS replication
(scripts/train.py:35-50,456,544): global device mesh across processes,
disjoint input shards, XLA gradient all-reduce across hosts (Gloo on CPU),
and chief-only checkpoint/summary IO.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest
import yaml

pytestmark = pytest.mark.slow  # multi-minute e2e path

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
  s = socket.socket()
  s.bind(('localhost', 0))
  port = s.getsockname()[1]
  s.close()
  return port


def test_two_process_training(tmp_path):
  from tests import synthetic
  bop_dir = str(tmp_path / 'bop')
  synthetic.make_bop_dataset(bop_dir, 'synthbox', num_scenes=1,
                             ims_per_scene=4)
  tf_data = str(tmp_path / 'tf_data')
  tf_models = str(tmp_path / 'tf_models')
  os.makedirs(tf_data)
  model_dir = os.path.join(tf_models, 'dist-micro')
  os.makedirs(model_dir)
  with open(os.path.join(model_dir, 'params.yml'), 'w') as f:
    yaml.safe_dump({
        'dataset': 'synthbox', 'model_variant': 'xception_micro',
        'num_frags': 8, 'atrous_rates': [2, 4],
        'train_crop_size': '160,120', 'train_max_height_before_crop': 120,
        'train_tfrecord_names': ['synthbox_test'],
        'compute_dtype': 'float32', 'max_gt_instances': 4,
        'train_steps': 4, 'train_batch_size': 4, 'log_steps': 2,
        'save_interval_steps': 4, 'save_summaries_steps': 2,
    }, f)

  env_base = dict(os.environ)
  env_base.update({
      'BOP_PATH': bop_dir, 'TF_DATA_PATH': tf_data,
      'TF_MODELS_PATH': tf_models, 'JAX_PLATFORMS': 'cpu',
      'XLA_FLAGS': '--xla_force_host_platform_device_count=2',
      'PYTHONPATH': REPO,
  })

  # Build the TFRecord once (single process).
  subprocess.run(
      [sys.executable, os.path.join(REPO, 'scripts/create_example_list.py'),
       '--dataset', 'synthbox', '--split', 'test'],
      env=env_base, check=True, timeout=300)
  subprocess.run(
      [sys.executable, os.path.join(REPO, 'scripts/create_tfrecord.py'),
       '--dataset', 'synthbox', '--split', 'test',
       '--output_name', 'synthbox_test', '--encode_ext', '.png'],
      env=env_base, check=True, timeout=300)

  port = _free_port()
  procs = []
  logs = []
  for task in (0, 1):
    log_path = str(tmp_path / f'proc{task}.log')
    logs.append(log_path)
    procs.append(subprocess.Popen(
        [sys.executable, os.path.join(REPO, 'scripts/train.py'),
         '--model', 'dist-micro', '--master', f'localhost:{port}',
         '--num_replicas', '2', '--task', str(task)],
        env=env_base, stdout=open(log_path, 'w'),
        stderr=subprocess.STDOUT))
  rcs = [p.wait(timeout=800) for p in procs]
  outs = [open(p).read() for p in logs]
  assert rcs == [0, 0], f'p0:\n{outs[0][-3000:]}\np1:\n{outs[1][-3000:]}'

  # Both processes saw the global 4-device mesh and finished 4 steps.
  for task, out in enumerate(outs):
    assert 'Multi-host: process %d/2' % task in out, out[-2000:]
    assert 'over 4 devices' in out, out[-2000:]

  # Checkpointing is collective (every process calls Orbax save; data is
  # written once), and the save log + summary writer are chief-only.
  from epos_tpu.train import checkpoints
  assert checkpoints.latest_step(
      os.path.join(model_dir, 'checkpoints')) == 4
  assert 'Saved checkpoint' in outs[0]
  assert 'Saved checkpoint' not in outs[1]
  assert os.path.isdir(os.path.join(model_dir, 'tb'))

  # The all-reduced loss is identical on both processes (same global
  # computation) — compare the logged step-4 totals.
  def step_totals(out):
    vals = []
    for line in out.splitlines():
      if 'step 4: total=' in line:
        vals.append(float(line.split('total=')[1].split()[0]))
    return vals
  t0, t1 = step_totals(outs[0]), step_totals(outs[1])
  assert t0 and t1
  np.testing.assert_allclose(t0, t1, rtol=1e-5)
