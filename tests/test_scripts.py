"""End-to-end CLI tests: create_example_list -> create_tfrecord ->
check_train_input -> train -> eval -> infer on a synthetic BOP dataset."""

import json
import os

import numpy as np
import pytest
import yaml

from epos_tpu import common, config as config_epos
from tests import synthetic

import scripts.create_example_list as cel
import scripts.create_tfrecord as ctr
import scripts.check_train_input as cti
import scripts.train as train_script
import scripts.eval as eval_script
import scripts.infer as infer_script

pytestmark = pytest.mark.slow  # multi-minute e2e path


@pytest.fixture(scope='module')
def workspace(tmp_path_factory):
  root = str(tmp_path_factory.mktemp('ws'))
  bop_dir = os.path.join(root, 'bop')
  synthetic.make_bop_dataset(bop_dir, 'synthbox', num_scenes=1,
                             ims_per_scene=4)
  old = (config_epos.BOP_PATH, config_epos.TF_DATA_PATH,
         config_epos.TF_MODELS_PATH)
  config_epos.BOP_PATH = bop_dir
  config_epos.TF_DATA_PATH = os.path.join(root, 'tf_data')
  config_epos.TF_MODELS_PATH = os.path.join(root, 'tf_models')
  os.makedirs(config_epos.TF_DATA_PATH, exist_ok=True)
  os.makedirs(config_epos.TF_MODELS_PATH, exist_ok=True)

  # Model dir with params.yml (micro backbone for CPU-speed).
  model_name = 'synthbox-micro-f8'
  model_dir = os.path.join(config_epos.TF_MODELS_PATH, model_name)
  os.makedirs(model_dir, exist_ok=True)
  params = {
      'dataset': 'synthbox',
      'model_variant': 'xception_micro',
      'num_frags': 8,
      'atrous_rates': [2, 4],
      'train_crop_size': '160,120',
      'infer_crop_size': '160,120',
      'eval_crop_size': '160,120',
      'train_max_height_before_crop': 120,
      'infer_max_height_before_crop': 120,
      'eval_max_height_before_crop': 120,
      'train_tfrecord_names': ['synthbox_test'],
      'infer_tfrecord_names': ['synthbox_test'],
      'eval_tfrecord_names': ['synthbox_test'],
      'compute_dtype': 'float32',
      'max_gt_instances': 4,
      'train_steps': 12,
      'train_batch_size': 2,
      'log_steps': 4,
      'save_interval_steps': 12,
      'save_summaries_steps': 6,
      'base_learning_rate': 1e-3,
      'max_fitting_iterations': 64,
      'max_corrs_per_obj': 512,
      'data_augmentations': {
          'random_adjust_brightness': {'min_delta': -0.1, 'max_delta': 0.1}},
  }
  with open(os.path.join(model_dir, 'params.yml'), 'w') as f:
    yaml.safe_dump(params, f)

  yield {'root': root, 'model': model_name, 'model_dir': model_dir}
  (config_epos.BOP_PATH, config_epos.TF_DATA_PATH,
   config_epos.TF_MODELS_PATH) = old


def test_01_create_example_list(workspace):
  out = cel.main(['--dataset', 'synthbox', '--split', 'test'])
  assert os.path.exists(out)
  with open(out) as f:
    lines = f.read().strip().splitlines()
  assert len(lines) == 4


def test_02_create_tfrecord(workspace):
  out = ctr.main(['--dataset', 'synthbox', '--split', 'test',
                  '--output_name', 'synthbox_test', '--encode_ext', '.png'])
  assert os.path.exists(out)
  from epos_tpu.data import records
  assert len(list(records.read_records(out))) == 4


def test_03_check_train_input(workspace):
  err = cti.main(['--model', workspace['model']], num_batches=2)
  assert err < 1.0


def test_04_train(workspace):
  train_script.main(['--model', workspace['model']])
  ckpt_dir = os.path.join(workspace['model_dir'], 'checkpoints')
  from epos_tpu.train import checkpoints
  assert checkpoints.latest_step(ckpt_dir) == 12
  # Summaries written.
  tb_dir = os.path.join(workspace['model_dir'], 'tb')
  assert any(f.startswith('events.out.tfevents')
             for f in os.listdir(tb_dir))
  metrics = [json.loads(line) for line in
             open(os.path.join(tb_dir, 'metrics.jsonl'))]
  assert any('total_loss' in m for m in metrics)


def test_05_train_resumes(workspace):
  """Second invocation resumes from the checkpoint instead of restarting."""
  import yaml as yaml_lib
  params_path = os.path.join(workspace['model_dir'], 'params.yml')
  with open(params_path) as f:
    params = yaml_lib.safe_load(f)
  params['train_steps'] = 16
  with open(params_path, 'w') as f:
    yaml_lib.safe_dump(params, f)
  train_script.main(['--model', workspace['model']])
  from epos_tpu.train import checkpoints
  ckpt_dir = os.path.join(workspace['model_dir'], 'checkpoints')
  assert checkpoints.latest_step(ckpt_dir) == 16


def test_05b_chunked_training_stop_at_step(workspace):
  """--stop_at_step ends the loop early with the LR horizon intact
  (train_steps), enabling restartable chunked runs (axon H2D-leak
  mitigation); resuming without it finishes the schedule."""
  import yaml as yaml_lib
  from epos_tpu.train import checkpoints
  params_path = os.path.join(workspace['model_dir'], 'params.yml')
  with open(params_path) as f:
    params = yaml_lib.safe_load(f)
  params['train_steps'] = 24
  params['save_interval_steps'] = 4
  with open(params_path, 'w') as f:
    yaml_lib.safe_dump(params, f)
  ckpt_dir = os.path.join(workspace['model_dir'], 'checkpoints')
  train_script.main(['--model', workspace['model'], '--stop_at_step', '20'])
  assert checkpoints.latest_step(ckpt_dir) == 20
  train_script.main(['--model', workspace['model']])
  assert checkpoints.latest_step(ckpt_dir) == 24


def test_06_eval(workspace):
  res = eval_script.main(['--model', workspace['model']])
  assert res is not None
  assert 0.0 <= res['miou_all'] <= 1.0
  guard = os.path.join(workspace['model_dir'], 'eval',
                       'last_evaluation.json')
  assert os.path.exists(guard)
  # Re-eval guard: second run skips.
  assert eval_script.main(['--model', workspace['model']]) is None


def test_07_infer(workspace):
  poses, times = infer_script.main(['--model', workspace['model']])
  # Localization mode: fitting attempted for every annotated object.
  assert len(times) == 4
  csv_path = os.path.join(workspace['model_dir'], 'infer',
                          'estimated-poses.csv')
  assert os.path.exists(csv_path)
  from epos_tpu.data import bop
  loaded = bop.load_bop_results(csv_path)
  assert len(loaded) == len(poses)
  # With an untrained model poses may be few/absent; the contract here is
  # the pipeline runs and the CSV is valid.


def test_08_infer_detection_mode(workspace):
  """DETECTION task type: all objects enabled, no GT needed."""
  poses, times = infer_script.main(
      ['--model', workspace['model'], '--task_type', 'detection',
       '--max_instances_to_fit', '1', '--infer_name', 'det'])
  assert len(times) == 4
  assert os.path.exists(os.path.join(
      workspace['model_dir'], 'infer_det', 'estimated-poses.csv'))


def test_09_infer_opencv_ransac(workspace):
  """cv2.solvePnPRansac host fallback (reference OPENCV_RANSAC path)."""
  poses, times = infer_script.main(
      ['--model', workspace['model'], '--fitting_method', 'opencv_ransac',
       '--infer_name', 'cv'])
  assert len(times) == 4
  # Stage timings populated in the staged path.
  assert times[1]['prediction'] > 0
  for p in poses:
    assert p['R'].shape == (3, 3)


def test_10_infer_save_corresp_and_vis(workspace):
  """Every vis_* flag on: the grid carries input/gt-poses/pred-poses/labels/
  conf tiles, and the GT/pred fragment-field images are written (reference
  infer.py:150-291)."""
  poses, times = infer_script.main(
      ['--model', workspace['model'], '--save_corresp', 'true',
       '--vis', 'true', '--vis_gt_poses', 'true', '--vis_pred_poses', 'true',
       '--vis_gt_obj_labels', 'true', '--vis_pred_obj_labels', 'true',
       '--vis_pred_obj_confs', 'true', '--vis_gt_frag_fields', 'true',
       '--vis_pred_frag_fields', 'true', '--infer_name', 'v'])
  base = os.path.join(workspace['model_dir'], 'infer_v')
  corr_files = []
  if os.path.isdir(os.path.join(base, 'corr')):
    corr_files = os.listdir(os.path.join(base, 'corr'))
  # Untrained net may produce zero correspondences for some images, but the
  # visualizations must exist for every image.
  vis_files = os.listdir(os.path.join(base, 'vis'))
  for i in range(4):
    prefix = f'{i:06d}'
    assert f'{prefix}_grid.jpg' in vis_files
    for name in ('gt_frag_labels', 'gt_frag_coords', 'gt_frag_reconst',
                 'gt_frag_weights'):
      assert f'{prefix}_{name}.png' in vis_files, (name, vis_files)
    for name in ('pred_frag_centers', 'pred_frag_coords',
                 'pred_frag_reconst'):
      assert f'{prefix}_{name}.jpg' in vis_files, (name, vis_files)
  # The grid has >= 6 tiles (input, gt poses, pred poses, gt labels, pred
  # labels, conf tiles): it must be strictly larger than a 2x2 grid of
  # input-sized tiles.
  import cv2
  grid = cv2.imread(os.path.join(base, 'vis', '000000_grid.jpg'))
  assert grid.shape[0] * grid.shape[1] > 4 * 120 * 160
