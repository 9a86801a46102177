#!/usr/bin/env python3
"""Synthetic end-to-end accuracy benchmark: train -> infer -> BOP19 AR.

The closest available proxy to BOP-AR parity while no real BOP data or
released checkpoints exist in this environment (VERDICT r1 #10): builds a
synthetic BOP dataset with MULTI-INSTANCE, OCCLUDED and SYMMETRIC scenes
(tests/synthetic.py), trains a model from scratch, runs the full inference
pipeline at default fitting settings, and evaluates symmetry-aware BOP19
Average Recall in-repo (epos_tpu/train/pose_eval.py).

Usage (defaults give the tracked benchmark configuration):
  python scripts/synthetic_e2e.py --work_dir=/tmp/e2e --steps=12000 \
      [--min_ar=0.3] [--variant=xception_micro]

Prints one JSON line: {"ar": ..., "ar_mssd": ..., "ar_mspd": ...,
"n_estimates": ..., "n_gt": ...}. Exits nonzero if --min_ar is given and
not reached.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np
import yaml


# The TRACKED benchmark configuration: xception_41 at 320x240, 3072 crowded
# multi-instance train images, 30k steps from scratch. Round 3 pinned 50k
# steps, but a from-scratch 50k run (0.10 s/step measured on one v5e chip +
# datagen + eval) does not fit a single round's wall-clock budget and
# driver run-state does not survive between rounds — a COMPLETED 30k
# poly-LR schedule beats a 50k schedule truncated at the same wall clock
# (the final low-LR steps are where dense-correspondence accuracy
# sharpens). The 'quick' preset is the fast pipeline-debug regime.
PRESETS = {
    'tracked': dict(variant='xception_41', steps=30000, train_images=3072,
                    test_images=64, holdout_images=64, detection_images=64,
                    im_width=320, slow_start_step=1000),
    'quick': dict(),   # argparse defaults
}


def _run_detection_eval(ns, model_name, model_dir, params_path, result,
                        cel, ctr, infer_script, eval_poses_script, bop):
  """DETECTION-mode pass on the variable-count split (VERDICT r3 #5).

  All objects enabled, counts unknown (upper bound instances_per_obj + 1):
  reports BOP19 AR plus phantom-pose statistics — estimates for objects
  with ZERO GT instances in the image, the failure mode LOCALIZATION's
  known counts can never expose. Optionally sweeps min_inlier_mass to
  calibrate the absolute acceptance floor on real CNN output.
  """
  from epos_tpu import config as config_epos

  split = 'test_detection'
  cel.main(['--dataset', 'synthbox', '--split', split])
  ctr.main(['--dataset', 'synthbox', '--split', split,
            '--output_name', f'synthbox_{split}', '--encode_ext', '.png'])

  # GT instance counts per (scene, im, obj) for phantom accounting.
  sp = bop.get_split_params(config_epos.BOP_PATH, 'synthbox', split)
  gt_counts = {}
  scene_id = 1
  gts = bop.load_scene_gt(sp['scene_gt_tpath'].format(scene_id=scene_id))
  for im_id, gt_list in gts.items():
    for g in gt_list:
      key = (scene_id, im_id, g['obj_id'])
      gt_counts[key] = gt_counts.get(key, 0) + 1

  masses = ([None] if not ns.sweep_min_inlier_mass else
            [float(x) for x in ns.sweep_min_inlier_mass.split(',')])
  orig_params = yaml.safe_load(open(params_path))
  try:
    for mass in masses:
      params = dict(orig_params)
      params['infer_tfrecord_names'] = [f'synthbox_{split}']
      params['task_type'] = 'detection'
      params['max_instances_to_fit'] = ns.instances_per_obj + 1
      if mass is not None:
        params['min_inlier_mass'] = mass
      yaml.safe_dump(params, open(params_path, 'w'))
      infer_name = split if mass is None else f'{split}_m{mass:g}'
      infer_script.main(['--model', model_name, '--infer_name', infer_name])
      csv_path = os.path.join(model_dir, f'infer_{infer_name}',
                              'estimated-poses.csv')
      out = eval_poses_script.main(
          ['--dataset', 'synthbox', '--split', split, '--results', csv_path])
      ests = bop.load_bop_results(csv_path)
      phantoms = sum(
          1 for e in ests
          if gt_counts.get((e['scene_id'], e['im_id'], e['obj_id']), 0) == 0)
      n_gt = len(out['matches_mssd'])
      matched = round(out['adi01_recall'] * n_gt)
      tag = '_det' if mass is None else f'_det_m{mass:g}'
      result.update({
          f'ar{tag}': round(out['ar'], 4),
          f'adi01{tag}': round(out['adi01_recall'], 4),
          f'n_estimates{tag}': len(ests),
          f'n_gt{tag}': n_gt,
          f'phantoms{tag}': phantoms,
          # Fraction of emitted poses that are phantom (absent object).
          f'phantom_rate{tag}': round(phantoms / max(len(ests), 1), 4),
          # ADI@0.1d matched poses per emitted pose.
          f'precision_adi01{tag}': round(matched / max(len(ests), 1), 4),
      })
  finally:
    # Restore the LOCALIZATION configuration for later --skip_train runs.
    yaml.safe_dump(orig_params, open(params_path, 'w'))


def main(args=None):
  p = argparse.ArgumentParser()
  p.add_argument('--work_dir', required=True)
  p.add_argument('--preset', choices=sorted(PRESETS), default='quick',
                 help='Named configuration; explicit flags still override.')
  p.add_argument('--steps', type=int, default=12000)
  p.add_argument('--variant', default='xception_micro')
  p.add_argument('--num_frags', type=int, default=16)
  p.add_argument('--gt_knn_frags', type=int, default=3)
  p.add_argument('--train_images', type=int, default=512)
  p.add_argument('--test_images', type=int, default=8)
  # Train-DISTRIBUTION eval split (VERDICT r2 #1): held-out poses drawn
  # from the same distribution as the training images — separates pipeline
  # correctness from small-data generalization.
  p.add_argument('--holdout_images', type=int, default=0)
  # DETECTION-mode measurement (VERDICT r3 #5): a split where each object's
  # per-image instance count is uniform in [0, instances_per_obj] — absent
  # objects expose phantom poses, which LOCALIZATION's known counts never
  # can. Inference runs with task_type=detection (all objects enabled,
  # counts unknown).
  p.add_argument('--detection_images', type=int, default=0)
  p.add_argument(
      '--sweep_min_inlier_mass', default='',
      help='Comma-separated min_inlier_mass values to sweep on the '
           'detection split (calibrates the absolute acceptance floor on '
           'real CNN output; cfg default used when empty).')
  p.add_argument('--instances_per_obj', type=int, default=2)
  p.add_argument('--im_width', type=int, default=160)
  p.add_argument('--batch_size', type=int, default=4)
  p.add_argument('--learning_rate', type=float, default=1e-3)
  # LR warmup (reference slow_start_step, train_utils.py): deep from-scratch
  # backbones at b4 can diverge in the first poly-LR steps.
  p.add_argument('--slow_start_step', type=int, default=0)
  p.add_argument('--min_ar', type=float, default=None,
                 help='Gate on the test-split BOP19 AR.')
  p.add_argument('--min_holdout_ar', type=float, default=None,
                 help='Gate on the train-distribution holdout AR.')
  p.add_argument('--skip_train', action='store_true',
                 help='Evaluate an existing checkpoint in work_dir only.')
  p.add_argument('--chunk_steps', type=int, default=10000,
                 help='Training-restart granularity (axon leak workaround); '
                      'also the checkpoint/stop granularity of the run.')
  p.add_argument('--cpu_only', action='store_true',
                 help='Force the CPU backend in train AND infer (outage '
                      'fallback; env JAX_PLATFORMS is overridden by the '
                      'axon bootstrap, so this must go through cfg).')
  ns = p.parse_args(args)
  # Preset values apply where the flag was not given on the command line.
  # Presence is detected from the raw argv tokens (every flag here is
  # --<dest> or --<dest>=...), NOT by comparing to defaults — a flag
  # explicitly passed AT its default value must still beat the preset.
  raw = list(args) if args is not None else sys.argv[1:]
  explicit = {a.dest for a in p._actions
              if any(t == f'--{a.dest}' or t.startswith(f'--{a.dest}=')
                     for t in raw)}
  for k, v in PRESETS[ns.preset].items():
    if k not in explicit:
      setattr(ns, k, v)

  root = os.path.abspath(ns.work_dir)
  os.makedirs(root, exist_ok=True)
  # Record the exact invocation: a later --skip_train re-eval MUST use the
  # same data args (im_width etc.) or it evaluates the checkpoint on a
  # differently-rendered distribution.
  args_path = os.path.join(root, 'run_args.json')
  if ns.skip_train and os.path.exists(args_path):
    prev = json.load(open(args_path))
    mismatches = {
        k: (prev[k], getattr(ns, k)) for k in
        ('variant', 'num_frags', 'gt_knn_frags', 'instances_per_obj',
         'im_width') if prev.get(k) != getattr(ns, k)}
    if mismatches:
      print(f'FAIL: --skip_train args differ from the recorded training '
            f'run {mismatches} (see {args_path})', file=sys.stderr)
      return 2
  else:
    json.dump(vars(ns), open(args_path, 'w'), indent=1)
  bop_dir = os.path.join(root, 'bop')
  os.environ['BOP_PATH'] = bop_dir
  os.environ['TF_DATA_PATH'] = os.path.join(root, 'tf_data')
  os.environ['TF_MODELS_PATH'] = os.path.join(root, 'tf_models')
  from epos_tpu import config as config_epos
  config_epos.BOP_PATH = bop_dir
  config_epos.TF_DATA_PATH = os.path.join(root, 'tf_data')
  config_epos.TF_MODELS_PATH = os.path.join(root, 'tf_models')
  os.makedirs(config_epos.TF_DATA_PATH, exist_ok=True)
  os.makedirs(config_epos.TF_MODELS_PATH, exist_ok=True)

  from tests import synthetic
  # Crowded multi-instance scenes with a symmetric object in both splits.
  # z_range keeps the objects large enough in the 160x120 frame for dense
  # prediction to be learnable (~40-60px across).
  w = ns.im_width
  h = int(w * 3 / 4)
  kw = dict(num_objs=2, instances_per_obj=ns.instances_per_obj,
            symmetric_first=True, crowded=True, z_range=(360, 500),
            im_size=(w, h))
  if not ns.skip_train:
    synthetic.make_bop_dataset(bop_dir, 'synthbox', num_scenes=1,
                               ims_per_scene=ns.train_images, split='train',
                               **kw)
  synthetic.make_bop_dataset(bop_dir, 'synthbox', num_scenes=1,
                             ims_per_scene=ns.test_images, split='test',
                             **kw)
  if ns.holdout_images:
    synthetic.make_bop_dataset(
        bop_dir, 'synthbox', num_scenes=1,
        ims_per_scene=ns.holdout_images, split='train_holdout', **kw)
  if ns.detection_images:
    synthetic.make_bop_dataset(
        bop_dir, 'synthbox', num_scenes=1,
        ims_per_scene=ns.detection_images, split='test_detection',
        instance_count_range=(0, ns.instances_per_obj), **kw)

  model_name = 'e2e-synthbox'
  model_dir = os.path.join(config_epos.TF_MODELS_PATH, model_name)
  os.makedirs(model_dir, exist_ok=True)
  max_inst = 2 * ns.instances_per_obj + 2
  with open(os.path.join(model_dir, 'params.yml'), 'w') as f:
    yaml.safe_dump({
        'dataset': 'synthbox', 'model_variant': ns.variant,
        'num_frags': ns.num_frags, 'atrous_rates': [2, 4],
        # k nearest fragments per GT pixel: near-miss fragment
        # classifications then carry TRAINED offsets instead of garbage
        # (the loc loss only supervises labeled fragments, loss.py:232-303).
        'gt_knn_frags': ns.gt_knn_frags,
        # Snap predicted 3D points to the model surface at inference
        # (reference --project_to_surface, corresp.py:87-88): removes
        # off-surface regression noise; measured +0.016 AR / +0.05
        # ADI@0.1d on the r3c mid-training checkpoint.
        'project_to_surface': True,
        'train_crop_size': f'{w},{h}', 'infer_crop_size': f'{w},{h}',
        'train_max_height_before_crop': h,
        'infer_max_height_before_crop': h,
        'train_tfrecord_names': ['synthbox_train'],
        'infer_tfrecord_names': ['synthbox_test'],
        'compute_dtype': 'float32',
        # Short from-scratch regimes: the reference BN momentum 0.9997 keeps
        # the moving stats 0.9997^steps at their init (74% after 1k steps),
        # so eval-mode predictions lag the trained params badly.
        'bn_momentum': 0.99,
        'max_gt_instances': max_inst,
        'train_steps': ns.steps, 'train_batch_size': ns.batch_size,
        'log_steps': max(10, ns.steps // 20),
        'save_interval_steps': ns.steps,
        'save_summaries_steps': max(10, ns.steps // 10),
        'base_learning_rate': ns.learning_rate,
        'slow_start_step': ns.slow_start_step,
        'slow_start_learning_rate': ns.learning_rate / 10.0,
        'cpu_only': bool(ns.cpu_only),
        'gt_cache_dir': os.path.join(root, 'gt_cache'),
        'data_augmentations': {
            'random_adjust_brightness': {'min_delta': -0.1,
                                         'max_delta': 0.1},
            'random_adjust_contrast': {'min_delta': -0.2, 'max_delta': 0.2},
            'random_gaussian_noise': {'max_sigma': 0.03}},
    }, f)

  import scripts.create_example_list as cel
  import scripts.create_tfrecord as ctr
  import scripts.infer as infer_script
  import scripts.eval_poses as eval_poses_script

  eval_splits = ['test'] + (['train_holdout'] if ns.holdout_images else [])
  for split in (['train'] if not ns.skip_train else []) + eval_splits:
    cel.main(['--dataset', 'synthbox', '--split', split])
    ctr.main(['--dataset', 'synthbox', '--split', split,
              '--output_name', f'synthbox_{split}', '--encode_ext', '.png'])

  # Train in restartable chunks: the axon PJRT client leaks every H2D
  # transfer's host buffer (~batch size per step, CLAUDE.md hazards), so a
  # long single-process run OOMs; checkpoints + auto-resume make process
  # restarts free.
  import subprocess
  if not ns.skip_train:
    chunk = ns.chunk_steps
    done = 0
    while done < ns.steps:
      done = min(ns.steps, done + chunk)
      subprocess.run(
          [sys.executable, os.path.join(os.path.dirname(__file__),
                                        'train.py'),
           '--model', model_name, '--stop_at_step', str(done)],
          env=dict(os.environ), check=True)

  from epos_tpu.data import bop
  from epos_tpu.train import checkpoints as ckpt_lib
  # The evaluated checkpoint's actual step — NOT ns.steps: with
  # --skip_train (or an interrupted run) the latest checkpoint can be far
  # behind the configured schedule, and the artifact must say so.
  ckpt_step = ckpt_lib.latest_step(os.path.join(model_dir, 'checkpoints'))
  result = {'steps': ns.steps, 'checkpoint_step': ckpt_step}
  ar_test = ar_holdout = None
  params_path = os.path.join(model_dir, 'params.yml')
  for split in eval_splits:
    # params.yml wins over CLI flags (reference precedence), so point it at
    # this split's record before running inference.
    params = yaml.safe_load(open(params_path))
    params['infer_tfrecord_names'] = [f'synthbox_{split}']
    yaml.safe_dump(params, open(params_path, 'w'))
    infer_script.main(['--model', model_name, '--infer_name', split])
    csv_path = os.path.join(model_dir, f'infer_{split}',
                            'estimated-poses.csv')
    out = eval_poses_script.main(
        ['--dataset', 'synthbox', '--split', split, '--results', csv_path])
    tag = '' if split == 'test' else '_holdout'
    result.update({
        f'ar{tag}': round(out['ar'], 4),
        f'ar_vsd{tag}': round(out.get('ar_vsd', -1.0), 4),
        f'ar_mssd{tag}': round(out['ar_mssd'], 4),
        f'ar_mspd{tag}': round(out['ar_mspd'], 4),
        f'adi01{tag}': round(out['adi01_recall'], 4),
        f'n_estimates{tag}': len(bop.load_bop_results(csv_path)),
        f'n_gt{tag}': len(out['matches_mssd']),
    })
    if split == 'test':
      ar_test = out['ar']
    else:
      ar_holdout = out['ar']

  if ns.detection_images:
    _run_detection_eval(ns, model_name, model_dir, params_path, result,
                        cel, ctr, infer_script, eval_poses_script, bop)

  print(json.dumps(result))
  rc = 0
  if ns.min_ar is not None and ar_test < ns.min_ar:
    print(f'FAIL: test AR {ar_test:.4f} < min_ar {ns.min_ar}',
          file=sys.stderr)
    rc = 1
  if ns.min_holdout_ar is not None:
    if ar_holdout is None:
      print('FAIL: --min_holdout_ar given but no holdout split was '
            'evaluated (pass --holdout_images)', file=sys.stderr)
      rc = 1
    elif ar_holdout < ns.min_holdout_ar:
      print(f'FAIL: holdout AR {ar_holdout:.4f} < min_holdout_ar '
            f'{ns.min_holdout_ar}', file=sys.stderr)
      rc = 1
  return rc


if __name__ == '__main__':
  sys.exit(main())
