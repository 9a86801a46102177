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


def _save_correspondences(cfg, infer_dir, im_ind, sample, corrs):
  """Saves established correspondences to per-object text files
  (reference infer.py:294-346 surface: --save_corresp)."""
  out_dir = os.path.join(infer_dir, 'corr')
  os.makedirs(out_dir, exist_ok=True)
  counts = np.asarray(corrs.count)
  for o in range(counts.shape[0]):
    n = int(counts[o])
    if n == 0:
      continue
    path = os.path.join(out_dir, f'{im_ind:06d}_corr_{o + 1:02d}.txt')
    c2d = np.asarray(corrs.coord_2d[o][:n])
    c3d = np.asarray(corrs.coord_3d[o][:n])
    conf = np.asarray(corrs.conf[o][:n])
    px = np.asarray(corrs.px_id[o][:n])
    frag = np.asarray(corrs.frag_id[o][:n])
    with open(path, 'w') as f:
      f.write('# scene {} im {} obj {}: px_id frag_id u v x y z conf\n'
              .format(int(sample[common.SCENE_ID][0]),
                      int(sample[common.IM_ID][0]), o + 1))
      for i in range(n):
        f.write('{} {} {:.3f} {:.3f} {:.4f} {:.4f} {:.4f} {:.6f}\n'.format(
            px[i], frag[i], c2d[i, 0], c2d[i, 1],
            c3d[i, 0], c3d[i, 1], c3d[i, 2], conf[i]))


def _make_vis_renderer(cfg, dataset, crop):
  """Full-resolution renderer for pose overlays (reference infer.py:625-640
  initializes a dedicated renderer at crop size when vis_gt_poses or
  vis_pred_poses; it loads 'eval' models — here the already-loaded model
  store is reused)."""
  if not (cfg.vis and (cfg.vis_gt_poses or cfg.vis_pred_poses)):
    return None
  from epos_tpu.data import renderer as renderer_lib
  store = dataset.model_store
  if store.models is None:
    store.load_models()
  r = renderer_lib.Renderer()
  r.init(crop[0], crop[1])
  for obj_id, model in store.models.items():
    r.add_object(obj_id, model)
  return r


def _visualize(cfg, infer_dir, im_ind, sample, poses, preds, dataset,
               vis_renderer=None):
  """Pose/label/confidence/fragment-field visualizations, covering every
  vis_* flag (reference infer.py:150-291)."""
  import cv2
  from epos_tpu.ops import geometry
  from epos_tpu.utils import vis as vis_lib
  vis_dir = os.path.join(infer_dir, 'vis')
  os.makedirs(vis_dir, exist_ok=True)
  vis_prefix = f'{im_ind:06d}'
  im = np.asarray(sample[common.IMAGE][0]).astype(np.uint8)
  K = np.asarray(sample[common.K][0])
  size = (im.shape[1], im.shape[0])

  def caption(tile, text):
    if tile.shape[:2] != im.shape[:2]:
      tile = cv2.resize(tile, size, interpolation=cv2.INTER_NEAREST)
    return vis_lib.write_text_on_image(tile, [text])

  tiles = [caption(im, 'input')]

  # GT poses (infer.py:204-218): quats/trans from the GT annotations.
  if (cfg.vis_gt_poses and common.GT_NUM in sample
      and vis_renderer is not None):
    n = int(np.asarray(sample[common.GT_NUM]).reshape(-1)[0])
    gt_poses = []
    for g in range(n):
      q = np.asarray(sample[common.GT_OBJ_QUATS][0][g], np.float64)
      gt_poses.append({
          'obj_id': int(np.asarray(sample[common.GT_OBJ_IDS][0][g])),
          'R': geometry.quaternion_matrix(q),
          't': np.asarray(sample[common.GT_OBJ_TRANS][0][g], np.float64),
      })
    tiles.append(caption(vis_lib.visualize_object_poses(
        im, K, gt_poses, vis_renderer), 'gt poses'))

  if cfg.vis_pred_poses and vis_renderer is not None:
    tiles.append(caption(vis_lib.visualize_object_poses(
        im, K, poses, vis_renderer), 'pred poses'))

  if cfg.vis_gt_obj_labels and common.GT_OBJ_LABEL in sample:
    label_vis = vis_lib.colorize_label_map(
        np.asarray(sample[common.GT_OBJ_LABEL][0]))
    tiles.append(caption(label_vis, 'gt obj labels'))

  if cfg.vis_pred_obj_labels and common.PRED_OBJ_LABEL in preds:
    label_vis = vis_lib.colorize_label_map(
        np.asarray(preds[common.PRED_OBJ_LABEL][0]))
    tiles.append(caption(label_vis, 'pred obj labels'))

  # Per-class confidence tiles (infer.py:253-265).
  if cfg.vis_pred_obj_confs and common.PRED_OBJ_CONF in preds:
    tiles.extend(
        caption(t, '') for t in vis_lib.visualize_obj_conf_tiles(
            np.asarray(preds[common.PRED_OBJ_CONF][0]), tile_size=size))

  store = dataset.model_store
  # GT fragment fields (infer.py:267-279; needs GT maps in the samples).
  if (cfg.vis_gt_frag_fields and common.GT_OBJ_MASKS in sample
      and common.GT_FRAG_LABEL in sample):
    n = int(np.asarray(sample[common.GT_NUM]).reshape(-1)[0])
    vis_lib.visualize_gt_frag(
        gt_obj_ids=np.asarray(sample[common.GT_OBJ_IDS][0][:n]),
        gt_obj_masks=np.asarray(sample[common.GT_OBJ_MASKS][0][:n]),
        gt_frag_labels=np.asarray(sample[common.GT_FRAG_LABEL][0]),
        gt_frag_weights=np.asarray(sample[common.GT_FRAG_WEIGHT][0]),
        gt_frag_coords=np.asarray(sample[common.GT_FRAG_LOC][0]),
        frag_centers=store.frag_centers, frag_sizes=store.frag_sizes,
        vis_prefix=vis_prefix, vis_dir=vis_dir)

  # Predicted fragment fields (infer.py:281-291; dense preds are available
  # because cfg.vis forces the unfused prediction path).
  if (cfg.vis_pred_frag_fields and common.PRED_FRAG_CONF in preds
      and common.PRED_FRAG_LOC in preds):
    fc = np.asarray(preds[common.PRED_FRAG_CONF][0])
    fl = np.asarray(preds[common.PRED_FRAG_LOC][0])
    num_objs = dataset.num_objs
    if fc.shape[2] == 1:  # frag_cls_agnostic -> broadcast over objects.
      fc = np.broadcast_to(fc, fc.shape[:2] + (num_objs, fc.shape[3]))
    if fl.shape[2] == 1:
      fl = np.broadcast_to(fl, fl.shape[:2] + (num_objs,) + fl.shape[3:])
    vis_lib.visualize_pred_frag(
        fc, fl, frag_centers=store.frag_centers, frag_sizes=store.frag_sizes,
        vis_prefix=vis_prefix, vis_dir=vis_dir)

  grid = vis_lib.build_grid(tiles)
  vis_lib.save_image(
      os.path.join(vis_dir, f'{vis_prefix}_grid.jpg'), grid)


def main(args=None, time_stages=False):
  cfg = config_from_args(args, 'EPOS-TPU inference')
  model_dir = cfg.model_dir
  if model_dir is None:
    raise ValueError('--model is required')
  if cfg.cpu_only:
    # Reference --cpu_only hides the GPU (infer.py:40-41,686); here: force
    # the CPU backend before any device is claimed.
    jax.config.update('jax_platforms', 'cpu')

  crop = tuple(cfg.infer_crop_size)
  stride = min(cfg.decoder_output_stride) if cfg.decoder_output_stride else \
      cfg.encoder_output_stride
  dataset = Dataset(
      cfg, cfg.dataset, cfg.infer_tfrecord_names, model_dir,
      batch_size=1, max_height_before_crop=cfg.infer_max_height_before_crop,
      crop_size=crop, is_training=False,
      # Reference gating (infer.py:593-602): GT annotations for
      # LOCALIZATION or GT-pose overlays; GT maps only for the vis flags
      # that consume them (the reference over-requests them for pred-side
      # visualizations its tf.data pipeline bundles together).
      return_gt_orig=(cfg.task_type == common.LOCALIZATION
                      or (cfg.vis and (cfg.vis_gt_poses
                                       or cfg.vis_gt_frag_fields))),
      return_gt_maps=(cfg.vis and (cfg.vis_gt_obj_labels
                                   or cfg.vis_gt_frag_fields)),
      output_stride=stride)
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
  vis_renderer = _make_vis_renderer(cfg, dataset, crop)

  all_poses = []
  all_times = []
  rng = jax.random.PRNGKey(0)
  infer_dir = os.path.join(
      model_dir, f'infer_{cfg.infer_name}' if cfg.infer_name else 'infer')
  for im_ind, sample in enumerate(loader):
    poses, run_times, extras = engine.process_image(
        sample, rng=jax.random.fold_in(rng, im_ind))
    all_poses.append(poses)
    all_times.append(run_times)
    log.info('image %d (scene %d, im %d): %d poses, %.3fs',
             im_ind, int(sample[common.SCENE_ID][0]),
             int(sample[common.IM_ID][0]), len(poses), run_times['total'])
    if cfg.save_corresp:
      _save_correspondences(cfg, infer_dir, im_ind, sample, extras[1])
    if cfg.vis:
      _visualize(cfg, infer_dir, im_ind, sample, poses, extras[0], dataset,
                 vis_renderer=vis_renderer)

  # First-image time (jit compile) replaced by the average of the rest
  # (infer.py:741-749).
  if len(all_times) > 1:
    mean_t = float(np.mean([t['total'] for t in all_times[1:]]))
    for pose in all_poses[0]:
      pose['time'] = mean_t
    all_times[0]['total'] = mean_t

  flat_poses = [p for poses in all_poses for p in poses]
  if cfg.save_estimates:
    out_path = os.path.join(infer_dir, 'estimated-poses.csv')
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
