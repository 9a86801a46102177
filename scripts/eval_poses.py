#!/usr/bin/env python3
"""BOP19-style pose evaluation of an estimated-poses.csv against dataset GT.

The reference defers this to external bop_toolkit scripts (SURVEY.md §4);
here it is part of the framework: MSSD/MSPD recall grids -> Average Recall.

Usage:
  python eval_poses.py --dataset=<name> --split=test \
      --results=<path/to/estimated-poses.csv> [--syms_json=...]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np

from epos_tpu import config as config_epos
from epos_tpu.data import bop
from epos_tpu.train import pose_eval

import logging
logging.basicConfig(level=logging.INFO, format='%(asctime)s %(message)s',
                    force=True)
log = logging.getLogger('eval_poses')


def load_split_gt(sp, models_pts, dataset, split, bop_path):
  """GT per image for BOP19 scoring: (gt_per_image, Ks, im_widths, depth_ims).

  bop_toolkit evaluates exactly the target list — an image the method
  produced no estimates for still counts all its GT instances as misses
  (keying on the results would silently inflate recall for weak models).
  Real BOP test splits are scored only on test_targets_bop19.json
  (untargeted images' GT must NOT count); splits without a targets file
  (the synthetic sets) are scored on every image of every scene.
  """
  split_root = os.path.dirname(
      os.path.dirname(sp['scene_gt_tpath'].format(scene_id=0)))
  targets_path = os.path.join(bop_path, dataset, 'test_targets_bop19.json')
  target_images = None
  if split == 'test' and os.path.exists(targets_path):
    target_images = {(t['scene_id'], t['im_id'])
                     for t in bop.load_json(targets_path)}
    log.info('Restricting GT to %d targeted images (%s)',
             len(target_images), targets_path)
  scene_ids = sorted(
      int(d) for d in os.listdir(split_root)
      if d.isdigit() and os.path.isdir(os.path.join(split_root, d)))
  gt_per_image, Ks, im_widths, depth_ims = {}, {}, {}, {}
  for scene_id in scene_ids:
    gts = bop.load_scene_gt(sp['scene_gt_tpath'].format(scene_id=scene_id))
    cams = bop.load_scene_camera(
        sp['scene_camera_tpath'].format(scene_id=scene_id))
    info_path = sp['scene_gt_info_tpath'].format(scene_id=scene_id)
    infos = (bop.load_json(info_path, keys_to_int=True)
             if os.path.exists(info_path) else {})
    for im_id in sorted(gts):
      s_id = scene_id
      if target_images is not None and (s_id, im_id) not in target_images:
        continue
      im_info = infos.get(im_id, [])
      gt_per_image[(s_id, im_id)] = [
          {'obj_id': g['obj_id'], 'R': g['cam_R_m2c'],
           't': g['cam_t_m2c'].flatten()} for gt_id, g in enumerate(gts[im_id])
          if g['obj_id'] in models_pts
          # BOP19 protocol: only GT instances visible from >= 10% count
          # (bop_toolkit eval_calc_scores visib_gt_min).
          and (gt_id >= len(im_info)
               or im_info[gt_id].get('visib_fract', 1.0) >= 0.1)]
      Ks[(s_id, im_id)] = cams[im_id]['cam_K']
      # Real scene depth for VSD visibility when the split ships it.
      d = bop.load_depth(
          sp['depth_tpath'].format(scene_id=s_id, im_id=im_id),
          cams[im_id].get('depth_scale', 1.0))
      if d is not None:
        depth_ims[(s_id, im_id)] = d
      # Image width for BOP19's MSPD scale normalization (r = 640/w,
      # bop_toolkit pose_error.mspd). The actual per-image width (from the
      # depth map) is exact even for off-center principal points (where the
      # former 2*cx heuristic is wrong) and for synthetic sets missing from
      # the _DATASET_IM_SIZE table; fall back to the split's nominal size.
      if d is not None:
        im_widths[(s_id, im_id)] = float(d.shape[1])
      else:
        im_widths[(s_id, im_id)] = float(sp['im_size'][0])
  return gt_per_image, Ks, im_widths, depth_ims


def main(args=None):
  p = argparse.ArgumentParser()
  p.add_argument('--dataset', required=True)
  p.add_argument('--split', default='test')
  p.add_argument('--split_type', default=None)
  p.add_argument('--results', required=True)
  p.add_argument('--output_path', default=None)
  p.add_argument('--no_vsd', action='store_true',
                 help='Skip VSD (AR becomes the MSSD/MSPD mean).')
  ns = p.parse_args(args)

  results = bop.load_bop_results(ns.results)
  sp = bop.get_split_params(config_epos.BOP_PATH, ns.dataset, ns.split,
                            ns.split_type)
  mp = bop.get_model_params(config_epos.BOP_PATH, ns.dataset,
                            model_type='eval')

  # Load models (points + diameters + symmetries from models_info.json).
  models_pts, diameters, syms = {}, {}, {}
  info = {}
  if os.path.exists(mp['models_info_path']):
    info = bop.load_json(mp['models_info_path'], keys_to_int=True)
  for obj_id in mp['obj_ids']:
    m = bop.load_ply(mp['model_tpath'].format(obj_id=obj_id))
    pts = m['pts']
    if len(pts) > 1000:  # Subsample for speed (error metrics are maxima
      pts = pts[:: len(pts) // 1000]  # over points; dense enough).
    models_pts[obj_id] = pts
    if obj_id in info and 'diameter' in info[obj_id]:
      diameters[obj_id] = float(info[obj_id]['diameter'])
    else:
      d2 = ((m['pts'][:, None, :][::10] - m['pts'][None, ::10]) ** 2
            ).sum(-1)
      diameters[obj_id] = float(np.sqrt(d2.max()))
    obj_syms = []
    if obj_id in info:
      for s in info[obj_id].get('symmetries_discrete', []):
        T = np.array(s).reshape(4, 4)
        obj_syms.append({'R': T[:3, :3], 't': T[:3, 3]})
      for s in info[obj_id].get('symmetries_continuous', []):
        obj_syms += pose_eval.continuous_syms_to_discrete(s['axis'])
    if obj_syms:
      syms[obj_id] = obj_syms

  gt_per_image, Ks, im_widths, depth_ims = load_split_gt(
      sp, models_pts, dataset=ns.dataset, split=ns.split,
      bop_path=config_epos.BOP_PATH)

  # VSD renderer: eval models at the split's image size (BOP19 AR is the
  # mean over VSD+MSSD+MSPD; reference defers to bop_toolkit, here in-repo).
  vsd_renderer = None
  if not ns.no_vsd:
    from epos_tpu.data import renderer as renderer_lib
    if depth_ims:
      h, w = next(iter(depth_ims.values())).shape[:2]
    else:
      w, h = sp['im_size']
    vsd_renderer = renderer_lib.Renderer()
    vsd_renderer.init(w, h)
    for obj_id in mp['obj_ids']:
      vsd_renderer.add_object(obj_id, mp['model_tpath'].format(obj_id=obj_id))

  out = pose_eval.evaluate_localization(
      results, gt_per_image, models_pts, diameters, Ks, syms,
      im_widths=im_widths, vsd_renderer=vsd_renderer, depth_ims=depth_ims)
  log.info('Images: %d, GT instances: %d, estimates: %d',
           len(gt_per_image), len(out['matches_mssd']), len(results))
  log.info('AR_VSD=%s AR_MSSD=%.4f AR_MSPD=%.4f AR=%.4f ADI@0.1d=%.4f',
           ('%.4f' % out['ar_vsd']) if 'ar_vsd' in out else 'n/a',
           out['ar_mssd'], out['ar_mspd'], out['ar'], out['adi01_recall'])
  if out.get('matches_terr'):
    # Depth-vs-lateral split of the matched-pose translation error: weak
    # PnP depth observability shows up as depth >> lateral (round-3
    # diagnosis, ~40 mm median depth error at holdout AR 0.33).
    terr = np.array([m[1:] for m in out['matches_terr']])
    med = np.median(terr, axis=0)
    log.info('Matched translation error (median over %d): depth=%.1f mm, '
             'lateral=%.1f mm, norm=%.1f mm, signed depth=%+.1f mm',
             len(terr), *med)
  if ns.output_path:
    dump = {k: out[k] for k in
            ('ar_vsd', 'ar_mssd', 'ar_mspd', 'ar', 'adi01_recall')
            if k in out}
    dump['n_gt'] = len(out['matches_mssd'])
    dump['n_estimates'] = len(results)
    if out.get('matches_terr'):
      dump['median_depth_err_mm'] = float(med[0])
      dump['median_lateral_err_mm'] = float(med[1])
      # Signed: + = poses pushed away from the camera (the EIV-inflation
      # signature the depth_debias option corrects); - = collapsed-depth.
      dump['median_depth_err_signed_mm'] = float(med[3])
    with open(ns.output_path, 'w') as f:
      json.dump(dump, f)
  return out


if __name__ == '__main__':
  main()
