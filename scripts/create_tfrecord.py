#!/usr/bin/env python3
"""BOP images + GT -> TFRecord (mirror of reference
scripts/create_tfrecord.py:91-288): per-example RGB (re-encoded jpg quality
95), camera intrinsics, and per-instance object ID / visibility / quaternion
pose / PNG mask.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import cv2
import numpy as np

from epos_tpu import config as config_epos
from epos_tpu.data import bop, records, schema
from epos_tpu.ops import geometry


def create_example(sp, scene_id, im_id, scene_camera, scene_gt,
                   scene_gt_info, encode_ext='.jpg', add_gt=True):
  rgb_path = sp['rgb_tpath'].format(scene_id=scene_id, im_id=im_id)
  im = cv2.cvtColor(cv2.imread(rgb_path), cv2.COLOR_BGR2RGB)
  h, w = im.shape[:2]
  if encode_ext is None:
    # --rgb_format=None: keep the original on-disk encoding
    # (reference create_tfrecord.py:70-74).
    encode_ext = os.path.splitext(rgb_path)[1] or '.png'
  gt_list = []
  for gt_id, gt in enumerate(scene_gt[im_id] if add_gt else []):
    mask_path = sp['mask_visib_tpath'].format(
        scene_id=scene_id, im_id=im_id, gt_id=gt_id)
    mask = cv2.imread(mask_path, cv2.IMREAD_GRAYSCALE)
    if mask is None:
      mask = np.zeros((h, w), np.uint8)
    # R -> quaternion (create_tfrecord.py:158-166).
    q = geometry.quaternion_from_matrix(gt['cam_R_m2c'])
    gt_list.append({
        'obj_id': int(gt['obj_id']),
        'visib_fract': float(
            scene_gt_info[im_id][gt_id].get('visib_fract', 1.0)),
        'q': q,
        't': np.asarray(gt['cam_t_m2c']).flatten(),
        'mask_png': schema.encode_mask_png(mask > 0),
    })
  return schema.make_example(
      scene_id, im_id, rgb_path, schema.encode_image(im, encode_ext),
      h, w, scene_camera[im_id]['cam_K'], gt_list)


def main(args=None):
  p = argparse.ArgumentParser()
  p.add_argument('--dataset', required=True)
  p.add_argument('--split', default='test')
  p.add_argument('--split_type', default=None)
  p.add_argument('--examples_filename', default=None)
  p.add_argument('--output_name', default=None)
  p.add_argument('--encode_ext', default=None,
                 help="Extension alias for --rgb_format (e.g. '.png').")
  # Reference flag surface (create_tfrecord.py:64-74).
  p.add_argument('--rgb_format', default='jpg',
                 help="'jpg', 'png' or 'None' (keep original encoding).")
  p.add_argument('--add_gt', default='True',
                 help='Whether to add ground-truth annotations.')
  p.add_argument('--shuffle', default='False',
                 help='Whether to shuffle the examples.')
  ns = p.parse_args(args)
  add_gt = str(ns.add_gt).lower() in ('1', 'true', 'yes')
  shuffle = str(ns.shuffle).lower() in ('1', 'true', 'yes')
  if ns.encode_ext is not None:
    encode_ext = ns.encode_ext
  elif str(ns.rgb_format).lower() in ('none', ''):
    encode_ext = None
  else:
    encode_ext = '.' + ns.rgb_format.lstrip('.')

  sp = bop.get_split_params(config_epos.BOP_PATH, ns.dataset, ns.split,
                            ns.split_type)
  split_name = sp['name']

  if ns.examples_filename:
    examples = records.load_example_list(os.path.join(
        config_epos.TF_DATA_PATH, 'example_lists', ns.examples_filename))
  else:
    examples = []
    for scene_id in bop.get_present_scene_ids(sp):
      gts = bop.load_scene_gt(sp['scene_gt_tpath'].format(scene_id=scene_id))
      examples += [(scene_id, im_id) for im_id in sorted(gts)]
  if shuffle:
    import random
    random.Random(0).shuffle(examples)

  out_name = ns.output_name or f'{ns.dataset}_{split_name}'
  out_path = os.path.join(config_epos.TF_DATA_PATH, f'{out_name}.tfrecord')

  cache = {}
  n = 0
  with records.RecordWriter(out_path) as w:
    for scene_id, im_id in examples:
      if scene_id not in cache:
        cache[scene_id] = (
            bop.load_scene_camera(
                sp['scene_camera_tpath'].format(scene_id=scene_id)),
            bop.load_scene_gt(
                sp['scene_gt_tpath'].format(scene_id=scene_id)),
            bop.load_json(
                sp['scene_gt_info_tpath'].format(scene_id=scene_id),
                keys_to_int=True)
            if os.path.exists(
                sp['scene_gt_info_tpath'].format(scene_id=scene_id))
            else {})
      cam, gts, infos = cache[scene_id]
      if im_id not in infos:
        infos = dict(infos)
        infos[im_id] = [{'visib_fract': 1.0}] * len(gts[im_id])
      w.write(create_example(sp, scene_id, im_id, cam, gts, infos,
                             encode_ext, add_gt=add_gt))
      n += 1
      if n % 100 == 0:
        print(f'{n}/{len(examples)} examples written')
  print(f'Wrote {n} examples to {out_path}')
  return out_path


if __name__ == '__main__':
  main()
