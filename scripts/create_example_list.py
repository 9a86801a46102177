#!/usr/bin/env python3
"""Creates a text list of examples from a BOP dataset split (mirror of
reference scripts/create_example_list.py:60-118).

Either all images of all present scenes, or the subset named by a BOP19
targets JSON (test_targets_bop19.json).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from epos_tpu import config as config_epos
from epos_tpu.data import bop, records


def main(args=None):
  p = argparse.ArgumentParser()
  p.add_argument('--dataset', required=True)
  p.add_argument('--split', default='test')
  p.add_argument('--split_type', default=None)
  p.add_argument('--targets_filename', default=None,
                 help='e.g. test_targets_bop19.json')
  p.add_argument('--output_path', default=None)
  ns = p.parse_args(args)

  examples = []
  if ns.targets_filename:
    targets = bop.load_json(os.path.join(
        config_epos.BOP_PATH, ns.dataset, ns.targets_filename))
    seen = set()
    for tgt in targets:
      key = (tgt['scene_id'], tgt['im_id'])
      if key not in seen:
        seen.add(key)
        examples.append(key)
  else:
    sp = bop.get_split_params(config_epos.BOP_PATH, ns.dataset, ns.split,
                              ns.split_type)
    for scene_id in bop.get_present_scene_ids(sp):
      gts = bop.load_scene_gt(sp['scene_gt_tpath'].format(scene_id=scene_id))
      for im_id in sorted(gts):
        examples.append((scene_id, im_id))

  split_name = ns.split if ns.split_type is None else \
      f'{ns.split}_{ns.split_type}'
  out = ns.output_path or os.path.join(
      config_epos.TF_DATA_PATH, 'example_lists',
      f'{ns.dataset}_{split_name}_examples.txt')
  records.save_example_list(out, examples)
  print(f'Saved {len(examples)} examples to {out}')
  return out


if __name__ == '__main__':
  main()
