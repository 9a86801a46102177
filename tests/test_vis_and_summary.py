import os

import numpy as np

from epos_tpu.data import records
from epos_tpu.utils import summary, vis


def test_colormap_and_label_colorize():
  cmap = vis.ade20k_colormap()
  assert cmap.shape == (256, 3)
  assert (cmap[0] == 0).all()
  # Distinct colors for small labels.
  assert not (cmap[1] == cmap[2]).all()
  lm = np.array([[0, 1], [2, 1]])
  out = vis.colorize_label_map(lm)
  assert out.shape == (2, 2, 3)
  assert (out[0, 0] == 0).all()
  assert (out[0, 1] == out[1, 1]).all()


def test_grid():
  tiles = [np.full((8, 8, 3), i, np.uint8) for i in range(5)]
  g = vis.build_grid(tiles)
  assert g.shape == (16, 24, 3)  # 2 rows x 3 cols
  assert g[0, 0, 0] == 0 and g[0, 9, 0] == 1


def test_pose_overlay_and_frame():
  from tests import synthetic
  s = synthetic.simple_scene()
  im = np.zeros((120, 160, 3), np.uint8)
  out = vis.render_pose_overlay(im, s['renderer'], s['obj_id'], s['K'],
                                s['R'], s['t'])
  assert out.shape == im.shape
  assert out.max() > 0  # silhouette rendered
  framed = vis.draw_frame(out, s['K'], s['R'], s['t'], length=30)
  assert framed.shape == im.shape


def test_frag_field_vis():
  from tests import synthetic
  from epos_tpu.data import gt_fields
  s = synthetic.simple_scene()
  fc, fs = synthetic.fragmented_store(s['mesh'], 8, s['obj_id'])
  gen = gt_fields.FragmentFieldGenerator(fc, fs, s['renderer'])
  K = s['K']
  s['renderer'].render_object(s['obj_id'], s['R'].flatten(), s['t'],
                              K[0, 0], K[1, 1], K[0, 2], K[1, 2])
  mask = s['renderer'].get_depth_image(s['obj_id']) > 0
  ids, coords, w = gen.construct_frag_fields(
      160, 120, K, [s['obj_id']], [s['q']], [s['t']], [mask])
  label = np.where(mask, s['obj_id'], 0)
  lv, xv = vis.visualize_frag_fields(ids, coords, label, fc, fs, 8)
  assert lv.shape == (120, 160, 3) and xv.shape == (120, 160, 3)
  assert lv[mask].max() > 0 and (lv[~mask] == 0).all()


def test_summary_writer_event_format(tmp_path):
  d = str(tmp_path / 'tb')
  w = summary.SummaryWriter(d)
  w.scalars(5, {'loss': 1.5, 'lr': 1e-4})
  w.scalars(10, {'loss': 1.0})
  w.close()
  event_files = [f for f in os.listdir(d) if f.startswith('events.out')]
  assert len(event_files) == 1
  # Parse back the TFRecord-framed events (verify CRC for TB compat).
  recs = list(records.read_records(os.path.join(d, event_files[0]),
                                   verify_crc=True))
  assert len(recs) == 3  # file_version + 2 scalar events
  assert b'brain.Event:2' in recs[0]
  assert b'loss' in recs[1]
  # JSONL mirror.
  import json
  lines = [json.loads(x) for x in
           open(os.path.join(d, 'metrics.jsonl'))]
  assert lines[0] == {'step': 5, 'loss': 1.5, 'lr': 1e-4}
