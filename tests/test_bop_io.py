import json
import numpy as np

from epos_tpu.data import bop


def test_ply_roundtrip_ascii(tmp_path):
  pts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], dtype=float)
  faces = np.array([[0, 1, 2], [0, 2, 3]])
  colors = np.array([[255, 0, 0]] * 4)
  p = tmp_path / 'm.ply'
  bop.save_ply(str(p), pts, colors=colors, faces=faces)
  m = bop.load_ply(str(p))
  np.testing.assert_allclose(m['pts'], pts, atol=1e-5)
  np.testing.assert_array_equal(m['faces'], faces)
  np.testing.assert_allclose(m['colors'], colors)


def test_ply_binary(tmp_path):
  # Write a binary little-endian PLY by hand and read it back.
  pts = np.array([[1.5, -2.0, 3.25], [0.0, 1.0, 2.0]], np.float32)
  faces = np.array([[0, 1, 0]], np.int32)
  p = tmp_path / 'b.ply'
  with open(p, 'wb') as f:
    hdr = ('ply\nformat binary_little_endian 1.0\n'
           'element vertex 2\nproperty float x\nproperty float y\n'
           'property float z\nelement face 1\n'
           'property list uchar int vertex_indices\nend_header\n')
    f.write(hdr.encode())
    f.write(pts.tobytes())
    f.write(bytes([3]) + faces.tobytes())
  m = bop.load_ply(str(p))
  np.testing.assert_allclose(m['pts'], pts, atol=1e-6)
  np.testing.assert_array_equal(m['faces'], faces)


def test_scene_camera_and_gt(tmp_path):
  cam = {'0': {'cam_K': [500, 0, 320, 0, 500, 240, 0, 0, 1],
               'depth_scale': 0.1}}
  p = tmp_path / 'scene_camera.json'
  p.write_text(json.dumps(cam))
  loaded = bop.load_scene_camera(str(p))
  assert 0 in loaded
  assert loaded[0]['cam_K'].shape == (3, 3)
  assert loaded[0]['cam_K'][0, 2] == 320

  gt = {'3': [{'obj_id': 5,
               'cam_R_m2c': list(np.eye(3).flatten()),
               'cam_t_m2c': [1, 2, 3]}]}
  p2 = tmp_path / 'scene_gt.json'
  p2.write_text(json.dumps(gt))
  loaded = bop.load_scene_gt(str(p2))
  assert loaded[3][0]['obj_id'] == 5
  assert loaded[3][0]['cam_R_m2c'].shape == (3, 3)
  assert loaded[3][0]['cam_t_m2c'].shape == (3, 1)


def test_bop_results_roundtrip(tmp_path):
  results = [{'scene_id': 1, 'im_id': 2, 'obj_id': 3, 'score': 0.9,
              'R': np.eye(3), 't': np.array([[1.0], [2.0], [3.0]]),
              'time': 0.5}]
  p = tmp_path / 'est.csv'
  bop.save_bop_results(str(p), results)
  loaded = bop.load_bop_results(str(p))
  assert len(loaded) == 1
  np.testing.assert_allclose(loaded[0]['R'], np.eye(3))
  np.testing.assert_allclose(loaded[0]['t'].flatten(), [1, 2, 3])
  assert loaded[0]['score'] == 0.9


def test_dataset_params():
  mp = bop.get_model_params('/data', 'ycbv')
  assert len(mp['obj_ids']) == 21
  assert mp['model_tpath'].format(obj_id=3).endswith('obj_000003.ply')
  mp = bop.get_model_params('/data', 'tless', model_type='reconst')
  assert 'models_reconst' in mp['model_tpath']
  assert len(mp['obj_ids']) == 30
  sp = bop.get_split_params('/data', 'ycbv', 'test')
  assert sp['rgb_tpath'].format(scene_id=48, im_id=1).endswith(
      '000048/rgb/000001.png')
