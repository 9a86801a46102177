import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from epos_tpu import common
from epos_tpu import config as config_epos
from epos_tpu.config import Config
from epos_tpu.data import augment, bop, records, schema
from epos_tpu.data.dataset import Dataset
from epos_tpu.data.pipeline import DataLoader
from epos_tpu.data import gt_fields
from tests import synthetic


def test_varint_roundtrip():
  buf = bytearray()
  for v in [0, 1, 127, 128, 300, 2 ** 35]:
    records._write_varint(buf, v)
  pos = 0
  for v in [0, 1, 127, 128, 300, 2 ** 35]:
    got, pos = records._read_varint(buf, pos)
    assert got == v


def test_example_proto_roundtrip():
  feats = {
      'a/int': records.int64_feature([1, -2, 3]),
      'b/float': records.float_feature([1.5, -2.25]),
      'c/bytes': records.bytes_feature([b'hello', b'world']),
  }
  buf = records.encode_example(feats)
  out = records.decode_example(buf)
  kind, vals = out['a/int']
  assert kind == 'int64'
  np.testing.assert_array_equal(vals, [1, -2, 3])
  kind, vals = out['b/float']
  np.testing.assert_allclose(vals, [1.5, -2.25])
  kind, vals = out['c/bytes']
  assert vals == [b'hello', b'world']


def test_tfrecord_file_roundtrip(tmp_path):
  path = str(tmp_path / 'x.tfrecord')
  recs = [b'abc', b'x' * 1000, b'']
  with records.RecordWriter(path) as w:
    for r in recs:
      w.write(r)
  got = list(records.read_records(path, verify_crc=True))
  assert got == recs


def test_crc32c_known_value():
  # RFC 3720 test vector: crc32c of 32 zero bytes = 0x8A9136AA.
  assert records.crc32c(b'\x00' * 32) == 0x8A9136AA


def test_schema_roundtrip():
  im = (np.random.default_rng(0).uniform(0, 255, (32, 40, 3))
        ).astype(np.uint8)
  K = np.array([[100.0, 0, 20], [0, 100.0, 16], [0, 0, 1]])
  mask = np.zeros((32, 40), bool)
  mask[4:10, 5:12] = True
  gt = [{'obj_id': 3, 'visib_fract': 0.8,
         'q': np.array([1.0, 0, 0, 0]), 't': np.array([1.0, 2.0, 500.0]),
         'mask_png': schema.encode_mask_png(mask)}]
  buf = schema.make_example(7, 42, '/x/y.png',
                            schema.encode_image(im, '.png'), 32, 40, K, gt)
  ex = schema.parse_example(buf)
  assert ex['scene_id'] == 7 and ex['im_id'] == 42
  assert ex['path'] == '/x/y.png'
  np.testing.assert_allclose(ex['K'], K)
  dec = schema.decode_image(ex['encoded'])
  np.testing.assert_array_equal(dec, im)  # png lossless
  assert ex['gt_obj_ids'].tolist() == [3]
  np.testing.assert_allclose(ex['gt_quats'][0], [1, 0, 0, 0])
  got_mask = schema.decode_mask_png(ex['gt_mask_pngs'][0])
  np.testing.assert_array_equal(got_mask, mask)


@pytest.fixture(scope='module')
def synth_bop(tmp_path_factory):
  """Synthetic BOP dataset + records, shared across tests."""
  root = str(tmp_path_factory.mktemp('bop'))
  synthetic.make_bop_dataset(root, 'synthbox', num_scenes=1, ims_per_scene=3)
  # Point the config paths at the temp dirs.
  old_bop, old_data = config_epos.BOP_PATH, config_epos.TF_DATA_PATH
  config_epos.BOP_PATH = root
  config_epos.TF_DATA_PATH = os.path.join(root, 'tf_data')
  os.makedirs(config_epos.TF_DATA_PATH, exist_ok=True)

  # Write records (create_tfrecord path).
  sp = bop.get_split_params(root, 'synthbox', 'test')
  from epos_tpu.ops import geometry
  rec_path = os.path.join(config_epos.TF_DATA_PATH,
                          'synthbox_test.tfrecord')
  with records.RecordWriter(rec_path) as w:
    for scene_id in [1]:
      cam = bop.load_scene_camera(
          sp['scene_camera_tpath'].format(scene_id=scene_id))
      gts = bop.load_scene_gt(sp['scene_gt_tpath'].format(scene_id=scene_id))
      infos = bop.load_json(
          sp['scene_gt_info_tpath'].format(scene_id=scene_id),
          keys_to_int=True)
      for im_id in sorted(gts):
        rgb_path = sp['rgb_tpath'].format(scene_id=scene_id, im_id=im_id)
        import cv2
        im = cv2.cvtColor(cv2.imread(rgb_path), cv2.COLOR_BGR2RGB)
        gt_list = []
        for gt_id, gt in enumerate(gts[im_id]):
          mask_path = sp['mask_visib_tpath'].format(
              scene_id=scene_id, im_id=im_id, gt_id=gt_id)
          mask = cv2.imread(mask_path, cv2.IMREAD_GRAYSCALE) > 0
          gt_list.append({
              'obj_id': gt['obj_id'],
              'visib_fract': infos[im_id][gt_id]['visib_fract'],
              'q': geometry.quaternion_from_matrix(gt['cam_R_m2c']),
              't': gt['cam_t_m2c'].flatten(),
              'mask_png': schema.encode_mask_png(mask)})
        w.write(schema.make_example(
            scene_id, im_id, rgb_path, schema.encode_image(im, '.png'),
            im.shape[0], im.shape[1], cam[im_id]['cam_K'], gt_list))
  yield root
  config_epos.BOP_PATH, config_epos.TF_DATA_PATH = old_bop, old_data


def make_dataset(synth_bop, tmp=None, **kw):
  cfg = Config(num_frags=8, gt_knn_frags=1, max_gt_instances=4)
  defaults = dict(
      dataset_name='synthbox', tfrecord_names=['synthbox_test'],
      model_dir=tmp, batch_size=2, max_height_before_crop=120,
      crop_size=(160, 120), is_training=True, return_gt_orig=True,
      return_gt_maps=True, output_stride=4)
  defaults.update(kw)
  return cfg, Dataset(cfg, **defaults)


def test_dataset_loader_end_to_end(synth_bop, tmp_path):
  cfg, ds = make_dataset(synth_bop, str(tmp_path / 'model'))
  loader = DataLoader(ds, batch_size=2, shuffle=False, repeat=False,
                      num_workers=2)
  batches = list(loader)
  assert sum(b[common.IMAGE].shape[0] for b in batches) == 3
  b = batches[0]
  assert b[common.IMAGE].shape == (2, 120, 160, 3)
  assert b[common.K].shape == (2, 3, 3)
  oh, ow = 30, 40
  assert b[common.GT_OBJ_LABEL].shape == (2, oh, ow)
  assert b[common.GT_FRAG_LABEL].shape == (2, oh, ow, 1)
  assert b[common.GT_FRAG_LOC].shape == (2, oh, ow, 1, 3)
  assert b[common.GT_OBJ_MASKS].shape == (2, 4, oh, ow)
  assert b[common.GT_NUM].max() <= 4
  # Labels: background 0 plus object ids 1..2.
  labels = set(np.unique(b[common.GT_OBJ_LABEL]))
  assert labels <= {0, 1, 2}
  assert len(labels) > 1


def test_dataset_gt_oracle(synth_bop, tmp_path):
  """Reprojection oracle over the full record->parse->GT-field path."""
  cfg, ds = make_dataset(synth_bop, str(tmp_path / 'model'))
  rec = next(iter(records.read_records(ds.record_files()[0])))
  sample = ds.parse_and_preprocess(rec, np.random.default_rng(0))
  n = int(sample[common.GT_NUM])
  assert n >= 1
  oK = sample[common.K].copy()
  oK[:2] /= 4  # output-stride K
  err = gt_fields.check_gt_frag_reprojection(
      sample[common.GT_FRAG_LABEL], sample[common.GT_FRAG_LOC], None, oK,
      sample[common.GT_OBJ_IDS][:n], sample[common.GT_OBJ_QUATS][:n],
      sample[common.GT_OBJ_TRANS][:n],
      {i: c for i, c in zip(ds.model_store.dp_model['obj_ids'],
                            [ds.model_store.frag_centers[o]
                             for o in ds.model_store.dp_model['obj_ids']])},
      {i: s for i, s in zip(ds.model_store.dp_model['obj_ids'],
                            [ds.model_store.frag_sizes[o]
                             for o in ds.model_store.dp_model['obj_ids']])},
      sample[common.GT_OBJ_MASKS][:n])
  assert err < 1.0, f'mean reprojection err {err}px'


def test_fragments_cache(synth_bop, tmp_path):
  model_dir = str(tmp_path / 'model')
  cfg, ds1 = make_dataset(synth_bop, model_dir)
  assert os.path.exists(os.path.join(model_dir, 'fragments.pkl'))
  # Second construction loads the cache (and validates shape).
  cfg, ds2 = make_dataset(synth_bop, model_dir)
  for o in ds1.model_store.frag_centers:
    np.testing.assert_allclose(ds1.model_store.frag_centers[o],
                               ds2.model_store.frag_centers[o])


def test_augmentations_shapes_and_range():
  rng = jax.random.PRNGKey(0)
  im = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (2, 16, 16, 3)),
                   jnp.float32)
  cfgs = {
      'random_adjust_brightness': {'min_delta': -0.2, 'max_delta': 0.2},
      'random_adjust_contrast': {'min_delta': -0.3, 'max_delta': 0.3},
      'random_adjust_saturation': {'min_delta': -0.3, 'max_delta': 0.3},
      'random_adjust_hue': {'max_delta': 0.05},
      'random_blur': {'max_sigma': 2.0},
      'random_gaussian_noise': {'max_sigma': 0.05},
  }
  out = augment.augment_batch(rng, im * 255.0, cfgs)
  assert out.shape == im.shape
  assert float(out.min()) >= 0 and float(out.max()) <= 255.0
  # Changed the image.
  assert not np.allclose(np.asarray(out), np.asarray(im * 255))
  # Jit + determinism.
  f = jax.jit(lambda r, x: augment.augment_batch(r, x, cfgs))
  o1 = f(rng, im * 255)
  o2 = f(rng, im * 255)
  np.testing.assert_allclose(np.asarray(o1), np.asarray(o2))


def test_hue_roundtrip():
  im = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (8, 8, 3)),
                   jnp.float32)
  hsv = augment._rgb_to_hsv(im)
  back = augment._hsv_to_rgb(hsv)
  np.testing.assert_allclose(np.asarray(back), np.asarray(im), atol=1e-5)


def test_blur_zero_sigma_identity():
  im = jnp.asarray(np.random.default_rng(2).uniform(0, 1, (8, 8, 3)),
                   jnp.float32)
  k = augment._gaussian_kernel(jnp.asarray(0.0))
  np.testing.assert_allclose(np.asarray(k[4]), 1.0)
  assert float(jnp.sum(k)) == pytest.approx(1.0)


def test_gt_cache_matches_uncached(synth_bop, tmp_path):
  """With gt_cache_dir set, sliced cached GT fields must match the uncached
  path when the crop offset is stride-aligned (here: zero offset, since the
  synthetic images equal the crop size)."""
  cfg1, ds1 = make_dataset(synth_bop, str(tmp_path / 'm1'))
  cfg2, ds2 = make_dataset(synth_bop, str(tmp_path / 'm2'))
  cfg2.gt_cache_dir = str(tmp_path / 'cache')
  rec = next(iter(records.read_records(ds1.record_files()[0])))
  s1 = ds1.parse_and_preprocess(rec, np.random.default_rng(0))
  s2 = ds2.parse_and_preprocess(rec, np.random.default_rng(0))
  np.testing.assert_array_equal(s1[common.GT_OBJ_LABEL],
                                s2[common.GT_OBJ_LABEL])
  np.testing.assert_array_equal(s1[common.GT_FRAG_LABEL],
                                s2[common.GT_FRAG_LABEL])
  np.testing.assert_allclose(s1[common.GT_FRAG_LOC], s2[common.GT_FRAG_LOC],
                             atol=1e-6)
  np.testing.assert_array_equal(s1[common.GT_OBJ_MASKS],
                                s2[common.GT_OBJ_MASKS])
  # Cache file created; second parse hits it and gives identical results.
  import glob as globlib
  assert globlib.glob(str(tmp_path / 'cache' / '*.npz'))
  s3 = ds2.parse_and_preprocess(rec, np.random.default_rng(0))
  np.testing.assert_array_equal(s2[common.GT_FRAG_LABEL],
                                s3[common.GT_FRAG_LABEL])


def test_gt_cache_skips_renders(synth_bop, tmp_path, monkeypatch):
  """Cache hits must not rasterize: count render_object calls instead of
  wall time (the old timing assertion was flaky on a loaded 1-core host)."""
  from epos_tpu.data import renderer as renderer_lib
  calls = {'n': 0}
  orig = renderer_lib.Renderer.render_object

  def counting(self, *a, **kw):
    calls['n'] += 1
    return orig(self, *a, **kw)

  monkeypatch.setattr(renderer_lib.Renderer, 'render_object', counting)
  cfg, ds = make_dataset(synth_bop, str(tmp_path / 'm'))
  cfg.gt_cache_dir = str(tmp_path / 'cache2')
  rec = next(iter(records.read_records(ds.record_files()[0])))
  ds.parse_and_preprocess(rec, np.random.default_rng(0))
  cold_calls = calls['n']
  assert cold_calls > 0  # The cold parse rendered the GT fields.
  calls['n'] = 0
  for _ in range(3):
    ds.parse_and_preprocess(rec, np.random.default_rng(0))
  assert calls['n'] == 0, 'cache hits must not call the rasterizer'


def test_jpeg_artifacts_real_dct_quantization():
  """jpeg_artifacts reproduces real JPEG behavior (augment.py:158-173):
  quality-monotone distortion, 8x8 block structure, and agreement with
  cv2's actual JPEG codec at matched quality."""
  import cv2
  import jax
  import jax.numpy as jnp
  r = np.random.default_rng(5)
  im = (r.uniform(0, 1, (64, 96, 3)).astype(np.float32) * 0.5
        + np.linspace(0, 0.5, 96)[None, :, None].astype(np.float32))
  key = jax.random.PRNGKey(0)

  out_hi = np.asarray(augment.jpeg_artifacts(key, jnp.asarray(im), 95))
  out_lo = np.asarray(augment.jpeg_artifacts(key, jnp.asarray(im), 10))
  assert out_hi.shape == im.shape
  assert out_hi.min() >= 0.0 and out_hi.max() <= 1.0
  err_hi = np.abs(out_hi - im).mean()
  err_lo = np.abs(out_lo - im).mean()
  assert 0 < err_hi < err_lo, (err_hi, err_lo)

  # Agreement with the real codec: our q~U[10,100] draw is deterministic
  # given the key; recover it and encode with cv2 at the same quality.
  q = float(jax.random.uniform(key, (), minval=10.0, maxval=100.0))
  enc = cv2.imencode('.jpg', (im * 255).astype(np.uint8)[..., ::-1],
                     [cv2.IMWRITE_JPEG_QUALITY, int(round(q))])[1]
  ref = cv2.imdecode(enc, cv2.IMREAD_COLOR)[..., ::-1].astype(np.float32)
  ref /= 255.0
  # Our simulation must be much closer to the real JPEG output than the
  # worst-case distortion budget (it shares the quant tables + subsampling).
  sim_err = np.abs(out_lo - ref).mean()
  assert sim_err < 2.0 * np.abs(ref - im).mean() + 0.01, (
      sim_err, np.abs(ref - im).mean())

  # Blockiness signature: discontinuities concentrate at 8px boundaries.
  dcol = np.abs(np.diff(out_lo, axis=1)).mean(axis=(0, 2))
  at_edges = dcol[7::8].mean()
  elsewhere = np.delete(dcol, np.s_[7::8]).mean()
  assert at_edges > elsewhere, (at_edges, elsewhere)


def test_crc32c_known_vectors():
  """CRC-32C (Castagnoli) test vectors (RFC 3720 appendix B.4)."""
  assert records.crc32c(b'') == 0x00000000
  assert records.crc32c(b'123456789') == 0xE3069283
  assert records.crc32c(bytes(32)) == 0x8A9136AA
  # Fallback path agrees with the C extension on random data.
  import epos_tpu.data.records as rec_mod
  if rec_mod._gcrc is not None:
    r = np.random.default_rng(0)
    data = r.integers(0, 256, 1000, dtype=np.uint8).tobytes()
    fast = rec_mod.crc32c(data)
    saved = rec_mod._gcrc
    try:
      rec_mod._gcrc = None
      slow = rec_mod.crc32c(data)
    finally:
      rec_mod._gcrc = saved
    assert fast == slow


def test_index_based_global_shuffle(tmp_path):
  """The loader's record iterator is a full per-epoch permutation (not a
  small shuffle buffer): every record appears exactly once per epoch and
  epoch orders differ."""
  from epos_tpu.data.pipeline import DataLoader
  path = str(tmp_path / 'r.tfrecord')
  with records.RecordWriter(path) as w:
    for i in range(50):
      w.write(f'rec{i:03d}'.encode())
  offs = records.read_record_index(path)
  assert len(offs) == 50
  with open(path, 'rb') as f:
    assert records.read_record_at(f, offs[7]) == b'rec007'

  loader = DataLoader.__new__(DataLoader)
  loader.files = [path]
  loader.shuffle = True
  loader.repeat = True
  loader.seed = 3
  loader.shard_index = 0
  loader.num_shards = 1
  loader.start_sample = 0
  it = loader._record_iter()
  ep1 = [next(it) for _ in range(50)]
  ep2 = [next(it) for _ in range(50)]
  assert sorted(ep1) == sorted(set(ep1)) and len(set(ep1)) == 50
  assert sorted(ep2) == sorted(ep1)
  assert ep1 != ep2


def test_gt_cache_distinguishes_same_ids_different_gt(synth_bop, tmp_path):
  """Regression: two records with identical (scene_id, im_id) but different
  GT (e.g. train vs test splits reusing ids) must not collide in the GT
  cache."""
  cfg, ds = make_dataset(synth_bop, str(tmp_path / 'm'))
  cfg.gt_cache_dir = str(tmp_path / 'cache3')
  rec = next(iter(records.read_records(ds.record_files()[0])))
  ex = schema.parse_example(rec)
  s1 = ds.parse_and_preprocess(rec, np.random.default_rng(0))

  # Same ids, GT translations shifted -> a different scene.
  gt2 = []
  for i in range(len(ex['gt_obj_ids'])):
    gt2.append({'obj_id': int(ex['gt_obj_ids'][i]),
                'visib_fract': float(ex['gt_visib'][i]),
                'q': ex['gt_quats'][i],
                't': ex['gt_trans'][i] + np.array([25.0, 0.0, 0.0]),
                'mask_png': ex['gt_mask_pngs'][i]})
  rec2 = schema.make_example(
      ex['scene_id'], ex['im_id'], ex['path'], ex['encoded'],
      ex['height'], ex['width'], ex['K'], gt2)
  s2 = ds.parse_and_preprocess(rec2, np.random.default_rng(0))
  t1 = s1[common.GT_OBJ_TRANS][:int(s1[common.GT_NUM])]
  t2 = s2[common.GT_OBJ_TRANS][:int(s2[common.GT_NUM])]
  assert not np.allclose(t1, t2), 'cache served stale GT for shifted scene'
  np.testing.assert_allclose(t2 - t1, np.broadcast_to([25.0, 0, 0], t1.shape),
                             atol=1e-4)


def test_detection_split_variable_counts(tmp_path):
  """instance_count_range draws per-object per-image counts in [lo, hi]:
  some images must have ABSENT objects (count 0) — the DETECTION-mode
  phantom-pose regime — and no image may exceed hi instances per object."""
  import collections
  import json
  import os
  from tests import synthetic
  synthetic.make_bop_dataset(
      str(tmp_path), 'synthbox', num_scenes=1, ims_per_scene=12,
      instances_per_obj=2, instance_count_range=(0, 2))
  gt_path = os.path.join(str(tmp_path), 'synthbox', 'test', '000001',
                         'scene_gt.json')
  gts = json.load(open(gt_path))
  assert len(gts) == 12
  saw_absent = False
  counts_seen = set()
  for im_id, gt_list in gts.items():
    per_obj = collections.Counter(g['obj_id'] for g in gt_list)
    for obj_id in (1, 2):
      c = per_obj.get(obj_id, 0)
      counts_seen.add(c)
      assert 0 <= c <= 2
      if c == 0:
        saw_absent = True
  assert saw_absent, 'expected at least one absent object over 12 images'
  assert len(counts_seen) > 1, 'counts must actually vary'


class _ByteDataset:
  """Stub dataset: parse returns the raw record bytes as a sample."""

  def parse_and_preprocess(self, rec, rng):
    return {'v': np.frombuffer(rec, np.uint8).copy()}

  def record_files(self):
    raise AssertionError('files= must be passed explicitly')


def _sample_stream(loader, n_batches):
  out = []
  it = iter(loader)
  for _ in range(n_batches):
    out.extend(bytes(v) for v in next(it)['v'])
  return out


def test_loader_resume_continues_stream(tmp_path):
  """A chunked (checkpoint-restart) run must consume the SAME sample
  sequence as one uninterrupted run — the restart continues the epoch
  permutation stream instead of replaying the first chunk
  (reference epos_lib/datagen.py:674-705: shuffle state advances for the
  whole session)."""
  path = str(tmp_path / 'r.tfrecord')
  with records.RecordWriter(path) as w:
    for i in range(10):
      w.write(b'rec%03d' % i)

  def make(start_sample):
    return DataLoader(_ByteDataset(), batch_size=2, shuffle=True,
                      repeat=True, num_workers=1, files=[path],
                      start_sample=start_sample)

  full = _sample_stream(make(0), 12)          # 24 samples = 2.4 epochs
  # Restart mid-epoch (8 samples consumed) and across an epoch boundary
  # (15 samples consumed -> one whole epoch skipped + 5 within the next).
  assert full[8:] == _sample_stream(make(8), 8)
  chunk3 = _sample_stream(make(15), 4)
  assert full[15:23] == chunk3
  # Distinct epochs use distinct permutations (regression guard: the
  # resumed stream is not just a replay of epoch 0).
  assert full[:10] != full[10:20]
  # Every epoch covers all 10 records.
  assert sorted(full[:10]) == sorted(full[10:20])
