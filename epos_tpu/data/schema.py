"""EPOS example schema over tf.train.Example.

Feature names match the reference exactly (epos_lib/datagen.py:384-422,
scripts/create_tfrecord.py:91-213) so record files interoperate.
"""

import cv2
import numpy as np

from epos_tpu.data import records


def encode_image(im, ext='.jpg', quality=95):
  """RGB uint8 -> encoded bytes (jpg quality 95, create_tfrecord.py:81-88)."""
  if ext == '.jpg':
    ok, buf = cv2.imencode(ext, cv2.cvtColor(im, cv2.COLOR_RGB2BGR),
                           [cv2.IMWRITE_JPEG_QUALITY, quality])
  else:
    ok, buf = cv2.imencode(ext, cv2.cvtColor(im, cv2.COLOR_RGB2BGR))
  assert ok
  return buf.tobytes()


def decode_image(data):
  """Encoded bytes -> RGB uint8."""
  arr = np.frombuffer(data, np.uint8)
  im = cv2.imdecode(arr, cv2.IMREAD_COLOR)
  return cv2.cvtColor(im, cv2.COLOR_BGR2RGB)


def encode_mask_png(mask):
  ok, buf = cv2.imencode('.png', mask.astype(np.uint8) * 255)
  assert ok
  return buf.tobytes()


def decode_mask_png(data):
  arr = np.frombuffer(data, np.uint8)
  m = cv2.imdecode(arr, cv2.IMREAD_GRAYSCALE)
  return m > 0


def make_example(scene_id, im_id, im_path, encoded_image, height, width,
                 K, gt_list):
  """Builds an Example proto.

  gt_list: list of dicts {obj_id, visib_fract, q (4,), t (3,), mask_png}.
  """
  feats = {
      'image/scene_id': records.int64_feature([scene_id]),
      'image/im_id': records.int64_feature([im_id]),
      'image/path': records.bytes_feature([im_path]),
      'image/encoded': records.bytes_feature([encoded_image]),
      'image/height': records.int64_feature([height]),
      'image/width': records.int64_feature([width]),
      'image/channels': records.int64_feature([3]),
      'image/camera/fx': records.float_feature([K[0, 0]]),
      'image/camera/fy': records.float_feature([K[1, 1]]),
      'image/camera/cx': records.float_feature([K[0, 2]]),
      'image/camera/cy': records.float_feature([K[1, 2]]),
      'image/object/id': records.int64_feature(
          [g['obj_id'] for g in gt_list]),
      'image/object/visibility': records.float_feature(
          [g['visib_fract'] for g in gt_list]),
      'image/object/mask': records.bytes_feature(
          [g['mask_png'] for g in gt_list]),
  }
  for qi in range(4):
    feats[f'image/object/pose/q{qi+1}'] = records.float_feature(
        [g['q'][qi] for g in gt_list])
  for ti in range(3):
    feats[f'image/object/pose/t{ti+1}'] = records.float_feature(
        [g['t'][ti] for g in gt_list])
  return records.encode_example(feats)


def parse_example(buf):
  """Example proto bytes -> plain dict (numpy values)."""
  raw = records.decode_example(buf)

  def get(name, default=None):
    if name not in raw:
      return default
    return raw[name][1]

  out = {
      'scene_id': int(get('image/scene_id', [np.int64(-1)])[0]),
      'im_id': int(get('image/im_id', [np.int64(-1)])[0]),
      'path': (get('image/path', [b''])[0]).decode('utf8'),
      'encoded': get('image/encoded', [b''])[0],
      'height': int(get('image/height', [np.int64(-1)])[0]),
      'width': int(get('image/width', [np.int64(-1)])[0]),
      'fx': float(get('image/camera/fx', [np.float32(-1)])[0]),
      'fy': float(get('image/camera/fy', [np.float32(-1)])[0]),
      'cx': float(get('image/camera/cx', [np.float32(-1)])[0]),
      'cy': float(get('image/camera/cy', [np.float32(-1)])[0]),
  }
  out['K'] = np.array([[out['fx'], 0, out['cx']],
                       [0, out['fy'], out['cy']],
                       [0, 0, 1]], np.float64)
  obj_ids = get('image/object/id', np.zeros(0, np.int64))
  n = len(obj_ids)
  out['gt_obj_ids'] = np.asarray(obj_ids, np.int64)
  out['gt_visib'] = np.asarray(
      get('image/object/visibility', np.zeros(n, np.float32)))
  qs = [get(f'image/object/pose/q{i+1}', np.zeros(n, np.float32))
        for i in range(4)]
  ts = [get(f'image/object/pose/t{i+1}', np.zeros(n, np.float32))
        for i in range(3)]
  out['gt_quats'] = np.stack(qs, axis=1) if n else np.zeros((0, 4), np.float32)
  out['gt_trans'] = np.stack(ts, axis=1) if n else np.zeros((0, 3), np.float32)
  out['gt_mask_pngs'] = get('image/object/mask', [])
  return out
