"""BOP dataset I/O.

Small self-contained library covering exactly the bop_toolkit_lib surface the
reference uses (SURVEY.md §2.4): PLY load/save, scene_gt / scene_camera /
targets JSON, BOP19 results CSV, and per-dataset model/split parameters.
"""

import glob
import json
import os
import re
import struct

import numpy as np

from epos_tpu import config as config_epos


# --- JSON ---------------------------------------------------------------------

def load_json(path, keys_to_int=False):
  """Loads JSON; optionally converts top-level dict keys to int
  (bop_toolkit inout.load_json behavior for scene_* files)."""
  with open(path, 'r') as f:
    content = json.load(f)
  if keys_to_int and isinstance(content, dict):
    content = {int(k): v for k, v in content.items()}
  return content


def save_json(path, content):
  with open(path, 'w') as f:
    json.dump(content, f, indent=2, sort_keys=True, default=_json_default)


def _json_default(o):
  if isinstance(o, np.ndarray):
    return o.tolist()
  if isinstance(o, (np.integer,)):
    return int(o)
  if isinstance(o, (np.floating,)):
    return float(o)
  raise TypeError(type(o))


def load_scene_camera(path):
  """scene_camera.json -> {im_id: {'cam_K': 3x3, 'depth_scale': float, ...}}."""
  cams = load_json(path, keys_to_int=True)
  for im_id, cam in cams.items():
    if 'cam_K' in cam:
      cam['cam_K'] = np.array(cam['cam_K'], np.float64).reshape((3, 3))
    if 'cam_R_w2c' in cam:
      cam['cam_R_w2c'] = np.array(cam['cam_R_w2c'], np.float64).reshape((3, 3))
    if 'cam_t_w2c' in cam:
      cam['cam_t_w2c'] = np.array(cam['cam_t_w2c'], np.float64).reshape((3, 1))
  return cams


def load_scene_gt(path):
  """scene_gt.json -> {im_id: [{'obj_id', 'cam_R_m2c' 3x3, 'cam_t_m2c' 3x1}]}."""
  gts = load_json(path, keys_to_int=True)
  for im_id, im_gts in gts.items():
    for gt in im_gts:
      if 'cam_R_m2c' in gt:
        gt['cam_R_m2c'] = np.array(gt['cam_R_m2c'], np.float64).reshape((3, 3))
      if 'cam_t_m2c' in gt:
        gt['cam_t_m2c'] = np.array(gt['cam_t_m2c'], np.float64).reshape((3, 1))
  return gts


# --- BOP19 results CSV (reference write site: scripts/infer.py:751-760) ------

def save_bop_results(path, results):
  """Saves pose estimates in the BOP19 CSV format.

  results: list of dicts with scene_id, im_id, obj_id, score, R (3x3),
  t (3x1), time.
  """
  lines = ['scene_id,im_id,obj_id,score,R,t,time']
  for r in results:
    R = np.asarray(r['R']).flatten()
    t = np.asarray(r['t']).flatten()
    lines.append('{},{},{},{},{},{},{}'.format(
        r['scene_id'], r['im_id'], r['obj_id'], r['score'],
        ' '.join(f'{x:.8f}' for x in R),
        ' '.join(f'{x:.8f}' for x in t),
        r.get('time', -1)))
  os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
  with open(path, 'w') as f:
    f.write('\n'.join(lines) + '\n')


def load_bop_results(path):
  results = []
  with open(path, 'r') as f:
    header = f.readline()
    for line in f:
      if not line.strip():
        continue
      parts = line.strip().split(',')
      results.append({
          'scene_id': int(parts[0]),
          'im_id': int(parts[1]),
          'obj_id': int(parts[2]),
          'score': float(parts[3]),
          'R': np.array([float(x) for x in parts[4].split()]).reshape((3, 3)),
          't': np.array([float(x) for x in parts[5].split()]).reshape((3, 1)),
          'time': float(parts[6]),
      })
  return results


# --- PLY ----------------------------------------------------------------------

def load_ply(path):
  """Loads a PLY mesh -> {'pts' [n,3], optionally 'normals', 'colors',
  'faces' [m,3], 'texture_uv', ...}. ASCII and binary little/big endian.

  Covers bop_toolkit inout.load_ply (used at epos_lib/datagen.py:76).
  """
  with open(path, 'rb') as f:
    line = f.readline().decode('utf8').strip()
    if line != 'ply':
      raise ValueError('Not a PLY file: ' + path)

    fmt = None
    n_verts = n_faces = 0
    vert_props = []   # (name, dtype_char)
    face_props = []
    cur_elem = None
    texture_file = None
    while True:
      line = f.readline().decode('utf8').strip()
      if line.startswith('comment TextureFile'):
        texture_file = line.split()[-1]
      elif line.startswith('format'):
        fmt = line.split()[1]
      elif line.startswith('element vertex'):
        n_verts = int(line.split()[-1]); cur_elem = 'vertex'
      elif line.startswith('element face'):
        n_faces = int(line.split()[-1]); cur_elem = 'face'
      elif line.startswith('element'):
        cur_elem = 'other'
      elif line.startswith('property'):
        parts = line.split()
        if cur_elem == 'vertex':
          vert_props.append((parts[-1], parts[1]))
        elif cur_elem == 'face':
          face_props.append((parts[-1], parts[1:-1]))
      elif line == 'end_header':
        break

    np_types = {'float': 'f4', 'float32': 'f4', 'double': 'f8',
                'float64': 'f8', 'uchar': 'u1', 'uint8': 'u1', 'char': 'i1',
                'int8': 'i1', 'short': 'i2', 'int16': 'i2', 'ushort': 'u2',
                'uint16': 'u2', 'int': 'i4', 'int32': 'i4', 'uint': 'u4',
                'uint32': 'u4'}

    model = {}
    if fmt == 'ascii':
      vdata = np.loadtxt(f, max_rows=n_verts, dtype=np.float64, ndmin=2)
      names = [p[0] for p in vert_props]
      def col(name):
        return vdata[:, names.index(name)]
      model['pts'] = np.stack([col('x'), col('y'), col('z')], axis=1)
      if 'nx' in names:
        model['normals'] = np.stack([col('nx'), col('ny'), col('nz')], axis=1)
      if 'red' in names:
        model['colors'] = np.stack(
            [col('red'), col('green'), col('blue')], axis=1)
      if 'texture_u' in names:
        model['texture_uv'] = np.stack(
            [col('texture_u'), col('texture_v')], axis=1)
      if n_faces:
        faces = []
        for _ in range(n_faces):
          vals = f.readline().split()
          cnt = int(vals[0])
          faces.append([int(v) for v in vals[1:1 + cnt]][:3])
        model['faces'] = np.array(faces, np.int64)
    else:
      endian = '<' if 'little' in fmt else '>'
      dtype = np.dtype([(name, endian + np_types[t])
                        for name, t in vert_props])
      vdata = np.frombuffer(f.read(dtype.itemsize * n_verts),
                            dtype=dtype, count=n_verts)
      model['pts'] = np.stack(
          [vdata['x'], vdata['y'], vdata['z']], axis=1).astype(np.float64)
      names = dtype.names
      if 'nx' in names:
        model['normals'] = np.stack(
            [vdata['nx'], vdata['ny'], vdata['nz']], axis=1).astype(np.float64)
      if 'red' in names:
        model['colors'] = np.stack(
            [vdata['red'], vdata['green'], vdata['blue']],
            axis=1).astype(np.float64)
      if 'texture_u' in names:
        model['texture_uv'] = np.stack(
            [vdata['texture_u'], vdata['texture_v']], axis=1).astype(np.float64)
      if n_faces:
        # Face rows: uchar count + count * int index (+ optional uv list).
        faces = np.empty((n_faces, 3), np.int64)
        for i in range(n_faces):
          cnt = struct.unpack(endian + 'B', f.read(1))[0]
          idx = struct.unpack(endian + 'i' * cnt, f.read(4 * cnt))
          faces[i] = idx[:3]
          for prop_name, prop_spec in face_props:
            if prop_name == 'texcoord':
              tc_cnt = struct.unpack(endian + 'B', f.read(1))[0]
              f.read(4 * tc_cnt)
        model['faces'] = faces
    if texture_file is not None:
      model['texture_file'] = texture_file
    return model


def save_ply(path, pts, colors=None, normals=None, faces=None):
  """Saves an ASCII PLY (bop_toolkit inout.save_ply surface,
  used by the fragmentation visual test — epos_lib/fragment_test.py)."""
  pts = np.asarray(pts)
  header = ['ply', 'format ascii 1.0', f'element vertex {len(pts)}',
            'property float x', 'property float y', 'property float z']
  if normals is not None:
    header += ['property float nx', 'property float ny', 'property float nz']
  if colors is not None:
    header += ['property uchar red', 'property uchar green',
               'property uchar blue']
  if faces is not None:
    header += [f'element face {len(faces)}',
               'property list uchar int vertex_indices']
  header += ['end_header']
  with open(path, 'w') as f:
    f.write('\n'.join(header) + '\n')
    for i in range(len(pts)):
      row = list(pts[i])
      if normals is not None:
        row += list(normals[i])
      line = ' '.join(f'{v:.6f}' for v in row)
      if colors is not None:
        line += ' ' + ' '.join(str(int(c)) for c in colors[i])
      f.write(line + '\n')
    if faces is not None:
      for face in faces:
        f.write('3 ' + ' '.join(str(int(v)) for v in face) + '\n')


# --- Dataset parameters -------------------------------------------------------

# Object ID ranges per BOP dataset (bop_toolkit dataset_params surface).
_DATASET_OBJ_IDS = {
    'lm': list(range(1, 16)),
    'lmo': [1, 5, 6, 8, 9, 10, 11, 12],
    'tless': list(range(1, 31)),
    'tudl': [1, 2, 3],
    'ruapc': list(range(1, 15)),
    'icbin': [1, 2],
    'icmi': list(range(1, 7)),
    'itodd': list(range(1, 29)),
    'hb': list(range(1, 34)),
    'hbs': [1, 3, 4, 8, 9, 10, 12, 15, 17, 18, 19, 22, 23, 29, 32, 33],
    'ycbv': list(range(1, 22)),
}

# Image sizes per dataset split (w, h).
_DATASET_IM_SIZE = {
    'lm': (640, 480), 'lmo': (640, 480), 'tless': (720, 540),
    'tudl': (640, 480), 'icbin': (640, 480), 'itodd': (1280, 960),
    'hb': (640, 480), 'hbs': (640, 480), 'ycbv': (640, 480),
}


def get_model_params(datasets_path, dataset_name, model_type=None):
  """Model paths per dataset (bop_toolkit dataset_params.get_model_params,
  used at epos_lib/datagen.py:61-62). Unknown (custom) datasets discover
  their object IDs from the models directory."""
  models_dir = 'models' if model_type is None else f'models_{model_type}'
  base = os.path.join(datasets_path, dataset_name, models_dir)
  obj_ids = list(_DATASET_OBJ_IDS.get(dataset_name, []))
  if not obj_ids:
    found = sorted(glob.glob(os.path.join(base, 'obj_*.ply')))
    obj_ids = [int(re.search(r'obj_(\d+)\.ply$', f).group(1)) for f in found]
  return {
      'obj_ids': obj_ids,
      'model_tpath': os.path.join(base, 'obj_{obj_id:06d}.ply'),
      'models_info_path': os.path.join(base, 'models_info.json'),
  }


def get_split_params(datasets_path, dataset_name, split, split_type=None):
  """Split paths (bop_toolkit dataset_params.get_split_params, used at
  scripts/create_tfrecord.py:226-227)."""
  split_name = split if split_type is None else f'{split}_{split_type}'
  base = os.path.join(datasets_path, dataset_name, split_name)
  rgb_ext = '.png'
  if dataset_name == 'itodd':
    rgb_ext = '.tif'
  elif dataset_name == 'ycbv' and split == 'train' and split_type == 'real':
    rgb_ext = '.png'
  return {
      'name': split_name,
      'split_path': base,
      'scene_camera_tpath': os.path.join(
          base, '{scene_id:06d}', 'scene_camera.json'),
      'scene_gt_tpath': os.path.join(base, '{scene_id:06d}', 'scene_gt.json'),
      'scene_gt_info_tpath': os.path.join(
          base, '{scene_id:06d}', 'scene_gt_info.json'),
      'rgb_tpath': os.path.join(
          base, '{scene_id:06d}', 'rgb', '{im_id:06d}' + rgb_ext),
      'mask_visib_tpath': os.path.join(
          base, '{scene_id:06d}', 'mask_visib', '{im_id:06d}_{gt_id:06d}.png'),
      'depth_tpath': os.path.join(
          base, '{scene_id:06d}', 'depth', '{im_id:06d}.png'),
      'im_size': _DATASET_IM_SIZE.get(dataset_name, (640, 480)),
  }


def load_depth(path, depth_scale=1.0):
  """BOP depth image (uint16 PNG) -> float32 mm (bop_toolkit inout.load_depth
  semantics: raw * depth_scale). Returns None if the file is absent."""
  if not os.path.exists(path):
    return None
  import cv2
  raw = cv2.imread(path, cv2.IMREAD_UNCHANGED)
  if raw is None:
    return None
  return raw.astype(np.float32) * float(depth_scale)


def get_present_scene_ids(dp_split):
  """Scene IDs present in a split directory (bop_toolkit
  dataset_params.get_present_scene_ids, scripts/create_example_list.py:85)."""
  dirs = sorted(glob.glob(os.path.join(dp_split['split_path'], '*')))
  return [int(os.path.basename(d)) for d in dirs
          if os.path.isdir(d) and re.fullmatch(r'\d+', os.path.basename(d))]


def datasets_path():
  return config_epos.BOP_PATH
