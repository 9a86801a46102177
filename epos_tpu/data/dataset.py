"""Dataset: model store, fragmentation cache, example parsing/preprocessing.

Host-side counterpart of epos_lib/datagen.py re-designed for a TPU feed:
parsing produces FIXED-SHAPE numpy samples (GT annotation lists padded to
`max_gt_instances`, SURVEY.md §7 "hard parts") that batch directly onto the
device without retracing. The thread-safe renderer removes the reference's
single-reader constraint (datagen.py:680-683).
"""

import glob
import os
import pickle

import numpy as np

from epos_tpu import common
from epos_tpu import config as config_epos
from epos_tpu.data import bop, gt_fields, renderer as renderer_lib, schema
from epos_tpu.ops import fragment as fragment_lib
from epos_tpu.utils import misc


class ObjectModelStore:
  """3D models, fragmentation and projection helpers
  (epos_lib/datagen.py:24-154)."""

  def __init__(self, dataset_name, model_type, num_frags, models=None,
               frag_centers=None, frag_sizes=None,
               prepare_for_projection=False):
    self.dataset_name = dataset_name
    self.model_type = model_type
    self.num_frags = num_frags
    self.models = models
    self.frag_centers = frag_centers
    self.frag_sizes = frag_sizes
    self.prepare_for_projection = prepare_for_projection
    self.dp_model = bop.get_model_params(
        bop.datasets_path(), dataset_name, model_type=model_type)

  @property
  def num_objs(self):
    return len(self.models) if self.models else len(self.dp_model['obj_ids'])

  def load_models(self):
    self.models = {}
    for obj_id in self.dp_model['obj_ids']:
      path = self.dp_model['model_tpath'].format(obj_id=obj_id)
      self.models[obj_id] = bop.load_ply(path)

  def fragment_models(self):
    """FPS fragmentation + bbox sizes (datagen.py:88-128)."""
    if self.models is None:
      self.load_models()
    self.frag_centers, self.frag_sizes = {}, {}
    for obj_id in self.dp_model['obj_ids']:
      pts = self.models[obj_id]['pts']
      if self.num_frags == 1:
        centers = np.zeros((1, 3))
        ids = np.zeros(len(pts), np.int64)
      else:
        centers, ids = fragment_lib.fragmentation_fps(pts, self.num_frags)
      self.frag_centers[obj_id] = centers
      self.frag_sizes[obj_id] = fragment_lib.fragment_sizes(
          pts, ids, self.num_frags)

  def frag_arrays(self, num_objs=None):
    """Dense [num_objs, F, 3] / [num_objs, F] arrays for device kernels.

    Channel o corresponds to obj_id o+1 (LM-O/HBS style ID mapping where
    channels cover the full parent-dataset range — datagen.py:308-317).
    """
    if num_objs is None:
      num_objs = self.num_objs
    F = self.num_frags
    centers = np.zeros((num_objs, F, 3), np.float32)
    sizes = np.ones((num_objs, F), np.float32)
    for obj_id, c in (self.frag_centers or {}).items():
      if 1 <= obj_id <= num_objs:
        centers[obj_id - 1] = c
        sizes[obj_id - 1] = self.frag_sizes[obj_id]
    return centers, sizes

  def vertex_arrays(self, num_objs=None, max_verts=4096):
    """Zero-padded [num_objs, Vmax, 3] vertex array + counts for the
    on-device --project_to_surface path (subsampled beyond max_verts —
    nearest-vertex projection on the dense eval models)."""
    if self.models is None:
      self.load_models()
    if num_objs is None:
      num_objs = self.num_objs
    vmax = 1
    pts_per_obj = {}
    for obj_id, m in self.models.items():
      pts = m['pts']
      if len(pts) > max_verts:
        pts = pts[:: len(pts) // max_verts][:max_verts]
      pts_per_obj[obj_id] = pts
      vmax = max(vmax, len(pts))
    verts = np.zeros((num_objs, vmax, 3), np.float32)
    counts = np.zeros((num_objs,), np.int32)
    for obj_id, pts in pts_per_obj.items():
      if 1 <= obj_id <= num_objs:
        verts[obj_id - 1, :len(pts)] = pts
        counts[obj_id - 1] = len(pts)
    return verts, counts

  def project_pts_to_model(self, pts, obj_id):
    """Closest-point projection onto the model point cloud.

    The reference uses an igl AABB tree over the triangle mesh
    (datagen.py:131-154); nearest-vertex is an adequate approximation for
    the optional --project_to_surface path (off by default) given the dense
    BOP models.
    """
    V = self.models[obj_id]['pts']
    out = np.empty_like(pts)
    chunk = max(1, int(2e7) // max(len(V), 1))
    for s in range(0, len(pts), chunk):
      d2 = ((pts[s:s + chunk, None] - V[None]) ** 2).sum(-1)
      out[s:s + chunk] = V[np.argmin(d2, axis=1)]
    return out


# Model-type policy per dataset (datagen.py:239-252).
def frag_model_type(dataset_name):
  return {'tless': 'reconst', 'itodd': 'dense', 'tudl': 'eval'}.get(
      dataset_name)


def num_objs_for_dataset(dataset_name, model_store):
  # LM-O/HBS predict channels for the full parent set (datagen.py:308-317).
  if dataset_name == 'lmo':
    return 15
  if dataset_name == 'hbs':
    return 33
  return model_store.num_objs


class Dataset:
  """Input dataset with fragmentation cache and GT generation
  (epos_lib/datagen.py:157-343)."""

  def __init__(self, cfg, dataset_name, tfrecord_names, model_dir,
               batch_size, max_height_before_crop, crop_size,
               is_training, return_gt_orig, return_gt_maps,
               output_stride=4, renderer=None):
    self.cfg = cfg
    self.dataset_name = dataset_name
    self.tfrecord_names = tfrecord_names or []
    self.model_dir = model_dir
    self.batch_size = batch_size
    self.max_height_before_crop = max_height_before_crop
    self.crop_size = tuple(crop_size)  # (w, h)
    self.is_training = is_training
    self.return_gt_orig = return_gt_orig
    self.return_gt_maps = return_gt_maps
    self.output_stride = output_stride
    self.ignore_obj_label = common.IGNORE_OBJ_LABEL

    # Fragmentation cache (datagen.py:255-296) — same fragments.pkl format.
    frag_path = os.path.join(model_dir, 'fragments.pkl') if model_dir else None
    if frag_path and os.path.exists(frag_path):
      with open(frag_path, 'rb') as f:
        fragments = pickle.load(f)
      frag_centers = fragments['frag_centers']
      frag_sizes = fragments['frag_sizes']
      for obj_id in frag_centers:
        if (frag_centers[obj_id].shape[0] != cfg.num_frags or
            frag_sizes[obj_id].shape[0] != cfg.num_frags):
          raise ValueError('The loaded fragmentation is not valid.')
    else:
      store_frag = ObjectModelStore(
          dataset_name, frag_model_type(dataset_name), cfg.num_frags)
      store_frag.fragment_models()
      frag_centers = store_frag.frag_centers
      frag_sizes = store_frag.frag_sizes
      if frag_path:
        os.makedirs(model_dir, exist_ok=True)
        with open(frag_path, 'wb') as f:
          pickle.dump({'frag_centers': frag_centers,
                       'frag_sizes': frag_sizes}, f,
                      protocol=pickle.HIGHEST_PROTOCOL)

    # Models for rendering: decimated 'eval' type (datagen.py:252).
    self.model_store = ObjectModelStore(
        dataset_name, 'eval', cfg.num_frags,
        frag_centers=frag_centers, frag_sizes=frag_sizes,
        prepare_for_projection=cfg.corr_project_to_model)
    self.model_store.load_models()
    self.num_objs = num_objs_for_dataset(dataset_name, self.model_store)

    # Renderer at output-stride resolution (datagen.py:321-333).
    self.renderer = renderer
    if (return_gt_orig or return_gt_maps) and renderer is None:
      w, h = self.crop_size
      self.renderer = renderer_lib.Renderer()
      self.renderer.init(w // output_stride, h // output_stride)
      for obj_id in self.model_store.dp_model['obj_ids']:
        self.renderer.add_object(obj_id, self.model_store.models[obj_id])

    self.frag_field_generator = None
    if return_gt_maps:
      self.frag_field_generator = gt_fields.FragmentFieldGenerator(
          frag_centers=frag_centers, frag_sizes=frag_sizes,
          renderer=self.renderer, knn_frags=cfg.gt_knn_frags)

    # Full-image renderers/generators for the GT cache, created lazily per
    # (width, height) since datasets can mix image sizes.
    self._full_renderers = {}

  def _full_generator(self, ow, oh):
    key = (ow, oh)
    if key not in self._full_renderers:
      r = renderer_lib.Renderer()
      r.init(ow, oh)
      for obj_id in self.model_store.dp_model['obj_ids']:
        r.add_object(obj_id, self.model_store.models[obj_id])
      gen = gt_fields.FragmentFieldGenerator(
          frag_centers=self.model_store.frag_centers,
          frag_sizes=self.model_store.frag_sizes,
          renderer=r, knn_frags=self.cfg.gt_knn_frags)
      self._full_renderers[key] = (r, gen)
    return self._full_renderers[key]

  # --- file listing (datagen.py:707-723) ---
  def record_files(self):
    files = []
    for name in self.tfrecord_names:
      pattern = os.path.join(config_epos.TF_DATA_PATH, f'{name}.tfrecord')
      files += sorted(glob.glob(pattern))
    if not files:
      raise ValueError('No input files.')
    return files

  # --- example parsing (datagen.py:424-672) ---
  def parse_and_preprocess(self, example_bytes, rng):
    ex = schema.parse_example(example_bytes)
    im = schema.decode_image(ex['encoded']).astype(np.float32)
    im_h_orig, im_w_orig = ex['height'], ex['width']
    if im_h_orig <= 0:
      im_h_orig, im_w_orig = im.shape[0], im.shape[1]

    # Resize to the maximum height before cropping (datagen.py:440-446).
    im_h_new = min(self.max_height_before_crop, im_h_orig)
    im_scale = im_h_new / im_h_orig
    im_w_new = int(im_w_orig * im_scale)
    crop_w, crop_h = self.crop_size

    max_off_h = im_h_new - crop_h
    max_off_w = im_w_new - crop_w
    off_h = int(rng.integers(0, max_off_h + 1)) if max_off_h > 0 else 0
    off_w = int(rng.integers(0, max_off_w + 1)) if max_off_w > 0 else 0
    use_cache = bool(self.cfg.gt_cache_dir) and (
        self.return_gt_orig or self.return_gt_maps)
    if use_cache:
      # Cached GT fields live on the uncropped stride grid; quantizing the
      # crop offsets to the output stride lets the per-step crop become a
      # pure slice of the cache (documented deviation from the reference's
      # arbitrary-offset crops, datagen.py:452-459).
      off_h = (off_h // self.output_stride) * self.output_stride
      off_w = (off_w // self.output_stride) * self.output_stride

    if (im_h_new, im_w_new) != (im.shape[0], im.shape[1]):
      im = misc.resize_image_py(im, (im_w_new, im_h_new))
    im = misc.crop_image(im, off_h, off_w, crop_h, crop_w)

    K = misc.adjust_K_for_resize_crop(ex['K'], im_scale, off_w, off_h)
    sample = {
        common.SCENE_ID: np.int32(ex['scene_id']),
        common.IM_ID: np.int32(ex['im_id']),
        common.IMAGE_PATH: ex['path'],
        common.IMAGE: im.astype(np.float32),
        common.K: K.astype(np.float32),
    }

    oh = crop_h // self.output_stride
    ow = crop_w // self.output_stride
    output_K = misc.adjust_K_for_resize_crop(
        ex['K'], im_scale, off_w, off_h, self.output_stride)

    if not (self.return_gt_orig or self.return_gt_maps):
      return sample

    if use_cache:
      bundle = self._gt_full_bundle(ex, im_scale, im_h_new, im_w_new)
      oy = off_h // self.output_stride
      ox = off_w // self.output_stride
      sl = (slice(oy, oy + oh), slice(ox, ox + ow))
      obj_ids = bundle['obj_ids']
      out_masks = bundle['masks'][:, sl[0], sl[1]]
      if self.return_gt_orig:
        M = self.cfg.max_gt_instances
        n = min(len(obj_ids), M)
        sample[common.GT_NUM] = np.int32(n)
        sample[common.GT_OBJ_IDS] = _pad(obj_ids[:n].astype(np.int32), (M,))
        sample[common.GT_OBJ_VISIB_FRACT] = _pad(
            bundle['visib'][:n].astype(np.float32), (M,))
        sample[common.GT_OBJ_QUATS] = _pad(
            bundle['quats'][:n].astype(np.float32), (M, 4))
        sample[common.GT_OBJ_TRANS] = _pad(
            bundle['trans'][:n].astype(np.float32), (M, 3))
        sample[common.GT_OBJ_MASKS] = _pad(out_masks[:n], (M, oh, ow))
      if self.return_gt_maps:
        label = bundle['label'][sl].copy()
        if self.dataset_name == 'tless' and \
              'tless/train_primesense' in sample[common.IMAGE_PATH]:
          label[label == 0] = self.ignore_obj_label
        sample[common.GT_OBJ_LABEL] = label.astype(np.int32)
        sample[common.GT_FRAG_LABEL] = bundle['frag_ids'][sl]
        sample[common.GT_FRAG_LOC] = bundle['frag_coords'][sl]
        sample[common.GT_FRAG_WEIGHT] = bundle['frag_weights'][sl]
      return sample

    # Decode + filter GT annotations (datagen.py:495-570).
    obj_ids = ex['gt_obj_ids']
    visib = ex['gt_visib']
    quats = ex['gt_quats']
    trans = ex['gt_trans']
    masks_orig = [schema.decode_mask_png(m) for m in ex['gt_mask_pngs']]

    keep = [i for i, o in enumerate(obj_ids)
            if o in self.model_store.dp_model['obj_ids']]
    if self.cfg.min_visib_fract is not None:
      keep = [i for i in keep if visib[i] >= self.cfg.min_visib_fract]
    obj_ids = obj_ids[keep]
    visib = visib[keep]
    quats = quats[keep]
    trans = trans[keep]
    masks_orig = [masks_orig[i] for i in keep]

    # Resize masks: orig -> scaled -> crop -> output stride (nearest).
    import cv2
    out_masks = np.zeros((len(keep), oh, ow), bool)
    for i, m in enumerate(masks_orig):
      m = m.astype(np.uint8)
      m = cv2.resize(m, (im_w_new, im_h_new), interpolation=cv2.INTER_NEAREST)
      m = misc.crop_image(m, off_h, off_w, crop_h, crop_w)
      m = cv2.resize(m, (ow, oh), interpolation=cv2.INTER_NEAREST)
      out_masks[i] = m > 0

    # Exclusive masks (datagen_utils.py:49-98).
    out_masks = gt_fields.make_masks_exclusive(
        out_masks, obj_ids, quats, trans, output_K, self.renderer)

    if self.return_gt_orig:
      M = self.cfg.max_gt_instances
      n = min(len(obj_ids), M)
      sample[common.GT_NUM] = np.int32(n)
      sample[common.GT_OBJ_IDS] = _pad(obj_ids[:n].astype(np.int32), (M,))
      sample[common.GT_OBJ_VISIB_FRACT] = _pad(
          visib[:n].astype(np.float32), (M,))
      sample[common.GT_OBJ_QUATS] = _pad(
          quats[:n].astype(np.float32), (M, 4))
      sample[common.GT_OBJ_TRANS] = _pad(
          trans[:n].astype(np.float32), (M, 3))
      sample[common.GT_OBJ_MASKS] = _pad(out_masks[:n], (M, oh, ow))

    if self.return_gt_maps:
      label = gt_fields.construct_seg_mask(out_masks, obj_ids, oh, ow)
      # T-LESS real-image background -> ignore (datagen.py:604-611).
      if self.dataset_name == 'tless' and \
            'tless/train_primesense' in sample[common.IMAGE_PATH]:
        label[label == 0] = self.ignore_obj_label
      sample[common.GT_OBJ_LABEL] = label.astype(np.int32)
      ids, coords, weights = \
          self.frag_field_generator.construct_frag_fields(
              ow, oh, output_K, obj_ids, quats, trans, out_masks)
      sample[common.GT_FRAG_LABEL] = ids
      sample[common.GT_FRAG_LOC] = coords
      sample[common.GT_FRAG_WEIGHT] = weights

    return sample

  def _gt_full_bundle(self, ex, im_scale, im_h_new, im_w_new):
    """GT fields for the FULL (uncropped) resized image, disk-cached.

    Rendering GT per training step is the reference's dominant input cost
    (it also forces its reader to a single thread, datagen.py:680-683);
    fragment fields depend only on pose+geometry, not the crop, so one
    full-image render per example serves every epoch.
    """
    stride = self.output_stride
    ohf = im_h_new // stride
    owf = im_w_new // stride
    cache_path = None
    if self.cfg.gt_cache_dir:
      os.makedirs(self.cfg.gt_cache_dir, exist_ok=True)
      # The key carries a hash of the GT annotations: (scene_id, im_id)
      # alone collide across splits reusing ids (e.g. a train and a test
      # example both named scene 1 / im 0 — BOP pbr vs test layouts do
      # this), which would silently serve one split's GT to the other.
      import hashlib
      gt_sig = hashlib.md5(
          np.ascontiguousarray(np.asarray(ex['gt_quats'])).tobytes() +
          np.ascontiguousarray(np.asarray(ex['gt_trans'])).tobytes() +
          np.ascontiguousarray(np.asarray(ex['gt_obj_ids'])).tobytes() +
          np.ascontiguousarray(
              np.asarray(ex['K'], np.float64)).tobytes()
      ).hexdigest()[:12]
      cache_path = os.path.join(
          self.cfg.gt_cache_dir,
          f'{self.dataset_name}_{ex["scene_id"]:06d}_{ex["im_id"]:06d}_'
          f'h{im_h_new}_s{stride}_f{self.cfg.num_frags}_'
          f'k{self.cfg.gt_knn_frags}_{gt_sig}.npz')
      if os.path.exists(cache_path):
        with np.load(cache_path) as z:
          return {k: z[k] for k in z.files}

    import cv2
    obj_ids = ex['gt_obj_ids']
    visib = ex['gt_visib']
    quats = ex['gt_quats']
    trans = ex['gt_trans']
    masks_orig = [schema.decode_mask_png(m) for m in ex['gt_mask_pngs']]
    keep = [i for i, o in enumerate(obj_ids)
            if o in self.model_store.dp_model['obj_ids']]
    if self.cfg.min_visib_fract is not None:
      keep = [i for i in keep if visib[i] >= self.cfg.min_visib_fract]
    obj_ids = obj_ids[keep]
    visib = visib[keep]
    quats = quats[keep]
    trans = trans[keep]
    masks = np.zeros((len(keep), ohf, owf), bool)
    for i, idx in enumerate(keep):
      m = masks_orig[idx].astype(np.uint8)
      m = cv2.resize(m, (owf, ohf), interpolation=cv2.INTER_NEAREST)
      masks[i] = m > 0

    K_full = misc.adjust_K_for_resize_crop(ex['K'], im_scale, 0, 0, stride)
    renderer, gen = self._full_generator(owf, ohf)
    masks = gt_fields.make_masks_exclusive(
        masks, obj_ids, quats, trans, K_full, renderer)
    label = gt_fields.construct_seg_mask(masks, obj_ids, ohf, owf)
    frag_ids, frag_coords, frag_weights = gen.construct_frag_fields(
        owf, ohf, K_full, obj_ids, quats, trans, masks)
    bundle = {
        'obj_ids': obj_ids.astype(np.int32),
        'visib': visib.astype(np.float32),
        'quats': quats.astype(np.float32),
        'trans': trans.astype(np.float32),
        'masks': masks,
        'label': label.astype(np.int32),
        'frag_ids': frag_ids,
        'frag_coords': frag_coords,
        'frag_weights': frag_weights,
    }
    if cache_path:
      import threading
      tmp = f'{cache_path}.{os.getpid()}.{threading.get_ident()}.tmp.npz'
      np.savez_compressed(tmp, **bundle)
      os.replace(tmp, cache_path)  # Atomic: concurrent workers race safely.
    return bundle


def _pad(arr, shape):
  out = np.zeros(shape, arr.dtype)
  sl = tuple(slice(0, min(a, b)) for a, b in zip(arr.shape, shape))
  out[sl] = arr[sl]
  return out
