"""Fused on-device inference engine: CNN -> correspondences -> poses.

The reference pipeline round-trips to host between stages (sess.run ->
numpy corresp -> C++ RANSAC; scripts/infer.py:348-554). Here the entire
per-image estimation — forward pass, correspondence extraction, and
multi-instance RANSAC over every object — is ONE jitted function: a single
dispatch, no host synchronization until the final pose tensors are read.

Stage timings mirror the reference's run_times dict (prediction /
establish_corr / fitting / total, infer.py:369-374): in fused mode the
breakdown is attributed to 'total' only; with time_stages=True the three
stages run as separate jitted calls for comparable per-stage numbers.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from epos_tpu import common
from epos_tpu.models import epos_model
from epos_tpu.ops import corresp as corresp_lib
from epos_tpu.ops import ransac


def production_fit_kwargs(cfg, max_instances, ow, task_type=None):
  """The pose-fitting kwargs the production engine runs with.

  Shared with bench/ablation paths so timed and ablated behavior equals
  shipped behavior (the spatial-coherence ICM term in particular is active
  exactly when the engine would run it: grid_w > 0 and PEARL enabled).
  """
  task_type = cfg.task_type if task_type is None else task_type
  return dict(
      num_hypotheses=cfg.max_fitting_iterations,
      inlier_thresh=cfg.inlier_thresh,
      max_instances=max_instances,
      min_quality=cfg.min_hypothesis_quality,
      use_prosac=cfg.use_prosac,
      min_triangle_area=cfg.min_triangle_area,
      neighbour_px=cfg.neighbour_max_dist,
      min_inlier_mass=cfg.min_inlier_mass,
      # PEARL re-optimization (reference scripts/infer.py:101-111): the
      # per-object instance-count gate vs max_model_number_for_pearl is
      # dynamic inside fit_instances; statically off only when at most
      # one instance can ever be fitted (or PEARL is disabled).
      pearl_iters=(2 if (max_instances > 1
                         and cfg.max_model_number_for_pearl > 1) else 0),
      pearl_max_models=cfg.max_model_number_for_pearl,
      spatial_weight=cfg.spatial_coherence_weight,
      grid_w=ow,
      refine_anneal=cfg.refine_anneal,
      refine_iters=cfg.refine_iters,
      depth_debias=cfg.depth_debias,
      # LOCALIZATION's instance counts are exact (GT annotation list,
      # reference infer.py:462-466): the fitter searches to the count
      # with absolute floors only and ranking happens at the BOP19
      # top-n cap; DETECTION keeps the relative in-loop gate.
      exact_counts=task_type == common.LOCALIZATION)


class InferenceEngine:
  """Builds and runs the jitted image -> poses path."""

  def __init__(self, cfg, model, variables, model_store, num_objs,
               crop_size=None, time_stages=False, use_pallas=None):
    self.cfg = cfg
    self.model = model
    self.variables = variables
    self.num_objs = num_objs
    self.time_stages = time_stages
    if use_pallas is None:
      # Measured policy (v5e): XLA's fused softmax+top-k wins at f64
      # (11ms vs 18ms), while the Pallas kernel wins at f256 (26ms vs
      # 64ms) by never materializing the [h,w,O,F] softmax tensor (412MB).
      # Visualization runs need the dense prediction dict -> unfused.
      use_pallas = (jax.devices()[0].platform == 'tpu' and not cfg.vis
                    and cfg.num_frags >= 128)
    self.use_pallas = use_pallas
    crop_w, crop_h = crop_size or cfg.infer_crop_size
    stride = (min(cfg.decoder_output_stride)
              if cfg.decoder_output_stride else cfg.encoder_output_stride)
    self.output_scale = 1.0 / stride
    oh, ow = epos_model.output_size((crop_w, crop_h), stride)
    self.npx = oh * ow
    centers, sizes = model_store.frag_arrays(num_objs)
    self.frag_centers = jnp.asarray(centers)
    self.frag_sizes = jnp.asarray(sizes)
    # --project_to_surface: snap predicted 3D points to the model surface
    # (nearest vertex) on device (reference corresp.py:87-88).
    self._proj_verts = self._proj_counts = None
    if cfg.project_to_surface:
      verts, counts = model_store.vertex_arrays(num_objs)
      self._proj_verts = jnp.asarray(verts)
      self._proj_counts = jnp.asarray(counts)
    self.max_instances = max(1, cfg.max_instances_to_fit or
                             cfg.max_gt_instances)

    cfg_f = dict(
        capacity=cfg.max_corrs_per_obj
        if cfg.max_correspondences is None
        else min(cfg.max_corrs_per_obj, cfg.max_correspondences),
        min_obj_conf=cfg.corr_min_obj_conf,
        min_frag_rel_conf=cfg.corr_min_frag_rel_conf,
        approx_topk=cfg.corresp_approx_topk)
    # Engine-level: a per-call task_type override does not rebuild the
    # jits (exact_counts is compiled in, see _check_task_type).
    fit_kw = production_fit_kwargs(cfg, self.max_instances, ow)

    def predict_fn(variables, images):
      # Weights as arguments: closure capture embeds them as program
      # constants, inflating compile time/cache size drastically.
      if not self.use_pallas:
        return epos_model.predict(
            self.model, variables, images,
            image_pyramid=cfg.image_pyramid, merge_method=cfg.merge_method)
      # Fused path: keep fragment logits RAW for the Pallas kernel.
      logits, _ = epos_model.multi_scale_logits(
          self.model, variables, images, image_pyramid=cfg.image_pyramid,
          merge_method=cfg.merge_method, train=False)
      b, h, w, _ = logits[common.PRED_OBJ_CONF].shape
      obj_conf = jax.nn.softmax(logits[common.PRED_OBJ_CONF], axis=-1)
      # Object-agnostic heads predict one class; broadcast to the object
      # axis (lazy view) so the correspondence kernels see a uniform shape
      # (reference reshape semantics, model.py:117-147).
      n_cls = 1 if cfg.frag_cls_agnostic else num_objs
      n_cls_loc = 1 if cfg.frag_loc_agnostic else num_objs
      frag_logits = jnp.broadcast_to(
          logits[common.PRED_FRAG_CONF].reshape(
              b, h, w, n_cls, cfg.num_frags),
          (b, h, w, num_objs, cfg.num_frags))
      frag_loc = jnp.broadcast_to(
          logits[common.PRED_FRAG_LOC].reshape(
              b, h, w, n_cls_loc, cfg.num_frags, 3),
          (b, h, w, num_objs, cfg.num_frags, 3))
      return {
          common.PRED_OBJ_CONF: obj_conf,
          common.PRED_OBJ_LABEL: jnp.argmax(obj_conf, axis=-1),
          'frag_logits': frag_logits,
          common.PRED_FRAG_LOC: frag_loc,
      }

    def corresp_single(pred1, obj_enable):
      """Correspondence extraction on UNBATCHED prediction arrays — the
      unit that both the single-image path and the vmapped batch path
      share."""
      if self.use_pallas:
        corrs = corresp_lib.establish_many_to_many_fused(
            pred1[common.PRED_OBJ_CONF], pred1['frag_logits'],
            pred1[common.PRED_FRAG_LOC], self.frag_centers,
            self.frag_sizes, self.output_scale,
            obj_mask_enable=obj_enable, **cfg_f)
      else:
        fc = pred1[common.PRED_FRAG_CONF]
        fl = pred1[common.PRED_FRAG_LOC]
        h, w = fc.shape[:2]
        # Agnostic heads -> broadcast the single class over objects.
        fc = jnp.broadcast_to(fc, (h, w, num_objs, cfg.num_frags))
        fl = jnp.broadcast_to(fl, (h, w, num_objs, cfg.num_frags, 3))
        corrs = corresp_lib.establish_many_to_many(
            pred1[common.PRED_OBJ_CONF], fc, fl, self.frag_centers,
            self.frag_sizes, self.output_scale,
            obj_mask_enable=obj_enable, **cfg_f)
      if self._proj_verts is not None:
        corrs = corresp_lib.project_to_model_vertices(
            corrs, self._proj_verts, self._proj_counts)
      return corrs

    def corresp_fn(preds, obj_enable):
      return corresp_single(
          jax.tree_util.tree_map(lambda x: x[0], preds), obj_enable)

    def fit_fn(corrs, K, instance_counts, rng):
      return ransac.fit_all_objects(
          corrs, K, self.npx, rng, instance_counts, **fit_kw)

    def full(variables, images, K, obj_enable, instance_counts, rng):
      preds = predict_fn(variables, images)
      corrs = corresp_fn(preds, obj_enable)
      fits = fit_fn(corrs, K, instance_counts, rng)
      return preds, corrs, fits

    self._jit_predict = jax.jit(predict_fn)
    self._jit_corresp = jax.jit(corresp_fn)
    self._jit_fit = jax.jit(fit_fn)
    self._jit_full = jax.jit(full)

    def full_batch(variables, images, Ks, obj_enables, instance_counts,
                   rngs):
      """Batched variant: one CNN forward over the whole batch, then
      extraction + fitting VMAPPED over the batch axis (BASELINE config
      #3: batched multi-image inference). vmap lets XLA overlap the
      per-image stages instead of adding their latencies — the round-2
      Python unroll ran batched-8 at only 1.12x the single-image rate."""
      preds = predict_fn(variables, images)

      def per_image(pred1, K, enable, counts, rng):
        corrs = corresp_single(pred1, enable)
        return fit_fn(corrs, K, counts, rng)

      return jax.vmap(per_image)(preds, Ks, obj_enables, instance_counts,
                                 rngs)

    self._jit_full_batch = jax.jit(full_batch, static_argnames=())

  def _check_task_type(self, task_type):
    """The fitter's acceptance gating (exact_counts) is baked into the
    jitted programs from cfg.task_type at engine build; running the other
    mode through them would pair DETECTION's all-objects counts with
    LOCALIZATION's ungated acceptance (phantom poses) or vice versa.
    Build a second engine for the other mode instead."""
    task_type = task_type or self.cfg.task_type
    if task_type != self.cfg.task_type:
      raise ValueError(
          f'engine was built for task_type={self.cfg.task_type!r}; '
          f'cannot run {task_type!r} (exact_counts gating is compiled in)')
    return task_type

  def process_image(self, sample, task_type=None, rng=None):
    """Estimates poses for one sample (batch of 1).

    Returns (poses list of dicts, run_times dict) — the reference's
    process_image contract (infer.py:348-554).
    """
    cfg = self.cfg
    task_type = self._check_task_type(task_type)
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    run_times = {}

    images = jnp.asarray(sample[common.IMAGE])
    if images.ndim == 3:
      images = images[None]
    K = jnp.asarray(sample[common.K], jnp.float32)
    if K.ndim == 3:
      K = K[0]

    # Which objects / how many instances (infer.py:462-466).
    if task_type == common.LOCALIZATION:
      n = int(np.asarray(sample[common.GT_NUM]).reshape(-1)[0])
      gt_ids = np.asarray(sample[common.GT_OBJ_IDS]).reshape(-1)[:n]
      counts = np.zeros(self.num_objs, np.int32)
      for oid in gt_ids:
        if 1 <= oid <= self.num_objs:
          counts[oid - 1] += 1
      obj_enable = counts > 0
    else:
      counts = np.full(self.num_objs, self.max_instances, np.int32)
      obj_enable = np.ones(self.num_objs, bool)
    if cfg.max_instances_to_fit is not None:
      counts = np.minimum(counts, cfg.max_instances_to_fit)

    counts_j = jnp.asarray(counts)
    enable_j = jnp.asarray(obj_enable)

    use_opencv = cfg.fitting_method == common.OPENCV_RANSAC
    if self.time_stages or use_opencv:
      t0 = time.time()
      preds = jax.block_until_ready(
          self._jit_predict(self.variables, images))
      run_times['prediction'] = time.time() - t0
      t0 = time.time()
      corrs = jax.block_until_ready(self._jit_corresp(preds, enable_j))
      run_times['establish_corr'] = time.time() - t0
      fits = None
      run_times['fitting'] = 0.0
      if not use_opencv:
        t0 = time.time()
        fits = jax.block_until_ready(self._jit_fit(corrs, K, counts_j, rng))
        run_times['fitting'] = time.time() - t0
      run_times['total'] = sum(run_times.values())
    else:
      t0 = time.time()
      preds, corrs, fits = jax.block_until_ready(
          self._jit_full(self.variables, images, K, enable_j, counts_j,
                         rng))
      run_times['prediction'] = 0.0
      run_times['establish_corr'] = 0.0
      run_times['fitting'] = 0.0
      run_times['total'] = time.time() - t0

    scene_id = int(np.asarray(sample[common.SCENE_ID]).reshape(-1)[0])
    im_id = int(np.asarray(sample[common.IM_ID]).reshape(-1)[0])

    poses = []
    if use_opencv:
      # Host fallback for exact-parity experiments (infer.py:505-528):
      # cv2.solvePnPRansac EPNP, single instance per object.
      t0 = time.time()
      poses = self._fit_opencv(corrs, np.asarray(K), obj_enable, scene_id,
                               im_id)
      run_times['fitting'] = time.time() - t0
      run_times['total'] += run_times['fitting']
      for p in poses:
        p['time'] = run_times['total']
      return poses, run_times, (preds, corrs, None)

    valid = np.asarray(fits.valid)
    R_all = np.asarray(fits.R)
    t_all = np.asarray(fits.t)
    q_all = np.asarray(fits.quality)
    for o in range(self.num_objs):
      for i in range(self.max_instances):
        if valid[o, i]:
          poses.append({
              'scene_id': scene_id, 'im_id': im_id, 'obj_id': o + 1,
              'R': R_all[o, i], 't': t_all[o, i].reshape(3, 1),
              'score': float(q_all[o, i]),
              'time': run_times['total'],
          })
    return poses, run_times, (preds, corrs, fits)

  def process_batch(self, batch, task_type=None, rng=None):
    """Estimates poses for a fixed-shape batch of samples in one dispatch.

    batch: dict with IMAGE [B,H,W,3], K [B,3,3], SCENE_ID/IM_ID [B], and for
    LOCALIZATION the padded GT id lists. Returns (poses, run_times).

    Note: this call synchronizes once per batch. On hosts with high
    device-sync latency, pipelining process_image calls (async dispatch,
    sync once at the end) can outperform batching; prefer this API when
    running on directly-attached TPUs.
    """
    cfg = self.cfg
    task_type = self._check_task_type(task_type)
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    images = jnp.asarray(batch[common.IMAGE])
    B = images.shape[0]
    Ks = jnp.asarray(batch[common.K], jnp.float32)

    counts = np.zeros((B, self.num_objs), np.int32)
    if task_type == common.LOCALIZATION:
      nums = np.asarray(batch[common.GT_NUM]).reshape(B)
      ids = np.asarray(batch[common.GT_OBJ_IDS]).reshape(B, -1)
      for b in range(B):
        for oid in ids[b][:nums[b]]:
          if 1 <= oid <= self.num_objs:
            counts[b, oid - 1] += 1
      enables = counts > 0
    else:
      counts[:] = self.max_instances
      enables = np.ones((B, self.num_objs), bool)
    if cfg.max_instances_to_fit is not None:
      counts = np.minimum(counts, cfg.max_instances_to_fit)

    rngs = jax.random.split(rng, B)
    t0 = time.time()
    fits = jax.block_until_ready(self._jit_full_batch(
        self.variables, images, Ks, jnp.asarray(enables),
        jnp.asarray(counts), rngs))
    total = time.time() - t0
    run_times = {'prediction': 0.0, 'establish_corr': 0.0, 'fitting': 0.0,
                 'total': total, 'per_image': total / B}

    scene_ids = np.asarray(batch[common.SCENE_ID]).reshape(B)
    im_ids = np.asarray(batch[common.IM_ID]).reshape(B)
    valid = np.asarray(fits.valid)
    R_all = np.asarray(fits.R)
    t_all = np.asarray(fits.t)
    q_all = np.asarray(fits.quality)
    poses = []
    for b in range(B):
      for o in range(self.num_objs):
        for i in range(self.max_instances):
          if valid[b, o, i]:
            poses.append({
                'scene_id': int(scene_ids[b]), 'im_id': int(im_ids[b]),
                'obj_id': o + 1, 'R': R_all[b, o, i],
                't': t_all[b, o, i].reshape(3, 1),
                'score': float(q_all[b, o, i]),
                'time': run_times['per_image'],
            })
    return poses, run_times

  def _fit_opencv(self, corrs, K, obj_enable, scene_id, im_id):
    """cv2.solvePnPRansac EPNP per object (reference infer.py:505-528)."""
    import cv2
    cfg = self.cfg
    poses = []
    counts = np.asarray(corrs.count)
    c2d = np.asarray(corrs.coord_2d)
    c3d = np.asarray(corrs.coord_3d)
    for o in range(self.num_objs):
      n = int(counts[o])
      if not obj_enable[o] or n < 6:  # min_required_corrs (infer.py:418)
        continue
      ok, rvec, tvec, inliers = cv2.solvePnPRansac(
          objectPoints=np.ascontiguousarray(c3d[o][:n], np.float64),
          imagePoints=np.ascontiguousarray(c2d[o][:n], np.float64),
          cameraMatrix=np.asarray(K, np.float64), distCoeffs=None,
          iterationsCount=cfg.max_fitting_iterations,
          reprojectionError=cfg.inlier_thresh,
          confidence=0.99, flags=cv2.SOLVEPNP_EPNP)
      if ok:
        poses.append({
            'scene_id': scene_id, 'im_id': im_id, 'obj_id': o + 1,
            'R': cv2.Rodrigues(rvec)[0], 't': tvec.reshape(3, 1),
            'score': 0.0,  # Undefined for this path (infer.py:527).
        })
    return poses
