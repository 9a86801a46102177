#!/usr/bin/env python3
"""Benchmark: end-to-end EPOS inference throughput on one chip.

Measures the fused image -> poses path (Xception-65 f64, 21 objects,
640x480 — the reference's flagship YCB-V config) on synthetic weights/input,
and prints ONE JSON line.

Protocol: N iterations are submitted back-to-back and synchronized once —
production serving overlaps dispatch with compute the same way, and the
axon tunnel's per-call sync latency is noise, not device time.

Baseline: the reference TF1-GPU pipeline reports ~0.75 s/image end to end
(EPOS CVPR'20; BASELINE.md (b)) — vs_baseline is the speedup over that
1.33 img/s figure.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from epos_tpu import common
from epos_tpu.config import Config
from epos_tpu.models import epos_model
from epos_tpu.ops import corresp as corresp_lib
from epos_tpu.ops import ransac


def main():
  num_objs, num_frags = 21, 64
  crop_w, crop_h = 640, 480
  cfg = Config(model_variant='xception_65', num_frags=num_frags,
               infer_crop_size=[crop_w, crop_h], compute_dtype='bfloat16',
               max_corrs_per_obj=1024, max_fitting_iterations=128)

  model = epos_model.build_model(cfg, num_objs)
  rng = jax.random.PRNGKey(0)
  r = np.random.default_rng(0)
  # Distinct images per iteration: the axon runtime can elide repeated
  # executions with identical inputs, which would inflate the result.
  n_iter = 24
  images = jnp.asarray(
      r.uniform(0, 255, (n_iter, 1, crop_h, crop_w, 3)), jnp.float32)
  variables = jax.jit(lambda k, im: model.init(k, im, train=False))(
      rng, images[0])
  jax.block_until_ready(variables)

  frag_centers = jnp.asarray(
      r.uniform(-50, 50, (num_objs, num_frags, 3)), jnp.float32)
  frag_sizes = jnp.asarray(
      r.uniform(10, 40, (num_objs, num_frags)), jnp.float32)
  K = jnp.asarray(
      [[572.4, 0, 325.3], [0, 573.6, 242.0], [0, 0, 1]], jnp.float32)
  oh, ow = epos_model.output_size((crop_w, crop_h), 4)
  npx = oh * ow
  counts = jnp.ones((num_objs,), jnp.int32)

  # Three chained jits instead of one fused program: identical pipelined
  # throughput (dispatch is ~30us), but each piece compiles fast / caches
  # well through the axon tunnel.
  # NOTE: weights are jit ARGUMENTS — closure capture would embed 230MB of
  # constants into the program and blow up compile time through the tunnel.
  def _predict(v, im):
    logits, _ = epos_model.multi_scale_logits(model, v, im)
    b, h, w, _ = logits[common.PRED_OBJ_CONF].shape
    return (jax.nn.softmax(logits[common.PRED_OBJ_CONF], -1),
            jax.nn.softmax(logits[common.PRED_FRAG_CONF].reshape(
                b, h, w, num_objs, num_frags), -1),
            logits[common.PRED_FRAG_LOC].reshape(
                b, h, w, num_objs, num_frags, 3))
  predict = jax.jit(_predict)

  @jax.jit
  def extract(preds):
    obj_conf, frag_conf, frag_loc = preds
    # XLA two-stage selection (the Pallas kernel wins only at f>=128,
    # see InferenceEngine policy).
    return corresp_lib.establish_many_to_many(
        obj_conf[0], frag_conf[0], frag_loc[0], frag_centers, frag_sizes,
        output_scale=0.25, capacity=cfg.max_corrs_per_obj)

  @jax.jit
  def fit(corrs, key):
    return ransac.fit_all_objects(
        corrs, K, npx, key, counts,
        num_hypotheses=cfg.max_fitting_iterations,
        inlier_thresh=cfg.inlier_thresh, max_instances=1,
        min_quality=cfg.min_hypothesis_quality)

  def full(images, key):
    return fit(extract(predict(variables, images)), key)

  # Warmup / compile.
  jax.block_until_ready(full(images[0], rng))
  keys = [jax.random.fold_in(rng, i) for i in range(n_iter)]
  jax.block_until_ready(keys)

  t0 = time.time()
  last = None
  for i in range(n_iter):
    last = full(images[i], keys[i])
  jax.block_until_ready(last)
  dt = (time.time() - t0) / n_iter
  fps = 1.0 / dt

  baseline_fps = 1.0 / 0.75  # reference ~0.75 s/image (BASELINE.md (b))
  print(json.dumps({
      'metric': 'ycbv_e2e_frames_per_sec_640x480_xc65_f64',
      'value': round(fps, 3),
      'unit': 'img/s',
      'vs_baseline': round(fps / baseline_fps, 2),
  }))


if __name__ == '__main__':
  main()
