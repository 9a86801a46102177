#!/usr/bin/env python3
"""Stage-level profile of the flagship inference path (VERDICT r2 #5).

Times prediction / extraction / fitting separately (pipelined over distinct
inputs, one sync per stage batch — the axon tunnel's per-call latency is
not device time), plus ablations inside the fit stage, to locate the MFU
headroom. Prints one JSON line.

Usage: python scripts/profile_infer.py [--n 24] [--num_frags 64]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from epos_tpu import common
from epos_tpu import inference as inference_lib
from epos_tpu.config import Config
from epos_tpu.models import epos_model
from epos_tpu.ops import corresp as corresp_lib
from epos_tpu.ops import ransac


def timed(fn, inputs):
  """Mean seconds per call: pipeline all calls, sync once. Warms up on
  inputs[0] and times only inputs[1:]: the axon runtime can ELIDE a
  repeated identical execution (CLAUDE.md hazard 1), so the warmed input
  must not re-enter the timed loop."""
  jax.block_until_ready(fn(*inputs[0]))
  t0 = time.time()
  out = None
  for args in inputs[1:]:
    out = fn(*args)
  jax.block_until_ready(out)
  return (time.time() - t0) / (len(inputs) - 1)


def main(args=None):
  p = argparse.ArgumentParser()
  p.add_argument('--n', type=int, default=24)
  p.add_argument('--num_frags', type=int, default=64)
  p.add_argument('--num_objs', type=int, default=21)
  # A/B the selection path: route the extraction top-Ks through
  # lax.approx_max_k (config.corresp_approx_topk rationale).
  p.add_argument('--approx_topk', action='store_true')
  ns = p.parse_args(args)

  num_objs, num_frags = ns.num_objs, ns.num_frags
  crop_w, crop_h = 640, 480
  cfg = Config(model_variant='xception_65', num_frags=num_frags,
               infer_crop_size=[crop_w, crop_h], compute_dtype='bfloat16')
  model = epos_model.build_model(cfg, num_objs)
  rng = jax.random.PRNGKey(0)
  r = np.random.default_rng(0)
  images = [jnp.asarray(r.uniform(0, 255, (1, crop_h, crop_w, 3)),
                        jnp.float32) for _ in range(ns.n)]
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

  @jax.jit
  def backbone_only(v, im):
    logits, _ = epos_model.multi_scale_logits(model, v, im)
    return logits[common.PRED_OBJ_CONF]

  @jax.jit
  def predict(v, im):
    logits, _ = epos_model.multi_scale_logits(model, v, im)
    b, h, w, _ = logits[common.PRED_OBJ_CONF].shape
    return (jax.nn.softmax(logits[common.PRED_OBJ_CONF], -1),
            jax.nn.softmax(logits[common.PRED_FRAG_CONF].reshape(
                b, h, w, num_objs, num_frags), -1),
            logits[common.PRED_FRAG_LOC].reshape(
                b, h, w, num_objs, num_frags, 3))

  @jax.jit
  def extract(preds):
    obj, fc, fl = preds
    return corresp_lib.establish_many_to_many(
        obj[0], fc[0], fl[0], frag_centers, frag_sizes,
        output_scale=0.25, capacity=cfg.max_corrs_per_obj,
        approx_topk=ns.approx_topk)

  def make_fit(refine_iters=None, num_hypotheses=None):
    # Production fit configuration (engine parity, VERDICT r3 #8) with
    # targeted single-knob ablations on top to locate the fit-stage cost.
    kw = inference_lib.production_fit_kwargs(
        cfg, 1, ow, task_type=common.LOCALIZATION)
    if refine_iters is not None:
      kw['refine_iters'] = refine_iters
    if num_hypotheses is not None:
      kw['num_hypotheses'] = num_hypotheses

    @jax.jit
    def fit(corrs, key):
      return ransac.fit_all_objects(corrs, K, npx, key, counts, **kw)
    return fit

  preds = [predict(variables, im) for im in images]
  jax.block_until_ready(preds)
  corrs = [extract(p) for p in preds]
  jax.block_until_ready(corrs)
  keys = [jax.random.fold_in(rng, i) for i in range(ns.n)]

  out = {
      'n': ns.n, 'num_frags': num_frags, 'num_objs': num_objs,
      'approx_topk': ns.approx_topk,
      'backbone_ms': round(1000 * timed(
          backbone_only, [(variables, im) for im in images]), 2),
      'predict_ms': round(1000 * timed(
          predict, [(variables, im) for im in images]), 2),
      'extract_ms': round(1000 * timed(
          extract, [(p,) for p in preds]), 2),
      'fit_ms': round(1000 * timed(
          make_fit(), list(zip(corrs, keys))), 2),
      'fit_norefine_ms': round(1000 * timed(
          make_fit(refine_iters=0), list(zip(corrs, keys))), 2),
      'fit_h100_ms': round(1000 * timed(
          make_fit(num_hypotheses=100), list(zip(corrs, keys))), 2),
  }
  ca = predict.lower(variables, images[0]).compile().cost_analysis()
  if isinstance(ca, (list, tuple)):
    ca = ca[0]
  out['predict_gflops'] = round(float(ca.get('flops', 0)) / 1e9, 1)
  print(json.dumps(out))
  return out


if __name__ == '__main__':
  main()
