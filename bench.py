#!/usr/bin/env python3
"""Benchmark: EPOS end-to-end performance on one chip, at FLAGSHIP settings.

Measures, on synthetic weights/input (Xception-65 f64, 21 objects, 640x480 —
the reference's flagship YCB-V config):
  1. LOCALIZATION inference img/s at the reference defaults
     (max_fitting_iterations=400, max_corrs_per_obj=2048) + MFU from XLA
     cost-analysis FLOPs.
  2. DETECTION-mode inference with multi-instance fitting (counts > 1).
  3. Training-step time (batch 1, 640x480, full losses) + MFU
     (BASELINE.md config #5).

Prints ONE JSON line; the primary metric is the flagship LOCALIZATION img/s.

Stall-proof protocol (VERDICT r4 weak #1): every section (flagship, f256,
train, tracked) runs in its OWN subprocess under a wall-clock budget, and the
orchestrator prints the MERGED JSON line after every section completes — a
mid-run axon stall costs one section's numbers, never the whole artifact
(the last parseable line always carries everything measured so far).

Protocol: N iterations are submitted back-to-back with DISTINCT inputs and
synchronized once — production serving overlaps dispatch with compute the
same way; the axon tunnel's per-call sync latency is noise, not device time,
and identical-input executions can be elided by the runtime.

Baseline: the reference TF1-GPU pipeline reports ~0.75 s/image end to end
(EPOS CVPR'20; BASELINE.md (b)) — vs_baseline is the speedup over that
1.33 img/s figure.
"""

import json
import os
import subprocess
import sys
import time

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
from epos_tpu.train import trainer

# Peak dense matmul throughput per chip, by device kind.
_PEAK_FLOPS = {
    'TPU v5 lite': 197e12,   # v5e, bf16
    'TPU v5': 459e12,        # v5p, bf16
    'TPU v4': 275e12,
    'TPU v6 lite': 918e12,   # v6e (Trillium)
}


def _peak_flops():
  kind = getattr(jax.devices()[0], 'device_kind', '')
  for k, v in _PEAK_FLOPS.items():
    if kind.startswith(k):
      return v
  return 197e12  # default to v5e


def _flops(compiled):
  ca = compiled.cost_analysis()
  if isinstance(ca, (list, tuple)):
    ca = ca[0]
  return float(ca.get('flops', 0.0))


def _sync(tree):
  """Barrier that provably waits: D2H-fetch one leaf of the result.

  Through the experimental axon tunnel jax.block_until_ready can return
  BEFORE the computation finishes (observed in the round-5 train section:
  batch-8 \"9.4 ms/step\" = an impossible 800% MFU). A device_get forces
  the value to exist on the host; chained/pipelined work upstream of the
  fetched leaf is bounded by it."""
  leaf = jax.tree_util.tree_leaves(tree)[0]
  np.asarray(jax.device_get(leaf)).ravel()[:1]
  return tree


def bench_inference(cfg, num_objs, variables, model, images, frag_centers,
                    frag_sizes, K, task='localization', max_instances=1,
                    use_pallas=False):
  """Returns (img_s, flops_per_img) for the fused 3-stage inference path."""
  num_frags = cfg.num_frags
  oh, ow = epos_model.output_size(tuple(cfg.infer_crop_size), 4)
  npx = oh * ow
  n_iter = images.shape[0]
  if task == 'localization':
    counts = jnp.ones((num_objs,), jnp.int32)
  else:  # DETECTION: unknown instance counts, search up to max_instances.
    counts = jnp.full((num_objs,), max_instances, jnp.int32)

  # Three chained jits instead of one fused program: identical pipelined
  # throughput (dispatch is ~30us), but each piece compiles fast / caches
  # well through the axon tunnel.
  # NOTE: weights are jit ARGUMENTS — closure capture would embed 230MB of
  # constants into the program and blow up compile time through the tunnel.
  def _predict(v, im):
    logits, _ = epos_model.multi_scale_logits(model, v, im)
    b, h, w, _ = logits[common.PRED_OBJ_CONF].shape
    frag_conf_or_logits = logits[common.PRED_FRAG_CONF].reshape(
        b, h, w, num_objs, num_frags)
    if not use_pallas:
      frag_conf_or_logits = jax.nn.softmax(frag_conf_or_logits, -1)
    return (jax.nn.softmax(logits[common.PRED_OBJ_CONF], -1),
            frag_conf_or_logits,
            logits[common.PRED_FRAG_LOC].reshape(
                b, h, w, num_objs, num_frags, 3))
  predict = jax.jit(_predict)

  @jax.jit
  def extract(preds):
    obj_conf, frag_conf, frag_loc = preds
    # XLA two-stage selection below f128; the Pallas best-score kernel
    # above (InferenceEngine policy — it avoids the [h,w,O,F] softmax
    # tensor, 412MB at f256).
    fn = (corresp_lib.establish_many_to_many_fused if use_pallas
          else corresp_lib.establish_many_to_many)
    return fn(
        obj_conf[0], frag_conf[0], frag_loc[0], frag_centers, frag_sizes,
        output_scale=0.25, capacity=cfg.max_corrs_per_obj)

  # Production fit configuration (engine parity): spatial-coherence PEARL
  # with grid_w, refine schedule, exact_counts by task — timed behavior
  # equals shipped behavior.
  fit_kw = inference_lib.production_fit_kwargs(
      cfg, max_instances, ow, task_type=task)

  @jax.jit
  def fit(corrs, key):
    return ransac.fit_all_objects(corrs, K, npx, key, counts, **fit_kw)

  def full(images, key):
    return fit(extract(predict(variables, images)), key)

  # Warmup / compile.
  rng = jax.random.PRNGKey(0)
  _sync(full(images[0], rng))
  keys = [jax.random.fold_in(rng, i) for i in range(n_iter)]
  jax.block_until_ready(keys)

  t0 = time.time()
  last = None
  for i in range(n_iter):
    last = full(images[i], keys[i])
  _sync(last)
  dt = (time.time() - t0) / n_iter
  img_s = 1.0 / dt

  flops = (
      _flops(predict.lower(variables, images[0]).compile()) +
      _flops(extract.lower(predict(variables, images[0])).compile()) +
      _flops(fit.lower(extract(predict(variables, images[0])), rng)
             .compile()))
  return img_s, flops


def bench_batched_inference(cfg, num_objs, variables, model, frag_centers,
                            frag_sizes, K, batch=8, n_iter=3):
  """BASELINE config #3: batched multi-image inference — one CNN forward
  over the batch, extraction+fitting VMAPPED over the batch (mirrors
  InferenceEngine.full_batch; the round-2 Python unroll added stage
  latencies instead of overlapping them). Returns img/s."""
  num_frags = cfg.num_frags
  crop_w, crop_h = cfg.infer_crop_size
  oh, ow = epos_model.output_size((crop_w, crop_h), 4)
  npx = oh * ow
  counts = jnp.ones((num_objs,), jnp.int32)
  r = np.random.default_rng(7)
  batches = [jnp.asarray(r.uniform(0, 255, (batch, crop_h, crop_w, 3)),
                         jnp.float32) for _ in range(n_iter)]

  def full(v, images, key):
    logits, _ = epos_model.multi_scale_logits(model, v, images)
    b, h, w, _ = logits[common.PRED_OBJ_CONF].shape
    obj = jax.nn.softmax(logits[common.PRED_OBJ_CONF], -1)
    fc = jax.nn.softmax(logits[common.PRED_FRAG_CONF].reshape(
        b, h, w, num_objs, num_frags), -1)
    fl = logits[common.PRED_FRAG_LOC].reshape(
        b, h, w, num_objs, num_frags, 3)

    fit_kw = inference_lib.production_fit_kwargs(
        cfg, 1, ow, task_type=common.LOCALIZATION)

    def per_image(obj_i, fc_i, fl_i, key_i):
      corrs = corresp_lib.establish_many_to_many(
          obj_i, fc_i, fl_i, frag_centers, frag_sizes,
          output_scale=0.25, capacity=cfg.max_corrs_per_obj)
      return ransac.fit_all_objects(corrs, K, npx, key_i, counts, **fit_kw)

    return jax.vmap(per_image)(obj, fc, fl, jax.random.split(key, b))

  run = jax.jit(full)
  rng = jax.random.PRNGKey(0)
  _sync(run(variables, batches[0], rng))
  t0 = time.time()
  out = None
  for i in range(n_iter):
    out = run(variables, batches[i], jax.random.fold_in(rng, i))
  _sync(out)
  return batch * n_iter / (time.time() - t0)


def bench_train_step(cfg, num_objs, n_steps=12):
  """Returns (step_ms, flops_per_step) for the full flagship training step."""
  crop_w, crop_h = cfg.train_crop_size
  b = cfg.train_batch_size
  rng = jax.random.PRNGKey(0)
  r = np.random.default_rng(1)
  state = trainer.create_train_state(
      cfg, num_objs, rng, jnp.zeros((b, crop_h, crop_w, 3), jnp.float32))
  oh, ow = epos_model.output_size((crop_w, crop_h), 4)
  knn = cfg.gt_knn_frags

  def make_batch(i):
    rr = np.random.default_rng(100 + i)
    return {
        common.IMAGE: jnp.asarray(
            rr.uniform(0, 255, (b, crop_h, crop_w, 3)), jnp.float32),
        common.GT_OBJ_LABEL: jnp.asarray(
            rr.integers(0, num_objs + 1, (b, oh, ow))),
        common.GT_FRAG_LABEL: jnp.asarray(
            rr.integers(0, cfg.num_frags, (b, oh, ow, knn))),
        common.GT_FRAG_LOC: jnp.asarray(
            rr.normal(size=(b, oh, ow, knn, 3)), jnp.float32),
        common.GT_FRAG_WEIGHT: jnp.ones((b, oh, ow, knn), jnp.float32),
    }

  step = trainer.make_jitted_train_step(cfg, num_objs)
  batches = [make_batch(i) for i in range(n_steps)]
  # Warmup/compile on an extra batch (state is donated by the jit).
  flops = _flops(step.lower(state, batches[0], rng).compile())
  state, warm_metrics = step(state, make_batch(999), rng)
  # Sync via a scalar D2H, NOT block_until_ready: through the axon tunnel
  # block_until_ready returns before the computation finishes (round-5
  # measurement: batch-8 "9.4 ms/step" = an impossible 800% MFU; the
  # device_get-synced infer sections never showed this). The steps chain
  # through the donated state, so fetching the LAST loss bounds them all.
  float(jax.device_get(warm_metrics['total_loss']))

  t0 = time.time()
  metrics = None
  for i in range(n_steps):
    state, metrics = step(state, batches[i], jax.random.fold_in(rng, i))
  float(jax.device_get(metrics['total_loss']))
  step_ms = (time.time() - t0) / n_steps * 1000.0
  return step_ms, flops


def bench_tracked_run(peak):
  """Side metric: inference timing of the TRACKED accuracy run's
  architecture with its TRAINED checkpoint on REAL scene images.

  Fit-stage dynamics — refine gating, PEARL, proposal-round counts in the
  while_loop — depend on the prediction statistics; random weights (or
  trained weights on noise images, which predict all-background) do not
  reproduce them. Self-contained from the run's model dir (params.yml +
  fragments.pkl + Orbax checkpoint) and the run's rendered test images;
  silently skipped when no tracked run exists on this machine.
  """
  import glob
  import pickle
  repo = os.path.dirname(os.path.abspath(__file__))
  model_dir = os.environ.get('EPOS_BENCH_TRACKED_DIR')
  if not model_dir:
    # Newest round's tracked workdir wins.
    cands = sorted(glob.glob(
        os.path.join(repo, '.e2e_r*', 'tf_models', 'e2e-synthbox')))
    model_dir = cands[-1] if cands else os.path.join(
        repo, '.e2e_r4', 'tf_models', 'e2e-synthbox')
  work_root = os.path.dirname(os.path.dirname(model_dir))
  rgb_dir = os.environ.get(
      'EPOS_BENCH_TRACKED_RGB',
      os.path.join(work_root, 'bop', 'synthbox', 'test', '000001', 'rgb'))
  try:
    params_path = os.path.join(model_dir, 'params.yml')
    frag_path = os.path.join(model_dir, 'fragments.pkl')
    ckpt_dir = os.path.join(model_dir, 'checkpoints')
    if not (os.path.exists(params_path) and os.path.exists(frag_path)
            and os.path.isdir(rgb_dir)):
      return {}
    from epos_tpu.train import checkpoints as ckpt_lib
    step = ckpt_lib.latest_step(ckpt_dir)
    if step is None:
      return {}
    from epos_tpu.config import Config as _Config
    cfg = _Config().update_from_yaml(params_path)
    with open(frag_path, 'rb') as f:
      frags = pickle.load(f)
    obj_ids = sorted(frags['frag_centers'])

    import cv2
    names = sorted(os.listdir(rgb_dir))[:13]
    if len(names) < 2:
      return {}
    ims = [cv2.cvtColor(cv2.imread(os.path.join(rgb_dir, n)),
                        cv2.COLOR_BGR2RGB) for n in names]
    images = jnp.asarray(np.stack(ims)[:, None], jnp.float32)  # [n,1,h,w,3]
    crop_h, crop_w = ims[0].shape[:2]
    cfg.infer_crop_size = [crop_w, crop_h]

    # Row o of the dense fragment arrays is obj_id o+1 over the FULL ID
    # range (ObjectModelStore.frag_arrays; the model head channels are laid
    # out the same way) — never positional over sorted keys, which
    # misaligns for non-contiguous or non-1-based obj_ids.
    num_objs = max(obj_ids)
    F = next(iter(frags['frag_centers'].values())).shape[0]
    fc_np = np.zeros((num_objs, F, 3), np.float32)
    fs_np = np.ones((num_objs, F), np.float32)
    for obj_id in obj_ids:
      fc_np[obj_id - 1] = frags['frag_centers'][obj_id]
      fs_np[obj_id - 1] = frags['frag_sizes'][obj_id]
    fc, fs = jnp.asarray(fc_np), jnp.asarray(fs_np)

    model = epos_model.build_model(cfg, num_objs)
    restored, step = ckpt_lib.restore_params(
        ckpt_dir, batch_stats_template=True, step=step)
    variables = jax.device_put({'params': restored['params'],
                                'batch_stats': restored['batch_stats']})
    jax.block_until_ready(variables)
    # The synthetic sets render with f = width (tests/synthetic.py); the
    # exact K only shifts which pixels become inliers, not the timing
    # protocol.
    K = jnp.asarray([[float(crop_w), 0, crop_w / 2.0],
                     [0, float(crop_w), crop_h / 2.0],
                     [0, 0, 1]], jnp.float32)
    img_s, flops = bench_inference(
        cfg, num_objs, variables, model, images, fc, fs, K,
        task='localization', max_instances=1)
    return {'tracked_ckpt_infer_img_s': round(img_s, 3),
            'tracked_ckpt_infer_mfu': round(img_s * flops / peak, 4),
            'tracked_ckpt': f'{os.path.basename(model_dir)}@{step} '
                            f'({cfg.model_variant} f{cfg.num_frags} '
                            f'{crop_w}x{crop_h}, real test images)'}
  except Exception as e:  # Bench must never die on tracked-run state.
    print(f'# tracked-run bench skipped ({e!r})', flush=True)
    return {}


def _backend_available(timeout_s=360, attempts=3):
  """Probes the default JAX backend in a SUBPROCESS with a timeout.

  The axon TPU tunnel can go down for hours; in that state jax.devices()
  hangs indefinitely and a driver-run bench would time out with no JSON
  (round-3 BENCH artifact was zeroed exactly this way). Two hazards shape
  the protocol (CLAUDE.md #1): (a) a single D2H read can stall for minutes
  while the tunnel is otherwise healthy, so one failed probe is retried
  after a wait instead of zeroing the whole bench (the round-5 first bench
  attempt was lost to exactly one such stall); (b) SIGKILLing a process
  mid-TPU-operation wedges the tunnel for EVERY process until the
  server-side claim expires (~3-4 min), so timeouts terminate gracefully
  first and the retry wait doubles as claim-expiry time. CPU/forced
  platforms pass trivially on the first attempt.
  """
  import subprocess
  import sys
  code = (
      "import jax\n"
      "jax.config.update('jax_compilation_cache_dir',"
      " '/root/repo/.jax_cache')\n"
      "import jax.numpy as jnp\n"
      "print(jax.jit(lambda a: a * 2)(jnp.ones(4))[0])\n")
  for attempt in range(attempts):
    if attempt:
      print(f'# backend probe attempt {attempt} failed; waiting 240s for '
            'a possible stale-claim expiry before retrying', flush=True)
      time.sleep(240)
    proc = subprocess.Popen([sys.executable, '-c', code],
                            stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT)
    try:
      proc.communicate(timeout=timeout_s)
      if proc.returncode == 0:
        return True
    except subprocess.TimeoutExpired:
      proc.terminate()  # graceful first: SIGKILL mid-op wedges the tunnel
      try:
        proc.communicate(timeout=60)
      except subprocess.TimeoutExpired:
        proc.kill()
        proc.communicate()
  return False


def _flagship_setup(r, n_iter=24):
  """Shared flagship configuration: Xception-65 f64, 21 objects, 640x480.

  FLAGSHIP settings: reference defaults (scripts/infer.py:118-120 — 400
  fitting iterations; config.py max_corrs_per_obj=2048). No weakening.
  """
  num_objs, num_frags = 21, 64
  crop_w, crop_h = 640, 480
  cfg = Config(model_variant='xception_65', num_frags=num_frags,
               infer_crop_size=[crop_w, crop_h],
               train_crop_size=[crop_w, crop_h],
               compute_dtype='bfloat16')
  assert cfg.max_fitting_iterations == 400
  assert cfg.max_corrs_per_obj == 2048
  # Distinct images per iteration: the axon runtime can elide repeated
  # executions with identical inputs, which would inflate the result.
  images = jnp.asarray(
      r.uniform(0, 255, (n_iter, 1, crop_h, crop_w, 3)), jnp.float32)
  K = jnp.asarray(
      [[572.4, 0, 325.3], [0, 573.6, 242.0], [0, 0, 1]], jnp.float32)
  return cfg, num_objs, images, K


def section_flagship():
  """Primary metric: LOCALIZATION img/s, plus DETECTION and batched."""
  r = np.random.default_rng(0)
  cfg, num_objs, images, K = _flagship_setup(r)
  num_frags = cfg.num_frags
  peak = _peak_flops()
  model = epos_model.build_model(cfg, num_objs)
  rng = jax.random.PRNGKey(0)
  variables = jax.jit(lambda k, im: model.init(k, im, train=False))(
      rng, images[0])
  jax.block_until_ready(variables)

  # Trained weights when available (EPOS_BENCH_CKPT -> Orbax checkpoint dir
  # of a FLAGSHIP-architecture run): fit-stage refine gating and PEARL
  # dynamics under trained prediction statistics can differ from random
  # weights; the JSON records which weights were timed.
  weights_src = 'random'
  ckpt_dir = os.environ.get('EPOS_BENCH_CKPT', '')
  if ckpt_dir and os.path.isdir(ckpt_dir):
    try:
      from epos_tpu.train import checkpoints as ckpt_lib
      out = ckpt_lib.restore_params(ckpt_dir, batch_stats_template=True)
      if out is not None:
        restored, step = out
        # tree_map raises on structure mismatch -> caught below.
        compat = jax.tree_util.tree_all(jax.tree_util.tree_map(
            lambda a, b: np.shape(a) == np.shape(b), restored,
            {'params': variables['params'],
             'batch_stats': variables['batch_stats']}))
        if compat:
          variables = jax.device_put(
              jax.tree_util.tree_map(jnp.asarray, restored))
          jax.block_until_ready(variables)
          weights_src = f'trained:{ckpt_dir}@{step}'
        else:
          print(f'# EPOS_BENCH_CKPT shape mismatch, using random '
                f'weights ({ckpt_dir})', flush=True)
    except Exception as e:  # Bench must never die on a stale checkpoint.
      print(f'# EPOS_BENCH_CKPT load failed ({e!r}), using random weights',
            flush=True)

  frag_centers = jnp.asarray(
      r.uniform(-50, 50, (num_objs, num_frags, 3)), jnp.float32)
  frag_sizes = jnp.asarray(
      r.uniform(10, 40, (num_objs, num_frags)), jnp.float32)

  loc_img_s, loc_flops = bench_inference(
      cfg, num_objs, variables, model, images, frag_centers, frag_sizes, K,
      task='localization', max_instances=1)
  det_img_s, _ = bench_inference(
      cfg, num_objs, variables, model, images[:12], frag_centers, frag_sizes,
      K, task='detection', max_instances=4)
  batched_img_s = bench_batched_inference(
      cfg, num_objs, variables, model, frag_centers, frag_sizes, K, batch=8)
  return {
      'value': round(loc_img_s, 3),
      'infer_flops_per_img': loc_flops,
      'infer_mfu': round(loc_img_s * loc_flops / peak, 4),
      'detection_multi_instance_img_s': round(det_img_s, 3),
      'batched8_img_s': round(batched_img_s, 3),
      'device_kind': getattr(jax.devices()[0], 'device_kind', 'unknown'),
      'peak_flops': peak,
      'weights': weights_src,
  }


def section_f256():
  """Stretch config (README table): f256 heads, 30 objects (T-LESS-scale) —
  the Pallas fused-extraction regime (BASELINE.md config #5 stretch)."""
  r = np.random.default_rng(0)
  cfg, _, images, K = _flagship_setup(r, n_iter=12)
  peak = _peak_flops()
  rng = jax.random.PRNGKey(0)
  n256, f256 = 30, 256
  cfg256 = cfg.replace(num_frags=f256)
  model256 = epos_model.build_model(cfg256, n256)
  variables256 = jax.jit(lambda k, im: model256.init(k, im, train=False))(
      rng, images[0])
  jax.block_until_ready(variables256)
  fc256 = jnp.asarray(r.uniform(-50, 50, (n256, f256, 3)), jnp.float32)
  fs256 = jnp.asarray(r.uniform(10, 40, (n256, f256)), jnp.float32)
  f256_img_s, f256_flops = bench_inference(
      cfg256, n256, variables256, model256, images, fc256, fs256, K,
      task='localization', max_instances=1, use_pallas=True)
  return {
      'f256_30obj_img_s': round(f256_img_s, 3),
      'f256_30obj_ms_per_img': round(1000.0 / f256_img_s, 1),
      'f256_infer_mfu': round(f256_img_s * f256_flops / peak, 4),
  }


def section_train():
  """Training-step time at batch 1 and 8 (BASELINE.md config #5)."""
  r = np.random.default_rng(0)
  cfg, num_objs, _, _ = _flagship_setup(r, n_iter=1)
  peak = _peak_flops()
  step_ms, train_flops = bench_train_step(cfg, num_objs)
  cfg_b8 = cfg.replace(train_batch_size=8)
  step_ms_b8, train_flops_b8 = bench_train_step(cfg_b8, num_objs, n_steps=8)
  return {
      'train_step_ms': round(step_ms, 2),
      'train_flops_per_step': train_flops,
      'train_mfu': round(train_flops / (step_ms / 1000.0) / peak, 4),
      'train_b8_step_ms': round(step_ms_b8, 2),
      'train_b8_mfu': round(
          train_flops_b8 / (step_ms_b8 / 1000.0) / peak, 4),
  }


def section_tracked():
  return bench_tracked_run(_peak_flops())


SECTIONS = [
    # (name, wall-clock budget in seconds)
    ('flagship', 2100),
    ('f256', 1200),
    ('train', 1200),
    ('tracked', 1200),
]
_SECTION_FNS = {'flagship': section_flagship, 'f256': section_f256,
                'train': section_train, 'tracked': section_tracked}


def _run_section_subprocess(name, budget):
  """Runs `bench.py --section name` under a budget; returns (dict|None, err).

  Timeout kills are graceful first (SIGTERM, then SIGKILL after 60 s):
  SIGKILL mid-TPU-operation can wedge the axon tunnel for every process.
  """
  proc = subprocess.Popen(
      [sys.executable, os.path.abspath(__file__), '--section', name],
      stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
  try:
    out, _ = proc.communicate(timeout=budget)
  except subprocess.TimeoutExpired:
    proc.terminate()
    try:
      out, _ = proc.communicate(timeout=60)
    except subprocess.TimeoutExpired:
      proc.kill()
      out, _ = proc.communicate()
    return None, f'timeout after {budget}s'
  for line in reversed((out or '').splitlines()):
    if line.startswith('{'):
      try:
        return json.loads(line), None
      except ValueError:
        pass
  tail = (out or '').strip().splitlines()[-3:]
  return None, f'rc={proc.returncode}: {" | ".join(tail)[:300]}'


def main():
  if len(sys.argv) > 2 and sys.argv[1] == '--section':
    # Child mode: measure one section, print its JSON fragment.
    print(json.dumps(_SECTION_FNS[sys.argv[2]]()), flush=True)
    return

  merged = {
      'metric': 'ycbv_e2e_frames_per_sec_640x480_xc65_f64_flagship',
      'value': None,
      'unit': 'img/s',
      'vs_baseline': None,
  }
  baseline_fps = 1.0 / 0.75  # reference ~0.75 s/image (BASELINE.md (b))
  if not _backend_available():
    # Emit an explicit, parseable artifact rather than hanging/crashing:
    # the outage is an environment condition, not a framework regression.
    merged['error'] = (
        'JAX default backend unreachable (axon TPU tunnel down?) after a '
        '360s subprocess probe; no measurement taken.')
    print(json.dumps(merged))
    return

  consecutive_timeouts = 0
  for name, budget in SECTIONS:
    if consecutive_timeouts >= 2:
      merged[f'error_{name}'] = 'skipped after 2 consecutive timeouts'
      continue
    result, err = _run_section_subprocess(name, budget)
    if result is None:
      merged[f'error_{name}'] = err
      consecutive_timeouts += 1 if 'timeout' in err else 0
    else:
      consecutive_timeouts = 0
      merged.update(result)
      if merged.get('value'):
        merged['vs_baseline'] = round(merged['value'] / baseline_fps, 2)
    # Incremental emission: the LAST parseable line always carries every
    # section measured so far, even if a later section stalls out.
    print(json.dumps(merged), flush=True)


if __name__ == '__main__':
  main()
