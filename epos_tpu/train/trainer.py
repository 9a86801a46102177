"""Sharded training step for EPOS-TPU.

One jitted function computes forward, the three losses, gradients, and the
optimizer update. Data parallelism comes from input shardings on a
`jax.sharding.Mesh` — XLA inserts the gradient all-reduce over ICI, replacing
the reference's per-GPU clones + CPU averaging (scripts/train.py:344-366).

Optimizer semantics mirrored from the reference:
- SGD momentum 0.9 (train.py:340) with poly/step LR (train_utils.py:117-195).
- L2 weight decay 4e-5 on conv kernels except depthwise
  (xception_arg_scope regularize_depthwise=False, net_xception.py:741;
  model.py uses slim.l2_regularizer on pointwise/dense convs only).
- Gradient multipliers: 2x biases, Nx last layers (train_utils.py:84-114).
- Regex freezing of variable subsets (scripts/train.py:85-87,368-378).
"""

import re
from typing import Any, Optional

import flax
import jax
import jax.numpy as jnp
import optax

from epos_tpu import common
from epos_tpu.models import epos_model
from epos_tpu.parallel import mesh as mesh_lib
from epos_tpu.train import losses, schedules


class TrainState(flax.struct.PyTreeNode):
  step: jnp.ndarray
  params: Any
  batch_stats: Any
  opt_state: Any
  tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)
  model: Any = flax.struct.field(pytree_node=False)


def _path_str(path):
  return '/'.join(str(getattr(p, 'key', p)) for p in path)


def _is_bias(path):
  return _path_str(path).endswith('bias')


def _is_decayed_kernel(path):
  """Conv kernels get L2 decay; depthwise convs, biases and BN scales don't."""
  s = _path_str(path)
  return s.endswith('kernel') and 'depthwise' not in s


# Scopes of the "extra" (non-backbone) layers (reference model.py:28-48).
LAST_LAYER_SCOPES = ('logits', 'image_pooling', 'aspp', 'concat_projection',
                     'decoder')


def _is_last_layer(path, logits_only=False):
  s = _path_str(path)
  scopes = ('logits',) if logits_only else LAST_LAYER_SCOPES
  return any(s.startswith(scope) or f'/{scope}' in s for scope in scopes)


def gradient_multipliers(params, last_layer_multiplier=1.0,
                         logits_only=False):
  """Multiplier tree: 2x biases, Nx last layers, 2Nx last-layer biases
  (train_utils.py:84-114)."""
  def mult(path, _):
    m = 1.0
    if _is_bias(path):
      m *= 2.0
    if last_layer_multiplier != 1.0 and _is_last_layer(path, logits_only):
      m *= last_layer_multiplier
    return m
  return jax.tree_util.tree_map_with_path(mult, params)


def freeze_mask(params, freeze_regex_list):
  """True where the parameter is trainable (train.py:368-378 semantics:
  variables matching any regex are excluded from training)."""
  patterns = [re.compile(p) for p in (freeze_regex_list or []) if p]

  def keep(path, _):
    s = _path_str(path)
    return not any(p.match(s) for p in patterns)
  return jax.tree_util.tree_map_with_path(keep, params)


def make_optimizer(cfg, params):
  """optax chain implementing the reference optimizer semantics."""
  lr = schedules.from_config(cfg)
  mults = gradient_multipliers(
      params, cfg.last_layer_gradient_multiplier,
      cfg.last_layers_contain_logits_only)
  trainable = freeze_mask(params, cfg.freeze_regex_list)

  chain = [
      optax.add_decayed_weights(
          cfg.weight_decay,
          mask=jax.tree_util.tree_map_with_path(
              lambda p, _: _is_decayed_kernel(p), params)),
      # Per-variable gradient multipliers.
      optax.multi_transform(
          {m: optax.scale(m) for m in
           set(jax.tree_util.tree_leaves(mults))},
          param_labels=mults),
      optax.sgd(lr, momentum=cfg.momentum),
  ]
  tx = optax.chain(*chain)
  if any(not t for t in jax.tree_util.tree_leaves(trainable)):
    tx = optax.masked(tx, trainable)
  return tx


def create_train_state(cfg, num_objs, rng, sample_image):
  """Initializes model + optimizer. sample_image: [B, H, W, 3]."""
  model = epos_model.build_model(cfg, num_objs)
  # Jitted init: unjitted model.init dispatches op-by-op (minutes on a
  # tunneled TPU).
  variables = jax.jit(
      lambda rng, im: model.init(rng, im, train=False))(rng, sample_image)
  params = variables['params']
  batch_stats = variables.get('batch_stats', {})
  tx = make_optimizer(cfg, params)
  return TrainState(
      step=jnp.zeros((), jnp.int32),
      params=params,
      batch_stats=batch_stats,
      opt_state=tx.init(params),
      tx=tx,
      model=model)


def train_step(state, batch, dropout_rng, cfg, num_objs):
  """One training step. Pure function of (state, batch, rng)."""
  model = state.model

  def loss_fn(params):
    variables = {'params': params, 'batch_stats': state.batch_stats}
    train_bn = cfg.fine_tune_batch_norm
    rngs = {'dropout': jax.random.fold_in(dropout_rng, state.step)}
    merged, per_scale, new_state = epos_model.multi_scale_logits(
        model, variables, batch[common.IMAGE],
        image_pyramid=cfg.image_pyramid, merge_method=cfg.merge_method,
        train=True, rngs=rngs,
        mutable=['batch_stats'] if train_bn else [], return_scales=True)

    def maybe_upsample(logit_dict):
      # --upsample_logits: loss at the GT-target resolution with
      # bilinearly upsampled logits (reference loss.py:129-133,179,259;
      # the GT maps are generated at stride 1 then, train.py:441-446).
      if not cfg.upsample_logits:
        return logit_dict
      gt_hw = batch[common.GT_OBJ_LABEL].shape[1:3]
      from epos_tpu.models.layers import resize_bilinear
      return {k: resize_bilinear(v, gt_hw) for k, v in logit_dict.items()}

    # A loss term per scale plus one for the merged logits (reference
    # loss.py:124 iterates the full scales_to_logits map).
    total = 0.0
    parts = None
    for logit_dict in per_scale + [merged]:
      t, p = losses.total_loss(
          maybe_upsample(logit_dict), batch, num_objs, cfg.num_frags, cfg)
      total = total + t
      parts = p if parts is None else {k: parts[k] + p[k] for k in parts}
    new_bs = (new_state['batch_stats'] if train_bn and new_state
              else state.batch_stats)
    return total, (parts, new_bs)

  grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
  (total, (parts, new_bs)), grads = grad_fn(state.params)
  updates, new_opt_state = state.tx.update(
      grads, state.opt_state, state.params)
  new_params = optax.apply_updates(state.params, updates)
  metrics = dict(parts, total_loss=total,
                 learning_rate=schedules.from_config(cfg)(state.step))
  new_state = state.replace(
      step=state.step + 1, params=new_params, batch_stats=new_bs,
      opt_state=new_opt_state)
  return new_state, metrics


def recalibrate_batch_stats(cfg, num_objs, state, next_batch_fn,
                            num_batches, momentum=0.9):
  """Refreshes the BN moving statistics on UN-augmented training batches.

  Short-training-regime necessity with no reference analogue: the
  reference's 2M-step schedule (epos/scripts/train.py:103-105) converges
  its BN moving averages in-run at momentum 0.9997, but a 20-50k-step
  schedule saves stats that are an EMA of the last ~1/(1-momentum)
  AUGMENTED batches — a different activation distribution than the clean
  eval images. Measured on the tracked benchmark's 20k checkpoint
  (ACCURACY_r05.json): stale stats cost 2.1x fragment top-1 accuracy
  (0.27 -> 0.57) and were the root cause of the round-4/5 tracked-run AR
  collapse (holdout 0.029 -> healthy after recalibration).

  Streams `num_batches` raw batches in train mode (dropout active, exactly
  as the stats were formed during training) through the model rebuilt with
  the recalibration momentum, then returns `state` with the refreshed
  stats. Residual weight of the old stats is momentum**num_batches
  (0.9**100 ~ 3e-5).
  """
  import dataclasses

  from epos_tpu.models import epos_model

  recal_cfg = dataclasses.replace(cfg, bn_momentum=momentum)
  model = epos_model.build_model(recal_cfg, num_objs)

  @jax.jit
  def update(params, stats, images, rng_):
    out = epos_model.multi_scale_logits(
        model, {'params': params, 'batch_stats': stats}, images,
        image_pyramid=cfg.image_pyramid, merge_method=cfg.merge_method,
        train=True, rngs={'dropout': rng_}, mutable=['batch_stats'])
    return out[-1]['batch_stats']

  stats = state.batch_stats
  rng = jax.random.PRNGKey(97)
  for i in range(num_batches):
    batch = next_batch_fn()
    stats = update(state.params, stats, jnp.asarray(batch[common.IMAGE]),
                   jax.random.fold_in(rng, i))
  return state.replace(batch_stats=stats)


def make_jitted_train_step(cfg, num_objs, mesh: Optional[Any] = None,
                           state_template: Optional[Any] = None):
  """Jits train_step with mesh shardings (batch on 'data').

  Parameters are replicated by default; with a model axis of size > 1 in
  the mesh AND a state_template, the wide EPOS head kernels (and their
  optimizer buffers) are output-channel-sharded over 'model' — tensor
  parallelism for the f256-class heads (SURVEY §5). XLA emits the gradient
  psum over 'data' and the gathers the sharded heads need automatically.
  """
  def step_fn(state, batch, rng):
    return train_step(state, batch, rng, cfg, num_objs)

  if mesh is None:
    return jax.jit(step_fn, donate_argnums=(0,))
  repl = mesh_lib.replicated(mesh)
  data = mesh_lib.batch_sharding(mesh)
  if mesh.shape[mesh_lib.MODEL_AXIS] > 1 and state_template is not None:
    state_sh = mesh_lib.state_shardings(mesh, state_template)
    return jax.jit(
        step_fn, donate_argnums=(0,),
        in_shardings=(state_sh, data, repl),
        out_shardings=(state_sh, repl))
  return jax.jit(
      step_fn, donate_argnums=(0,),
      in_shardings=(repl, data, repl),
      out_shardings=(repl, repl))
