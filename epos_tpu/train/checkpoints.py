"""Checkpointing with the reference's warm-start/resume semantics, on Orbax.

Reference behavior being mirrored (epos_lib/train_utils.py:31-81,
scripts/train.py:502,523-528):
- Periodic checkpoints keeping the latest N (train.py:56-61).
- Auto-resume from the latest checkpoint in the model dir.
- Warm start from an initial checkpoint ONLY when no native checkpoint
  exists, excluding the step counter and (optionally) the extra/logits
  layers (the `last_layers` scopes, model.py:28-48).
"""

import os

import jax
import numpy as np
import orbax.checkpoint as ocp

from epos_tpu.train import trainer as trainer_lib


def _manager(ckpt_dir, max_to_keep=40):
  # An explicit handler makes item_metadata() available (used to build
  # restore templates from the checkpoint's own shapes/dtypes).
  return ocp.CheckpointManager(
      os.path.abspath(ckpt_dir),
      item_handlers=ocp.StandardCheckpointHandler(),
      options=ocp.CheckpointManagerOptions(
          max_to_keep=max_to_keep, create=True))


def save_checkpoint(ckpt_dir, state, max_to_keep=40):
  """Saves step/params/batch_stats/opt_state."""
  mgr = _manager(ckpt_dir, max_to_keep)
  payload = {
      'step': np.asarray(state.step),
      'params': jax.device_get(state.params),
      'batch_stats': jax.device_get(state.batch_stats),
      'opt_state': jax.device_get(state.opt_state),
  }
  mgr.save(int(state.step), args=ocp.args.StandardSave(payload))
  mgr.wait_until_finished()
  mgr.close()


def latest_step(ckpt_dir):
  if not os.path.isdir(ckpt_dir):
    return None
  try:
    mgr = _manager(ckpt_dir)
    step = mgr.latest_step()
    mgr.close()
    return step
  except Exception:
    return None


def restore_checkpoint(ckpt_dir, state, step=None):
  """Restores a TrainState saved by save_checkpoint. Returns new state."""
  mgr = _manager(ckpt_dir)
  if step is None:
    step = mgr.latest_step()
  if step is None:
    mgr.close()
    return None
  template = {
      'step': np.asarray(state.step),
      'params': jax.device_get(state.params),
      'batch_stats': jax.device_get(state.batch_stats),
      'opt_state': jax.device_get(state.opt_state),
  }
  payload = mgr.restore(step, args=ocp.args.StandardRestore(template))
  mgr.close()
  return state.replace(
      step=jax.numpy.asarray(payload['step']),
      params=payload['params'],
      batch_stats=payload['batch_stats'],
      opt_state=payload['opt_state'])


def restore_params(ckpt_dir, params_template=None, batch_stats_template=None,
                   step=None):
  """Restores only params (+ batch_stats) for inference.

  The restore template is built from the checkpoint's OWN metadata
  (shapes/dtypes via item_metadata), mirroring the reference's
  exact-scaffold restore (scripts/train.py:523-528): Orbax never emits the
  template-less UNSAFE warning and the result does not depend on the
  caller being able to reconstruct the optimizer state tree.

  Returns ({'params': ..., 'batch_stats': ...}, step) or None.
  """
  del params_template  # Kept for call-site compatibility; unused.
  mgr = _manager(ckpt_dir)
  if step is None:
    step = mgr.latest_step()
  if step is None:
    mgr.close()
    return None
  meta = mgr.item_metadata(step)
  template = jax.tree_util.tree_map(
      lambda m: jax.ShapeDtypeStruct(tuple(m.shape), m.dtype), meta)
  payload = mgr.restore(step, args=ocp.args.StandardRestore(template))
  mgr.close()
  out = {'params': payload['params']}
  if batch_stats_template is not None and 'batch_stats' in payload:
    out['batch_stats'] = payload['batch_stats']
  return out, step


def warm_start(state, initial_ckpt_dir, model_dir,
               initialize_last_layer=False, logits_only=False):
  """Initializes params from a pre-trained checkpoint (train_utils.py:31-81).

  No-op when the model dir already has a native checkpoint. Variables whose
  path starts with a last-layer scope are kept at their fresh init unless
  initialize_last_layer.
  """
  if initial_ckpt_dir is None:
    return state
  if latest_step(os.path.join(model_dir, 'checkpoints')) is not None:
    return state  # Other checkpoint exists -> ignore warm start.

  restored = restore_checkpoint(initial_ckpt_dir, state)
  if restored is None:
    return state

  def merge(path, new, old):
    if not initialize_last_layer and trainer_lib._is_last_layer(
        path, logits_only):
      return old
    return new

  params = jax.tree_util.tree_map_with_path(
      merge, restored.params, state.params)
  # batch_stats follow the same exclusion.
  bs = jax.tree_util.tree_map_with_path(
      merge, restored.batch_stats, state.batch_stats)
  # Step restarts at 0 (exclude_list=['global_step'], train_utils.py:62).
  return state.replace(params=params, batch_stats=bs)
