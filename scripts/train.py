#!/usr/bin/env python3
"""Training driver — CLI-compatible with the reference scripts/train.py.

TPU-native execution model: one jitted step over a jax.sharding.Mesh (data
parallel over all devices; XLA all-reduces gradients over ICI), device-side
photometric augmentation, Orbax checkpoints with warm-start exclusions.

Flags mirror the reference (model/params.yml overlay wins over CLI).
"""

import logging
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp
import numpy as np

from epos_tpu import common, config as config_epos
from epos_tpu.config import config_from_args
from epos_tpu.data import augment
from epos_tpu.data.dataset import Dataset
from epos_tpu.data.pipeline import DataLoader
from epos_tpu.parallel import mesh as mesh_lib
from epos_tpu.train import checkpoints, trainer

logging.basicConfig(level=logging.INFO, format='%(asctime)s %(message)s', force=True)
logging.getLogger('absl').setLevel(logging.WARNING)  # quiet orbax internals
log = logging.getLogger('train')


def main(args=None):
  cfg = config_from_args(args, 'EPOS-TPU training')
  model_dir = cfg.model_dir
  if model_dir is None:
    raise ValueError('--model is required')
  if cfg.cpu_only:
    # Same semantics as infer.py --cpu_only (reference infer.py:40-41):
    # force the CPU backend before any device is claimed. The env var
    # JAX_PLATFORMS is NOT enough here — the baked axon bootstrap sets the
    # jax config to 'axon,cpu', and with the tunnel down the axon client
    # init hangs in C (uninterruptible) at the first backend touch.
    jax.config.update('jax_platforms', 'cpu')
  os.makedirs(model_dir, exist_ok=True)

  # Multi-host: initialize the distributed runtime BEFORE any backend use
  # (reference PS scheme train.py:35-50 -> jax.distributed; see
  # epos_tpu/parallel/distributed.py).
  from epos_tpu.parallel import distributed as dist
  dist.initialize_from_config(cfg)
  chief = dist.is_chief()
  if dist.process_count() > 1:
    log.info('Multi-host: process %d/%d, chief=%s',
             dist.process_index(), dist.process_count(), chief)

  crop_w, crop_h = cfg.train_crop_size
  if cfg.upsample_logits:
    # GT maps at input resolution; the losses upsample the logits
    # (reference train.py:441-446).
    stride = 1
  else:
    stride = min(cfg.decoder_output_stride) if cfg.decoder_output_stride \
        else cfg.encoder_output_stride

  dataset = Dataset(
      cfg, cfg.dataset, cfg.train_tfrecord_names, model_dir,
      batch_size=cfg.train_batch_size,
      max_height_before_crop=cfg.train_max_height_before_crop,
      crop_size=(crop_w, crop_h), is_training=True,
      return_gt_orig=False, return_gt_maps=True, output_stride=stride)
  num_objs = dataset.num_objs
  log.info('Dataset %s: %d objects, %d fragments', cfg.dataset, num_objs,
           cfg.num_frags)

  mesh = mesh_lib.create_mesh(cfg.mesh_shape)
  n_dev = int(np.prod(mesh.devices.shape))
  global_batch = cfg.train_batch_size
  if global_batch % n_dev != 0:
    # Per-clone batch semantics (reference splits per clone,
    # train.py:450-453): scale to a multiple of the device count.
    global_batch = max(global_batch, n_dev)
    log.info('Scaling global batch to %d for %d devices', global_batch, n_dev)

  # Each process feeds its local slice of the global batch from a disjoint
  # shard of the (shared-seed) epoch permutation.
  n_proc = dist.process_count()
  if global_batch % n_proc != 0:
    raise ValueError(f'global batch {global_batch} not divisible by '
                     f'{n_proc} processes')
  local_batch = global_batch // n_proc

  rng = jax.random.PRNGKey(0)
  state = trainer.create_train_state(
      cfg, num_objs, rng, jnp.zeros((1, crop_h, crop_w, 3), jnp.float32))
  n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
  log.info('Model %s: %.1fM params', cfg.model_variant, n_params / 1e6)

  # Resume or warm start (train.py:502, train_utils.py:31-81).
  ckpt_dir = os.path.join(model_dir, 'checkpoints')
  restored = checkpoints.restore_checkpoint(ckpt_dir, state)
  # Host-side step counter: int(state.step) would be a D2H scalar read
  # through the tunnel at startup (hazard: can stall for minutes).
  steps_done = 0
  if restored is not None:
    state = restored
    steps_done = int(checkpoints.latest_step(ckpt_dir) or 0)
    log.info('Resumed from step %d', steps_done)
  elif cfg.initial_checkpoint:
    init_dir = os.path.join(config_epos.TF_MODELS_PATH,
                            cfg.initial_checkpoint)
    state = checkpoints.warm_start(
        state, init_dir, model_dir,
        initialize_last_layer=cfg.initialize_last_layer,
        logits_only=cfg.last_layers_contain_logits_only)
    log.info('Warm-started from %s', init_dir)

  # Constructed AFTER the resume so the input stream continues from where
  # the previous process stopped (start_sample) instead of replaying the
  # first batches — reference shuffle state advances for the whole session
  # (epos_lib/datagen.py:674-705).
  loader = DataLoader(dataset, batch_size=local_batch, shuffle=True,
                      repeat=True, num_workers=cfg.num_pipeline_workers,
                      shard_index=dist.process_index(), num_shards=n_proc,
                      start_sample=steps_done * local_batch)

  step_fn = trainer.make_jitted_train_step(cfg, num_objs, mesh,
                                           state_template=state)
  aug_fn = jax.jit(lambda r, im: augment.augment_batch(
      r, im, cfg.data_augmentations))

  # Chief-only summary/checkpoint IO (reference is_chief, train.py:544).
  writer = None
  if chief:
    from epos_tpu.utils.summary import SummaryWriter
    writer = SummaryWriter(os.path.join(model_dir, 'tb'))

  log.info('Training for %d steps (batch %d over %d devices)',
           cfg.train_steps, global_batch, n_dev)
  t_last = time.time()
  data_iter = iter(loader)
  # Profiler window (reference --profile_logdir wraps the whole session,
  # train.py:66-69,534-541; a bounded window keeps traces usable).
  profile_start = steps_done + 10
  profile_stop = profile_start + 5
  profiling = False
  end_step = cfg.train_steps if cfg.stop_at_step is None else \
      min(cfg.train_steps, cfg.stop_at_step)
  while steps_done < end_step:
    if cfg.profile_logdir and steps_done == profile_start and not profiling:
      jax.profiler.start_trace(cfg.profile_logdir)
      profiling = True
    batch = next(data_iter)
    batch.pop(common.IMAGE_PATH, None)
    batch = {k: v for k, v in batch.items()
             if k in (common.IMAGE, common.GT_OBJ_LABEL,
                      common.GT_FRAG_LABEL, common.GT_FRAG_LOC,
                      common.GT_FRAG_WEIGHT)}
    if cfg.data_augmentations:
      akey = jax.random.fold_in(jax.random.PRNGKey(1), steps_done)
      batch[common.IMAGE] = aug_fn(akey, jnp.asarray(batch[common.IMAGE]))
    batch = mesh_lib.shard_batch(batch, mesh)
    state, metrics = step_fn(state, batch, rng)
    steps_done += 1
    if profiling and steps_done >= profile_stop:
      jax.block_until_ready(metrics['total_loss'])
      jax.profiler.stop_trace()
      profiling = False
      log.info('Wrote profiler trace to %s', cfg.profile_logdir)

    if steps_done % cfg.log_steps == 0:
      dt = time.time() - t_last
      t_last = time.time()
      # One packed D2H read: per-scalar reads can stall for seconds through
      # the TPU tunnel (see memory: axon-tpu-quirks).
      names = sorted(metrics)
      vals = np.asarray(jnp.stack([metrics[k] for k in names]))
      m = dict(zip(names, vals.tolist()))
      log.info('step %d: total=%.4f obj=%.4f frag=%.4f loc=%.4f '
               'lr=%.2e (%.2f s/step)', steps_done, m['total_loss'],
               m['obj_cls_loss'], m['frag_cls_loss'], m['frag_loc_loss'],
               m['learning_rate'], dt / cfg.log_steps)
      if not np.isfinite(m['total_loss']):
        raise FloatingPointError(  # tf.check_numerics parity (train.py:281)
            f'Non-finite loss at step {steps_done}: {m}')
    if steps_done % cfg.save_summaries_steps == 0 and writer is not None:
      names = sorted(metrics)
      vals = np.asarray(jnp.stack([metrics[k] for k in names]))
      writer.scalars(steps_done, dict(zip(names, vals.tolist())))
    if steps_done % cfg.save_interval_steps == 0 or \
          steps_done >= end_step:
      # Orbax checkpointing is COLLECTIVE under jax.distributed: every
      # process must call save (it synchronizes internally and writes the
      # replicated arrays from the primary host only) — a chief-only call
      # deadlocks on Orbax's barrier. This is the JAX-native form of the
      # reference's is_chief checkpoint gating (train.py:544).
      if cfg.bn_recalibration_batches > 0 and cfg.fine_tune_batch_norm:
        # Refresh BN moving stats on RAW batches before saving: the
        # training EMA tracks the last ~1/(1-momentum) AUGMENTED batches,
        # a different activation distribution than clean eval images
        # (trainer.recalibrate_batch_stats docstring; root cause of the
        # round-4 tracked AR collapse). A dedicated loader keeps the
        # training stream untouched so chunk resume stays deterministic.
        recal_loader = DataLoader(
            dataset, batch_size=local_batch, shuffle=True, repeat=True,
            num_workers=cfg.num_pipeline_workers, seed=10_000 + steps_done)
        recal_iter = iter(recal_loader)

        def recal_batch():
          b = next(recal_iter)
          return {k: v for k, v in b.items() if k == common.IMAGE}

        state = trainer.recalibrate_batch_stats(
            cfg, num_objs, state, recal_batch,
            cfg.bn_recalibration_batches)
        recal_iter.close()  # -> generator finally -> worker stop event
        if chief:
          log.info('Recalibrated BN stats on %d raw batches',
                   cfg.bn_recalibration_batches)
      checkpoints.save_checkpoint(ckpt_dir, state,
                                  cfg.max_checkpoints_to_keep)
      if chief:
        log.info('Saved checkpoint at step %d', steps_done)

  if writer is not None:
    writer.close()
  if dist.process_count() > 1:
    # Exit together: a fast process leaving early trips the distributed
    # runtime's shutdown barrier while slower ones still run.
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices('epos_tpu_train_end')
  log.info('Training complete at step %d.', steps_done)


if __name__ == '__main__':
  main()
