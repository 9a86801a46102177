import numpy as np
import jax
import jax.numpy as jnp
import pytest

from epos_tpu import common
from epos_tpu.config import Config
from epos_tpu.parallel import mesh as mesh_lib
from epos_tpu.train import schedules, trainer

NUM_OBJS = 2
NUM_FRAGS = 4
H = W = 32


def micro_cfg(**kw):
  cfg = Config(num_frags=NUM_FRAGS, model_variant='xception_micro',
               atrous_rates=[2, 4], compute_dtype='float32',
               train_crop_size=[W, H], fine_tune_batch_norm=True)
  for k, v in kw.items():
    setattr(cfg, k, v)
  return cfg


def make_batch(batch_size, oh, ow, seed=0):
  r = np.random.default_rng(seed)
  obj_label = r.integers(0, NUM_OBJS + 1, size=(batch_size, oh, ow))
  return {
      common.IMAGE: jnp.asarray(
          r.uniform(0, 255, (batch_size, H, W, 3)), jnp.float32),
      common.GT_OBJ_LABEL: jnp.asarray(obj_label),
      common.GT_FRAG_LABEL: jnp.asarray(
          r.integers(0, NUM_FRAGS, (batch_size, oh, ow, 1))),
      common.GT_FRAG_LOC: jnp.asarray(
          r.normal(size=(batch_size, oh, ow, 1, 3)), jnp.float32),
      common.GT_FRAG_WEIGHT: jnp.ones((batch_size, oh, ow, 1), jnp.float32),
  }


def test_schedules():
  s = schedules.model_learning_rate(
      'poly', base_learning_rate=1e-4, train_steps=100, learning_power=0.9,
      slow_start_step=10, slow_start_learning_rate=1e-6)
  assert float(s(0)) == pytest.approx(1e-6)
  assert float(s(50)) == pytest.approx(1e-4 * 0.5 ** 0.9, rel=1e-5)
  assert float(s(100)) == pytest.approx(0.0, abs=1e-10)
  st = schedules.model_learning_rate(
      'step', base_learning_rate=1e-2, learning_rate_decay_step=10,
      learning_rate_decay_factor=0.1)
  assert float(st(0)) == pytest.approx(1e-2)
  assert float(st(25)) == pytest.approx(1e-4, rel=1e-5)


def test_gradient_multipliers():
  params = {
      'xception_micro': {'conv': {'kernel': jnp.zeros(1),
                                  'bias': jnp.zeros(1)}},
      'logits/pred_obj_conf': {'kernel': jnp.zeros(1), 'bias': jnp.zeros(1)},
  }
  m = trainer.gradient_multipliers(params, last_layer_multiplier=10.0)
  assert m['xception_micro']['conv']['kernel'] == 1.0
  assert m['xception_micro']['conv']['bias'] == 2.0
  assert m['logits/pred_obj_conf']['kernel'] == 10.0
  assert m['logits/pred_obj_conf']['bias'] == 20.0


def test_freeze_mask():
  params = {'backbone': {'kernel': jnp.zeros(1)},
            'logits': {'kernel': jnp.zeros(1)}}
  mask = trainer.freeze_mask(params, ['backbone.*'])
  assert mask['backbone']['kernel'] is False
  assert mask['logits']['kernel'] is True


def test_train_step_reduces_loss_single_device():
  cfg = micro_cfg()
  rng = jax.random.PRNGKey(0)
  state = trainer.create_train_state(
      cfg, NUM_OBJS, rng, jnp.zeros((1, H, W, 3)))
  oh = ow = 8  # 32 / stride 4.
  batch = make_batch(1, oh, ow)
  cfg.base_learning_rate = 1e-2
  step = trainer.make_jitted_train_step(cfg, NUM_OBJS)
  losses = []
  for i in range(8):
    state, metrics = step(state, batch, rng)
    losses.append(float(metrics['total_loss']))
  assert losses[-1] < losses[0]
  assert int(state.step) == 8
  assert np.isfinite(losses).all()


def test_train_step_sharded_8dev_mesh():
  """DP over a virtual 8-device CPU mesh (SURVEY.md §2.5)."""
  assert len(jax.devices()) == 8
  mesh = mesh_lib.create_mesh()
  cfg = micro_cfg()
  rng = jax.random.PRNGKey(0)
  state = trainer.create_train_state(
      cfg, NUM_OBJS, rng, jnp.zeros((1, H, W, 3)))
  batch = make_batch(8, 8, 8)
  batch = mesh_lib.shard_batch(batch, mesh)
  step = trainer.make_jitted_train_step(cfg, NUM_OBJS, mesh)
  state, metrics = step(state, batch, rng)
  assert np.isfinite(float(metrics['total_loss']))
  # Params replicated after the step.
  p = jax.tree_util.tree_leaves(state.params)[0]
  assert p.sharding.is_fully_replicated


def test_sharded_matches_single_device_grads():
  """The mesh step must equal the single-device step on the same batch."""
  mesh = mesh_lib.create_mesh()
  cfg = micro_cfg(fine_tune_batch_norm=False)  # BN stats differ per shard.
  rng = jax.random.PRNGKey(0)
  state1 = trainer.create_train_state(
      cfg, NUM_OBJS, rng, jnp.zeros((1, H, W, 3)))
  # Deep-copy: the jitted steps donate their input state.
  state2 = jax.tree_util.tree_map(jnp.copy, state1)
  batch = make_batch(8, 8, 8)

  step1 = trainer.make_jitted_train_step(cfg, NUM_OBJS)
  step8 = trainer.make_jitted_train_step(cfg, NUM_OBJS, mesh)
  state1, m1 = step1(state1, batch, rng)
  state2, m2 = step8(state2, mesh_lib.shard_batch(batch, mesh), rng)
  np.testing.assert_allclose(
      float(m1['total_loss']), float(m2['total_loss']), rtol=1e-5)
  l1 = jax.tree_util.tree_leaves(state1.params)
  l2 = jax.tree_util.tree_leaves(state2.params)
  for a, b in zip(l1, l2):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_train_step_image_pyramid_per_scale_losses():
  """With an image pyramid the total loss is a SUM over per-scale losses
  plus the merged logits (reference loss.py:124 iterates scales_to_logits
  incl. 'logits_%.2f' entries and MERGED_LOGITS_SCOPE)."""
  rng = jax.random.PRNGKey(0)
  oh = ow = 8
  batch = make_batch(1, oh, ow)

  cfg1 = micro_cfg()
  state1 = trainer.create_train_state(
      cfg1, NUM_OBJS, rng, jnp.zeros((1, H, W, 3)))
  _, m1 = trainer.make_jitted_train_step(cfg1, NUM_OBJS)(state1, batch, rng)

  cfg2 = micro_cfg(image_pyramid=[1.0, 0.5])
  state2 = trainer.create_train_state(
      cfg2, NUM_OBJS, rng, jnp.zeros((1, H, W, 3)))
  _, m2 = trainer.make_jitted_train_step(cfg2, NUM_OBJS)(state2, batch, rng)

  # 3 loss terms (scale 1.0, scale 0.5, merged) vs 1: clearly larger, and
  # finite.
  assert np.isfinite(float(m2['total_loss']))
  assert float(m2['total_loss']) > 1.5 * float(m1['total_loss'])


def test_train_step_upsample_logits():
  """--upsample_logits: GT maps at input resolution, logits bilinearly
  upsampled inside the loss (reference loss.py:129-133, train.py:441-446)."""
  cfg = micro_cfg(upsample_logits=True)
  rng = jax.random.PRNGKey(0)
  state = trainer.create_train_state(
      cfg, NUM_OBJS, rng, jnp.zeros((1, H, W, 3)))
  batch = make_batch(1, H, W)  # GT at stride 1 == input resolution.
  step = trainer.make_jitted_train_step(cfg, NUM_OBJS)
  state, metrics = step(state, batch, rng)
  assert np.isfinite(float(metrics['total_loss']))
  assert int(state.step) == 1


def test_train_step_tensor_parallel_heads():
  """[data=4, model=2] mesh: the EPOS head kernels are output-channel
  sharded over 'model' (SURVEY §2.5 TP row / §5 f256 memory axis) and the
  step produces the same loss as the replicated-parameter path."""
  cfg = micro_cfg()
  rng = jax.random.PRNGKey(0)
  oh = ow = 8
  batch = make_batch(8, oh, ow)  # divisible by data=8 and data=4

  state = trainer.create_train_state(
      cfg, NUM_OBJS, rng, jnp.zeros((1, H, W, 3)))
  mesh_dp = mesh_lib.create_mesh([8, 1])
  step_dp = trainer.make_jitted_train_step(cfg, NUM_OBJS, mesh_dp)
  _, m_dp = step_dp(state, mesh_lib.shard_batch(batch, mesh_dp), rng)
  loss_dp = float(m_dp['total_loss'])

  state2 = trainer.create_train_state(
      cfg, NUM_OBJS, rng, jnp.zeros((1, H, W, 3)))
  mesh_tp = mesh_lib.create_mesh([4, 2])
  step_tp = trainer.make_jitted_train_step(cfg, NUM_OBJS, mesh_tp,
                                           state_template=state2)
  batch_tp = mesh_lib.shard_batch(batch, mesh_tp)
  state2, m_tp = step_tp(state2, batch_tp, rng)
  loss_tp = float(m_tp['total_loss'])
  assert np.isfinite(loss_tp)
  np.testing.assert_allclose(loss_tp, loss_dp, rtol=2e-4)
  # The head kernel really is sharded over the model axis.
  from jax.sharding import NamedSharding
  head = state2.params['logits/pred_frag_conf']['kernel']
  assert isinstance(head.sharding, NamedSharding)
  assert head.sharding.spec[-1] == mesh_lib.MODEL_AXIS
  # A second step runs on the sharded state (donation + resharding OK).
  state2, m2 = step_tp(state2, batch_tp, rng)
  assert np.isfinite(float(m2['total_loss']))

def test_bn_recalibration_tracks_target_distribution():
  """trainer.recalibrate_batch_stats: moving stats refreshed on the target
  distribution converge to that distribution's batch moments and away from
  stats seeded on a shifted (augmented-like) distribution — the property
  whose violation collapsed the round-4 tracked run."""
  cfg = micro_cfg(bn_momentum=0.9)
  rng = jax.random.PRNGKey(0)
  state = trainer.create_train_state(
      cfg, NUM_OBJS, rng, jnp.zeros((2, H, W, 3)))

  # CONSTANT batches make the convergence target exact: with a fixed input
  # the EMA must land on that batch's moments (up to dropout noise), so the
  # assertion is not polluted by inter-batch sampling variance (random
  # per-batch moments of deep activations vary enough to mask the shift).
  r = np.random.default_rng(3)
  shifted = {common.IMAGE: jnp.asarray(
      150.0 + 40.0 * r.normal(size=(2, H, W, 3)), jnp.float32)}
  clean = {common.IMAGE: jnp.asarray(
      r.uniform(0, 255, (2, H, W, 3)), jnp.float32)}

  def flat(stats):
    leaves = jax.tree_util.tree_leaves(stats)
    return np.concatenate([np.asarray(x).ravel() for x in leaves])

  # Stats as training would leave them: an EMA over the SHIFTED stream.
  it_s = iter([shifted] * 8)
  seeded = trainer.recalibrate_batch_stats(
      cfg, NUM_OBJS, state, lambda: next(it_s), num_batches=8, momentum=0.5)

  # Ground truth: pure moments of the clean batch (momentum 0 == keep only
  # the latest batch).
  it1 = iter([clean])
  true = flat(trainer.recalibrate_batch_stats(
      cfg, NUM_OBJS, seeded, lambda: next(it1), num_batches=1,
      momentum=0.0).batch_stats)

  it_c = iter([clean] * 7)
  recal = trainer.recalibrate_batch_stats(
      cfg, NUM_OBJS, seeded, lambda: next(it_c), num_batches=7,
      momentum=0.5)

  d_seeded = np.linalg.norm(flat(seeded.batch_stats) - true)
  d_recal = np.linalg.norm(flat(recal.batch_stats) - true)
  # Recalibration moves the stats decisively onto the target moments.
  assert d_recal < d_seeded / 3.0, (d_seeded, d_recal)
