import jax
import jax.numpy as jnp
import numpy as np
import pytest

from epos_tpu import common
from epos_tpu.config import Config
from epos_tpu.models import epos_model
from epos_tpu.models.layers import resize_bilinear, scale_dimension

NUM_OBJS = 2
NUM_FRAGS = 4


def tiny_cfg(**kw):
  cfg = Config(num_frags=NUM_FRAGS, atrous_rates=[2, 4, 6],
               compute_dtype='float32')
  for k, v in kw.items():
    setattr(cfg, k, v)
  return cfg


def init_and_run(cfg, h=64, w=64, train=False):
  model = epos_model.build_model(cfg, NUM_OBJS)
  x = jnp.zeros((1, h, w, 3), jnp.float32)
  variables = model.init(jax.random.PRNGKey(0), x, train=False)
  return model, variables, x


def test_resize_bilinear_align_corners():
  # align_corners=True: corners map exactly.
  x = jnp.array([[0.0, 1.0], [2.0, 3.0]])[None, :, :, None]
  out = resize_bilinear(x, (3, 3))[0, :, :, 0]
  expected = np.array([[0, 0.5, 1], [1, 1.5, 2], [2, 2.5, 3]])
  np.testing.assert_allclose(np.asarray(out), expected, atol=1e-6)


def test_scale_dimension():
  # Reference: model.py:100-114.
  assert scale_dimension(480, 0.25) == 120
  assert scale_dimension(640, 0.25) == 160
  assert scale_dimension(480, 0.125) == 60
  assert scale_dimension(65, 0.5) == 33


@pytest.mark.parametrize('variant', ['xception_65', 'resnet_v1_50_beta'])
def test_model_shapes(variant):
  cfg = tiny_cfg(model_variant=variant)
  model, variables, x = init_and_run(cfg)
  logits = model.apply(variables, x, train=False)
  # Output at decoder stride 4 of 64x64 -> scale_dimension(64, 0.25) = 16.
  oh = ow = scale_dimension(64, 0.25)
  assert logits[common.PRED_OBJ_CONF].shape == (1, oh, ow, NUM_OBJS + 1)
  assert logits[common.PRED_FRAG_CONF].shape == (
      1, oh, ow, NUM_OBJS * NUM_FRAGS)
  assert logits[common.PRED_FRAG_LOC].shape == (
      1, oh, ow, NUM_OBJS * NUM_FRAGS * 3)
  for v in logits.values():
    assert v.dtype == jnp.float32
    assert np.all(np.isfinite(np.asarray(v)))


def test_predict_dict():
  cfg = tiny_cfg()
  model, variables, x = init_and_run(cfg)
  preds = epos_model.predict(model, variables, x)
  oh = ow = scale_dimension(64, 0.25)
  assert preds[common.PRED_OBJ_CONF].shape == (1, oh, ow, NUM_OBJS + 1)
  assert preds[common.PRED_OBJ_LABEL].shape == (1, oh, ow)
  assert preds[common.PRED_FRAG_CONF].shape == (
      1, oh, ow, NUM_OBJS, NUM_FRAGS)
  assert preds[common.PRED_FRAG_LOC].shape == (
      1, oh, ow, NUM_OBJS, NUM_FRAGS, 3)
  # Softmax outputs sum to 1.
  np.testing.assert_allclose(
      np.asarray(preds[common.PRED_OBJ_CONF].sum(-1)), 1.0, atol=1e-5)
  np.testing.assert_allclose(
      np.asarray(preds[common.PRED_FRAG_CONF].sum(-1)), 1.0, atol=1e-5)


def test_predict_jits():
  cfg = tiny_cfg()
  model, variables, x = init_and_run(cfg)
  fn = jax.jit(lambda v, im: epos_model.predict(model, v, im))
  preds = fn(variables, x)
  assert preds[common.PRED_OBJ_LABEL].shape[1] == scale_dimension(64, 0.25)


def test_multi_scale_merge():
  cfg = tiny_cfg(image_pyramid=[1.0, 0.5])
  model, variables, x = init_and_run(cfg)
  logits, _ = epos_model.multi_scale_logits(
      model, variables, x, image_pyramid=[1.0, 0.5], merge_method='max')
  oh = scale_dimension(64, 1.0 / 4)
  assert logits[common.PRED_OBJ_CONF].shape == (1, oh, oh, NUM_OBJS + 1)
  # Max merge >= each component: recompute single scales.
  l1, _ = epos_model.multi_scale_logits(model, variables, x,
                                        image_pyramid=[1.0])
  assert np.all(np.asarray(logits[common.PRED_OBJ_CONF]) >=
                np.asarray(l1[common.PRED_OBJ_CONF]) - 1e-5)


def test_train_mode_updates_batch_stats():
  cfg = tiny_cfg()
  model, variables, x = init_and_run(cfg)
  rng = jax.random.PRNGKey(1)
  x2 = jax.random.normal(rng, (2, 64, 64, 3)) * 50 + 128
  out, new_state = model.apply(
      variables, x2, train=True, rngs={'dropout': rng},
      mutable=['batch_stats'])
  old = jax.tree_util.tree_leaves(variables['batch_stats'])
  new = jax.tree_util.tree_leaves(new_state['batch_stats'])
  assert any(not np.allclose(o, n) for o, n in zip(old, new))


def test_bfloat16_compute():
  cfg = tiny_cfg()
  cfg.compute_dtype = 'bfloat16'
  model, variables, x = init_and_run(cfg)
  logits = model.apply(variables, x, train=False)
  # Heads cast to f32; params stored in f32.
  assert logits[common.PRED_OBJ_CONF].dtype == jnp.float32
  p = jax.tree_util.tree_leaves(variables['params'])[0]
  assert p.dtype == jnp.float32


def test_encoder_stride_16():
  cfg = tiny_cfg(encoder_output_stride=16, atrous_rates=[6, 12, 18])
  model, variables, x = init_and_run(cfg)
  logits = model.apply(variables, x, train=False)
  # Decoder still brings it to stride 4.
  assert logits[common.PRED_OBJ_CONF].shape[1] == scale_dimension(64, 0.25)


def test_mobilenet_v2_variant():
  cfg = tiny_cfg(model_variant='mobilenet_v2')
  model, variables, x = init_and_run(cfg)
  logits = model.apply(variables, x, train=False)
  oh = scale_dimension(64, 0.25)
  assert logits[common.PRED_OBJ_CONF].shape == (1, oh, oh, NUM_OBJS + 1)
  assert np.all(np.isfinite(np.asarray(logits[common.PRED_OBJ_CONF])))


def test_mobilenet_depth_multiplier():
  cfg = tiny_cfg(model_variant='mobilenet_v2', depth_multiplier=0.5,
                 divisible_by=8)
  model, variables, x = init_and_run(cfg)
  logits = model.apply(variables, x, train=False)
  assert logits[common.PRED_FRAG_LOC].shape[-1] == NUM_OBJS * NUM_FRAGS * 3


def test_no_aspp_branch_logits_heads():
  """aspp_with_batch_norm=False: the ASPP module is skipped and each head
  grows one conv branch per atrous rate (kernel logits_kernel_size),
  sum-merged, with scopes 'logits/<out>', 'logits/<out>_1', ...
  (reference model.py:187-189, 396-458)."""
  cfg = tiny_cfg(model_variant='xception_micro', aspp_with_batch_norm=False,
                 logits_kernel_size=3)
  model, variables, x = init_and_run(cfg)
  params = variables['params']
  # No ASPP scopes.
  for scope in ('aspp0', 'aspp1', 'image_pooling', 'concat_projection'):
    assert scope not in params, scope
  # Per-rate head branches with the reference scope suffixes.
  for suffix in ('', '_1', '_2'):
    key = f'logits/{common.PRED_OBJ_CONF}{suffix}'
    assert key in params, sorted(k for k in params if k.startswith('logits'))
    assert params[key]['kernel'].shape[:2] == (3, 3)
  out = model.apply(variables, x, train=False)
  assert out[common.PRED_OBJ_CONF].shape[-1] == NUM_OBJS + 1


def test_logits_kernel_size_validated_with_aspp():
  """Reference model.py:421-424 raises when kernel != 1 with BN-ASPP."""
  cfg = tiny_cfg(model_variant='xception_micro', logits_kernel_size=3)
  with pytest.raises(ValueError, match='Kernel size must be 1'):
    init_and_run(cfg)


def test_bounded_activation():
  """use_bounded_activation: relu6 activations bound every feature map;
  the forward pass runs and differs from the unbounded model
  (net_xception.py:264-319, model.py:200-207)."""
  cfg = tiny_cfg(model_variant='xception_micro')
  cfg_b = tiny_cfg(model_variant='xception_micro',
                   use_bounded_activation=True)
  model, variables, _ = init_and_run(cfg)
  model_b = epos_model.build_model(cfg_b, NUM_OBJS)
  r = np.random.default_rng(0)
  x = jnp.asarray(r.uniform(0, 255, (1, 64, 64, 3)), jnp.float32)
  # Same params apply to both graphs (bounded changes activations only).
  out = model.apply(variables, x, train=False)
  out_b = model_b.apply(variables, x, train=False)
  a = np.asarray(out[common.PRED_OBJ_CONF])
  b = np.asarray(out_b[common.PRED_OBJ_CONF])
  assert np.all(np.isfinite(b))
  assert not np.allclose(a, b)


def test_bounded_activation_rejected_for_resnet():
  cfg = tiny_cfg(model_variant='resnet_v1_50', use_bounded_activation=True)
  with pytest.raises(ValueError, match='bounded'):
    init_and_run(cfg)
