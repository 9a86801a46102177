"""Tests for the TF1-slim -> Flax name mapping and weight conversion."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from epos_tpu.config import Config
from epos_tpu.models import epos_model
from epos_tpu.utils import tf1_convert


def test_name_mapping_examples():
  f = lambda p: tf1_convert.flax_path_to_tf1(p, 'xception_65')
  # Backbone root stem.
  assert f('xception_65/entry_flow/conv1_1/conv/kernel') == \
      'xception_65/entry_flow/conv1_1/weights'
  assert f('xception_65/entry_flow/conv1_1/bn/scale') == \
      'xception_65/entry_flow/conv1_1/BatchNorm/gamma'
  # Xception module separable convs.
  base = ('xception_65/entry_flow/block1/unit_1/xception_module/'
          'separable_conv1_depthwise')
  assert f(base + '/depthwise/kernel') == base + '/depthwise_weights'
  assert f(base + '/bn/mean') == base + '/BatchNorm/moving_mean'
  pw = base.replace('_depthwise', '_pointwise')
  assert f(pw + '/conv/kernel') == pw + '/weights'
  # Shortcut.
  assert f('xception_65/entry_flow/block1/unit_1/xception_module/shortcut/'
           'conv/kernel') == \
      'xception_65/entry_flow/block1/unit_1/xception_module/shortcut/weights'
  # ASPP split separable conv.
  assert f('aspp1/depthwise/depthwise/kernel') == \
      'aspp1_depthwise/depthwise_weights'
  assert f('aspp1/depthwise/bn/var') == \
      'aspp1_depthwise/BatchNorm/moving_variance'
  assert f('aspp1/pointwise/conv/kernel') == 'aspp1_pointwise/weights'
  # Decoder.
  assert f('decoder/feature_projection0/conv/kernel') == \
      'decoder/feature_projection0/weights'
  assert f('decoder/decoder_conv0/depthwise/depthwise/kernel') == \
      'decoder/decoder_conv0_depthwise/depthwise_weights'
  # Heads.
  assert f('logits/pred_obj_conf/kernel') == 'logits/pred_obj_conf/weights'
  assert f('logits/pred_obj_conf/bias') == 'logits/pred_obj_conf/biases'
  # Image pooling / concat projection.
  assert f('image_pooling/conv/kernel') == 'image_pooling/weights'
  assert f('concat_projection/bn/bias') == 'concat_projection/BatchNorm/beta'


def test_resnet_beta_scope():
  f = lambda p: tf1_convert.flax_path_to_tf1(p, 'resnet_v1_50_beta')
  # Beta variants load the non-beta checkpoint scope (feature.py:148-151).
  assert f('resnet_v1_50_beta/conv1_1/conv/kernel') == \
      'resnet_v1_50/conv1_1/weights'
  assert f('resnet_v1_50_beta/block1/unit_1/bottleneck_v1/conv2/bn/scale') \
      == 'resnet_v1_50/block1/unit_1/bottleneck_v1/conv2/BatchNorm/gamma'


@pytest.mark.parametrize('variant', ['xception_micro'])
def test_full_tree_roundtrip(variant):
  """Every parameter of a model maps to a TF name; converting synthetic TF
  values fills the whole tree (mapping completeness check)."""
  cfg = Config(num_frags=4, model_variant=variant, atrous_rates=[2, 4],
               compute_dtype='float32')
  model = epos_model.build_model(cfg, 2)
  variables = model.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 32, 32, 3)), train=False)
  params, stats = variables['params'], variables['batch_stats']

  # Build a synthetic TF checkpoint from the mapping itself.
  tf_vars = {}
  rng = np.random.default_rng(0)

  def collect(path, value):
    path_str = '/'.join(str(getattr(k, 'key', k)) for k in path)
    tf_name = tf1_convert.flax_path_to_tf1(path_str, variant)
    assert tf_name not in tf_vars, f'duplicate mapping {tf_name}'
    v = rng.normal(size=np.asarray(value).shape).astype(np.float32)
    if path_str.endswith('/var'):
      v = np.abs(v) + 0.1  # variances must be positive
    if path_str.endswith('depthwise/kernel'):
      v = np.transpose(v, (0, 1, 3, 2))  # store in TF layout
    tf_vars[tf_name] = v
    return value

  jax.tree_util.tree_map_with_path(collect, params)
  jax.tree_util.tree_map_with_path(collect, stats)

  new_params, new_stats, report = tf1_convert.convert_tf1_weights(
      params, stats, tf_vars, variant, strict=True)
  assert not report['missing']
  # All leaves replaced (and depthwise transposed back to flax layout).
  for (pa, a), (pb, b) in zip(
      jax.tree_util.tree_leaves_with_path(params),
      jax.tree_util.tree_leaves_with_path(new_params)):
    assert a.shape == b.shape
    assert not np.allclose(np.asarray(a), np.asarray(b))

  # Model still runs with converted weights.
  out = model.apply({'params': new_params, 'batch_stats': new_stats},
                    jnp.zeros((1, 32, 32, 3)), train=False)
  assert np.all(np.isfinite(np.asarray(out['pred_obj_conf'])))


def test_npz_loading(tmp_path):
  p = str(tmp_path / 'w.npz')
  np.savez(p, **{'a/weights': np.ones((3, 3))})
  out = tf1_convert.load_tf1_weights(p)
  assert 'a/weights' in out
