"""TF1-slim checkpoint -> Flax parameter conversion.

The reference ships TF1 checkpoints (README.md:168-191) trained with slim
variable naming. This module maps every EPOS-TPU Flax parameter path to its
TF1 variable name and converts layouts:

- conv kernels: same HWIO layout, no transpose.
- depthwise kernels: TF [H, W, C, 1] -> Flax feature_group_count layout
  [H, W, 1, C].
- BatchNorm: gamma/beta/moving_mean/moving_variance -> scale/bias/mean/var.

Reading .ckpt files requires TensorFlow, which is not a dependency: when TF
is importable we read the checkpoint directly; otherwise accept an .npz/dict
of {tf_name: array} prepared offline (tools/export instructions in the
docstring of load_tf1_weights).

Name-scope parity references: epos_lib/feature.py:144-155 (name_scope map),
epos_lib/model.py:18-26 (ASPP/decoder/logits scopes),
net_xception.py / net_resnet_v1_beta.py (backbone variable scopes).
"""

import re

import jax
import numpy as np

# TF name-scope for each variant (feature.py:144-155) — beta resnets share
# the non-beta checkpoint scope.
NAME_SCOPE = {
    'xception_41': 'xception_41',
    'xception_65': 'xception_65',
    'xception_71': 'xception_71',
    'resnet_v1_50': 'resnet_v1_50',
    'resnet_v1_50_beta': 'resnet_v1_50',
    'resnet_v1_101': 'resnet_v1_101',
    'resnet_v1_101_beta': 'resnet_v1_101',
    'mobilenet_v2': 'MobilenetV2',
}

_BN_MAP = {'scale': 'gamma', 'bias': 'beta',
           'mean': 'moving_mean', 'var': 'moving_variance'}


def flax_path_to_tf1(path, model_variant):
  """Maps a '/'-joined Flax param path to the TF1 variable name."""
  p = path
  # Top-level backbone scope rename (variant -> checkpoint name scope).
  scope = NAME_SCOPE.get(model_variant, model_variant)
  if p.startswith(model_variant + '/'):
    p = scope + p[len(model_variant):]

  # BatchNorm leaves first (before the generic /bias -> /biases rule).
  def bn_leaf(m):
    return '/BatchNorm/' + _BN_MAP[m.group(2)]
  p = re.sub(r'(/bn)/(scale|bias|mean|var)$', bn_leaf, p)

  # SplitSeparableConv (ASPP / decoder): child modules 'depthwise' /
  # 'pointwise' flatten into '<scope>_depthwise' / '<scope>_pointwise'.
  p = re.sub(r'([^/]+)/depthwise/depthwise/kernel$',
             r'\1_depthwise/depthwise_weights', p)
  p = re.sub(r'([^/]+)/depthwise/BatchNorm/(\w+)$',
             r'\1_depthwise/BatchNorm/\2', p)
  p = re.sub(r'([^/]+)/pointwise/conv/kernel$', r'\1_pointwise/weights', p)
  p = re.sub(r'([^/]+)/pointwise/conv/bias$', r'\1_pointwise/biases', p)
  p = re.sub(r'([^/]+)/pointwise/BatchNorm/(\w+)$',
             r'\1_pointwise/BatchNorm/\2', p)

  # Xception-module separable convs: '<x>_depthwise/depthwise/kernel'.
  p = re.sub(r'(_depthwise)/depthwise/kernel$', r'\1/depthwise_weights', p)

  # Generic ConvBN children.
  p = re.sub(r'/conv/kernel$', '/weights', p)
  p = re.sub(r'/conv/bias$', '/biases', p)

  # Plain nn.Conv heads (logits/<output>).
  p = re.sub(r'/kernel$', '/weights', p)
  p = re.sub(r'/bias$', '/biases', p)
  return p


def _convert_value(flax_path, value, tf_value):
  """Layout conversion for one variable."""
  tf_value = np.asarray(tf_value)
  if flax_path.endswith('depthwise/kernel'):
    # TF depthwise [H, W, C, 1] -> Flax grouped conv [H, W, 1, C].
    return np.transpose(tf_value, (0, 1, 3, 2)).astype(value.dtype)
  if tf_value.shape != value.shape:
    raise ValueError(
        f'Shape mismatch for {flax_path}: flax {value.shape} '
        f'vs tf {tf_value.shape}')
  return tf_value.astype(value.dtype)


def convert_tf1_weights(params, batch_stats, tf_vars, model_variant,
                        strict=True):
  """Fills a Flax (params, batch_stats) tree from {tf_name: ndarray}.

  Follows the warm-start contract (train_utils.py:31-81): missing variables
  raise in strict mode, otherwise keep their fresh initialization.
  Returns (params, batch_stats, report dict).
  """
  converted, missing = [], []

  def make_tree(tree, leaf_kind):
    def visit(path, value):
      path_str = '/'.join(str(getattr(k, 'key', k)) for k in path)
      if leaf_kind == 'stats':
        # batch_stats leaves are mean/var.
        pass
      tf_name = flax_path_to_tf1(path_str, model_variant)
      if tf_name in tf_vars:
        converted.append(path_str)
        return jax.numpy.asarray(
            _convert_value(path_str, np.asarray(value), tf_vars[tf_name]))
      missing.append((path_str, tf_name))
      return value
    return jax.tree_util.tree_map_with_path(visit, tree)

  new_params = make_tree(params, 'params')
  new_stats = make_tree(batch_stats, 'stats')
  if strict and missing:
    raise KeyError(
        f'{len(missing)} variables not found in the TF checkpoint, e.g. '
        f'{missing[:5]}')
  return new_params, new_stats, {
      'converted': len(converted), 'missing': missing}


def load_tf1_weights(path):
  """Loads {name: array} from a TF1 checkpoint or an .npz export.

  Without TensorFlow in this environment, export on any machine that has it:
    import tensorflow as tf, numpy as np
    r = tf.train.load_checkpoint('model.ckpt-2000000')
    np.savez('weights.npz', **{k: r.get_tensor(k)
                               for k in r.get_variable_to_shape_map()})
  """
  if path.endswith('.npz'):
    with np.load(path) as z:
      return {k: z[k] for k in z.files}
  try:
    import tensorflow as tf  # Gated: not a dependency of this image.
  except ImportError as e:
    raise ImportError(
        'Reading TF1 .ckpt requires tensorflow; export to .npz instead '
        '(see load_tf1_weights docstring).') from e
  reader = tf.train.load_checkpoint(path)
  return {k: reader.get_tensor(k)
          for k in reader.get_variable_to_shape_map()}
