"""ResNet-v1 (and beta variant) backbones in Flax with atrous control.

TPU-native re-design of epos_lib/net_resnet_v1_beta.py. Beta variant replaces
the 7x7 root conv with three 3x3 convs (net_resnet_v1_beta.py:96-112).
BN decay 0.997 / epsilon 1e-5 per slim resnet_arg_scope.
"""

import dataclasses
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from epos_tpu.models.layers import ConvBN, same_pad

BN_EPS = 1e-5
BN_MOMENTUM = 0.997

# Decoder skip endpoint (epos_lib/feature.py:35-52): raw conv3 output (after
# BN, before the residual add) of block1/unit_2.
DECODER_ENDPOINT = {
    'resnet_v1_50': 'block1/unit_2/bottleneck_v1/conv3',
    'resnet_v1_50_beta': 'block1/unit_2/bottleneck_v1/conv3',
    'resnet_v1_101': 'block1/unit_2/bottleneck_v1/conv3',
    'resnet_v1_101_beta': 'block1/unit_2/bottleneck_v1/conv3',
}


@dataclasses.dataclass(frozen=True)
class UnitSpec:
  depth: int
  depth_bottleneck: int
  stride: int
  unit_rate: int = 1


def _resnet_blocks(num_units_block3, multi_grid):
  """Block specs for resnet_v1_{50,101}: stride in the LAST unit of each block
  (net_resnet_v1_beta.py:207-231), block4 dilated by multi_grid."""
  def block(base_depth, num_units, stride):
    return [UnitSpec(base_depth * 4, base_depth, 1)] * (num_units - 1) + \
           [UnitSpec(base_depth * 4, base_depth, stride)]
  return [
      ('block1', block(64, 3, 2)),
      ('block2', block(128, 4, 2)),
      ('block3', block(256, num_units_block3, 2)),
      ('block4', [UnitSpec(2048, 512, 1, r) for r in multi_grid]),
  ]


class Bottleneck(nn.Module):
  """ResNet v1 bottleneck unit (net_resnet_v1_beta.py:39-94)."""
  depth: int
  depth_bottleneck: int
  stride: int
  rate: int
  dtype: jnp.dtype = jnp.float32
  bn_momentum: float = BN_MOMENTUM

  @nn.compact
  def __call__(self, x, train=False, capture=None, capture_prefix=''):
    bnm = self.bn_momentum
    depth_in = x.shape[-1]
    if self.depth == depth_in:
      # Subsample identity shortcut via strided slice (resnet_utils.subsample).
      shortcut = x[:, ::self.stride, ::self.stride, :] \
          if self.stride > 1 else x
    else:
      shortcut = ConvBN(self.depth, 1, stride=self.stride, act=False,
                        bn_momentum=bnm, bn_epsilon=BN_EPS,
                        dtype=self.dtype, name='shortcut')(x, train)
    residual = ConvBN(self.depth_bottleneck, 1, act=True,
                      bn_momentum=bnm, bn_epsilon=BN_EPS,
                      dtype=self.dtype, name='conv1')(x, train)
    residual = ConvBN(self.depth_bottleneck, 3, stride=self.stride,
                      rate=self.rate, use_explicit_padding=True, act=True,
                      bn_momentum=bnm, bn_epsilon=BN_EPS,
                      dtype=self.dtype, name='conv2')(residual, train)
    residual = ConvBN(self.depth, 1, act=False, bn_momentum=bnm,
                      bn_epsilon=BN_EPS, dtype=self.dtype,
                      name='conv3')(residual, train)
    if capture is not None:
      capture[capture_prefix + 'conv3'] = residual
    return nn.relu(shortcut + residual)


class ResNetV1(nn.Module):
  """ResNet-v1 feature extractor with output-stride control."""
  variant: str = 'resnet_v1_50_beta'
  output_stride: int = 8
  multi_grid: Optional[Sequence[int]] = None
  dtype: jnp.dtype = jnp.float32
  # Overridable BN decay (cfg.bn_momentum); slim default 0.997 otherwise.
  bn_momentum: float = BN_MOMENTUM

  @nn.compact
  def __call__(self, x, train=False):
    bnm = self.bn_momentum
    mg = tuple(self.multi_grid) if self.multi_grid else (1, 1, 1)
    n_block3 = 23 if '101' in self.variant else 6
    blocks = _resnet_blocks(n_block3, mg)
    beta = self.variant.endswith('_beta')

    endpoints = {}
    if beta:
      # Three 3x3 root convs (net_resnet_v1_beta.py:106-110).
      x = ConvBN(64, 3, stride=2, use_explicit_padding=True, act=True,
                 bn_momentum=bnm, bn_epsilon=BN_EPS, dtype=self.dtype,
                 name='conv1_1')(x, train)
      x = ConvBN(64, 3, act=True, bn_momentum=bnm, bn_epsilon=BN_EPS,
                 dtype=self.dtype, name='conv1_2')(x, train)
      x = ConvBN(128, 3, act=True, bn_momentum=bnm, bn_epsilon=BN_EPS,
                 dtype=self.dtype, name='conv1_3')(x, train)
    else:
      x = ConvBN(64, 7, stride=2, use_explicit_padding=True, act=True,
                 bn_momentum=bnm, bn_epsilon=BN_EPS, dtype=self.dtype,
                 name='conv1')(x, train)
    # Max pool 3x3 stride 2 SAME (net_resnet_v1_beta.py:190).
    pads = same_pad(3)
    x = nn.max_pool(x, (3, 3), strides=(2, 2),
                    padding=[tuple(p) for p in pads])

    # Root consumed a factor of 4 (net_resnet_v1_beta.py:186-188).
    target = self.output_stride // 4 if self.output_stride else None
    current_stride, rate = 1, 1
    for block_name, units in blocks:
      for i, unit in enumerate(units):
        prefix = f'{block_name}/unit_{i+1}/bottleneck_v1/'
        if target is not None and current_stride == target:
          x = Bottleneck(unit.depth, unit.depth_bottleneck, 1,
                         rate * unit.unit_rate, dtype=self.dtype,
                         bn_momentum=bnm, name=prefix[:-1])(
                             x, train, capture=endpoints,
                             capture_prefix=prefix)
          rate *= unit.stride
        else:
          x = Bottleneck(unit.depth, unit.depth_bottleneck, unit.stride,
                         unit.unit_rate, dtype=self.dtype,
                         bn_momentum=bnm, name=prefix[:-1])(
                             x, train, capture=endpoints,
                             capture_prefix=prefix)
          current_stride *= unit.stride
      endpoints[block_name] = x
    if target is not None and current_stride != target:
      raise ValueError('The target output_stride cannot be reached.')
    return x, endpoints
