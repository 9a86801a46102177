"""MobileNet-v2 backbone in Flax with atrous output-stride control.

Mirror of the slim mobilenet_v2.mobilenet_base path the reference dispatches
to (epos_lib/feature.py:76-117, external/slim nets/mobilenet). Inverted
residual blocks with ReLU6, expansion 6, the standard V2_DEF layer table, a
`layer_N` endpoint naming scheme, and the `layer_4/depthwise_output` decoder
skip endpoint (epos_lib/feature.py:29-33). Supports depth_multiplier /
divisible_by (epos_lib/common.py:116-123).
"""

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from epos_tpu.models.layers import ConvBN, DepthwiseConvBN

BN_EPS = 1e-3
BN_MOMENTUM = 0.997

DECODER_ENDPOINT = {'mobilenet_v2': 'layer_4/depthwise_output'}

# (expansion, channels, stride) per inverted-residual layer; layer_1 is the
# stem conv, layer_18 the final 1x1 conv (V2_DEF).
_V2_BLOCKS = [
    (1, 16, 1),                                     # layer_2
    (6, 24, 2), (6, 24, 1),                         # layer_3..4
    (6, 32, 2), (6, 32, 1), (6, 32, 1),             # layer_5..7
    (6, 64, 2), (6, 64, 1), (6, 64, 1), (6, 64, 1),  # layer_8..11
    (6, 96, 1), (6, 96, 1), (6, 96, 1),             # layer_12..14
    (6, 160, 2), (6, 160, 1), (6, 160, 1),          # layer_15..17
    (6, 320, 1),                                    # layer_18 block
]


def make_divisible(v, divisor=8, min_value=None):
  if min_value is None:
    min_value = divisor
  new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
  if new_v < 0.9 * v:
    new_v += divisor
  return new_v


class InvertedResidual(nn.Module):
  expansion: int
  features: int
  stride: int
  rate: int
  dtype: jnp.dtype = jnp.float32
  bn_momentum: float = BN_MOMENTUM

  @nn.compact
  def __call__(self, x, train=False, capture=None, capture_prefix=''):
    bnm = self.bn_momentum
    c_in = x.shape[-1]
    h = x
    if self.expansion != 1:
      h = ConvBN(c_in * self.expansion, 1, act=False,
                 bn_momentum=bnm, bn_epsilon=BN_EPS,
                 dtype=self.dtype, name='expand')(h, train)
      h = jnp.minimum(nn.relu(h), 6.0)
    h = DepthwiseConvBN(kernel_size=3, stride=self.stride, rate=self.rate,
                        use_explicit_padding=False, act=False,
                        bn_momentum=bnm, bn_epsilon=BN_EPS,
                        dtype=self.dtype, name='depthwise')(h, train)
    h = jnp.minimum(nn.relu(h), 6.0)
    if capture is not None:
      capture[capture_prefix + 'depthwise_output'] = h
    h = ConvBN(self.features, 1, act=False, bn_momentum=bnm,
               bn_epsilon=BN_EPS, dtype=self.dtype, name='project')(h, train)
    if self.stride == 1 and c_in == self.features:
      h = h + x
    return h


class MobileNetV2(nn.Module):
  variant: str = 'mobilenet_v2'
  output_stride: int = 8
  multi_grid: Optional[Sequence[int]] = None  # Unused (parity with API).
  depth_multiplier: float = 1.0
  divisible_by: Optional[int] = None
  dtype: jnp.dtype = jnp.float32
  # Overridable BN decay (cfg.bn_momentum); slim default 0.997 otherwise.
  bn_momentum: float = BN_MOMENTUM

  @nn.compact
  def __call__(self, x, train=False):
    bnm = self.bn_momentum
    div = self.divisible_by
    if div is None:
      div = 8 if self.depth_multiplier == 1.0 else 1
    min_depth = 8 if self.depth_multiplier == 1.0 else 1

    def depth(c):
      return make_divisible(c * self.depth_multiplier, div, min_depth)

    endpoints = {}
    # Stem (layer_1): conv 3x3 stride 2, 32 channels.
    h = ConvBN(depth(32), 3, stride=2, act=False, bn_momentum=bnm,
               bn_epsilon=BN_EPS, dtype=self.dtype, name='layer_1')(x, train)
    h = jnp.minimum(nn.relu(h), 6.0)
    endpoints['layer_1'] = h

    current_stride, rate = 2, 1
    for i, (exp, c, stride) in enumerate(_V2_BLOCKS):
      name = f'layer_{i + 2}'
      if self.output_stride and current_stride == self.output_stride:
        h = InvertedResidual(exp, depth(c), 1, rate, dtype=self.dtype,
                             bn_momentum=bnm, name=name)(
                                 h, train, capture=endpoints,
                                 capture_prefix=name + '/')
        rate *= stride
      else:
        h = InvertedResidual(exp, depth(c), stride, 1, dtype=self.dtype,
                             bn_momentum=bnm, name=name)(
                                 h, train, capture=endpoints,
                                 capture_prefix=name + '/')
        current_stride *= stride
      endpoints[name] = h

    # Final 1x1 conv (mobilenet_base final endpoint 'layer_18' maps to this
    # 1280-channel features map in the reference's usage).
    c_final = max(1280, depth(1280)) if self.depth_multiplier > 1.0 \
        else depth(1280)
    h = ConvBN(c_final, 1, act=False, bn_momentum=bnm,
               bn_epsilon=BN_EPS, dtype=self.dtype, name='layer_19')(h, train)
    h = jnp.minimum(nn.relu(h), 6.0)
    return h, endpoints
