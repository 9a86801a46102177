"""Xception backbones (41/65/71) in Flax, with atrous output-stride control.

TPU-native re-design of epos_lib/net_xception.py. Differences from a naive
port: blocks are built with static Python control flow (everything is traced
once under jit), dilation bookkeeping is resolved at construction time, and
compute runs in bfloat16 on the MXU with float32 BN statistics.

Structural parity (for converted TF1 checkpoints):
- Root stem: conv2d_same 32 s2, conv 64 s1 (net_xception.py:460-464).
- Module = 3x [pre-relu -> depthwise(BN) -> pointwise(BN)] + conv/sum/none
  skip (net_xception.py:198-323); stride lives in the 3rd separable conv.
- Atrous control: once the accumulated stride hits the target output stride,
  further strides become dilation (net_xception.py:327-393).
- BN decay 0.9997, epsilon 1e-3 (xception_arg_scope, net_xception.py:741-751).
"""

import dataclasses
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from epos_tpu.models.layers import ConvBN, DepthwiseConvBN

BN_EPS = 1e-3  # xception_arg_scope batch_norm_epsilon.


@dataclasses.dataclass(frozen=True)
class BlockSpec:
  name: str
  depths: Tuple[int, int, int]
  skip: str                 # 'conv' | 'sum' | 'none'
  act_in_sep: bool
  num_units: int
  stride: int
  unit_rates: Tuple[int, int, int] = (1, 1, 1)


def _blocks_41(multi_grid):
  return [
      BlockSpec('entry_flow/block1', (128, 128, 128), 'conv', False, 1, 2),
      BlockSpec('entry_flow/block2', (256, 256, 256), 'conv', False, 1, 2),
      BlockSpec('entry_flow/block3', (728, 728, 728), 'conv', False, 1, 2),
      BlockSpec('middle_flow/block1', (728, 728, 728), 'sum', False, 8, 1),
      BlockSpec('exit_flow/block1', (728, 1024, 1024), 'conv', False, 1, 2),
      BlockSpec('exit_flow/block2', (1536, 1536, 2048), 'none', True, 1, 1,
                multi_grid),
  ]


def _blocks_65(multi_grid):
  return [
      BlockSpec('entry_flow/block1', (128, 128, 128), 'conv', False, 1, 2),
      BlockSpec('entry_flow/block2', (256, 256, 256), 'conv', False, 1, 2),
      BlockSpec('entry_flow/block3', (728, 728, 728), 'conv', False, 1, 2),
      BlockSpec('middle_flow/block1', (728, 728, 728), 'sum', False, 16, 1),
      BlockSpec('exit_flow/block1', (728, 1024, 1024), 'conv', False, 1, 2),
      BlockSpec('exit_flow/block2', (1536, 1536, 2048), 'none', True, 1, 1,
                multi_grid),
  ]


def _blocks_71(multi_grid):
  return [
      BlockSpec('entry_flow/block1', (128, 128, 128), 'conv', False, 1, 2),
      BlockSpec('entry_flow/block2', (256, 256, 256), 'conv', False, 1, 1),
      BlockSpec('entry_flow/block3', (256, 256, 256), 'conv', False, 1, 2),
      BlockSpec('entry_flow/block4', (728, 728, 728), 'conv', False, 1, 1),
      BlockSpec('entry_flow/block5', (728, 728, 728), 'conv', False, 1, 2),
      BlockSpec('middle_flow/block1', (728, 728, 728), 'sum', False, 16, 1),
      BlockSpec('exit_flow/block1', (728, 1024, 1024), 'conv', False, 1, 2),
      BlockSpec('exit_flow/block2', (1536, 1536, 2048), 'none', True, 1, 1,
                multi_grid),
  ]


def _blocks_micro(multi_grid):
  """Tiny EPOS-TPU-only variant for fast tests and pipeline debugging
  (no reference equivalent)."""
  return [
      BlockSpec('entry_flow/block1', (32, 32, 32), 'conv', False, 1, 2),
      BlockSpec('entry_flow/block2', (48, 48, 48), 'conv', False, 1, 2),
      BlockSpec('middle_flow/block1', (48, 48, 48), 'sum', False, 2, 1),
      BlockSpec('exit_flow/block1', (64, 64, 64), 'none', True, 1, 1,
                multi_grid),
  ]


_BLOCK_BUILDERS = {
    'xception_41': _blocks_41,
    'xception_65': _blocks_65,
    'xception_71': _blocks_71,
    'xception_micro': _blocks_micro,
}

# Decoder skip endpoint per variant (epos_lib/feature.py:54-71): the output
# of the stride-4 entry block's second separable conv (pointwise+BN, pre-act).
DECODER_ENDPOINT = {
    'xception_41': 'entry_flow/block2/unit_1/separable_conv2_pointwise',
    'xception_65': 'entry_flow/block2/unit_1/separable_conv2_pointwise',
    'xception_71': 'entry_flow/block3/unit_1/separable_conv2_pointwise',
    'xception_micro': 'entry_flow/block2/unit_1/separable_conv2_pointwise',
}


_CLIP_CAP = 6  # net_xception.py:58 — bounded-activation clip value.


class XceptionModule(nn.Module):
  """One Xception unit: 3 separable convs + skip (net_xception.py:198-323).

  bounded implements use_bounded_activation (net_xception.py:264-319):
  relu6 pre-activations, clip residual/shortcut to +-_CLIP_CAP before the
  skip sum, relu6 after conv/sum skips, and native SAME padding instead of
  explicit padding (xception_arg_scope sets use_explicit_padding =
  not use_bounded_activation, net_xception.py:790-793)."""
  depths: Tuple[int, int, int]
  skip: str
  stride: int
  rates: Tuple[int, int, int]
  act_in_sep: bool
  bounded: bool = False
  bn_momentum: float = 0.9997
  dtype: jnp.dtype = jnp.float32

  @nn.compact
  def __call__(self, x, train=False, capture=None, capture_prefix=''):
    residual = x
    clip = lambda v: jnp.clip(v, -_CLIP_CAP, _CLIP_CAP)
    for i in range(3):
      if not self.act_in_sep:
        if self.bounded:
          # Clip-then-relu6 pre-activation (net_xception.py:268-273).
          residual = nn.relu6(clip(residual))
        else:
          residual = nn.relu(residual)
      stride_i = self.stride if i == 2 else 1
      residual = DepthwiseConvBN(
          kernel_size=3, stride=stride_i, rate=self.rates[i],
          use_explicit_padding=not self.bounded, act=self.act_in_sep,
          bounded=self.bounded, bn_momentum=self.bn_momentum,
          bn_epsilon=BN_EPS, dtype=self.dtype,
          name=f'separable_conv{i+1}_depthwise')(residual, train)
      residual = ConvBN(
          self.depths[i], 1, act=self.act_in_sep, bounded=self.bounded,
          bn_momentum=self.bn_momentum, bn_epsilon=BN_EPS, dtype=self.dtype,
          name=f'separable_conv{i+1}_pointwise')(residual, train)
      if capture is not None and i == 1:
        capture[capture_prefix + f'separable_conv2_pointwise'] = residual

    if self.skip == 'conv':
      shortcut = ConvBN(self.depths[-1], 1, stride=self.stride, act=False,
                        bn_momentum=self.bn_momentum, bn_epsilon=BN_EPS,
                        dtype=self.dtype, name='shortcut')(x, train)
      if self.bounded:
        return nn.relu6(clip(residual) + clip(shortcut))
      return residual + shortcut
    elif self.skip == 'sum':
      if self.bounded:
        return nn.relu6(clip(residual) + clip(x))
      return residual + x
    return residual


class Xception(nn.Module):
  """Xception feature extractor with output-stride control."""
  variant: str = 'xception_65'
  output_stride: int = 8
  multi_grid: Optional[Sequence[int]] = None
  bounded: bool = False
  bn_momentum: float = 0.9997
  dtype: jnp.dtype = jnp.float32

  @nn.compact
  def __call__(self, x, train=False):
    mg = tuple(self.multi_grid) if self.multi_grid else (1, 1, 1)
    blocks = _BLOCK_BUILDERS[self.variant](mg)

    endpoints = {}
    # Root stem (stride 2): net_xception.py:460-464.
    x = ConvBN(32, 3, stride=2, use_explicit_padding=not self.bounded,
               act=True, bounded=self.bounded, bn_momentum=self.bn_momentum,
               bn_epsilon=BN_EPS, dtype=self.dtype,
               name='entry_flow/conv1_1')(x, train)
    x = ConvBN(64, 3, stride=1, act=True, bounded=self.bounded,
               bn_momentum=self.bn_momentum, bn_epsilon=BN_EPS,
               dtype=self.dtype, name='entry_flow/conv1_2')(x, train)

    # Dense block stacking with atrous bookkeeping (net_xception.py:327-393).
    # The stem already consumed a factor of 2.
    target = self.output_stride // 2 if self.output_stride else None
    current_stride, rate = 1, 1
    for block in blocks:
      for unit in range(block.num_units):
        prefix = f'{block.name}/unit_{unit+1}/'
        if target is not None and current_stride == target:
          unit_rates = tuple(r * rate for r in block.unit_rates)
          x = XceptionModule(
              depths=block.depths, skip=block.skip, stride=1,
              rates=unit_rates, act_in_sep=block.act_in_sep,
              bounded=self.bounded, bn_momentum=self.bn_momentum,
              dtype=self.dtype,
              name=prefix + 'xception_module')(
                  x, train, capture=endpoints, capture_prefix=prefix)
          rate *= block.stride
        else:
          x = XceptionModule(
              depths=block.depths, skip=block.skip, stride=block.stride,
              rates=block.unit_rates, act_in_sep=block.act_in_sep,
              bounded=self.bounded, bn_momentum=self.bn_momentum,
              dtype=self.dtype,
              name=prefix + 'xception_module')(
                  x, train, capture=endpoints, capture_prefix=prefix)
          current_stride *= block.stride
      endpoints[block.name] = x
    if target is not None and current_stride != target:
      raise ValueError('The target output_stride cannot be reached.')
    return x, endpoints
