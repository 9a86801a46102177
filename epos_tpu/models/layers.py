"""Shared Flax layers for EPOS-TPU backbones and heads.

TPU-first notes:
- NHWC layout throughout (XLA:TPU native).
- bfloat16 compute / float32 params & BN stats (MXU-friendly).
- 'SAME'-with-explicit-padding conv matching slim's resnet_utils.conv2d_same /
  net_xception.separable_conv2d_same (reference: epos_lib/net_xception.py:74-195)
  so converted TF1 checkpoints reproduce activations exactly.
- align-corners bilinear resize matching tf.image.resize_bilinear(align_corners
  =True) (reference: epos_lib/misc.py:94-107) for logit/feature resizing.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp


def same_pad(kernel_size, rate=1):
  """Explicit padding equal to TF 'SAME' for stride-1, and to slim's
  conv2d_same fixed padding for strided convs (net_xception.py:74-94)."""
  keff = kernel_size + (kernel_size - 1) * (rate - 1)
  beg = (keff - 1) // 2
  end = keff - 1 - beg
  return [(beg, end), (beg, end)]


def resize_bilinear(x, size, align_corners=True):
  """Bilinear resize of NHWC (or HWC) tensors.

  align_corners=True matches TF1 tf.image.resize_bilinear(align_corners=True)
  used throughout the reference: sample positions i*(in-1)/(out-1).
  """
  no_batch = x.ndim == 3
  if no_batch:
    x = x[None]
  b, h, w, c = x.shape
  out_h, out_w = int(size[0]), int(size[1])
  if (h, w) == (out_h, out_w):
    return x[0] if no_batch else x

  dtype = x.dtype
  xf = x.astype(jnp.float32)

  def _axis_weights(n_in, n_out):
    if align_corners and n_out > 1:
      pos = jnp.arange(n_out, dtype=jnp.float32) * ((n_in - 1) / (n_out - 1))
    elif align_corners:
      pos = jnp.zeros((1,), jnp.float32)
    else:
      scale = n_in / n_out
      pos = (jnp.arange(n_out, dtype=jnp.float32) + 0.5) * scale - 0.5
      pos = jnp.clip(pos, 0.0, n_in - 1)
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n_in - 1)
    hi = jnp.clip(lo + 1, 0, n_in - 1)
    frac = pos - lo.astype(jnp.float32)
    return lo, hi, frac

  ylo, yhi, yf = _axis_weights(h, out_h)
  xlo, xhi, xf_ = _axis_weights(w, out_w)

  top = xf[:, ylo, :, :] * (1 - yf)[None, :, None, None] + \
        xf[:, yhi, :, :] * yf[None, :, None, None]
  out = top[:, :, xlo, :] * (1 - xf_)[None, None, :, None] + \
        top[:, :, xhi, :] * xf_[None, None, :, None]
  out = out.astype(dtype)
  return out[0] if no_batch else out


def scale_dimension(dim, scale):
  """int((dim - 1) * scale + 1) — reference model.py:100-114."""
  return int((float(dim) - 1.0) * scale + 1.0)


class ConvBN(nn.Module):
  """Conv + BatchNorm + optional activation (slim.conv2d equivalent).

  bounded: relu6 instead of relu (use_bounded_activation,
  net_xception.py:794 / model.py:200-207)."""
  features: int
  kernel_size: int = 1
  stride: int = 1
  rate: int = 1
  use_explicit_padding: bool = False
  act: bool = True
  use_bn: bool = True
  bounded: bool = False
  bn_momentum: float = 0.9997
  bn_epsilon: float = 1e-5
  dtype: jnp.dtype = jnp.float32

  @nn.compact
  def __call__(self, x, train=False):
    if self.use_explicit_padding and self.stride > 1:
      padding = same_pad(self.kernel_size, self.rate)
    else:
      padding = 'SAME'
    x = nn.Conv(self.features, (self.kernel_size, self.kernel_size),
                strides=(self.stride, self.stride),
                kernel_dilation=(self.rate, self.rate),
                padding=padding, use_bias=not self.use_bn,
                dtype=self.dtype, name='conv')(x)
    if self.use_bn:
      x = nn.BatchNorm(use_running_average=not train,
                       momentum=self.bn_momentum, epsilon=self.bn_epsilon,
                       dtype=jnp.float32, name='bn')(x.astype(jnp.float32))
      x = x.astype(self.dtype)
    if self.act:
      x = nn.relu6(x) if self.bounded else nn.relu(x)
    return x


class DepthwiseConvBN(nn.Module):
  """Depthwise conv + BN (+ optional activation)."""
  kernel_size: int = 3
  stride: int = 1
  rate: int = 1
  use_explicit_padding: bool = True
  act: bool = False
  bounded: bool = False
  bn_momentum: float = 0.9997
  bn_epsilon: float = 1e-3
  dtype: jnp.dtype = jnp.float32

  @nn.compact
  def __call__(self, x, train=False):
    c = x.shape[-1]
    if self.use_explicit_padding and self.stride > 1:
      padding = same_pad(self.kernel_size, self.rate)
    else:
      padding = 'SAME'
    x = nn.Conv(c, (self.kernel_size, self.kernel_size),
                strides=(self.stride, self.stride),
                kernel_dilation=(self.rate, self.rate),
                feature_group_count=c, padding=padding, use_bias=False,
                dtype=self.dtype, name='depthwise')(x)
    x = nn.BatchNorm(use_running_average=not train,
                     momentum=self.bn_momentum, epsilon=self.bn_epsilon,
                     dtype=jnp.float32, name='bn')(x.astype(jnp.float32))
    x = x.astype(self.dtype)
    if self.act:
      x = nn.relu6(x) if self.bounded else nn.relu(x)
    return x


class SplitSeparableConv(nn.Module):
  """Depthwise conv (+BN+relu) then pointwise conv (+BN+relu).

  Matches model.split_separable_conv2d (reference: epos_lib/model.py:51-97):
  activation between depthwise and pointwise. Used by ASPP and decoder,
  so BN epsilon is 1e-5 there (model.py:194-199).
  """
  features: int
  kernel_size: int = 3
  rate: int = 1
  bounded: bool = False
  bn_momentum: float = 0.9997
  bn_epsilon: float = 1e-5
  dtype: jnp.dtype = jnp.float32

  @nn.compact
  def __call__(self, x, train=False):
    x = DepthwiseConvBN(kernel_size=self.kernel_size, rate=self.rate,
                        use_explicit_padding=False, act=True,
                        bounded=self.bounded, bn_momentum=self.bn_momentum,
                        bn_epsilon=self.bn_epsilon,
                        dtype=self.dtype, name='depthwise')(x, train)
    x = ConvBN(self.features, 1, act=True, bounded=self.bounded,
               bn_momentum=self.bn_momentum, bn_epsilon=self.bn_epsilon,
               dtype=self.dtype, name='pointwise')(x, train)
    return x


# Mean RGB of ImageNet used by the reference (epos_lib/feature.py:158).
MEAN_RGB = (123.15, 115.90, 103.06)


def preprocess_image(images, model_variant, dtype=jnp.float32):
  """Input normalization per backbone family.

  Reference: epos_lib/feature.py:158-186 — xception/mobilenet map to [-1, 1],
  resnet subtracts the mean RGB.
  """
  images = images.astype(jnp.float32)
  if model_variant.startswith('resnet'):
    out = images - jnp.asarray(MEAN_RGB, jnp.float32)
  else:
    out = images * (2.0 / 255.0) - 1.0
  return out.astype(dtype)
