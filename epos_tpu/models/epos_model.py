"""EPOS meta-architecture: DeepLab-v3+ encoder-decoder with three dense heads.

TPU-native re-design of epos_lib/model.py. One Flax module produces, at the
decoder output stride (default 4), the three logit maps:
  - obj conf   [B, h, w, num_objs + 1]
  - frag conf  [B, h, w, num_objs * num_frags]
  - frag loc   [B, h, w, num_objs * num_frags * 3]
Static shapes, bfloat16 compute; softmax/argmax post-processing and the
multi-scale image pyramid live in jitted wrapper functions below.

Parity map (reference):
  ASPP + image pooling              model.py:187-265
  stride-4 skip decoder             model.py:268-393
  1x1 conv heads                    model.py:396-458
  multi-scale pyramid + merge       model.py:517-626
  predict softmax/argmax dict       model.py:629-687
"""

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from epos_tpu import common
from epos_tpu.models import mobilenet as mobilenet_lib
from epos_tpu.models import resnet as resnet_lib
from epos_tpu.models import xception as xception_lib
from epos_tpu.models.layers import (
    ConvBN, SplitSeparableConv, preprocess_image, resize_bilinear,
    scale_dimension)


def _backbone(variant, output_stride, multi_grid, dtype,
              depth_multiplier=1.0, divisible_by=None, bounded=False,
              bn_momentum=None):
  if variant.startswith('xception'):
    return xception_lib.Xception(
        variant=variant, output_stride=output_stride, multi_grid=multi_grid,
        bounded=bounded,
        bn_momentum=0.9997 if bn_momentum is None else bn_momentum,
        dtype=dtype,
        name=variant)
  if bounded:
    # The reference threads use_bounded_activation only into the xception
    # family (net_xception.py:741-795); resnet/mobilenet arg scopes ignore
    # it (feature.py:133-142).
    raise ValueError(
        'use_bounded_activation is only supported for xception variants '
        f'(got {variant}) — matching the reference arg scopes.')
  if variant.startswith('resnet'):
    return resnet_lib.ResNetV1(
        variant=variant, output_stride=output_stride, multi_grid=multi_grid,
        bn_momentum=(resnet_lib.BN_MOMENTUM if bn_momentum is None
                     else bn_momentum),
        dtype=dtype, name=variant)
  if variant == 'mobilenet_v2':
    return mobilenet_lib.MobileNetV2(
        variant=variant, output_stride=output_stride,
        depth_multiplier=depth_multiplier, divisible_by=divisible_by,
        bn_momentum=(mobilenet_lib.BN_MOMENTUM if bn_momentum is None
                     else bn_momentum),
        dtype=dtype, name=variant)
  raise ValueError(f'Unsupported model variant: {variant}')


def _decoder_endpoint(variant):
  if variant.startswith('xception'):
    return xception_lib.DECODER_ENDPOINT[variant]
  if variant == 'mobilenet_v2':
    return mobilenet_lib.DECODER_ENDPOINT[variant]
  return resnet_lib.DECODER_ENDPOINT[variant]


class EposNet(nn.Module):
  """Backbone + ASPP + decoder + the three EPOS heads."""
  num_objs: int
  num_frags: int
  model_variant: str = 'xception_65'
  encoder_output_stride: int = 8
  atrous_rates: Sequence[int] = (12, 24, 36)
  multi_grid: Optional[Sequence[int]] = None
  add_image_level_feature: bool = True
  aspp_with_batch_norm: bool = True
  aspp_with_separable_conv: bool = True
  logits_kernel_size: int = 1
  use_bounded_activation: bool = False
  decoder_output_stride: int = 4
  decoder_use_separable_conv: bool = True
  frag_cls_agnostic: bool = False
  frag_loc_agnostic: bool = False
  fine_tune_batch_norm: bool = True
  depth_multiplier: float = 1.0
  divisible_by: Optional[int] = None
  # None -> reference constants (0.9997 here and in xception; resnet/
  # mobilenet keep their own family constants regardless).
  bn_momentum: Optional[float] = None
  dtype: jnp.dtype = jnp.float32

  @nn.compact
  def __call__(self, images, train=False):
    """images: [B, H, W, 3] raw RGB in [0, 255]. Returns dict of logit maps
    at the decoder output stride, float32."""
    b, im_h, im_w, _ = images.shape
    bounded = self.use_bounded_activation
    # Reference validation (model.py:421-424): with the BN-ASPP module the
    # heads must be plain 1x1 convs.
    if self.aspp_with_batch_norm and self.logits_kernel_size != 1:
      raise ValueError(
          'Kernel size must be 1 when using aspp_with_batch_norm, got '
          f'{self.logits_kernel_size} (reference model.py:421-424).')
    # BN trains only when also fine-tuning batch norm (reference:
    # model.py:195, train.py passes fine_tune_batch_norm).
    bn_train = train and self.fine_tune_batch_norm
    bnm = 0.9997 if self.bn_momentum is None else self.bn_momentum
    x = preprocess_image(images, self.model_variant, self.dtype)
    features, endpoints = _backbone(
        self.model_variant, self.encoder_output_stride, self.multi_grid,
        self.dtype, self.depth_multiplier, self.divisible_by,
        bounded=bounded, bn_momentum=self.bn_momentum)(x, bn_train)

    depth = 256
    if self.aspp_with_batch_norm:
      # --- ASPP (model.py:187-265) ---
      branches = []
      if self.add_image_level_feature:
        img_feat = jnp.mean(features, axis=(1, 2), keepdims=True)
        img_feat = ConvBN(depth, 1, act=True, bounded=bounded,
                          bn_momentum=bnm, dtype=self.dtype,
                          name='image_pooling')(img_feat, bn_train)
        img_feat = jnp.broadcast_to(
            img_feat, (b, features.shape[1], features.shape[2], depth))
        branches.append(img_feat)
      branches.append(
          ConvBN(depth, 1, act=True, bounded=bounded, bn_momentum=bnm,
                 dtype=self.dtype, name='aspp0')(features, bn_train))
      for i, rate in enumerate(self.atrous_rates, 1):
        if self.aspp_with_separable_conv:
          branches.append(SplitSeparableConv(
              depth, rate=rate, bounded=bounded, bn_momentum=bnm,
              dtype=self.dtype, name=f'aspp{i}')(features, bn_train))
        else:
          branches.append(ConvBN(depth, 3, rate=rate, act=True,
                                 bounded=bounded, bn_momentum=bnm,
                                 dtype=self.dtype,
                                 name=f'aspp{i}')(features, bn_train))
      x = jnp.concatenate(branches, axis=-1)
      x = ConvBN(depth, 1, act=True, bounded=bounded, bn_momentum=bnm,
                 dtype=self.dtype, name='concat_projection')(x, bn_train)
      x = nn.Dropout(rate=0.1, deterministic=not train,
                     name='concat_projection_dropout')(x)
    else:
      # aspp_with_batch_norm=False skips the ASPP module entirely; the
      # atrous pyramid moves into the heads (extract_encoder_features
      # returns the raw backbone features, model.py:187-189, and
      # get_branch_logits grows per-rate branches, model.py:396-458).
      x = features

    # --- Decoder (model.py:268-393) ---
    if self.decoder_output_stride:
      stride = self.decoder_output_stride
      skip = endpoints[_decoder_endpoint(self.model_variant)]
      skip = ConvBN(48, 1, act=True, bounded=bounded, bn_momentum=bnm,
                    dtype=self.dtype,
                    name='decoder/feature_projection0')(skip, bn_train)
      out_h = scale_dimension(im_h, 1.0 / stride)
      out_w = scale_dimension(im_w, 1.0 / stride)
      x = resize_bilinear(x, (out_h, out_w))
      skip = resize_bilinear(skip, (out_h, out_w))
      x = jnp.concatenate([x, skip], axis=-1)
      if self.decoder_use_separable_conv:
        x = SplitSeparableConv(depth, bounded=bounded, bn_momentum=bnm,
                               dtype=self.dtype,
                               name='decoder/decoder_conv0')(x, bn_train)
        x = SplitSeparableConv(depth, bounded=bounded, bn_momentum=bnm,
                               dtype=self.dtype,
                               name='decoder/decoder_conv1')(x, bn_train)
      else:
        x = ConvBN(depth, 3, act=True, bounded=bounded, bn_momentum=bnm,
                   dtype=self.dtype,
                   name='decoder/decoder_conv0')(x, bn_train)
        x = ConvBN(depth, 3, act=True, bounded=bounded, bn_momentum=bnm,
                   dtype=self.dtype,
                   name='decoder/decoder_conv1')(x, bn_train)

    # --- Heads (model.py:396-458): plain convs with bias, no BN/act. With
    # aspp_with_batch_norm a single 1x1 branch; without it, one branch per
    # atrous rate (kernel logits_kernel_size), sum-merged, with TF1 scopes
    # 'logits/<out>', 'logits/<out>_1', ... (model.py:440-456). ---
    head_widths = common.get_outputs_to_num_channels(
        self.num_objs, self.num_frags, self.frag_cls_agnostic,
        self.frag_loc_agnostic)
    if self.aspp_with_batch_norm or not self.atrous_rates:
      head_rates = [1]
      k = 1
    else:
      head_rates = list(self.atrous_rates)
      k = self.logits_kernel_size
    init = nn.initializers.truncated_normal(stddev=0.01)
    logits = {}
    for name, width in sorted(head_widths.items()):
      branch_logits = []
      for i, rate in enumerate(head_rates):
        scope = f'logits/{name}' if i == 0 else f'logits/{name}_{i}'
        branch_logits.append(nn.Conv(
            width, (k, k), kernel_dilation=(rate, rate), padding='SAME',
            kernel_init=init, dtype=self.dtype,
            name=scope)(x).astype(jnp.float32))
      logits[name] = sum(branch_logits)
    return logits


def build_model(cfg, num_objs, dtype=None):
  """Constructs an EposNet from a Config (epos_tpu.config.Config)."""
  if dtype is None:
    dtype = jnp.bfloat16 if cfg.compute_dtype == 'bfloat16' else jnp.float32
  dec_os = min(cfg.decoder_output_stride) if cfg.decoder_output_stride else 0
  return EposNet(
      num_objs=num_objs,
      num_frags=cfg.num_frags,
      model_variant=cfg.model_variant,
      encoder_output_stride=cfg.encoder_output_stride,
      atrous_rates=tuple(cfg.atrous_rates or ()),
      multi_grid=tuple(cfg.multi_grid) if cfg.multi_grid else None,
      add_image_level_feature=cfg.add_image_level_feature,
      aspp_with_batch_norm=cfg.aspp_with_batch_norm,
      aspp_with_separable_conv=cfg.aspp_with_separable_conv,
      logits_kernel_size=cfg.logits_kernel_size,
      use_bounded_activation=cfg.use_bounded_activation,
      decoder_output_stride=dec_os,
      decoder_use_separable_conv=cfg.decoder_use_separable_conv,
      frag_cls_agnostic=cfg.frag_cls_agnostic,
      frag_loc_agnostic=cfg.frag_loc_agnostic,
      fine_tune_batch_norm=cfg.fine_tune_batch_norm,
      depth_multiplier=cfg.depth_multiplier,
      divisible_by=cfg.divisible_by,
      bn_momentum=cfg.bn_momentum,
      dtype=dtype)


def output_size(crop_size, output_stride):
  """Logit map size for a crop (w, h) — model.py:552-562 semantics."""
  w, h = crop_size
  return (scale_dimension(h, 1.0 / output_stride),
          scale_dimension(w, 1.0 / output_stride))


def multi_scale_logits(model, variables, images, image_pyramid=None,
                       merge_method='max', train=False, rngs=None,
                       mutable=False, return_scales=False):
  """Image-pyramid evaluation with max/avg logit merging (model.py:517-626).

  Returns (dict output_name -> merged logits at base output size, new_state),
  or with return_scales=True a triple (merged, per_scale_list, new_state) —
  the training losses iterate over every per-scale logit map in addition to
  the merged one (reference loss.py:124 over scales_to_logits, which holds
  'logits_%.2f' entries plus MERGED_LOGITS_SCOPE, model.py:585-607).
  """
  image_pyramid = list(image_pyramid or [1.0])
  b, im_h, im_w, _ = images.shape
  stride = model.decoder_output_stride or model.encoder_output_stride
  base_h = scale_dimension(im_h, max(1.0, max(image_pyramid)) / stride)
  base_w = scale_dimension(im_w, max(1.0, max(image_pyramid)) / stride)

  per_scale = []
  new_state = None
  for scale in image_pyramid:
    if scale != 1.0:
      sh = scale_dimension(im_h, scale)
      sw = scale_dimension(im_w, scale)
      scaled = resize_bilinear(images, (sh, sw))
    else:
      scaled = images
    out = model.apply(variables, scaled, train=train, rngs=rngs,
                      mutable=mutable)
    if mutable is not False:  # flax returns (out, state) even for mutable=[]
      out, new_state = out
    out = {k: resize_bilinear(v, (base_h, base_w)) for k, v in out.items()}
    per_scale.append(out)

  if len(per_scale) == 1:
    if return_scales:
      # Single scale: the reference stores only MERGED_LOGITS_SCOPE
      # (model.py:597-601) — no extra per-scale loss terms.
      return per_scale[0], [], new_state
    return per_scale[0], new_state
  merged = {}
  for k in per_scale[0]:
    stacked = jnp.stack([o[k] for o in per_scale], axis=0)
    merged[k] = (jnp.max(stacked, 0) if merge_method == 'max'
                 else jnp.mean(stacked, 0))
  if return_scales:
    return merged, per_scale, new_state
  return merged, new_state


def reshape_and_activate(logits, num_objs, num_frags, frag_cls_agnostic=False,
                         frag_loc_agnostic=False):
  """Logits dict -> prediction dict with softmax/argmax (model.py:629-687)."""
  preds = {}
  obj = jax.nn.softmax(logits[common.PRED_OBJ_CONF], axis=-1)
  preds[common.PRED_OBJ_CONF] = obj
  preds[common.PRED_OBJ_LABEL] = jnp.argmax(obj, axis=-1)

  b, h, w, _ = logits[common.PRED_FRAG_CONF].shape
  n_cls = 1 if frag_cls_agnostic else num_objs
  frag_conf = logits[common.PRED_FRAG_CONF].reshape(b, h, w, n_cls, num_frags)
  preds[common.PRED_FRAG_CONF] = jax.nn.softmax(frag_conf, axis=-1)

  n_cls_loc = 1 if frag_loc_agnostic else num_objs
  preds[common.PRED_FRAG_LOC] = logits[common.PRED_FRAG_LOC].reshape(
      b, h, w, n_cls_loc, num_frags, 3)
  return preds


def predict(model, variables, images, image_pyramid=None, merge_method='max',
            upsample_logits=False):
  """Full inference prediction dict (model.py:629-687). Jittable."""
  logits, _ = multi_scale_logits(
      model, variables, images, image_pyramid, merge_method, train=False)
  if upsample_logits:
    logits = {k: resize_bilinear(v, images.shape[1:3])
              for k, v in logits.items()}
  return reshape_and_activate(
      logits, model.num_objs, model.num_frags, model.frag_cls_agnostic,
      model.frag_loc_agnostic)
