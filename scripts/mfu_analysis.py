#!/usr/bin/env python3
"""Roofline analysis of the flagship inference path: why MFU is bounded.

Parses the lowered StableHLO of the flagship predict graph (Xception-65
f64, 21 objects, 640x480 — BASELINE.md config #1), computes per-convolution
FLOPs and memory traffic, and classifies each conv as MXU-eligible (dense /
pointwise) or VPU/bandwidth-bound (depthwise, feature_group_count ==
channels). The output quantifies the architecture's achievable-MFU ceiling
on a v5e chip: depthwise + atrous stages execute on the vector unit at HBM
speed, so the chip's 197 TFLOP/s peak only applies to the dense fraction.

CPU-only (lowering needs no device); prints one JSON line and a table.
Companion to scripts/profile_infer.py (measured stage timings on-chip).
Reference protocol: epos/scripts/infer.py:730-734 stage timing.
"""

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
import jax

jax.config.update('jax_platforms', 'cpu')
import jax.numpy as jnp
import numpy as np

from epos_tpu.config import Config
from epos_tpu.models import epos_model

# v5e per-chip peaks (public: cloud.google.com/tpu/docs/v5e).
PEAK_MXU_BF16 = 197e12      # FLOP/s
HBM_BW = 819e9              # bytes/s
# VPU: 8 lanes x 128 sublanes... effective vector f32 throughput is ~1/50
# of MXU peak; depthwise convs are further bandwidth-limited in practice.
PEAK_VPU_F32 = 4e12

_SHAPE_RE = re.compile(r'tensor<([0-9x]+)x(f32|bf16|f16|i32|i8)>')


def _dims(t):
  return [int(d) for d in t.split('x')]


def conv_stats(line):
  """FLOPs + IO bytes of one stablehlo.convolution line."""
  shapes = _SHAPE_RE.findall(line)
  if len(shapes) < 3:
    return None
  (in_s, in_t), (k_s, _), (out_s, out_t) = shapes[0], shapes[1], shapes[-1]
  in_d, k_d, out_d = _dims(in_s), _dims(k_s), _dims(out_s)
  m = re.search(r'feature_group_count\s*=\s*(\d+)', line)
  groups = int(m.group(1)) if m else 1
  # NHWC x HWIO -> NHWC (flax default); FLOPs = 2 * prod(out) * Kh*Kw*Cin/g.
  kh, kw, cin_g, cout = k_d[0], k_d[1], k_d[2], k_d[3]
  flops = 2.0 * np.prod(out_d, dtype=np.float64) * kh * kw * cin_g
  bpe = {'f32': 4, 'bf16': 2, 'f16': 2, 'i32': 4, 'i8': 1}
  io = (np.prod(in_d, dtype=np.float64) * bpe[in_t]
        + np.prod(k_d, dtype=np.float64) * bpe[in_t]
        + np.prod(out_d, dtype=np.float64) * bpe[out_t])
  depthwise = groups > 1 and cin_g == 1
  return dict(flops=float(flops), io=float(io), depthwise=depthwise,
              groups=groups, kh=kh, kw=kw, cout=cout,
              out=out_d, dtype=in_t)


def dot_stats(line):
  shapes = _SHAPE_RE.findall(line)
  if len(shapes) < 3:
    return None
  a, b, o = _dims(shapes[0][0]), _dims(shapes[1][0]), _dims(shapes[-1][0])
  k = a[-1]
  flops = 2.0 * np.prod(o, dtype=np.float64) * k
  bpe = {'f32': 4, 'bf16': 2, 'f16': 2, 'i32': 4, 'i8': 1}
  io = sum(np.prod(d, dtype=np.float64) for d in (a, b, o)) * bpe[shapes[0][1]]
  return dict(flops=float(flops), io=float(io))


def main(args=None):
  p = argparse.ArgumentParser()
  p.add_argument('--variant', default='xception_65')
  p.add_argument('--num_frags', type=int, default=64)
  p.add_argument('--num_objs', type=int, default=21)
  p.add_argument('--width', type=int, default=640)
  p.add_argument('--height', type=int, default=480)
  ns = p.parse_args(args)

  cfg = Config(model_variant=ns.variant, num_frags=ns.num_frags,
               infer_crop_size=[ns.width, ns.height],
               compute_dtype='bfloat16')
  model = epos_model.build_model(cfg, ns.num_objs)
  x = jnp.zeros((1, ns.height, ns.width, 3), jnp.float32)
  variables = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), x,
                                                train=False))

  def predict(v, im):
    return model.apply(v, im, train=False)

  lowered = jax.jit(predict).lower(
      jax.tree_util.tree_map(
          lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype), variables), x)
  hlo = lowered.as_text()

  convs, dots = [], []
  for line in hlo.splitlines():
    if 'stablehlo.convolution' in line:
      s = conv_stats(line)
      if s:
        convs.append(s)
    elif 'stablehlo.dot_general' in line or 'stablehlo.dot ' in line:
      s = dot_stats(line)
      if s:
        dots.append(s)

  dw = [c for c in convs if c['depthwise']]
  dense = [c for c in convs if not c['depthwise']]
  f_dw = sum(c['flops'] for c in dw)
  f_dense = sum(c['flops'] for c in dense) + sum(d['flops'] for d in dots)
  io_dw = sum(c['io'] for c in dw)
  total = f_dw + f_dense

  # Roofline: dense convs at MXU peak; depthwise at the tighter of VPU
  # FLOPs and HBM traffic. Elementwise/BN/resize traffic is NOT counted —
  # this is an upper bound (real MFU is lower still).
  t_dense = f_dense / PEAK_MXU_BF16
  t_dw = max(f_dw / PEAK_VPU_F32, io_dw / HBM_BW)
  t_total = t_dense + t_dw
  mfu_ceiling = total / (t_total * PEAK_MXU_BF16)

  out = {
      'config': f'{ns.variant} f{ns.num_frags} {ns.num_objs}obj '
                f'{ns.width}x{ns.height}',
      'total_gflops': round(total / 1e9, 1),
      'dense_gflops': round(f_dense / 1e9, 1),
      'depthwise_gflops': round(f_dw / 1e9, 2),
      'depthwise_io_mb': round(io_dw / 1e6, 1),
      'n_conv_dense': len(dense),
      'n_conv_depthwise': len(dw),
      'n_dots': len(dots),
      't_dense_ms_roofline': round(t_dense * 1e3, 2),
      't_depthwise_ms_roofline': round(t_dw * 1e3, 2),
      'mfu_ceiling_predict_only': round(mfu_ceiling, 3),
      'note': 'ceiling EXCLUDES elementwise/BN/resize traffic and the '
              'extract+fit stages; measured end-to-end MFU is bounded '
              'well below this.',
  }
  print(json.dumps(out))


if __name__ == '__main__':
  main()
