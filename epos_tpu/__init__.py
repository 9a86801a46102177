"""EPOS-TPU: a TPU-native (JAX/XLA/Pallas) 6D object pose estimation framework.

Re-implements the capabilities of the EPOS reference pipeline (Hodan, Barath,
Matas, CVPR 2020) with a TPU-first design:

- Flax DeepLab-v3+ style encoder-decoder (Xception / ResNet-v1 backbones)
  emitting dense surface-fragment classifications + 3D offset regressions.
- Fixed-capacity, fully jitted correspondence extraction (Pallas-fusable).
- On-device batched EPnP + RANSAC multi-instance pose fitting.
- `jax.sharding.Mesh` + jit-based data-parallel training with XLA collectives.
- Host-side BOP data tooling (records, rasterizer, fragmentation) kept lean.

Reference parity citations point into /root/reference (thodan/epos).
"""

__version__ = "0.1.0"
