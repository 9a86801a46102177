"""Rotation / projection utilities (numpy + JAX).

Covers the surface the reference pulls from bop_toolkit_lib.transform and
bop_toolkit_lib.misc (SURVEY.md §2.4): quaternion <-> rotation matrix with the
scalar-first (w, x, y, z) convention, point transforms, and pinhole projection.
All functions work on numpy or jax arrays (pure jnp/np-agnostic math).
"""

import numpy as np
import jax.numpy as jnp

_EPS = 1e-12


def _xp(a):
  return jnp if isinstance(a, jnp.ndarray) else np


def quaternion_matrix(q):
  """Rotation matrix (3x3) from quaternion (w, x, y, z).

  Matches bop_toolkit transform.quaternion_matrix (used at
  epos_lib/datagen_utils.py:80,223) up to the 4x4-vs-3x3 shape: the reference
  takes [:3, :3] at every call site, so we return 3x3 directly.
  """
  xp = _xp(q)
  q = xp.asarray(q, dtype=xp.float64 if xp is np else jnp.float32)
  n = xp.sum(q * q)
  # Degenerate quaternion -> identity (transformations.py behavior).
  scale = xp.where(n < _EPS, 0.0, 2.0 / xp.maximum(n, _EPS))
  w, x, y, z = q[0], q[1], q[2], q[3]
  xx, yy, zz = x * x * scale, y * y * scale, z * z * scale
  xy, xz, yz = x * y * scale, x * z * scale, y * z * scale
  wx, wy, wz = w * x * scale, w * y * scale, w * z * scale
  R = xp.stack([
      xp.stack([1.0 - (yy + zz), xy - wz, xz + wy]),
      xp.stack([xy + wz, 1.0 - (xx + zz), yz - wx]),
      xp.stack([xz - wy, yz + wx, 1.0 - (xx + yy)]),
  ])
  eye = xp.eye(3, dtype=R.dtype)
  return xp.where(n < _EPS, eye, R)


def quaternion_from_matrix(R):
  """Quaternion (w, x, y, z) from a 3x3 rotation matrix.

  Numerically-stable Shepperd method; numpy-only (used by dataset creation,
  reference: scripts/create_tfrecord.py:158-166).
  """
  R = np.asarray(R, dtype=np.float64)
  m00, m01, m02 = R[0]
  m10, m11, m12 = R[1]
  m20, m21, m22 = R[2]
  tr = m00 + m11 + m22
  if tr > 0:
    s = np.sqrt(tr + 1.0) * 2
    q = np.array([0.25 * s, (m21 - m12) / s, (m02 - m20) / s, (m10 - m01) / s])
  elif m00 > m11 and m00 > m22:
    s = np.sqrt(1.0 + m00 - m11 - m22) * 2
    q = np.array([(m21 - m12) / s, 0.25 * s, (m01 + m10) / s, (m02 + m20) / s])
  elif m11 > m22:
    s = np.sqrt(1.0 + m11 - m00 - m22) * 2
    q = np.array([(m02 - m20) / s, (m01 + m10) / s, 0.25 * s, (m12 + m21) / s])
  else:
    s = np.sqrt(1.0 + m22 - m00 - m11) * 2
    q = np.array([(m10 - m01) / s, (m02 + m20) / s, (m12 + m21) / s, 0.25 * s])
  if q[0] < 0:
    q = -q
  return q / np.linalg.norm(q)


def transform_pts(pts, R, t):
  """Applies a rigid transform: pts [n,3] -> R @ pts^T + t, returns [n,3]."""
  xp = _xp(pts)
  t = xp.reshape(xp.asarray(t), (1, 3))
  return pts @ xp.transpose(R) + t


def project_pts(pts, K, R=None, t=None):
  """Pinhole projection of [n,3] points to [n,2] image coordinates.

  Matches bop_toolkit misc.project_pts (used at epos_lib/eval_utils.py:85,
  vis.py:127): optional rigid transform then perspective divide.
  """
  xp = _xp(pts)
  if R is not None:
    pts = transform_pts(pts, R, t)
  proj = pts @ xp.transpose(xp.asarray(K, dtype=pts.dtype))
  return proj[:, :2] / xp.maximum(proj[:, 2:3], _EPS)


def convert_px_indices_to_im_coords(px_indices, scale):
  """Pixel indices -> image coordinates with the +0.5 center convention.

  Reference: epos_lib/misc.py:14-26. With scale=1, index (i, j) maps to
  (i + 0.5, j + 0.5).
  """
  xp = _xp(px_indices)
  return scale * (xp.asarray(px_indices, dtype=xp.float64 if xp is np
                             else jnp.float32) + 0.5)


def rotation_6d_to_matrix(r6):
  """Continuous 6D rotation parameterization -> 3x3 matrix (Zhou CVPR'19).

  Used by the on-device pose refiner (no reference equivalent — the reference
  refines inside C++ GC-RANSAC). Gram-Schmidt on two 3-vectors.
  """
  xp = _xp(r6)
  a1, a2 = r6[..., :3], r6[..., 3:6]
  b1 = a1 / xp.maximum(xp.linalg.norm(a1, axis=-1, keepdims=True), _EPS)
  a2p = a2 - xp.sum(b1 * a2, axis=-1, keepdims=True) * b1
  b2 = a2p / xp.maximum(xp.linalg.norm(a2p, axis=-1, keepdims=True), _EPS)
  b3 = xp.cross(b1, b2)
  return xp.stack([b1, b2, b3], axis=-2)


def matrix_to_rotation_6d(R):
  """Inverse of rotation_6d_to_matrix (first two rows, flattened)."""
  xp = _xp(R)
  return xp.concatenate([R[..., 0, :], R[..., 1, :]], axis=-1)
