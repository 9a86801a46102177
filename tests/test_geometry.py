import numpy as np
import pytest

from epos_tpu.ops import geometry


def random_rotation(rng):
  q = rng.normal(size=4)
  q /= np.linalg.norm(q)
  return geometry.quaternion_matrix(q)


def test_quaternion_matrix_identity():
  R = geometry.quaternion_matrix(np.array([1.0, 0, 0, 0]))
  np.testing.assert_allclose(R, np.eye(3), atol=1e-12)


def test_quaternion_matrix_is_rotation():
  rng = np.random.default_rng(0)
  for _ in range(20):
    R = random_rotation(rng)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-10)
    assert np.linalg.det(R) == pytest.approx(1.0, abs=1e-10)


def test_quaternion_roundtrip():
  rng = np.random.default_rng(1)
  for _ in range(50):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    if q[0] < 0:
      q = -q
    R = geometry.quaternion_matrix(q)
    q2 = geometry.quaternion_from_matrix(R)
    np.testing.assert_allclose(q, q2, atol=1e-9)


def test_quaternion_matrix_unnormalized():
  # The reference's transform.quaternion_matrix normalizes internally.
  q = np.array([2.0, 0, 0, 0])
  np.testing.assert_allclose(
      geometry.quaternion_matrix(q), np.eye(3), atol=1e-12)


def test_known_quaternion_90deg_z():
  # 90 deg about z: q = (cos45, 0, 0, sin45).
  s = np.sqrt(0.5)
  R = geometry.quaternion_matrix(np.array([s, 0, 0, s]))
  expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], dtype=float)
  np.testing.assert_allclose(R, expected, atol=1e-12)


def test_project_pts():
  K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
  pts = np.array([[0.0, 0.0, 1000.0], [100.0, -50.0, 500.0]])
  uv = geometry.project_pts(pts, K)
  np.testing.assert_allclose(uv[0], [320, 240])
  np.testing.assert_allclose(uv[1], [320 + 500 * 100 / 500,
                                     240 - 500 * 50 / 500])


def test_project_pts_with_pose():
  rng = np.random.default_rng(2)
  K = np.array([[572.4, 0, 325.3], [0, 573.6, 242.0], [0, 0, 1]])
  R = random_rotation(rng)
  t = np.array([10.0, -20.0, 1000.0])
  pts = rng.normal(size=(10, 3)) * 50
  uv = geometry.project_pts(pts, K, R, t)
  cam = pts @ R.T + t
  expected = (cam @ K.T)
  expected = expected[:, :2] / expected[:, 2:]
  np.testing.assert_allclose(uv, expected, atol=1e-9)


def test_px_coords_convention():
  # Reference: misc.py:14-26 — index (i, j) -> (i + 0.5, j + 0.5) at scale 1.
  idx = np.array([[0, 0], [3, 7]])
  out = geometry.convert_px_indices_to_im_coords(idx, 1.0)
  np.testing.assert_allclose(out, [[0.5, 0.5], [3.5, 7.5]])
  out4 = geometry.convert_px_indices_to_im_coords(idx, 4.0)
  np.testing.assert_allclose(out4, [[2.0, 2.0], [14.0, 30.0]])


def test_rotation_6d_roundtrip():
  rng = np.random.default_rng(3)
  for _ in range(10):
    R = random_rotation(rng)
    r6 = geometry.matrix_to_rotation_6d(R)
    R2 = geometry.rotation_6d_to_matrix(r6)
    np.testing.assert_allclose(R, R2, atol=1e-9)
