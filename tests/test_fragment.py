import numpy as np

from epos_tpu.ops import fragment


def sphere_points(n=2000, seed=0):
  rng = np.random.default_rng(seed)
  v = rng.normal(size=(n, 3))
  v /= np.linalg.norm(v, axis=1, keepdims=True)
  return v * 100.0  # mm scale


def test_fps_shapes():
  pts = sphere_points()
  centers, ids = fragment.fragmentation_fps(pts, 64)
  assert centers.shape == (64, 3)
  assert ids.shape == (2000,)
  assert ids.min() >= 0 and ids.max() < 64


def test_fps_centers_are_vertices():
  pts = sphere_points()
  centers, _ = fragment.fragmentation_fps(pts, 16)
  for c in centers:
    d = np.linalg.norm(pts - c, axis=1).min()
    assert d < 1e-9


def test_fps_first_center_is_furthest_from_origin():
  # The algorithm seeds at the origin and picks the furthest vertex first
  # (reference: fragment.py:27-38).
  pts = sphere_points()
  pts[5] *= 3.0  # Make one clearly furthest.
  centers, _ = fragment.fragmentation_fps(pts, 8)
  np.testing.assert_allclose(centers[0], pts[5])


def test_fps_spread():
  # FPS centers should be well-separated: min pairwise distance should be a
  # decent fraction of the object extent.
  pts = sphere_points()
  centers, _ = fragment.fragmentation_fps(pts, 32)
  d = np.linalg.norm(centers[:, None] - centers[None, :], axis=-1)
  d[np.arange(32), np.arange(32)] = np.inf
  assert d.min() > 10.0  # sphere radius 100


def test_vertex_assignment_nearest():
  pts = sphere_points(500)
  centers, ids = fragment.fragmentation_fps(pts, 16)
  d2 = ((pts[:, None] - centers[None]) ** 2).sum(-1)
  np.testing.assert_array_equal(ids, d2.argmin(1))


def test_fragment_sizes_min_5mm():
  pts = np.zeros((100, 3))  # Degenerate: all at origin.
  ids = np.zeros(100, np.int64)
  sizes = fragment.fragment_sizes(pts, ids, 4)
  np.testing.assert_allclose(sizes, 5.0)  # min 5 mm (datagen.py:125)


def test_fragment_sizes_bbox():
  pts = np.array([[0, 0, 0], [10, 2, 3], [5, 1, 1]], dtype=float)
  ids = np.zeros(3, np.int64)
  sizes = fragment.fragment_sizes(pts, ids, 1)
  assert sizes[0] == 10.0  # longest bbox side


def test_assign_points_to_frags_knn1():
  centers = np.array([[0, 0, 0], [100, 0, 0]], dtype=float)
  sizes = np.array([10.0, 20.0])
  pts = np.array([[1.0, 0, 0], [99.0, 0, 0]])
  ids, coords, w = fragment.assign_points_to_frags(pts, centers, sizes, knn=1)
  np.testing.assert_array_equal(ids[:, 0], [0, 1])
  np.testing.assert_allclose(coords[0, 0], [0.1, 0, 0])   # 1/10
  np.testing.assert_allclose(coords[1, 0], [-0.05, 0, 0])  # -1/20
  np.testing.assert_allclose(w, 1.0)


def test_assign_points_to_frags_knn3_sorted():
  rng = np.random.default_rng(4)
  centers = rng.normal(size=(8, 3)) * 50
  sizes = np.full(8, 10.0)
  pts = rng.normal(size=(20, 3)) * 50
  ids, coords, w = fragment.assign_points_to_frags(pts, centers, sizes, knn=3)
  assert ids.shape == (20, 3) and coords.shape == (20, 3, 3)
  # Ascending distance order (reference: datagen_utils.py:173).
  d = np.linalg.norm(pts[:, None] - centers[ids], axis=-1)
  assert np.all(np.diff(d, axis=1) >= -1e-9)
