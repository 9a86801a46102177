"""Surface fragmentation by furthest point sampling.

TPU-native re-design of epos_lib/fragment.py:8-54: the FPS loop is O(F·V) with
a running min-distance array (no kd-tree needed — the reference builds cKDTrees
it doesn't have to). Pure vectorized numpy on host; fragmentation runs once
per model set and is cached (see data/dataset.py).
"""

import numpy as np


def fragmentation_fps(vertices, num_frags, seed_center=True):
  """Fragments a model surface by furthest point sampling.

  Seeded at the model origin, which is then discarded — matching the reference
  algorithm (epos_lib/fragment.py:27-47).

  Args:
    vertices: [num_vertices, 3] float array of model vertices.
    num_frags: Number of fragments.
    seed_center: Seed FPS with the coordinate origin (reference behavior).

  Returns:
    (frag_centers [num_frags, 3], vertex_frag_ids [num_vertices]).
  """
  vertices = np.asarray(vertices, dtype=np.float64)
  num_v = vertices.shape[0]
  if num_v < num_frags:
    raise ValueError(
        f'Need >= {num_frags} vertices, got {num_v} (datagen.py:106 assert).')

  centers = np.empty((num_frags, 3), dtype=np.float64)
  # Distance of each vertex to the nearest selected center so far.
  if seed_center:
    nn_dists = np.linalg.norm(vertices, axis=1)
  else:
    nn_dists = np.full(num_v, np.inf)

  for i in range(num_frags):
    new_ind = int(np.argmax(nn_dists))
    centers[i] = vertices[new_ind]
    nn_dists[new_ind] = -1.0
    d = np.linalg.norm(vertices - centers[i], axis=1)
    np.minimum(nn_dists, d, out=nn_dists)

  # Assign each vertex to its nearest fragment center. Chunked to bound the
  # [V, F] distance matrix memory.
  vertex_frag_ids = np.empty(num_v, dtype=np.int64)
  chunk = max(1, int(4e7) // max(num_frags, 1))
  for s in range(0, num_v, chunk):
    d2 = ((vertices[s:s + chunk, None, :] - centers[None, :, :]) ** 2).sum(-1)
    vertex_frag_ids[s:s + chunk] = np.argmin(d2, axis=1)

  return centers, vertex_frag_ids


def fragment_sizes(vertices, vertex_frag_ids, num_frags, min_frag_size=5.0):
  """Fragment size = longest side of the fragment's 3D bounding box, >= 5 mm.

  Reference: epos_lib/datagen.py:113-128.
  """
  vertices = np.asarray(vertices, dtype=np.float64)
  sizes = np.full(num_frags, min_frag_size, dtype=np.float64)
  for frag_id in range(num_frags):
    pts = vertices[vertex_frag_ids == frag_id]
    if pts.shape[0] > 0:
      bb = pts.max(axis=0) - pts.min(axis=0)
      sizes[frag_id] = max(float(bb.max()), min_frag_size)
  return sizes


def assign_points_to_frags(points, frag_centers, frag_sizes, knn=1):
  """Assigns 3D points to their k nearest fragments with normalized offsets.

  Vectorized equivalent of FragmentFieldGenerator.assign_to_frags_py
  (epos_lib/datagen_utils.py:161-199): for each point, the k nearest fragment
  centers (ascending distance), the offset from each center normalized by the
  fragment size, and unit weights.

  Args:
    points: [n, 3] points (object-local frame).
    frag_centers: [num_frags, 3].
    frag_sizes: [num_frags].
    knn: Number of nearest fragments per point.

  Returns:
    (ids [n, knn] int32, coords [n, knn, 3] float32, weights [n, knn] float32)
  """
  points = np.asarray(points, dtype=np.float64)
  n = points.shape[0]
  if n == 0:
    return (np.zeros((0, knn), np.int32), np.zeros((0, knn, 3), np.float32),
            np.zeros((0, knn), np.float32))
  d2 = ((points[:, None, :] - frag_centers[None, :, :]) ** 2).sum(-1)
  if knn == 1:
    nn_ids = np.argmin(d2, axis=1)[:, None]
  else:
    part = np.argpartition(d2, knn - 1, axis=1)[:, :knn]
    order = np.argsort(np.take_along_axis(d2, part, axis=1), axis=1)
    nn_ids = np.take_along_axis(part, order, axis=1)
  coords = points[:, None, :] - frag_centers[nn_ids]
  coords = coords / frag_sizes[nn_ids][..., None]
  weights = np.ones((n, knn), np.float32)
  return nn_ids.astype(np.int32), coords.astype(np.float32), weights
