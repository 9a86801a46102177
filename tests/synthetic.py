"""Synthetic-scene fixtures: analytically known meshes, poses and cameras.

The reference has no test assets; these fixtures make GT generation
assertable (SURVEY.md §4).
"""

import numpy as np

from epos_tpu.data.renderer import Renderer
from epos_tpu.ops import fragment as fragment_lib
from epos_tpu.ops import geometry


def box_mesh(sx=60.0, sy=40.0, sz=30.0):
  """Axis-aligned box centered at origin, 12 triangles, mm units."""
  hx, hy, hz = sx / 2, sy / 2, sz / 2
  corners = np.array([
      [-hx, -hy, -hz], [hx, -hy, -hz], [hx, hy, -hz], [-hx, hy, -hz],
      [-hx, -hy, hz], [hx, -hy, hz], [hx, hy, hz], [-hx, hy, hz]])
  faces = np.array([
      [0, 2, 1], [0, 3, 2],  # -z
      [4, 5, 6], [4, 6, 7],  # +z
      [0, 1, 5], [0, 5, 4],  # -y
      [2, 3, 7], [2, 7, 6],  # +y
      [1, 2, 6], [1, 6, 5],  # +x
      [0, 4, 7], [0, 7, 3],  # -x
  ])
  colors = np.full((8, 3), 180)
  return {'pts': corners.astype(np.float64), 'faces': faces,
          'colors': colors}


def dense_box_mesh(n=6, **kw):
  """Box with subdivided faces (more vertices for fragmentation)."""
  base = box_mesh(**kw)
  # Subdivide by sampling a grid on each face.
  hx, hy, hz = [kw.get(k, d) / 2 for k, d in
                (('sx', 60.0), ('sy', 40.0), ('sz', 30.0))]
  pts = []
  u = np.linspace(-1, 1, n)
  for a in u:
    for b in u:
      pts += [[hx, a * hy, b * hz], [-hx, a * hy, b * hz],
              [a * hx, hy, b * hz], [a * hx, -hy, b * hz],
              [a * hx, b * hy, hz], [a * hx, b * hy, -hz]]
  pts = np.unique(np.round(np.array(pts), 6), axis=0)
  return {'pts': pts, 'faces': base['faces'],
          'verts_corner': base['pts']}


DEFAULT_K = np.array([[300.0, 0, 80.0], [0, 300.0, 60.0], [0, 0, 1.0]])


def simple_scene(width=160, height=120, obj_id=1, z=800.0):
  """One box in front of the camera. Returns dict with everything a GT test
  needs."""
  mesh = box_mesh()
  renderer = Renderer()
  renderer.init(width, height)
  renderer.add_object(obj_id, mesh)
  q = np.array([0.9, 0.1, 0.3, 0.2])
  q /= np.linalg.norm(q)
  R = geometry.quaternion_matrix(q)
  t = np.array([5.0, -10.0, z])
  return {
      'mesh': mesh, 'renderer': renderer, 'obj_id': obj_id,
      'K': DEFAULT_K.copy(), 'q': q, 'R': R, 't': t,
      'width': width, 'height': height,
  }


def fragmented_store(mesh, num_frags=8, obj_id=1):
  """Fragment a mesh; returns (frag_centers dict, frag_sizes dict)."""
  # Use a denser sampling of the surface for FPS.
  dense = dense_box_mesh(n=8)
  centers, ids = fragment_lib.fragmentation_fps(dense['pts'], num_frags)
  sizes = fragment_lib.fragment_sizes(dense['pts'], ids, num_frags)
  return {obj_id: centers}, {obj_id: sizes}
