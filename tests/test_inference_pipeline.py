"""End-to-end inference-path test on a synthetic scene.

Builds 'perfect predictions' from GT fragment fields (the idealized output of
a perfectly trained net), runs the jitted correspondence extraction +
on-device multi-instance RANSAC, and asserts the recovered pose matches GT.
This exercises the full infer-side device path (SURVEY.md §7 minimum slice)
without a trained model.
"""

import jax
import jax.numpy as jnp
import numpy as np

from epos_tpu.data import gt_fields
from epos_tpu.ops import corresp as corresp_lib
from epos_tpu.ops import geometry, ransac
from tests import synthetic


def build_perfect_predictions(s, frag_centers, frag_sizes, num_frags=8):
  """GT fields -> (obj_confs, frag_confs, frag_coords) dense maps."""
  K = s['K']
  gen = gt_fields.FragmentFieldGenerator(
      frag_centers, frag_sizes, s['renderer'], knn_frags=1)
  s['renderer'].render_object(
      s['obj_id'], s['R'].flatten(), s['t'],
      K[0, 0], K[1, 1], K[0, 2], K[1, 2])
  mask = s['renderer'].get_depth_image(s['obj_id']) > 0
  ids, coords, w = gen.construct_frag_fields(
      s['width'], s['height'], K, [s['obj_id']], [s['q']], [s['t']], [mask])

  h, w_, num_objs = s['height'], s['width'], 1
  obj_confs = np.zeros((h, w_, num_objs + 1), np.float32)
  obj_confs[..., 0] = 1.0
  obj_confs[mask, 0] = 0.05
  obj_confs[mask, 1] = 0.95
  frag_confs = np.full((h, w_, num_objs, num_frags), 1e-4, np.float32)
  ys, xs = np.nonzero(mask)
  frag_confs[ys, xs, 0, ids[ys, xs, 0]] = 0.9
  frag_coords = np.zeros((h, w_, num_objs, num_frags, 3), np.float32)
  frag_coords[ys, xs, 0, ids[ys, xs, 0]] = coords[ys, xs, 0]
  return obj_confs, frag_confs, frag_coords, mask


def test_full_inference_slice_recovers_pose():
  s = synthetic.simple_scene()
  num_frags = 8
  frag_centers, frag_sizes = synthetic.fragmented_store(
      s['mesh'], num_frags=num_frags, obj_id=s['obj_id'])
  obj_confs, frag_confs, frag_coords, mask = build_perfect_predictions(
      s, frag_centers, frag_sizes, num_frags)

  centers_arr = jnp.asarray(frag_centers[s['obj_id']])[None]  # [O=1, F, 3]
  sizes_arr = jnp.asarray(frag_sizes[s['obj_id']])[None]

  # The maps are at "output" resolution; treat output_scale=1 (K already at
  # that resolution in this synthetic setup).
  @jax.jit
  def infer(obj_confs, frag_confs, frag_coords):
    corrs = corresp_lib.establish_many_to_many(
        obj_confs, frag_confs, frag_coords, centers_arr, sizes_arr,
        output_scale=1.0, capacity=1024)
    fits = ransac.fit_all_objects(
        corrs, jnp.asarray(s['K'], jnp.float32),
        npx=s['height'] * s['width'], rng=jax.random.PRNGKey(0),
        instance_counts=jnp.array([1]), num_hypotheses=128,
        inlier_thresh=4.0, max_instances=1, min_quality=0.3)
    return corrs, fits

  corrs, fits = infer(jnp.asarray(obj_confs), jnp.asarray(frag_confs),
                      jnp.asarray(frag_coords))

  assert int(corrs.count[0]) >= mask.sum()  # one corr per fg pixel at least
  assert bool(fits.valid[0, 0])
  R_est = np.asarray(fits.R[0, 0])
  t_est = np.asarray(fits.t[0, 0])
  dR = R_est @ s['R'].T
  ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
  dt = np.linalg.norm(t_est - s['t'])
  assert ang < 3.0, f'rotation error {ang} deg'
  assert dt < 10.0, f'translation error {dt} mm'
  assert float(fits.quality[0, 0]) > 0.8
