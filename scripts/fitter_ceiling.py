#!/usr/bin/env python3
"""Fitter ceiling: PERFECT correspondences -> fit -> BOP19 AR.

Renders the GT of an existing synthetic_e2e work_dir split, samples the
visible surface on the output-stride pixel grid (model-frame XYZ from the
rasterizer — i.e. zero-noise correspondences with exact per-pixel object
identity), runs the production fitter (ops/ransac.fit_instances at the
inference defaults), and evaluates BOP19 AR against the same GT. The result
is the accuracy ceiling the CNN's correspondence quality is measured
against: on the round-3 tracked holdout (crowded 2-object scenes, 2
instances each, 320x240) the ceiling is AR 0.92 — the unreachable 8% are
instances whose visible support is (almost) fully occluded at stride 4.

Mirrors the role of the reference's GT-input sanity runs (feeding
pyprogressivex GT-derived correspondences, infer.py:470-488 inputs), which
the reference has no committed tool for.

CPU-only by design — never touches the TPU claim. Usage:
  python scripts/fitter_ceiling.py --work_dir /tmp/e2e_r3c \
      [--split train_holdout] [--num_hypotheses 400] [--num_images 64]
Prints one JSON line {"gt_ceiling_ar": ...}.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main(args=None):
  p = argparse.ArgumentParser()
  p.add_argument('--work_dir', required=True,
                 help='A scripts/synthetic_e2e.py work_dir.')
  p.add_argument('--split', default='train_holdout')
  p.add_argument('--num_hypotheses', type=int, default=400)
  p.add_argument('--num_images', type=int, default=None)
  p.add_argument('--stride', type=int, default=4)
  ns = p.parse_args(args)

  root = os.path.abspath(ns.work_dir)
  os.environ['BOP_PATH'] = root + '/bop'
  os.environ['TF_DATA_PATH'] = root + '/tf_data'
  os.environ['TF_MODELS_PATH'] = root + '/tf_models'
  os.environ.setdefault('JAX_PLATFORMS', 'cpu')
  import jax
  jax.config.update('jax_platforms', 'cpu')
  import numpy as np
  import jax.numpy as jnp
  from epos_tpu import config as config_epos
  config_epos.BOP_PATH = root + '/bop'
  config_epos.TF_DATA_PATH = root + '/tf_data'
  config_epos.TF_MODELS_PATH = root + '/tf_models'
  from epos_tpu.data.renderer import Renderer
  from epos_tpu.ops import ransac
  from tests import synthetic
  import cv2

  split_dir = os.path.join(root, 'bop', 'synthbox', ns.split, '000001')
  scene_gt = json.load(open(os.path.join(split_dir, 'scene_gt.json')))
  scene_cam = json.load(open(os.path.join(split_dir, 'scene_camera.json')))
  im0 = cv2.imread(os.path.join(split_dir, 'rgb', '000000.png'))
  h, w = im0.shape[:2]
  stride = ns.stride
  ow = w // stride
  npx = ow * (h // stride)
  n_im = ns.num_images or len(scene_gt)

  meshes, _, _ = synthetic.synthbox_meshes(2, True)
  r = Renderer()
  r.init(w, h)
  for oid, m in meshes.items():
    r.add_object(oid, m)

  C = 2048
  nh = ns.num_hypotheses

  @jax.jit
  def fit_jit(uv, xyz, val, px, K, k, key):
    return ransac.fit_instances(
        uv, xyz, val.astype(jnp.float32), px, val, K,
        npx=npx, rng=key, num_hypotheses=nh, inlier_thresh=4.0,
        max_instances=6, num_instances=k, min_quality=0.5, grid_w=ow)

  poses_csv = []
  for im_id in range(n_im):
    gts = scene_gt[str(im_id)]
    K = np.array(scene_cam[str(im_id)]['cam_K']).reshape(3, 3)
    depths, xyzs, oids = [], [], []
    for g in gts:
      R = np.array(g['cam_R_m2c']).reshape(3, 3)
      t = np.array(g['cam_t_m2c'])
      r.render_object(g['obj_id'], R.flatten(), t,
                      K[0, 0], K[1, 1], K[0, 2], K[1, 2])
      depths.append(r.get_depth_image(g['obj_id']).copy())
      xyzs.append(r.get_local_pos_image(g['obj_id']).copy())
      oids.append(g['obj_id'])
    st = np.stack([np.where(d > 0, d, np.inf) for d in depths])
    win = np.argmin(st, 0)
    anyhit = np.isfinite(st.min(0))
    ys, xs = np.mgrid[stride // 2:h:stride, stride // 2:w:stride]
    for o in sorted(set(oids)):
      mine = anyhit[ys, xs] & np.isin(
          win[ys, xs], [i for i, oid in enumerate(oids) if oid == o])
      if mine.sum() < 6:
        continue
      uv = np.stack([xs[mine] + 0.5, ys[mine] + 0.5], 1).astype(np.float32)
      gi = win[ys, xs][mine]
      xyz = np.stack([xyzs[g][y, x] for g, y, x in
                      zip(gi, ys[mine], xs[mine])]).astype(np.float32)
      n = min(len(uv), C)
      if len(uv) > C:
        keep = np.random.default_rng(0).choice(len(uv), C, replace=False)
        uv, xyz = uv[keep], xyz[keep]
      uvp = np.zeros((C, 2), np.float32)
      xyzp = np.zeros((C, 3), np.float32)
      uvp[:n], xyzp[:n] = uv[:n], xyz[:n]
      valid = np.arange(C) < n
      px = (uvp[:, 1].astype(int) // stride) * ow \
          + (uvp[:, 0].astype(int) // stride)
      res = fit_jit(
          jnp.asarray(uvp), jnp.asarray(xyzp), jnp.asarray(valid),
          jnp.asarray(np.clip(px, 0, npx - 1), jnp.int32),
          jnp.asarray(K, jnp.float32),
          jnp.asarray(sum(1 for oid in oids if oid == o), jnp.int32),
          jax.random.PRNGKey(im_id * 7 + o))
      for i in range(6):
        if bool(res.valid[i]):
          poses_csv.append((im_id, o, float(res.quality[i]),
                            np.asarray(res.R[i]), np.asarray(res.t[i])))

  csv_path = os.path.join(root, f'fitter-ceiling-{ns.split}.csv')
  with open(csv_path, 'w') as f:
    f.write('scene_id,im_id,obj_id,score,R,t,time\n')
    for im_id, o, score, R, t in poses_csv:
      Rs = ' '.join(f'{v:.8f}' for v in R.flatten())
      ts = ' '.join(f'{v:.8f}' for v in t.flatten())
      f.write(f'1,{im_id},{o},{score:.4f},{Rs},{ts},0\n')
  import scripts.eval_poses as eval_poses_script
  out = eval_poses_script.main(
      ['--dataset', 'synthbox', '--split', ns.split, '--results', csv_path])
  print(json.dumps({'gt_ceiling_ar': round(out['ar'], 4),
                    'ar_vsd': round(out.get('ar_vsd', -1.0), 4),
                    'ar_mssd': round(out['ar_mssd'], 4),
                    'ar_mspd': round(out['ar_mspd'], 4),
                    'n_estimates': len(poses_csv)}))
  return out


if __name__ == '__main__':
  main()
