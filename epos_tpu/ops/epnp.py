"""EPnP perspective-n-point solver in pure JAX (vmappable, jittable).

TPU-native replacement for the EPnP solvers the reference reaches through
pyprogressivex / cv2.solvePnPRansac (scripts/infer.py:470-528). Weighted
formulation: every correspondence carries a weight in [0, 1], so fixed-shape
buffers with mask weights replace dynamic point lists (SURVEY.md §7 "hard
parts").

Algorithm (Lepetit et al., IJCV 2009): 4 control points from the weighted
PCA frame, barycentric coordinates, the 2n x 12 projection system, the N=1
betas solution refined by Gauss-Newton on the control-point distance
constraints, then weighted Kabsch alignment.
"""

import jax
import jax.numpy as jnp

_EPS = 1e-9
# TPU matmuls default to bfloat16 precision; the EPnP normal equations have
# condition numbers ~1e6+ (the smallest eigenvalue IS the signal), so every
# small matmul here forces full-f32 accumulation.
_HI = jax.lax.Precision.HIGHEST


def _mm(a, b):
  return jnp.matmul(a, b, precision=_HI)


def mat3_apply(R, pts):
  """R [..., 3, 3] applied to pts [n, 3] -> [..., n, 3], unrolled.

  TPU note: expressing this as dot_general (pts @ R.T) pads the size-3
  contraction onto the 128x128 MXU — measured ~500x slower than the
  unrolled elementwise form for large hypothesis batches.
  """
  x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]
  out = []
  for i in range(3):
    out.append(R[..., i, 0:1] * x + R[..., i, 1:2] * y + R[..., i, 2:3] * z)
  return jnp.stack(out, axis=-1)


def mat_small_apply(A, x):
  """A [..., m, k] @ x [..., k] -> [..., m] for tiny m, k (unrolled)."""
  k = A.shape[-1]
  return sum(A[..., :, i] * x[..., i][..., None] for i in range(k))


def sym_eigh3(A):
  """Analytic eigendecomposition of a symmetric 3x3 (Smith's trigonometric
  method + row-cross eigenvectors). Pure arithmetic — vmapping
  lax.linalg.eigh over RANSAC hypothesis batches is the single most
  expensive op of the minimal solves on TPU (hazard: batched tiny
  eigh/svd serialize).

  Returns (eigvals [3] ascending, eigvecs [3,3] columns).
  """
  a00, a01, a02 = A[0, 0], A[0, 1], A[0, 2]
  a11, a12, a22 = A[1, 1], A[1, 2], A[2, 2]
  p1 = a01 * a01 + a02 * a02 + a12 * a12
  q = (a00 + a11 + a22) / 3.0
  p2 = ((a00 - q) ** 2 + (a11 - q) ** 2 + (a22 - q) ** 2 + 2.0 * p1)
  p = jnp.sqrt(jnp.maximum(p2 / 6.0, 1e-30))
  b00, b11, b22 = (a00 - q) / p, (a11 - q) / p, (a22 - q) / p
  b01, b02, b12 = a01 / p, a02 / p, a12 / p
  detB = (b00 * (b11 * b22 - b12 * b12)
          - b01 * (b01 * b22 - b12 * b02)
          + b02 * (b01 * b12 - b11 * b02))
  r = jnp.clip(detB / 2.0, -1.0, 1.0)
  phi = jnp.arccos(r) / 3.0
  e_hi = q + 2.0 * p * jnp.cos(phi)
  e_lo = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
  e_mid = 3.0 * q - e_hi - e_lo
  eigvals = jnp.stack([e_lo, e_mid, e_hi])

  def eigvec_for(lam, fallback):
    # Null vector of (A - lam I): the largest cross product of two rows.
    r0 = jnp.stack([a00 - lam, a01, a02])
    r1 = jnp.stack([a01, a11 - lam, a12])
    r2 = jnp.stack([a02, a12, a22 - lam])
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    cands = jnp.stack([c01, c02, c12])
    norms = jnp.sum(cands * cands, axis=1)
    v = cands[jnp.argmax(norms)]
    n = jnp.sqrt(jnp.maximum(jnp.sum(v * v), 1e-30))
    # Repeated eigenvalues make every cross product vanish; the caller's
    # fallback completes a valid orthonormal frame then (an isotropic /
    # zero covariance has no preferred axes).
    return jnp.where(n > 1e-12, v / n, fallback)

  v_lo = eigvec_for(e_lo, jnp.array([1.0, 0.0, 0.0]))
  # v_hi's fallback must stay independent of whatever v_lo resolved to:
  # pick the canonical axis LEAST aligned with v_lo.
  axes = jnp.eye(3)
  fallback_hi = axes[jnp.argmin(jnp.abs(axes @ v_lo))]
  v_hi = eigvec_for(e_hi, fallback_hi)
  # Orthogonal middle vector; re-orthogonalize v_hi defensively. If v_hi
  # collapsed onto v_lo (degenerate spectrum), substitute the fallback.
  v_hi = v_hi - jnp.sum(v_hi * v_lo) * v_lo
  n_hi = jnp.linalg.norm(v_hi)
  fb = fallback_hi - jnp.sum(fallback_hi * v_lo) * v_lo
  fb = fb / jnp.maximum(jnp.linalg.norm(fb), 1e-12)
  v_hi = jnp.where(n_hi > 1e-12, v_hi / jnp.maximum(n_hi, 1e-12), fb)
  v_mid = jnp.cross(v_hi, v_lo)
  eigvecs = jnp.stack([v_lo, v_mid, v_hi], axis=1)
  return eigvals, eigvecs


def _control_points(pts, w):
  """Weighted PCA control points (textbook EPnP choice — axis-aligned
  frames measurably hurt planar-case accuracy). pts [n,3], w [n] ->
  (ctrl [4,3], c0, eigvec, s)."""
  wsum = jnp.maximum(jnp.sum(w), _EPS)
  c0 = jnp.sum(pts * w[:, None], axis=0) / wsum
  centered = (pts - c0) * jnp.sqrt(w)[:, None]
  cov = _mm(centered.T, centered) / wsum
  eigval, eigvec = sym_eigh3(cov)                # ascending, analytic
  s = jnp.sqrt(jnp.maximum(eigval, 1e-8))
  ctrl = jnp.concatenate([c0[None], c0[None] + (s[:, None] * eigvec.T)],
                         axis=0)                  # [4, 3]
  return ctrl, c0, eigvec, s


def _alphas(pts, c0, eigvec, s):
  """Barycentric coords wrt control points: [n, 4] summing to 1."""
  d = pts - c0
  # (pts - c0) @ eigvec, unrolled (size-3 contraction; see mat3_apply note).
  proj = jnp.stack(
      [d[:, 0] * eigvec[0, i] + d[:, 1] * eigvec[1, i] +
       d[:, 2] * eigvec[2, i] for i in range(3)], axis=1) / s[None, :]
  a0 = 1.0 - jnp.sum(proj, axis=1)
  return jnp.concatenate([a0[:, None], proj], axis=1)


def _build_M(alphas, uv, K, w):
  """The 2n x 12 EPnP system, rows scaled by sqrt(weight)."""
  fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
  n = alphas.shape[0]
  u, v = uv[:, 0], uv[:, 1]
  sw = jnp.sqrt(jnp.maximum(w, 0.0))
  # Row pairs: [a_i fx, 0, a_i (cx - u)] and [0, a_i fy, a_i (cy - v)].
  zeros = jnp.zeros_like(alphas)
  row_u = jnp.stack([alphas * fx, zeros, alphas * (cx - u)[:, None]],
                    axis=2).reshape(n, 12) * sw[:, None]
  row_v = jnp.stack([zeros, alphas * fy, alphas * (cy - v)[:, None]],
                    axis=2).reshape(n, 12) * sw[:, None]
  return jnp.concatenate([row_u, row_v], axis=0)  # [2n, 12]


def _pairs():
  return jnp.array([(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)])


def _ctrl_dists(ctrl):
  p = _pairs()
  d = ctrl[p[:, 0]] - ctrl[p[:, 1]]
  return d, jnp.sum(d * d, axis=1)


def _gauss_newton_betas(V, dist_w_sq, beta0, iters=5):
  """Refines betas so control-point distances match the world distances.

  V: [12, nb] basis of the 4 smallest right-singular vectors (as columns).
  dist_w_sq: [6] squared world control distances.
  """
  p = _pairs()
  Vr = V.T.reshape(-1, 4, 3)                      # [nb, 4, 3]
  dv = Vr[:, p[:, 0], :] - Vr[:, p[:, 1], :]      # [nb, 6, 3]

  def body(_, beta):
    # cc_diff [6,3] for current betas.
    diff = jnp.einsum('b,bpk->pk', beta, dv)
    f = jnp.sum(diff * diff, axis=1) - dist_w_sq  # [6]
    # Jacobian df/dbeta = 2 * diff . dv
    J = 2.0 * jnp.einsum('pk,bpk->pb', diff, dv)  # [6, nb]
    JtJ = _mm(J.T, J) + 1e-9 * jnp.eye(J.shape[1])
    g = _mm(J.T, f[:, None])[:, 0]
    nb = JtJ.shape[-1]
    L = chol_unrolled(JtJ)
    step = chol_solve_unrolled(L, [g[i] for i in range(nb)])
    return beta - jnp.stack(step)

  return jax.lax.fori_loop(0, iters, body, beta0)


def chol_unrolled(A):
  """Cholesky of [..., n, n] PSD matrices, fully unrolled over n.

  For tiny n with huge batches, lax.linalg.cholesky under-utilizes the TPU;
  the unrolled Cholesky-Banachiewicz recurrence is pure batched arithmetic.
  Returns the lower factor as an n x n list-of-lists of [...] arrays.
  """
  n = A.shape[-1]
  L = [[None] * n for _ in range(n)]
  for i in range(n):
    for j in range(i + 1):
      s = A[..., i, j]
      for k in range(j):
        s = s - L[i][k] * L[j][k]
      if i == j:
        L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-20))
      else:
        L[i][j] = s / L[j][j]
  return L


def trisolve_unrolled(L, b, transpose=False):
  """Solves L x = b (or L^T x = b) for the list-of-lists factor from
  chol_unrolled. b: list of n [...] arrays. Returns list of n arrays."""
  n = len(L)
  x = [None] * n
  if not transpose:
    for i in range(n):
      s = b[i]
      for k in range(i):
        s = s - L[i][k] * x[k]
      x[i] = s / L[i][i]
  else:
    for i in reversed(range(n)):
      s = b[i]
      for k in range(i + 1, n):
        s = s - L[k][i] * x[k]
      x[i] = s / L[i][i]
  return x


def chol_solve_unrolled(L, b):
  """A^-1 b via the unrolled factor; b: list of n [...] arrays."""
  return trisolve_unrolled(L, trisolve_unrolled(L, b), transpose=True)


def _matvec_unrolled(A, x):
  """A [..., n, n] @ x [..., n] with the contraction unrolled: pure
  fused-multiply-adds, batches cleanly on the VPU (vs dot_general padding
  tiny dims onto the MXU, or lax.linalg solves that serialize)."""
  n = A.shape[-1]
  return sum(A[..., :, k] * x[..., k][..., None] for k in range(n))


def _smallest_eigvecs_power(A, k=1, iters=2):
  """k smallest eigenvectors of a symmetric PSD matrix via block Cholesky
  inverse iteration with Gram-Schmidt orthonormalization.

  EPnP's MtM has near-zero smallest eigenvalues far below the rest, so
  inverse iteration converges in 2-3 steps (a shifted power iteration would
  need thousands for this spectrum). eigh would lower to a slow QR routine;
  Cholesky + triangular solves batch acceptably over hypothesis batches.

  Returns [..., n, k] with columns ordered smallest-first (approximately).
  """
  n = A.shape[-1]
  reg = 1e-5 * jnp.trace(A)[..., None, None] / n
  Areg = A + reg * jnp.eye(n, dtype=A.dtype)
  # Unrolled batched Cholesky: pure VPU arithmetic over the hypothesis
  # batch (lax.linalg solves serialize badly for tiny n, huge batch).
  L = chol_unrolled(Areg)
  # Deterministic, linearly independent starting block.
  x0 = jnp.stack([jnp.ones(A.shape[:-2] + (n,), A.dtype)] + [
      jnp.broadcast_to(
          jnp.linspace(-1.0, 1.0, n, dtype=A.dtype) ** (j + 1),
          A.shape[:-2] + (n,))
      for j in range(k - 1)], axis=-1)              # [..., n, k]

  def orthonormalize(X):
    cols = []
    for j in range(k):
      v = X[..., j]
      for u in cols:
        v = v - jnp.sum(u * v, axis=-1, keepdims=True) * u
      v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), _EPS)
      cols.append(v)
    return jnp.stack(cols, axis=-1)

  def solve_block(X):
    cols = []
    for j in range(X.shape[-1]):
      b = [X[..., i, j] for i in range(n)]
      y = chol_solve_unrolled(L, b)
      cols.append(jnp.stack(y, axis=-1))
    return jnp.stack(cols, axis=-1)

  X = orthonormalize(x0)
  for _ in range(iters):  # Unrolled (iters is tiny; enables fusion).
    X = orthonormalize(solve_block(X))
  return X


def _smallest_eigvec_power(A, iters=2):
  return _smallest_eigvecs_power(A, k=1, iters=iters)[..., 0]


def _quat_to_matrix(q):
  """Unit quaternion [..., 4] (w,x,y,z) -> [..., 3, 3]. Arithmetic only."""
  w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
  xx, yy, zz = x * x, y * y, z * z
  xy, xz, yz = x * y, x * z, y * z
  wx, wy, wz = w * x, w * y, w * z
  return jnp.stack([
      jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], -1),
      jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], -1),
      jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], -1),
  ], -2)


def _kabsch(src, dst, w, iters=64):
  """Weighted rigid alignment src -> dst via Horn's quaternion method.

  The optimal rotation is the largest eigenvector of the 4x4 N-matrix of the
  cross-covariance, found with a shifted power iteration — arithmetic only,
  so it batches over thousands of RANSAC hypotheses (3x3 SVD does not).
  """
  wsum = jnp.maximum(jnp.sum(w), _EPS)
  ms = jnp.sum(src * w[:, None], axis=0) / wsum
  md = jnp.sum(dst * w[:, None], axis=0) / wsum
  S = _mm(((src - ms) * w[:, None]).T, dst - md)  # [3, 3], big contraction.
  Sxx, Sxy, Sxz = S[0, 0], S[0, 1], S[0, 2]
  Syx, Syy, Syz = S[1, 0], S[1, 1], S[1, 2]
  Szx, Szy, Szz = S[2, 0], S[2, 1], S[2, 2]
  N = jnp.stack([
      jnp.stack([Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx]),
      jnp.stack([Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz]),
      jnp.stack([Szx - Sxz, Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy]),
      jnp.stack([Sxy - Syx, Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz]),
  ])
  # Shift by the Gershgorin bound on |lambda| so the target (largest)
  # eigenvalue dominates with the tightest achievable gap.
  shift = jnp.max(jnp.sum(jnp.abs(N), axis=-1))
  B = N + shift * jnp.eye(4, dtype=N.dtype)
  q = jnp.ones((4,), N.dtype) * 0.5

  def body(_, q):
    # Two matvecs per step (power iteration on B^2) halves the iteration
    # count for the same 16-FMA-per-matvec cost.
    y = _matvec_unrolled(B, _matvec_unrolled(B, q))
    return y / jnp.maximum(jnp.linalg.norm(y), _EPS)

  q = jax.lax.fori_loop(0, iters, body, q)
  R = _quat_to_matrix(q)
  t = md - mat_small_apply(R, ms)
  return R, t


def solve_epnp(pts3d, uv, K, weights, gn_iters=5, num_basis=4):
  """Weighted EPnP. pts3d [n,3], uv [n,2], weights [n] (0 disables a row).

  Returns (R [3,3], t [3]) mapping model points into the camera frame.
  Fully differentiable-free path; float32 throughout; vmappable.
  """
  pts3d = pts3d.astype(jnp.float32)
  uv = uv.astype(jnp.float32)
  K = K.astype(jnp.float32)
  w = weights.astype(jnp.float32)

  ctrl_w, c0, eigvec, s = _control_points(pts3d, w)
  alphas = _alphas(pts3d, c0, eigvec, s)
  M = _build_M(alphas, uv, K, w)
  MtM = _mm(M.T, M)
  _, dw2 = _ctrl_dists(ctrl_w)

  def finish(ctrl_c):
    """ctrl_c [4,3] -> (R, t) with cheirality fix + Kabsch."""
    cam_pts = sum(alphas[:, i:i + 1] * ctrl_c[i] for i in range(4))
    mean_z = jnp.sum(cam_pts[:, 2] * w) / jnp.maximum(jnp.sum(w), _EPS)
    flip = jnp.where(mean_z < 0, -1.0, 1.0)
    return _kabsch(pts3d, cam_pts * flip, w)

  def n1_scale(v1):
    dv1, dc2 = _ctrl_dists(v1)
    num = jnp.sum(jnp.sqrt(dc2) * jnp.sqrt(dw2))
    den = jnp.maximum(jnp.sum(dc2), _EPS)
    return num / den

  if num_basis == 1:
    # Fast path: smallest eigenvector + N=1 closed-form scale. Degrades on
    # near-planar samples (the classic EPnP N=1 failure) — use num_basis=2
    # when minimal samples can be planar.
    v1 = _smallest_eigvec_power(MtM).reshape(4, 3)
    ctrl_c = n1_scale(v1) * v1
    return finish(ctrl_c)

  # Planar-robust fast path (no eigh): the num_basis smallest eigenvectors
  # via block inverse iteration; pick the better of the N=1 and the
  # GN-refined multi-beta solutions by weighted reprojection error.
  # Near-planar point sets (objects showing one face) need 3-4 basis
  # vectors — the classic EPnP N=1 degeneracy.
  V = _smallest_eigvecs_power(MtM, k=num_basis, iters=2)   # [12, nb]
  v1 = V[:, 0].reshape(4, 3)
  ctrl_c1 = n1_scale(v1) * v1
  beta0 = jnp.zeros((num_basis,), jnp.float32).at[0].set(n1_scale(v1))
  beta = _gauss_newton_betas(V, dw2, beta0, iters=gn_iters)
  ctrl_c2 = jnp.einsum('b,bk->k', beta, V.T).reshape(4, 3)
  R1, t1 = finish(ctrl_c1)
  R2, t2 = finish(ctrl_c2)
  e1 = jnp.sum(w * reprojection_errors(pts3d, uv, K, R1, t1))
  e2 = jnp.sum(w * reprojection_errors(pts3d, uv, K, R2, t2))
  pick2 = e2 < e1
  return (jnp.where(pick2, R2, R1), jnp.where(pick2, t2, t1))


def _rodrigues(w):
  """Axis-angle [..., 3] -> rotation matrix [..., 3, 3] (arithmetic only)."""
  theta = jnp.linalg.norm(w, axis=-1, keepdims=True)
  theta = jnp.maximum(theta, 1e-12)
  k = w / theta
  kx, ky, kz = k[..., 0], k[..., 1], k[..., 2]
  zero = jnp.zeros_like(kx)
  Km = jnp.stack([
      jnp.stack([zero, -kz, ky], -1),
      jnp.stack([kz, zero, -kx], -1),
      jnp.stack([-ky, kx, zero], -1)], -2)
  st = jnp.sin(theta)[..., None]
  ct = jnp.cos(theta)[..., None]
  eye = jnp.broadcast_to(jnp.eye(3), Km.shape)
  return eye + st * Km + (1 - ct) * (Km @ Km)


def refine_pose_gn(pts3d, uv, K, weights, R, t, iters=5, damping=1e-6):
  """Gauss-Newton refinement of (R, t) on weighted reprojection error.

  The counterpart of GC-RANSAC's local optimization, but solving the actual
  least-squares objective: 6-dof update (axis-angle left-perturbation +
  translation) from the normal equations (6x6 Cholesky solve). All small
  matrix algebra is unrolled/batched — no eigh/svd.

  Args:
    pts3d [n,3], uv [n,2], weights [n]; R [3,3]; t [3].
  Returns refined (R, t).
  """
  fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
  w = weights.astype(jnp.float32)

  def body(_, carry):
    R, t = carry
    cam = mat3_apply(R, pts3d) + t                 # [n, 3]
    X, Y, Z = cam[:, 0], cam[:, 1], cam[:, 2]
    Zs = jnp.maximum(Z, 1e-6)
    u = fx * X / Zs + cx
    v = fy * Y / Zs + cy
    ru = (u - uv[:, 0])
    rv = (v - uv[:, 1])
    # d(u,v)/d(cam): [n, 2, 3].
    iz = 1.0 / Zs
    du = jnp.stack([fx * iz, jnp.zeros_like(iz), -fx * X * iz * iz], -1)
    dv = jnp.stack([jnp.zeros_like(iz), fy * iz, -fy * Y * iz * iz], -1)
    # d(cam)/d(xi): [n, 3, 6] with xi = (omega, dt), cam' = dOmega x cam + dt.
    zero = jnp.zeros_like(X)
    one = jnp.ones_like(X)
    dcam = jnp.stack([
        jnp.stack([zero, Z, -Y, one, zero, zero], -1),
        jnp.stack([-Z, zero, X, zero, one, zero], -1),
        jnp.stack([Y, -X, zero, zero, zero, one], -1)], -2)  # [n, 3, 6]
    # Contraction dim is 3 — unrolled (see mat3_apply note).
    Ju = sum(du[:, k, None] * dcam[:, k, :] for k in range(3))  # [n, 6]
    Jv = sum(dv[:, k, None] * dcam[:, k, :] for k in range(3))
    J = jnp.concatenate([Ju, Jv], axis=0)          # [2n, 6]
    r = jnp.concatenate([ru, rv], axis=0)
    ww = jnp.concatenate([w, w], axis=0)
    JtJ = _mm((J * ww[:, None]).T, J) + damping * jnp.eye(6)
    g = _mm((J * ww[:, None]).T, r[:, None])[:, 0]
    L = chol_unrolled(JtJ)
    step = jnp.stack(chol_solve_unrolled(L, [-g[i] for i in range(6)]))
    dR = _rodrigues(step[:3])
    R2, t2 = dR @ R, mat_small_apply(dR, t) + step[3:]
    # Divergence guard: on degenerate sets (e.g. a mixed multi-instance
    # pool behind a far-off initialization) the normal equations go
    # singular and the update explodes to non-finite values, which then
    # poison every downstream score/argmax with NaN. Keep the previous
    # iterate instead — callers gate acceptance on inlier support, so a
    # stuck pose is simply rejected rather than corrupting the round.
    ok = jnp.isfinite(step).all()
    return jnp.where(ok, R2, R), jnp.where(ok, t2, t)

  return jax.lax.fori_loop(0, iters, body, (R, t))


def reprojection_errors(pts3d, uv, K, R, t):
  """Per-point reprojection error [..., n] in pixels.

  R may carry leading batch dims ([..., 3, 3], t [..., 3]); the transform is
  unrolled elementwise (see mat3_apply note).
  """
  cam = mat3_apply(R, pts3d) + t[..., None, :]
  z = jnp.maximum(cam[..., 2], 1e-6)
  u = K[0, 0] * cam[..., 0] / z + K[0, 2]
  v = K[1, 1] * cam[..., 1] / z + K[1, 2]
  behind = cam[..., 2] <= 1e-6
  err = jnp.sqrt((u - uv[..., 0]) ** 2 + (v - uv[..., 1]) ** 2)
  return jnp.where(behind, 1e9, err)
