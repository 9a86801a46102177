"""Host renderer: thread-safe rasterization of depth / local-XYZ / color.

API mirrors the surface the reference consumes from bop_renderer
(SURVEY.md §2.3): Renderer().init(w, h), add_object(obj_id, ply_path),
render_object(obj_id, R9, t3, fx, fy, cx, cy), get_depth_image,
get_local_pos_image, get_color_image.

The compute core is a stateless C++ function (native/rasterizer.cpp, loaded
via ctypes) — reentrant, so multiple pipeline workers can render concurrently,
unlike the reference renderer (epos_lib/datagen.py:680-683). A pure-numpy
fallback implements identical semantics when the .so is not built.
"""

import ctypes
import os
import threading

import numpy as np

from epos_tpu.data import bop

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), '..', 'native')
_SO_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, 'librasterizer.so'))

_lib = None
_lib_lock = threading.Lock()


def _load_native():
  """Loads (and lazily builds) the native rasterizer; None if unavailable."""
  global _lib
  with _lib_lock:
    if _lib is not None:
      return _lib
    if not os.path.exists(_SO_PATH):
      # Try to build it (toolchain is available in the image).
      import subprocess
      try:
        subprocess.run(['make', '-C', os.path.abspath(_NATIVE_DIR)],
                       check=True, capture_output=True, timeout=120)
      except Exception:
        return None
    if not os.path.exists(_SO_PATH):
      return None
    lib = ctypes.CDLL(_SO_PATH)
    lib.rasterize_tex.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,       # V, nv
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int,        # F, nf
        ctypes.POINTER(ctypes.c_uint8),                      # C
        ctypes.POINTER(ctypes.c_double),                     # UV
        ctypes.POINTER(ctypes.c_uint8),                      # tex
        ctypes.c_int, ctypes.c_int,                          # tw, th
        ctypes.POINTER(ctypes.c_double),                     # R
        ctypes.POINTER(ctypes.c_double),                     # t
        ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.c_int, ctypes.c_int,                          # w, h
        ctypes.POINTER(ctypes.c_float),                      # depth
        ctypes.POINTER(ctypes.c_float),                      # xyz
        ctypes.POINTER(ctypes.c_uint8),                      # rgb
    ]
    lib.rasterize_tex.restype = None
    _lib = lib
    return _lib


def _rasterize_py(V, F, C, R, t, fx, fy, cx, cy, width, height,
                  want_xyz=True, want_rgb=True, UV=None, tex=None):
  """Numpy fallback with the same semantics as native rasterize()."""
  depth = np.zeros((height, width), np.float32)
  xyz = np.zeros((height, width, 3), np.float32) if want_xyz else None
  rgb = np.zeros((height, width, 3), np.uint8) if want_rgb else None

  cam = V @ R.T + t
  z = cam[:, 2]
  with np.errstate(divide='ignore', invalid='ignore'):
    px = np.stack([fx * cam[:, 0] / z + cx, fy * cam[:, 1] / z + cy], 1)

  for f in range(F.shape[0]):
    ia, ib, ic = F[f]
    za, zb, zc = z[ia], z[ib], z[ic]
    if min(za, zb, zc) <= 1e-6:
      continue
    a, b, c = px[ia], px[ib], px[ic]
    x0 = max(0, int(np.floor(min(a[0], b[0], c[0]) - 0.5)))
    x1 = min(width - 1, int(np.ceil(max(a[0], b[0], c[0]))))
    y0 = max(0, int(np.floor(min(a[1], b[1], c[1]) - 0.5)))
    y1 = min(height - 1, int(np.ceil(max(a[1], b[1], c[1]))))
    if x0 > x1 or y0 > y1:
      continue
    area = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
    if abs(area) < 1e-12:
      continue
    xs = np.arange(x0, x1 + 1) + 0.5
    ys = np.arange(y0, y1 + 1) + 0.5
    gx, gy = np.meshgrid(xs, ys)
    w0 = ((b[0] - gx) * (c[1] - gy) - (b[1] - gy) * (c[0] - gx)) / area
    w1 = ((c[0] - gx) * (a[1] - gy) - (c[1] - gy) * (a[0] - gx)) / area
    w2 = 1.0 - w0 - w1
    inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
    if not inside.any():
      continue
    iz = w0 / za + w1 / zb + w2 / zc
    zval = np.where(iz > 0, 1.0 / np.maximum(iz, 1e-12), np.inf)
    patch = depth[y0:y1 + 1, x0:x1 + 1]
    closer = inside & ((patch == 0) | (zval < patch))
    patch[closer] = zval[closer].astype(np.float32)
    ka = (w0 / za) * zval
    kb = (w1 / zb) * zval
    kc = (w2 / zc) * zval
    if want_xyz:
      interp = (ka[..., None] * V[ia] + kb[..., None] * V[ib] +
                kc[..., None] * V[ic])
      xyz[y0:y1 + 1, x0:x1 + 1][closer] = interp[closer].astype(np.float32)
    if want_rgb:
      e1, e2 = cam[ib] - cam[ia], cam[ic] - cam[ia]
      n = np.cross(e1, e2)
      nn = np.linalg.norm(n)
      shade = 0.4 + 0.6 * abs(n[2] / nn) if nn > 0 else 1.0
      if UV is not None and tex is not None:
        th_, tw_ = tex.shape[:2]
        u = ka * UV[ia, 0] + kb * UV[ib, 0] + kc * UV[ic, 0]
        v = ka * UV[ia, 1] + kb * UV[ib, 1] + kc * UV[ic, 1]
        tx = np.clip(np.round(u * (tw_ - 1)).astype(int), 0, tw_ - 1)
        ty = np.clip(np.round((1.0 - v) * (th_ - 1)).astype(int), 0, th_ - 1)
        col = tex[ty, tx].astype(np.float64)
      elif C is not None:
        col = (ka[..., None] * C[ia] + kb[..., None] * C[ib] +
               kc[..., None] * C[ic])
      else:
        col = np.full(ka.shape + (3,), 200.0)
      col = np.clip(col * shade, 0, 255)
      rgb[y0:y1 + 1, x0:x1 + 1][closer] = col[closer].astype(np.uint8)
  return depth, xyz, rgb


class Renderer:
  """bop_renderer-compatible surface over the stateless rasterizer core.

  Thread-safety: render results are stored per (thread, obj_id), so a single
  Renderer can be shared by concurrent pipeline workers.
  """

  def __init__(self):
    self.width = None
    self.height = None
    self._models = {}
    self._local = threading.local()
    self._native = _load_native()

  def init(self, width, height):
    self.width = int(width)
    self.height = int(height)

  def add_object(self, obj_id, model_or_path):
    """Registers a model: a PLY path or a dict with 'pts'/'faces'.

    Texture mapping (bop_renderer parity for textured BOP models like
    YCB-V): a model with 'texture_uv' per-vertex coordinates and either a
    'texture' HxWx3 array or a 'texture_file' (resolved relative to the
    PLY path) renders with nearest-texel sampling."""
    if isinstance(model_or_path, str):
      model = bop.load_ply(model_or_path)
      if 'texture_file' in model and 'texture' not in model:
        tex_path = os.path.join(os.path.dirname(model_or_path),
                                model['texture_file'])
        if os.path.exists(tex_path):
          import cv2
          tex = cv2.imread(tex_path, cv2.IMREAD_COLOR)
          if tex is not None:
            model['texture'] = cv2.cvtColor(tex, cv2.COLOR_BGR2RGB)
    else:
      model = model_or_path
    V = np.ascontiguousarray(model['pts'], np.float64)
    F = np.ascontiguousarray(model.get('faces', np.zeros((0, 3))), np.int32)
    C = model.get('colors')
    if C is not None:
      C = np.ascontiguousarray(np.clip(C, 0, 255), np.uint8)
    UV = model.get('texture_uv')
    tex = model.get('texture')
    if UV is not None:
      UV = np.ascontiguousarray(UV, np.float64)
    if tex is not None:
      tex = np.ascontiguousarray(tex, np.uint8)
    self._models[int(obj_id)] = (V, F, C, UV, tex)

  def _results(self):
    if not hasattr(self._local, 'results'):
      self._local.results = {}
    return self._local.results

  def render_object(self, obj_id, R, t, fx, fy, cx, cy,
                    want_xyz=True, want_rgb=True):
    """Renders object obj_id under pose (R, t). R: 9 floats or 3x3."""
    V, F, C, UV, tex = self._models[int(obj_id)]
    R = np.asarray(R, np.float64).reshape(3, 3)
    t = np.asarray(t, np.float64).reshape(3)
    w, h = self.width, self.height

    if self._native is not None:
      depth = np.zeros((h, w), np.float32)
      xyz = np.zeros((h, w, 3), np.float32) if want_xyz else None
      rgb = np.zeros((h, w, 3), np.uint8) if want_rgb else None
      null_u8 = ctypes.cast(None, ctypes.POINTER(ctypes.c_uint8))
      null_f64 = ctypes.cast(None, ctypes.POINTER(ctypes.c_double))
      cptr = (C.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
              if C is not None else null_u8)
      uvptr = (UV.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
               if UV is not None else null_f64)
      texptr = (tex.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
                if tex is not None else null_u8)
      tw = tex.shape[1] if tex is not None else 0
      th = tex.shape[0] if tex is not None else 0
      Rc = np.ascontiguousarray(R)
      tc = np.ascontiguousarray(t)
      self._native.rasterize_tex(
          V.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), V.shape[0],
          F.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), F.shape[0],
          cptr, uvptr, texptr, tw, th,
          Rc.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
          tc.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
          float(fx), float(fy), float(cx), float(cy), w, h,
          depth.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
          (xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) if want_xyz
           else ctypes.cast(None, ctypes.POINTER(ctypes.c_float))),
          (rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)) if want_rgb
           else null_u8))
    else:
      depth, xyz, rgb = _rasterize_py(
          V, F, C, R, t, fx, fy, cx, cy, w, h, want_xyz, want_rgb,
          UV=UV, tex=tex)

    self._results()[int(obj_id)] = (depth, xyz, rgb)

  def get_depth_image(self, obj_id):
    return self._results()[int(obj_id)][0]

  def get_local_pos_image(self, obj_id):
    return self._results()[int(obj_id)][1]

  def get_color_image(self, obj_id):
    return self._results()[int(obj_id)][2]
