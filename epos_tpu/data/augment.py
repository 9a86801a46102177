"""Photometric augmentations as jitted device ops.

TPU-native re-design of epos_lib/augment.py: the reference mixes tf.image ops
with host cv2 py_funcs (blur/noise, augment.py:99-155), serializing the input
pipeline. Here every augmentation is a pure jax function on [0, 1] RGB
batches, applied inside the jitted train step — the host feed stays thin.

Semantics match the reference op-for-op:
  brightness: x + delta,      delta ~ U[min, max]         (augment.py:12-32)
  contrast:   (x - mean_c) * f + mean_c, f ~ U[1+min,1+max] (augment.py:35-57)
  saturation: blend(gray, x, f)                           (augment.py:60-77)
  hue:        rotate hue channel by delta ~ U[-max, max]  (augment.py:80-96)
  blur:       gaussian blur, sigma ~ U[0, max]            (augment.py:99-126)
  noise:      x + N(0, sigma), sigma ~ U[0, max]          (augment.py:129-155)
All outputs clipped to [0, 1].
"""

import jax
import jax.numpy as jnp
import numpy as np


def _u(rng, lo, hi):
  return jax.random.uniform(rng, (), minval=lo, maxval=hi)


# --- JPEG artifacts via DCT quantization (augment.py:158-173) -----------------
# The reference encodes/decodes with tf.image.random_jpeg_quality. Here the
# same artifact distribution (8x8 block DCT, quality-scaled quantization,
# 4:2:0 chroma subsampling) is reproduced as pure jitted math — 8x8 matmuls
# map straight onto the MXU, no host round trip.

# Standard JPEG (Annex K) base quantization tables.
_JPEG_LUMA_Q = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99]], np.float32)
_JPEG_CHROMA_Q = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99]], np.float32)


def _dct8_matrix():
  k, n = np.arange(8)[:, None], np.arange(8)[None, :]
  m = np.sqrt(0.25) * np.cos(np.pi * (2 * n + 1) * k / 16.0)
  m[0] /= np.sqrt(2.0)
  return m.astype(np.float32)  # X = M @ block @ M.T; block = M.T @ X @ M


def _blockwise_quantize(plane, qtable):
  """plane [h, w] (multiple of 8, centered at 0) -> DCT-quantized plane."""
  h, w = plane.shape
  m = jnp.asarray(_dct8_matrix())
  blocks = plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)
  dct = jnp.einsum('ij,bcjk,lk->bcil', m, blocks, m)
  dct = jnp.round(dct / qtable) * qtable
  out = jnp.einsum('ji,bcjk,kl->bcil', m, dct, m)
  return out.transpose(0, 2, 1, 3).reshape(h, w)


def jpeg_artifacts(rng, image, min_quality=80):
  """JPEG compression artifacts at quality ~ U[min_quality, 100]
  (reference augment.py:158-173 / tf.image.random_jpeg_quality).

  image: [h, w, 3] RGB in [0, 1]. Static shapes; pads to 8px blocks.
  """
  h, w, _ = image.shape
  q = jax.random.uniform(rng, (), minval=float(min_quality), maxval=100.0)
  scale = jnp.where(q < 50.0, 5000.0 / q, 200.0 - 2.0 * q)
  luma_t = jnp.clip(jnp.floor(
      (jnp.asarray(_JPEG_LUMA_Q) * scale + 50.0) / 100.0), 1.0, 255.0)
  chroma_t = jnp.clip(jnp.floor(
      (jnp.asarray(_JPEG_CHROMA_Q) * scale + 50.0) / 100.0), 1.0, 255.0)

  x = jnp.round(image * 255.0)
  r, g, b = x[..., 0], x[..., 1], x[..., 2]
  y = 0.299 * r + 0.587 * g + 0.114 * b
  cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
  cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

  ph = (-h) % 8
  pw = (-w) % 8
  pad = lambda p: jnp.pad(p, ((0, ph), (0, pw)), mode='edge')
  hp, wp = h + ph, w + pw

  y_q = _blockwise_quantize(pad(y) - 128.0, luma_t) + 128.0

  def chroma(p):
    # 4:2:0: 2x2 mean subsample, quantize at half resolution, nearest
    # upsample back.
    p = pad(p)
    sub = p.reshape(hp // 2, 2, wp // 2, 2).mean(axis=(1, 3))
    sh = (-sub.shape[0]) % 8
    sw = (-sub.shape[1]) % 8
    subp = jnp.pad(sub, ((0, sh), (0, sw)), mode='edge')
    qd = _blockwise_quantize(subp - 128.0, chroma_t) + 128.0
    qd = qd[:sub.shape[0], :sub.shape[1]]
    return jnp.repeat(jnp.repeat(qd, 2, axis=0), 2, axis=1)

  cb_q = chroma(cb)
  cr_q = chroma(cr)

  y_q = y_q[:h, :w]
  cb_q = cb_q[:h, :w] - 128.0
  cr_q = cr_q[:h, :w] - 128.0
  r2 = y_q + 1.402 * cr_q
  g2 = y_q - 0.344136 * cb_q - 0.714136 * cr_q
  b2 = y_q + 1.772 * cb_q
  out = jnp.stack([r2, g2, b2], axis=-1)
  return jnp.clip(jnp.round(out) / 255.0, 0.0, 1.0)


def random_adjust_brightness(rng, image, min_delta=-0.15, max_delta=0.15):
  return jnp.clip(image + _u(rng, min_delta, max_delta), 0.0, 1.0)


def random_adjust_contrast(rng, image, min_delta=-0.5, max_delta=0.5):
  factor = 1.0 + _u(rng, min_delta, max_delta)
  mean = jnp.mean(image, axis=(-3, -2), keepdims=True)
  return jnp.clip((image - mean) * factor + mean, 0.0, 1.0)


def rgb_to_grayscale(image):
  w = jnp.asarray([0.2989, 0.587, 0.114], image.dtype)
  return jnp.sum(image * w, axis=-1, keepdims=True)


def random_adjust_saturation(rng, image, min_delta=-0.5, max_delta=0.5):
  factor = 1.0 + _u(rng, min_delta, max_delta)
  gray = rgb_to_grayscale(image)
  return jnp.clip(gray + (image - gray) * factor, 0.0, 1.0)


def _rgb_to_hsv(rgb):
  r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
  maxc = jnp.max(rgb, axis=-1)
  minc = jnp.min(rgb, axis=-1)
  v = maxc
  delta = maxc - minc
  s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-12), 0.0)
  safe = jnp.maximum(delta, 1e-12)
  rc = (maxc - r) / safe
  gc = (maxc - g) / safe
  bc = (maxc - b) / safe
  h = jnp.where(r == maxc, bc - gc,
                jnp.where(g == maxc, 2.0 + rc - bc, 4.0 + gc - rc))
  h = (h / 6.0) % 1.0
  h = jnp.where(delta == 0, 0.0, h)
  return jnp.stack([h, s, v], axis=-1)


def _hsv_to_rgb(hsv):
  h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
  i = jnp.floor(h * 6.0)
  f = h * 6.0 - i
  p = v * (1.0 - s)
  q = v * (1.0 - s * f)
  t = v * (1.0 - s * (1.0 - f))
  i = i.astype(jnp.int32) % 6
  r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                 [v, q, p, p, t, v])
  g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                 [t, v, v, q, p, p])
  b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                 [p, p, t, v, v, q])
  return jnp.stack([r, g, b], axis=-1)


def random_adjust_hue(rng, image, max_delta=0.05):
  delta = _u(rng, -max_delta, max_delta)
  hsv = _rgb_to_hsv(image)
  hsv = hsv.at[..., 0].set((hsv[..., 0] + delta) % 1.0)
  return jnp.clip(_hsv_to_rgb(hsv), 0.0, 1.0)


def _gaussian_kernel(sigma, radius=4):
  x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
  k = jnp.exp(-0.5 * (x / jnp.maximum(sigma, 1e-6)) ** 2)
  # sigma ~ 0 -> identity kernel.
  k = jnp.where(sigma < 1e-3, (x == 0).astype(jnp.float32), k)
  return k / jnp.sum(k)


def random_blur(rng, image, max_sigma=3.0, radius=4):
  """Separable gaussian blur with random sigma (augment.py:99-126)."""
  sigma = _u(rng, 0.0, max_sigma)
  k = _gaussian_kernel(sigma, radius)
  no_batch = image.ndim == 3
  x = image[None] if no_batch else image
  # Depthwise separable conv: horizontal then vertical.
  kh = k.reshape(1, -1, 1, 1)
  kv = k.reshape(-1, 1, 1, 1)
  dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape,
                                      ('NHWC', 'HWIO', 'NHWC'))
  c = x.shape[-1]

  def dw(x, kern):
    return jax.lax.conv_general_dilated(
        x, jnp.tile(kern, (1, 1, 1, c)), (1, 1), 'SAME',
        dimension_numbers=dn, feature_group_count=c)

  out = dw(dw(x, kh), kv)
  return out[0] if no_batch else out


def random_gaussian_noise(rng, image, max_sigma=0.08):
  r1, r2 = jax.random.split(rng)
  sigma = _u(r1, 0.0, max_sigma)
  noise = jax.random.normal(r2, image.shape) * sigma
  return jnp.clip(image + noise, 0.0, 1.0)


# Name -> (fn, param adapter) registry matching datagen.py:635-668 dispatch.
def apply_augmentations(rng, image, data_augmentations):
  """Applies the configured augmentations to a [0, 1] RGB image/batch.

  data_augmentations: dict like the reference YAML (train.py:157-159), e.g.
    {'random_adjust_brightness': {'min_delta': -0.15, 'max_delta': 0.15},
     'random_blur': {'max_sigma': 3.0}, ...}
  Unknown names raise (parity with datagen.py:635-668 dispatch).
  """
  if not data_augmentations:
    return image
  for i, (name, params) in enumerate(data_augmentations.items()):
    key = jax.random.fold_in(rng, i)
    p = params or {}
    if name == 'random_adjust_brightness':
      image = random_adjust_brightness(
          key, image, p.get('min_delta', -0.15), p.get('max_delta', 0.15))
    elif name == 'random_adjust_contrast':
      image = random_adjust_contrast(
          key, image, p.get('min_delta', -0.5), p.get('max_delta', 0.5))
    elif name == 'random_adjust_saturation':
      image = random_adjust_saturation(
          key, image, p.get('min_delta', -0.5), p.get('max_delta', 0.5))
    elif name == 'random_adjust_hue':
      image = random_adjust_hue(key, image, p.get('max_delta', 0.05))
    elif name == 'random_blur':
      image = random_blur(key, image, p.get('max_sigma', 3.0))
    elif name == 'random_gaussian_noise':
      image = random_gaussian_noise(key, image, p.get('max_sigma', 0.08))
    elif name == 'jpeg_artifacts':
      image = jpeg_artifacts(key, image, p.get('min_quality', 80))
    else:
      raise ValueError(f'Unknown augmentation: {name}')
  return image


def augment_batch(rng, images_255, data_augmentations):
  """[B, H, W, 3] images in [0, 255] -> augmented, per-image keys.

  Mirrors the reference's scale-to-[0,1], augment, scale-back flow
  (datagen.py:629-671).
  """
  if not data_augmentations:
    return images_255
  b = images_255.shape[0]
  keys = jax.random.split(rng, b)
  fn = lambda k, im: apply_augmentations(k, im, data_augmentations) * 255.0
  return jax.vmap(fn)(keys, images_255 / 255.0)
