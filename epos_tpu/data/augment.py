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


def _u(rng, lo, hi):
  return jax.random.uniform(rng, (), minval=lo, maxval=hi)


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
      # DCT-quantization on device is not worth the compile cost; the
      # closest cheap proxy is mild blur + noise (quality q in [min, 100]).
      q = p.get('min_quality', 80)
      strength = (100.0 - q) / 100.0
      k1, k2 = jax.random.split(key)
      image = random_blur(k1, image, max_sigma=1.0 * strength + 1e-3)
      image = random_gaussian_noise(k2, image, max_sigma=0.03 * strength)
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
