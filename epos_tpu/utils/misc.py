"""Host-side image utilities mirroring reference conventions.

Reference: epos_lib/misc.py. Device-side resizing lives in models/layers.py
(jax.image); these are the numpy/cv2 host equivalents used by the input
pipeline and visualization.
"""

import numpy as np
import cv2


def resize_image_py(image, size, interpolation=None):
  """Resize with AREA when downscaling, LINEAR when upscaling.

  Reference: epos_lib/misc.py:57-72 (same interpolation policy).

  Args:
    image: HxW[xC] array.
    size: (width, height) of the output.
  """
  if interpolation is None:
    interpolation = (cv2.INTER_AREA if image.shape[0] >= size[1]
                     else cv2.INTER_LINEAR)
  return cv2.resize(image, tuple(size), interpolation=interpolation)


def crop_image(image, offset_h, offset_w, crop_h, crop_w):
  """Crops image[offset_h:offset_h+crop_h, offset_w:offset_w+crop_w].

  Reference: epos_lib/misc.py:110-156 (assertion semantics preserved).
  """
  if image.ndim < 2:
    raise ValueError('input must have rank >= 2')
  if image.shape[0] < crop_h or image.shape[1] < crop_w:
    raise ValueError('Crop size greater than the image size.')
  return image[offset_h:offset_h + crop_h, offset_w:offset_w + crop_w]


def adjust_K_for_resize_crop(K, scale, offset_w, offset_h, output_stride=1):
  """Adjusts the camera intrinsics for resize-then-crop (+ output stride).

  Reference: epos_lib/datagen.py:470-488.
  """
  K = np.asarray(K, np.float64)
  fx, fy = K[0, 0] * scale, K[1, 1] * scale
  cx = K[0, 2] * scale - offset_w
  cy = K[1, 2] * scale - offset_h
  s = float(output_stride)
  return np.array([[fx / s, 0.0, cx / s],
                   [0.0, fy / s, cy / s],
                   [0.0, 0.0, 1.0]], np.float64)
