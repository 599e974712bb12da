"""Image layout / normalization ops shared by training, inference and tools.

Internal tensor convention is **NHWC float32/bfloat16, RGB** (TPU-native
layout — channels-last keeps the lane dimension dense for the VPU and lets XLA
pick conv layouts freely). The cv2 boundary (BGR uint8 HWC) is crossed only in
host-side code.

Parity targets:
* ``cv2_to_tensor_normalised`` / ``tensor_cv2_to_denormalised``
  (`/root/reference/d3f/train_deep_fake/lit_module.py:272-300`),
* the 3x3 TensorBoard image grid (`lit_module.py:235-249`),
* center-crop geometry (`/root/reference/d3f/script_tools/video_to_center_cropped_images.py:83-100`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def normalise_uint8_rgb(image_rgb: jax.Array, mean, std) -> jax.Array:
    """uint8/float RGB HWC (or NHWC) in [0,255] -> normalized float32.

    ``(x - mean*255) / (std*255)`` per channel — matches
    `cv2_to_tensor_normalised` (`lit_module.py:272-283`) without the in-place
    mutation trap noted in SURVEY.md appendix #6.
    """
    mean = jnp.asarray(mean, jnp.float32).reshape(1, 1, -1)
    std = jnp.asarray(std, jnp.float32).reshape(1, 1, -1)
    x = image_rgb.astype(jnp.float32)
    return (x - mean * 255.0) / (std * 255.0)


def denormalise_to_uint8_rgb(tensor: jax.Array, mean, std) -> jax.Array:
    """Normalized float -> uint8-range RGB, truncation + clamp like the reference.

    The reference casts with ``tensor.int()`` (truncation toward zero) *before*
    clamping to [0, 255] (`lit_module.py:285-300`); we reproduce that exactly so
    swapped frames are bit-identical for equal float inputs.
    """
    mean = jnp.asarray(mean, jnp.float32).reshape(1, 1, -1)
    std = jnp.asarray(std, jnp.float32).reshape(1, 1, -1)
    x = tensor * (std * 255.0) + mean * 255.0
    x = jnp.trunc(x).astype(jnp.int32)
    x = jnp.clip(x, 0, 255)
    return x.astype(jnp.uint8)


def make_grid(batch: jax.Array, nrow: int = 3, padding: int = 2,
              pad_value: float = 0.0) -> jax.Array:
    """Tile an NHWC batch into one HWC image (torchvision ``make_grid`` geometry).

    Grid rows hold ``nrow`` images each; 2px padding surrounds every cell on
    the top/left plus a final right/bottom border, matching torchvision's
    layout used by `log_batch_as_image_grid` (`lit_module.py:235-249`).
    """
    b, h, w, c = batch.shape
    ncol = nrow  # torchvision nrow = images per row
    nrows_grid = int(np.ceil(b / ncol))
    cell_h, cell_w = h + padding, w + padding
    grid = jnp.full((nrows_grid * cell_h + padding, ncol * cell_w + padding, c),
                    pad_value, dtype=batch.dtype)
    for idx in range(b):
        r, col = divmod(idx, ncol)
        y0 = r * cell_h + padding
        x0 = col * cell_w + padding
        grid = grid.at[y0:y0 + h, x0:x0 + w, :].set(batch[idx])
    return grid


def grid_to_display(batch: jax.Array, nrow: int = 3) -> jax.Array:
    """3x3 grid + ``x*0.5+0.5`` denorm + clamp, as logged by the reference."""
    n = nrow * nrow
    grid = make_grid(batch[:n], nrow=nrow)
    return jnp.clip(grid * 0.5 + 0.5, 0.0, 1.0)


def center_crop_box(height: int, width: int, target_aspect_w: int,
                    target_aspect_h: int) -> tuple[int, int, int, int]:
    """(y0, y1, x0, x1) of the centered crop with the target aspect ratio.

    Geometry parity with `crop_image_at_center`
    (`video_to_center_cropped_images.py:83-100`): shrink whichever dimension is
    too large for ``target_aspect_w/target_aspect_h``, keeping the center.
    """
    target_ratio = target_aspect_w / target_aspect_h
    ratio = width / height
    if ratio > target_ratio:
        new_w = int(round(height * target_ratio))
        x0 = (width - new_w) // 2
        return 0, height, x0, x0 + new_w
    new_h = int(round(width / target_ratio))
    y0 = (height - new_h) // 2
    return y0, y0 + new_h, 0, width


def center_crop(image: np.ndarray, target_aspect_w: int,
                target_aspect_h: int) -> np.ndarray:
    """Host-side center crop of an HWC array to a target aspect ratio."""
    y0, y1, x0, x1 = center_crop_box(image.shape[0], image.shape[1],
                                     target_aspect_w, target_aspect_h)
    return image[y0:y1, x0:x1]
