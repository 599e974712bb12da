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


def panel_grid_u8(batch: jax.Array, nrow: int = 3) -> jax.Array:
    """Display-ready uint8 TB panel, computed ON DEVICE inside the image
    step (round-5): grid + denorm + clamp + 255-quantize before the fetch.

    The loop previously fetched each panel as the FULL normalized float
    batch ([16,448,448,3] fp32 = 38 MB per panel, ~300 MB per image step
    across the swap workload's 8 panels) and then re-uploaded it for the
    grid math. Only the first ``nrow²`` images ever reach TensorBoard, so
    the grid/denorm/quantize belongs in the compiled step: the wire now
    carries one ~5 MB uint8 grid per panel (448²) — ~56x fewer panel bytes
    on the tunnel the async metric worker shares with batch uploads.
    Quantization matches tensorboardX's own float->uint8 conversion
    (``(x * 255.0).astype(uint8)`` — truncation), so logged pixels are
    bit-identical to the old full-batch path.
    """
    g = grid_to_display(batch.astype(jnp.float32), nrow=nrow)
    return (g * 255.0).astype(jnp.uint8)


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


# --------------------------------------------------------------- I420 packing
#
# 4:2:0-packed uint8 transfers halve host<->device bytes (1.5 B/px vs 3):
# on transfer-limited links (BASELINE.md measures this dev tunnel at
# ~20 MB/s) the video/serving pipelines are byte-bound, and the mp4 encoder
# 4:2:0-subsamples anyway, so packing loses nothing the output keeps.
# Color math matches OpenCV's COLOR_BGR2YUV_I420 / COLOR_YUV2BGR_I420
# (BT.601 studio swing, top-left chroma subsample — calibrated against cv2
# in tests/test_image_ops.py) so hosts can use cv2's SIMD converters.

def pack_rgb_batch_to_i420_np(batch: np.ndarray) -> np.ndarray:
    """HOST-side (B, H, W, 3) RGB uint8 -> (B, H*3/2, W) uint8 I420.

    Uses cv2's SIMD converter (same math the device-side ``i420_to_rgb``
    matches bit-closely); runs on the prefetch thread so training uploads
    carry half the bytes (`upload_format: i420`, VERDICT r2 item 3).
    """
    import cv2

    b, h, w, _ = batch.shape
    validate_i420_dims(h, w)
    out = np.empty((b, h * 3 // 2, w), dtype=np.uint8)
    for i in range(b):
        out[i] = cv2.cvtColor(batch[i], cv2.COLOR_RGB2YUV_I420)
    return out


def unpack_i420_batch_to_rgb_np(packed: np.ndarray) -> np.ndarray:
    """HOST-side (B, H*3/2, W) uint8 I420 -> (B, H, W, 3) RGB uint8.

    Inverse of ``pack_rgb_batch_to_i420_np`` via cv2's SIMD converter — the
    ONE host-side unpack shared by the serving engine, the HTTP mixed-format
    path, and the benches, so any future colorspace calibration change lands
    everywhere at once.
    """
    import cv2

    b = packed.shape[0]
    h = packed.shape[1] * 2 // 3
    out = np.empty((b, h, packed.shape[2], 3), dtype=np.uint8)
    for i in range(b):
        out[i] = cv2.cvtColor(packed[i], cv2.COLOR_YUV2RGB_I420)
    return out


def unpack_upload(batch: "jax.Array", upload_format: str) -> "jax.Array":
    """Device-side start of the train step: wire format -> RGB in [0, 255].

    ``rgb`` batches pass through (uint8); ``i420`` batches are unpacked to
    float32 RGB — ``normalise_batch``/``augment_batch`` accept either.
    """
    if upload_format == "i420":
        return i420_to_rgb(batch)
    return batch


def validate_i420_dims(height: int, width: int) -> None:
    """Raise a descriptive error for frame sizes the I420 packing can't carry.

    The packed layout ravels each (H/2, W/2) chroma plane into quarter-height
    full-width rows, which needs H % 4 == 0 and W % 2 == 0; without this check
    an odd size fails with an opaque reshape error inside jit.
    """
    if height % 4 != 0 or width % 2 != 0:
        raise ValueError(
            f"I420 transfer needs height % 4 == 0 and width % 2 == 0, got "
            f"{height}x{width} — round the frame size (e.g. --height/--width) "
            "to multiples of 4/2 or use transfer='rgb'")


def rgb_to_i420(rgb: "jax.Array") -> "jax.Array":
    """(B, H, W, 3) RGB [0,255] float/uint8 -> (B, H*3/2, W) uint8 I420."""
    x = rgb.astype(jnp.float32)
    b, h, w, _ = x.shape
    validate_i420_dims(h, w)
    r, g, bl = x[..., 0], x[..., 1], x[..., 2]
    y = 16.0 + 0.257 * r + 0.504 * g + 0.098 * bl
    # Top-left chroma sample of each 2x2 block (cv2 convention).
    rs, gs, bs = (c[:, ::2, ::2] for c in (r, g, bl))
    u = 128.0 - 0.148 * rs - 0.291 * gs + 0.439 * bs
    v = 128.0 + 0.439 * rs - 0.368 * gs - 0.071 * bs
    # I420 plane layout: Y (H,W), then U and V each (H/2, W/2) raveled into
    # quarter-height full-width rows.
    u_rows = u.reshape(b, h // 4, w)
    v_rows = v.reshape(b, h // 4, w)
    packed = jnp.concatenate([y, u_rows, v_rows], axis=1)
    return jnp.clip(jnp.round(packed), 0, 255).astype(jnp.uint8)


def i420_to_rgb(i420: "jax.Array") -> "jax.Array":
    """(B, H*3/2, W) uint8 I420 -> (B, H, W, 3) float32 RGB in [0, 255]."""
    x = i420.astype(jnp.float32)
    b, h15, w = x.shape
    if h15 % 3 != 0:
        raise ValueError(f"I420 packed height must be H*3/2, got {h15}")
    h = (h15 * 2) // 3
    validate_i420_dims(h, w)
    y = x[:, :h]
    u = x[:, h:h + h // 4].reshape(b, h // 2, w // 2)
    v = x[:, h + h // 4:].reshape(b, h // 2, w // 2)
    # Nearest (2x2 duplicate) chroma upsample, like cv2's I420 decode.
    u = jnp.repeat(jnp.repeat(u, 2, axis=1), 2, axis=2)
    v = jnp.repeat(jnp.repeat(v, 2, axis=1), 2, axis=2)
    yc = 1.164 * (y - 16.0)
    uc, vc = u - 128.0, v - 128.0
    r = yc + 1.596 * vc
    g = yc - 0.813 * vc - 0.391 * uc
    bl = yc + 2.018 * uc
    return jnp.clip(jnp.stack([r, g, bl], axis=-1), 0.0, 255.0)
