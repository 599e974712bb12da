"""On-device batched augmentation: random affine warps + normalization.

Replaces both of the reference's augmentation paths with one on-device,
batched, jit-compiled implementation (the BASELINE north star's "fused
on-device augmentation"):

* albumentations ``ShiftScaleRotate(shift_limit=0.2, scale_limit=0.1,
  rotate_limit=15, border_mode=0, p=0.7)`` run per-sample on CPU dataloader
  workers (`/root/reference/d3f/train_deep_fake/lit_module.py:99-111`),
* Kornia ``RandomAffine(degrees=15, translate=[.2,.2], scale=[.8,1.2], p=1)``
  run on-device per batch (`/root/reference/d3f/train_denoiser/lit_module.py:55-65`).

Both are the same op family: per-sample inverse-affine bilinear resampling
with constant-zero border, applied *after* normalization (the reference's
Compose order — so the border value is normalized-zero, i.e. mid-gray for
mean=std=0.5).

TPU notes: the warp is one fused XLA program — per-pixel source coordinates
are computed from 6 scalars per image (rotation/scale/shift), and the 4-tap
bilinear gather runs on the VPU. Weights/masks fold into the gather's
elementwise epilogue. A Pallas kernel variant lives in ``ops/pallas/`` for the
fully-fused normalize+warp+noise path.

Angle convention: positive = counter-clockwise, like cv2.getRotationMatrix2D.
Rotation center is (W/2, H/2) in pixel coordinates (cv2/albumentations
convention; kornia's (W-1)/2 differs by half a pixel — irrelevant for a
random augmentation, documented for parity auditing).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class AffineAugmentConfig:
    """Parameter ranges for the random affine family."""

    degrees: float = 15.0          # rotation in [-degrees, +degrees]
    translate: float = 0.2         # shift fraction of H/W per axis
    scale_min: float = 0.9
    scale_max: float = 1.1
    probability: float = 1.0       # per-sample apply probability

    @classmethod
    def shift_scale_rotate(cls, shift_limit=0.2, scale_limit=0.1,
                           rotate_limit=15.0, p=0.7):
        """albumentations ShiftScaleRotate ranges (deep-fake workload)."""
        return cls(degrees=rotate_limit, translate=shift_limit,
                   scale_min=1.0 - scale_limit, scale_max=1.0 + scale_limit,
                   probability=p)

    @classmethod
    def random_affine(cls, degrees=15.0, translate=0.2, scale_min=0.8,
                      scale_max=1.2, p=1.0):
        """Kornia RandomAffine ranges (denoiser workload)."""
        return cls(degrees=degrees, translate=translate, scale_min=scale_min,
                   scale_max=scale_max, probability=p)


def sample_affine_params(key: jax.Array, batch_size: int,
                         cfg: AffineAugmentConfig) -> dict[str, jax.Array]:
    """Per-sample (angle°, scale, shift_x_frac, shift_y_frac, apply) draws."""
    k_ang, k_scale, k_tx, k_ty, k_p = jax.random.split(key, 5)
    u = lambda k, lo, hi: jax.random.uniform(
        k, (batch_size,), minval=lo, maxval=hi, dtype=jnp.float32)
    angle = u(k_ang, -cfg.degrees, cfg.degrees)
    scale = u(k_scale, cfg.scale_min, cfg.scale_max)
    tx = u(k_tx, -cfg.translate, cfg.translate)
    ty = u(k_ty, -cfg.translate, cfg.translate)
    apply = jax.random.uniform(k_p, (batch_size,)) < cfg.probability
    return {"angle": angle, "scale": scale, "tx": tx, "ty": ty, "apply": apply}


def _inverse_affine_coeffs(params: dict[str, jax.Array], height: int,
                           width: int) -> tuple[jax.Array, ...]:
    """dst->src affine coefficients per sample (6 scalars each).

    Forward map (cv2 convention): rotate by ``angle`` CCW + scale about the
    image center, then shift by (tx*W, ty*H). Identity where ``apply`` is
    False.
    """
    theta = jnp.deg2rad(params["angle"])
    s = params["scale"]
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    # cv2.getRotationMatrix2D: alpha = s*cos, beta = s*sin, and y axis points
    # down, so the matrix is [[a, b], [-b, a]].
    a, b = s * cos, s * sin
    cx, cy = width / 2.0, height / 2.0
    fx = params["tx"] * width
    fy = params["ty"] * height
    # Forward: dst = M src + t, with
    #   M = [[a, b], [-b, a]],  t = [(1-a)cx - b cy + fx, b cx + (1-a)cy + fy]
    tx_full = (1.0 - a) * cx - b * cy + fx
    ty_full = b * cx + (1.0 - a) * cy + fy
    # Inverse: src = M^-1 (dst - t); det(M) = a^2 + b^2 = s^2 and
    # [[a, b], [-b, a]]^-1 = [[a, -b], [b, a]] / det.
    det = a * a + b * b
    inv00 = a / det
    inv01 = -b / det
    inv10 = b / det
    inv11 = a / det
    itx = -(inv00 * tx_full + inv01 * ty_full)
    ity = -(inv10 * tx_full + inv11 * ty_full)

    apply = params["apply"]
    ident = jnp.zeros_like(inv00)
    one = jnp.ones_like(inv00)
    inv00 = jnp.where(apply, inv00, one)
    inv01 = jnp.where(apply, inv01, ident)
    inv10 = jnp.where(apply, inv10, ident)
    inv11 = jnp.where(apply, inv11, one)
    itx = jnp.where(apply, itx, ident)
    ity = jnp.where(apply, ity, ident)
    return inv00, inv01, inv10, inv11, itx, ity


def _resample_axis(img: jax.Array, alpha: jax.Array, shift: jax.Array,
                   taps_lo: int, taps_hi: int, axis: int) -> jax.Array:
    """1-D linear resample along ``axis`` (2=x, 1=y) of NHWC images.

    ``out[..., t, ...] = img[..., alpha * t + shift, ...]`` (per-sample
    ``alpha``; ``shift`` varies along the *other* spatial axis), evaluated as
    a windowed multiply-accumulate over static slices: for each integer tap
    offset k, weight ``hat(src - (t + k))`` picks out the two bilinear taps.
    No gathers — K fused FMAs on the VPU, which on TPU is ~20x faster than
    the gather lowering for augmentation-sized warps (see BASELINE.md).

    ``taps_lo/hi`` bound ``src - t`` (static, derived from the augment
    parameter ranges). Out-of-image samples contribute zero (cv2
    BORDER_CONSTANT semantics).
    """
    n = img.shape[axis]
    pad = [(0, 0)] * img.ndim
    pad[axis] = (taps_lo, taps_hi + 1)
    padded = jnp.pad(img, pad)

    ts = jnp.arange(n, dtype=jnp.float32)
    if axis == 2:
        # alpha: (B,), shift: (B, H); base position = x.
        # offset(b, y, x) = src - x = (alpha - 1) * x + shift(b, y)
        offset = (alpha[:, None, None] - 1.0) * ts + shift[:, :, None]
    else:
        # alpha: (B,), shift: (B, W); base position = y.
        offset = ((alpha[:, None, None] - 1.0) * ts[:, None]
                  + shift[:, None, :])
    # offset: (B, H, W) — how far the source lies from the output position.

    out = jnp.zeros(img.shape, jnp.float32)
    for k in range(-taps_lo, taps_hi + 1):
        w = jnp.clip(1.0 - jnp.abs(offset - k), 0.0, 1.0)
        sl = [slice(None)] * img.ndim
        sl[axis] = slice(taps_lo + k, taps_lo + k + n)
        out = out + w[..., None] * padded[tuple(sl)]
    return out


def _shear_tap_bounds(height: int, width: int,
                      cfg: "AffineAugmentConfig") -> tuple[int, int]:
    """Static bound on |src - t| for both shear passes given config ranges."""
    import math

    inv_scale = 1.0 / cfg.scale_min          # worst-case magnification
    tan_t = math.tan(math.radians(cfg.degrees))
    half = max(height, width) / 2.0
    # scale term + rotation shear term + translation (+1 slack)
    bound = (abs(inv_scale - 1.0) * half
             + inv_scale * tan_t * half
             + cfg.translate * max(height, width) * inv_scale
             + 2.0)
    k = int(math.ceil(bound))
    return k, k


def affine_warp_shear(images: jax.Array, params: dict[str, jax.Array],
                      taps: tuple[int, int]) -> jax.Array:
    """TPU-fast affine warp: LDU shear decomposition into two 1-D resamples.

    The inverse map ``src = Minv @ dst + t`` factors as
    ``Minv = [[1,0],[l,1]] @ diag(d1,d2) @ [[1,u],[0,1]]`` so the warp is one
    per-row x-resample followed by one per-column y-resample — each a
    windowed-MAC ``_resample_axis`` pass, no gathers. Standard shear-warp
    resampling: quality is equivalent to direct bilinear for augmentation
    (the x-taps of the two blended rows sit half a row apart on the source
    line; pure shifts/scales are exact).
    """
    b, h, w, c = images.shape
    i00, i01, i10, i11, itx, ity = _inverse_affine_coeffs(params, h, w)

    # LDU factors (i11 stays well away from 0 for <=15 degree rotations).
    alpha_x = i00 - i01 * i10 / i11           # d1
    alpha_y = i11                             # d2 (per-column y scale)
    # Pass 1 (x): src_x = alpha_x * x + (i01/i11) * v + cx_const   at row v
    vs = jnp.arange(h, dtype=jnp.float32)
    cx_const = itx - i01 * ity / i11
    shift_x = (i01 / i11)[:, None] * vs[None, :] + cx_const[:, None]  # (B,H)
    t = _resample_axis(images.astype(jnp.float32), alpha_x, shift_x,
                       taps[0], taps[1], axis=2)
    # Pass 2 (y): src_y = i11 * y + i10 * x + ity   at column x
    xs = jnp.arange(w, dtype=jnp.float32)
    shift_y = i10[:, None] * xs[None, :] + ity[:, None]               # (B,W)
    out = _resample_axis(t, alpha_y, shift_y, taps[0], taps[1], axis=1)
    return out.astype(images.dtype)


def _hybrid_axis_pass(img: jax.Array, alpha: jax.Array, shift: jax.Array,
                      *, block: int = 32, k: int = 12,
                      pad: int | None = None) -> jax.Array:
    """1-D resample along x: ``out[b,v,x] = img[b, v, alpha_b*x + shift(b,v)]``.

    TPU-fast decomposition for LARGE images (the shear pass's window grows
    linearly with W; this stays O(1)):

    1. per-sample centered **scale** as an interpolation matmul on the MXU
       (the banded hat matrix is built on the fly; ~7 ms at 448²/b16),
    2. the remaining per-row displacement, **block-quantized** to its value
       at each ``block``-row group's center, applied as one dynamic slice per
       (sample, group) — 32x fewer dynamic ops than per-row slicing,
    3. the in-block residual (slope*block/2 + rounding + fraction, bounded by
       ``k``) as a tiny windowed-MAC blend.

    Two chained linear interpolations (scale interp, then residual blend) —
    marginally softer than one-shot bilinear, standard for resampling chains.
    """
    b_, h, w, c = img.shape
    cx = w / 2.0
    xs = jnp.arange(w, dtype=jnp.float32)

    # 1) scale about the center: g[x] = img[alpha (x - cx) + cx]
    src = alpha[:, None] * (xs[None, :] - cx) + cx          # (B, W_out)
    weights = jnp.clip(1.0 - jnp.abs(src[:, None, :] - xs[None, :, None]),
                       0.0, 1.0)                            # (B, W_in, W_out)
    g = jnp.einsum("bhuc,buo->bhoc", img, weights,
                   preferred_element_type=jnp.float32)

    # Displacement in g's coordinates: g[x + d] = img[alpha x + shift] with
    # d = (shift - (1 - alpha) cx) / alpha.
    d = (shift - (1.0 - alpha[:, None]) * cx) / alpha[:, None]   # (B, H)

    # 2) block-quantized integer part via per-(sample, group) dynamic slices.
    if pad is None:
        pad = w // 2 + k
    nb = h // block
    assert h % block == 0, (h, block)
    d_blocks = d.reshape(b_, nb, block)
    base = jnp.round(d_blocks[:, :, block // 2]).astype(jnp.int32)  # (B, nb)
    padded = jnp.pad(g, ((0, 0), (0, 0), (pad, pad + 1), (0, 0)))
    blocks = padded.reshape(b_, nb, block, w + 2 * pad + 1, c)

    span = w + 2 * k + 1

    def slice_group(group, start):
        return jax.lax.dynamic_slice(
            group, (0, start, 0), (block, span, c))

    starts = jnp.clip(pad + base - k, 0, w + 2 * pad + 1 - span)
    window = jax.vmap(jax.vmap(slice_group))(blocks, starts)  # (B,nb,block,span,C)
    # Effective integer offset actually applied (clip-adjusted).
    applied = starts - pad + k                                # (B, nb)

    # 3) residual windowed MAC: r = d - applied, |r| <= k by construction.
    r = d_blocks - applied[:, :, None]                        # (B, nb, block)
    out = jnp.zeros((b_, nb, block, w, c), jnp.float32)
    for j in range(2 * k + 1):
        wgt = jnp.clip(1.0 - jnp.abs(r - (j - k)), 0.0, 1.0)
        out = out + wgt[..., None, None] * window[:, :, :, j:j + w, :]
    return out.reshape(b_, h, w, c)


def affine_warp_hybrid(images: jax.Array,
                       params: dict[str, jax.Array]) -> jax.Array:
    """Large-resolution affine warp: LDU shears via ``_hybrid_axis_pass``.

    Same factorization as ``affine_warp_shear`` (x-pass then y-pass, the
    y-pass on the transposed image), with per-axis cost independent of the
    parameter ranges — built for 256²+ where both the gather and the plain
    shear window get expensive.
    """
    b, h, w, c = images.shape
    i00, i01, i10, i11, itx, ity = _inverse_affine_coeffs(params, h, w)

    alpha_x = i00 - i01 * i10 / i11
    vs = jnp.arange(h, dtype=jnp.float32)
    shift_x = ((i01 / i11)[:, None] * vs[None, :]
               + (itx - i01 * ity / i11)[:, None])            # (B, H)
    t = _hybrid_axis_pass(images.astype(jnp.float32), alpha_x, shift_x)

    xs = jnp.arange(w, dtype=jnp.float32)
    shift_y = i10[:, None] * xs[None, :] + ity[:, None]       # (B, W)
    t_t = jnp.swapaxes(t, 1, 2)                               # y -> lanes
    out_t = _hybrid_axis_pass(t_t, i11, shift_y)
    return jnp.swapaxes(out_t, 1, 2).astype(images.dtype)


def affine_warp(images: jax.Array, params: dict[str, jax.Array]) -> jax.Array:
    """Per-sample affine warp of an NHWC batch, bilinear, zero border."""
    b, h, w, c = images.shape
    inv00, inv01, inv10, inv11, itx, ity = _inverse_affine_coeffs(params, h, w)

    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)

    def warp_one(img, i00, i01, i10, i11, tx, ty):
        sx = i00 * xx + i01 * yy + tx
        sy = i10 * xx + i11 * yy + ty
        x0 = jnp.floor(sx)
        y0 = jnp.floor(sy)
        wx = sx - x0
        wy = sy - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)

        flat = img.reshape(h * w, c)

        def tap(yi, xi, weight):
            valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
            idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
            vals = jnp.take(flat, idx.reshape(-1), axis=0).reshape(h, w, c)
            return vals * (weight * valid)[..., None]

        out = (tap(y0i, x0i, (1 - wx) * (1 - wy))
               + tap(y0i, x0i + 1, wx * (1 - wy))
               + tap(y0i + 1, x0i, (1 - wx) * wy)
               + tap(y0i + 1, x0i + 1, wx * wy))
        return out.astype(img.dtype)

    return jax.vmap(warp_one)(images, inv00, inv01, inv10, inv11, itx, ity)


def normalise_batch(batch_uint8: jax.Array, mean, std,
                    dtype=jnp.float32) -> jax.Array:
    """uint8 NHWC -> normalized float: ``(x - mean*255) / (std*255)``."""
    mean = jnp.asarray(mean, jnp.float32).reshape(1, 1, 1, -1) * 255.0
    std = jnp.asarray(std, jnp.float32).reshape(1, 1, 1, -1) * 255.0
    return ((batch_uint8.astype(jnp.float32) - mean) / std).astype(dtype)


def select_warp_method(h: int, w: int, cfg: AffineAugmentConfig, *,
                       backend: str, n_devices: int) -> str:
    """Resolve ``method="auto"`` for an HxW batch on the given backend.

    Routing table (measured, tools/warp_breakdown.py + BASELINE.md):

    * single-TPU, 32-aligned, 384² <= size <= 512²: ``pallas_fused`` — whole
      sample VMEM-resident, both passes + normalize in one kernel (1.22x over
      the two-pass kernel at 448²). Above 512² the fused kernel's whole-sample
      VMEM residency (image block + bf16 scratch + fp32 output,
      double-buffered) overflows scoped VMEM, so the row-tiled two-pass
      ``pallas`` kernel (O(1) VMEM in image height) takes over.
    * other 32-aligned shapes: ``hybrid`` (scale matmul + block roll +
      residual MAC) — at 256² repeated marginals straddle break-even vs the
      kernels, so the XLA hybrid keeps that shape and stays shardable.
    * small non-32-aligned: ``shear`` when the static tap window is <= 64;
      ``gather`` as the universal fallback.
    """
    if (h % 32 == 0 and w % 32 == 0 and min(h, w) >= 384
            and backend == "tpu" and n_devices == 1):
        return "pallas_fused" if max(h, w) <= 512 else "pallas"
    if h % 32 == 0 and w % 32 == 0:
        return "hybrid"
    if _shear_tap_bounds(h, w, cfg)[0] <= 64:
        return "shear"
    return "gather"


def augment_batch(key: jax.Array, batch_uint8: jax.Array, mean, std,
                  cfg: AffineAugmentConfig, dtype=jnp.float32,
                  method: str = "auto") -> jax.Array:
    """Fused normalize -> random-affine pipeline (the on-device data path).

    Matches the reference's Compose ordering (normalize before warp) so the
    zero border lands in normalized space. ``method="shear"`` (default) uses
    the gather-free two-pass resampler — ~20x faster on TPU; ``"gather"``
    keeps the direct 4-tap bilinear (reference semantics for parity tests).
    ``"pallas_fused"`` folds the normalize into the whole-sample kernel (the
    batch crosses HBM as uint8).
    """
    params = sample_affine_params(key, batch_uint8.shape[0], cfg)
    bh, bw = batch_uint8.shape[1], batch_uint8.shape[2]
    if method == "auto":
        method = select_warp_method(
            bh, bw, cfg, backend=jax.default_backend(),
            n_devices=jax.device_count())
    if method == "pallas_fused":
        from denoising_diffusion_deep_fake_tpu.ops.pallas.warp_fused import (
            affine_warp_pallas_fused)

        return affine_warp_pallas_fused(
            batch_uint8, params, mean=mean, std=std,
            interpret=jax.default_backend() != "tpu").astype(dtype)
    x = normalise_batch(batch_uint8, mean, std, dtype=jnp.float32)
    h, w = x.shape[1], x.shape[2]
    if method == "shear":
        taps = _shear_tap_bounds(h, w, cfg)
        return affine_warp_shear(x, params, taps).astype(dtype)
    if method == "hybrid":
        return affine_warp_hybrid(x, params).astype(dtype)
    if method == "pallas":
        from denoising_diffusion_deep_fake_tpu.ops.pallas.warp_kernel import (
            affine_warp_pallas)

        return affine_warp_pallas(
            x, params,
            interpret=jax.default_backend() != "tpu").astype(dtype)
    return affine_warp(x, params).astype(dtype)
