"""Pallas TPU kernel for the hybrid affine warp's 1-D resample pass.

Replaces ``ops/augment._hybrid_axis_pass`` (the XLA formulation) for large
resolutions. Same math — per-sample centered scale, block-quantized integer
shift, 25-tap residual blend — but restructured for the memory hierarchy:

* the XLA path's residual windowed-MAC re-reads its (B, H, W+2K, C) window
  from HBM once per tap: ~25x the image bytes (measured 5.4 ms/pass at
  448²/b16 — exactly HBM-bound at this platform's ~180 GB/s achievable rate,
  BASELINE.md calibration),
* here each (sample, 32-row block) tile is resident in VMEM: HBM sees ONE
  read of the image and one write of the result; the 25 tap reads hit VMEM,
* the scale resample AND the block-integer shift fold into a single banded
  interpolation matrix built on the fly from two scalars (alpha, base) —
  one (rows*C, W_in) x (W_in, W_win) MXU matmul per tile, no dynamic slices
  anywhere,
* the per-row fractional residual is a 25-tap VPU MAC over static lane
  slices of the VMEM window.

Math derivation mirrors ``_hybrid_axis_pass`` exactly (two chained linear
interpolations); unit tests assert elementwise agreement with the XLA path.

Layout: the pass resamples along the LANE axis. Callers present the image as
``(B, H, C, W)`` (W on lanes — C=3 would waste 125/128 lanes in NHWC) and
the (32-row, 3-channel) tile flattens to 96 sublanes for the matmul.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Residual blend half-width: within a 32-row block the displacement varies
# from its center value by at most slope*16 + rounding; the augment parameter
# ranges (<=15deg rotation, >=0.8 scale) bound this under 12 (same K as the
# XLA hybrid path).
K = 12
TAPS = 2 * K + 1
ROWS = 32          # rows per tile (block-quantization granularity)
WGT_PAD = 32       # TAPS padded to a sublane multiple for the weight input


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def band_matrix(alpha, base, n_in: int, n_win: int):
    """Banded hat-interpolation matrix folding centered scale + block shift.

    ``S[i, o] = hat(src(o) - i)`` with ``src(o) = alpha * (o - K + base - c)
    + c``, ``c = n_in/2`` (the rotation center); src outside ``[0, n_in)``
    matches no row -> zero border. Shared by the two-pass and fused kernels
    — their exact-equality contract (tests/test_warp_fused.py) hangs on this
    being ONE implementation. Mosaic's iota is integer-only; cast after.
    """
    c = n_in / 2.0
    i_idx = jax.lax.broadcasted_iota(jnp.int32, (n_in, n_win),
                                     0).astype(jnp.float32)
    o_idx = jax.lax.broadcasted_iota(jnp.int32, (n_in, n_win),
                                     1).astype(jnp.float32)
    src = alpha * (o_idx - float(K) + base - c) + c
    return jnp.clip(1.0 - jnp.abs(src - i_idx), 0.0, 1.0)


def residual_mac(g_win, wgt, n: int):
    """25-tap residual blend: ``out[r, t] = sum_j wgt[r, j] g_win[r, j+t]``
    (per-row weights on sublanes, static lane-offset slices; VPU FMAs)."""
    acc = jnp.zeros((g_win.shape[0], n), jnp.float32)
    for j in range(TAPS):
        acc = acc + wgt[:, j][:, None] * g_win[:, j:j + n]
    return acc


def pass_scalars(alpha, shift, n_resample: int):
    """Per-block integer base + per-line residual hat weights for one pass.

    Displacement in scaled coordinates: ``g[t + d] = img[alpha t + shift]``
    with ``d = (shift - (1-alpha) c) / alpha`` and ``c`` the RESAMPLE-axis
    center; blocking runs over ``shift``'s axis. Returns ``(base (B, nb)
    int32, wgt (B, n, WGT_PAD) f32)``. Host-side XLA (tiny arrays).
    """
    c = n_resample / 2.0
    d = (shift - (1.0 - alpha[:, None]) * c) / alpha[:, None]
    b, n = d.shape
    nb = n // ROWS
    d_blocks = d.reshape(b, nb, ROWS)
    base = jnp.round(d_blocks[:, :, ROWS // 2]).astype(jnp.int32)
    resid = d_blocks - base[:, :, None].astype(jnp.float32)
    taps = jnp.arange(TAPS, dtype=jnp.float32) - float(K)
    wgt = jnp.clip(1.0 - jnp.abs(resid[..., None] - taps), 0.0, 1.0)
    wgt = jnp.pad(wgt, ((0, 0), (0, 0), (0, 0), (0, WGT_PAD - TAPS)))
    return base, wgt.reshape(b, n, WGT_PAD)


def _warp_pass_kernel(alpha_ref, base_ref, wgt_ref, img_ref, out_ref, *,
                      w: int, w_win: int, channels: int):
    """One (sample, row-block) tile: scale+shift matmul, residual MAC."""
    # alpha/base arrive whole via scalar prefetch (SMEM); index by grid pos.
    alpha = alpha_ref[pl.program_id(0)]
    base = base_ref[pl.program_id(0), pl.program_id(1)].astype(jnp.float32)
    s_mat = band_matrix(alpha, base, w, w_win)

    # bf16 matmul (8x the fp32 MXU rate); S entries are interpolation
    # weights in [0,1] and the data is normalized images — bf16 rounding is
    # far below augmentation-relevant precision. The tile arrives natively
    # 2-D: (ROWS*C, W) rows on sublanes — an in-kernel (ROWS, C, W) ->
    # (ROWS*C, W) reshape would be a full VMEM relayout (~2.7 ms/pass
    # measured, the single largest cost of the first kernel iteration).
    tile = img_ref[0]
    # precision pinned: under jax_default_matmul_precision=highest (the
    # fp32 parity mode, config.py matmul_precision) Mosaic rejects a bf16
    # dot with HIGHEST ("Bad lhs type") — this dot's types are an explicit
    # kernel design choice, not subject to the global knob.
    g_win = jnp.dot(tile.astype(jnp.bfloat16), s_mat.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT)

    # Residual 25-tap blend, per-(row,channel) weights; reads hit VMEM.
    out_ref[0] = residual_mac(g_win, wgt_ref[0], w)


def warp_axis_pass_pallas(img_bhcw: jax.Array, alpha: jax.Array,
                          shift: jax.Array, *,
                          interpret: bool = False) -> jax.Array:
    """``out[b, v, c, x] = img[b, v, c, alpha_b * x + shift[b, v]]``.

    Drop-in Pallas equivalent of ``ops.augment._hybrid_axis_pass`` for
    ``(B, H, C, W)`` layout (resample axis on lanes). fp32 in/out; linear
    interpolation, zero border.
    """
    b, h, c, w = img_bhcw.shape
    if h % ROWS:
        raise ValueError(f"H={h} must be a multiple of {ROWS}")
    nb = h // ROWS
    # Blocks spanning the FULL lane dimension are exempt from the
    # 128-divisibility rule, so no width padding is needed anywhere; the
    # window only has to cover true outputs: x + j <= (w-1) + 2K.
    w_win = _round_up(w + 2 * K, 128)

    # Displacement in scale-output coordinates (see _hybrid_axis_pass):
    # g[x] = img[alpha (x - cx) + cx]; out[v, x] = g[x + d[v]]. Weights are
    # built once in XLA (tiny: B*H*32 floats) and replicated per channel so
    # kernel rows line up with the (H*C, W) layout.
    base, wgt = pass_scalars(alpha, shift, w)                  # (B,nb),(B,H,.)
    wgt = jnp.repeat(wgt, c, axis=1)                           # (B, H*C, .)

    # (B, H, C, W) -> (B, H*C, W) is a free reshape (row-major); the kernel
    # then sees plain 2-D (ROWS*C, W) tiles with rows on sublanes.
    img2 = img_bhcw.astype(jnp.float32).reshape(b, h * c, w)

    kernel = functools.partial(_warp_pass_kernel, w=w, w_win=w_win,
                               channels=c)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # alpha (B,), base (B, nb) land in SMEM whole
        grid=(b, nb),
        in_specs=[
            pl.BlockSpec((1, ROWS * c, WGT_PAD), lambda i, j, *_: (i, j, 0),
                         memory_space=pltpu.VMEM),               # wgt
            pl.BlockSpec((1, ROWS * c, w),
                         lambda i, j, *_: (i, j, 0),
                         memory_space=pltpu.VMEM),               # img
        ],
        out_specs=pl.BlockSpec((1, ROWS * c, w),
                               lambda i, j, *_: (i, j, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h * c, w), jnp.float32),
        interpret=interpret,
    )(alpha.astype(jnp.float32), base, wgt, img2)
    return out.reshape(b, h, c, w)


def affine_warp_pallas(images: jax.Array, params: dict, *,
                       interpret: bool = False) -> jax.Array:
    """Full per-sample affine warp via two Pallas axis passes.

    Same LDU shear factorization as ``ops.augment.affine_warp_hybrid``
    (x-pass, then y-pass on the axis-swapped intermediate); NHWC in/out.
    """
    from denoising_diffusion_deep_fake_tpu.ops.augment import (
        _inverse_affine_coeffs)

    b, h, w, c = images.shape
    i00, i01, i10, i11, itx, ity = _inverse_affine_coeffs(params, h, w)

    x = images.astype(jnp.float32)
    # x-pass: resample along W. Layout (B, H, C, W).
    alpha_x = i00 - i01 * i10 / i11
    vs = jnp.arange(h, dtype=jnp.float32)
    shift_x = ((i01 / i11)[:, None] * vs[None, :]
               + (itx - i01 * ity / i11)[:, None])               # (B, H)
    t = warp_axis_pass_pallas(jnp.transpose(x, (0, 1, 3, 2)), alpha_x,
                              shift_x, interpret=interpret)      # (B, H, C, W)

    # y-pass: resample along H. Layout (B, W, C, H).
    xs = jnp.arange(w, dtype=jnp.float32)
    shift_y = i10[:, None] * xs[None, :] + ity[:, None]          # (B, W)
    t_t = jnp.transpose(t, (0, 3, 2, 1))                         # (B, W, C, H)
    out_t = warp_axis_pass_pallas(t_t, i11, shift_y,
                                  interpret=interpret)           # (B, W, C, H)
    return jnp.transpose(out_t, (0, 3, 1, 2)).astype(images.dtype)
