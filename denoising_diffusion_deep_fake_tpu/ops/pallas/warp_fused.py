"""Fused whole-sample Pallas warp: both affine axis passes in one kernel.

The shipped two-pass kernel (``warp_kernel.py``) needs five HBM round trips
per warp: NHWC->(B,H,C,W) transpose, x-pass, (B,H,C,W)->(B,W,C,H) transpose,
y-pass, transpose back. Each is read+write of the full batch — at 448²/b16
that is ~77 MB x5 over ~180 GB/s achievable HBM bandwidth (BASELINE.md
calibration), so the warp is relayout-bound, not compute-bound.

This kernel keeps the ENTIRE sample resident in VMEM (448²x3 fp32 = 2.4 MB
per sample, well under the ~16 MB/core budget) and runs both passes plus the
intermediate "transpose" inside one ``pallas_call``:

* grid is ``(B,)`` — one kernel instance per sample;
* phase 1 (x-pass) mirrors the shipped kernel's math: per 32-row block, a
  banded scale+shift interpolation matmul on the MXU plus a 25-tap residual
  VPU MAC, writing a bf16 intermediate into VMEM scratch;
* phase 2 (y-pass) needs the intermediate transposed — instead of a data
  relayout it contracts over SUBLANES with ``lax.dot_general`` (dimension
  numbers ``((0,), (0,))``): ``g2[x, o] = sum_h t[h, x] * S_y[h, o]``. The
  MXU consumes the transposed operand directly; no transpose op exists
  anywhere in the kernel;
* the output leaves in ``(B, C, W, H)`` orientation; the caller's single XLA
  transpose back to NHWC plus the input NHWC->NCHW transpose are the only
  HBM relayouts left (3 round trips total, and 2 of 3 are plain transposes).

Math is identical to ``ops.augment.affine_warp_hybrid`` (same LDU shear
factorization, same block quantization, K=12 residual window); unit tests
assert elementwise agreement in interpret mode. Rebuilds the on-device
augmentation of the reference (`/root/reference/d3f/train_denoiser/
lit_module.py:55-65`) at the 448² operating point
(`/root/reference/d3f/train_deep_fake/denoise_config.yml:13-14`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from denoising_diffusion_deep_fake_tpu.ops.pallas.warp_kernel import (
    K,
    ROWS,
    WGT_PAD,
    _round_up,
    band_matrix,
    pass_scalars,
    residual_mac,
)


def _fused_warp_kernel(ax_ref, ay_ref, bx_ref, by_ref,   # scalar prefetch
                       wx_ref, wy_ref, img_ref,          # VMEM inputs
                       out_ref, t_ref, *,                # output + scratch
                       h: int, w: int, channels: int,
                       norm: tuple | None):
    """One sample: x-pass into VMEM scratch, then y-pass out of it.

    ``norm`` (optional) is a static per-channel ``((mean255, std255), ...)``
    — the tile is normalized in-kernel BEFORE the warp, so the batch crosses
    HBM as uint8 and the zero border still lands in normalized space (the
    reference's Compose order, see ops/augment.py docstring).

    Both block loops are ``lax.fori_loop``s, NOT Python unrolls: Mosaic
    allocates scoped-VMEM stack per unrolled instance, and 2x14 inlined
    band matrices + 84 ``residual_mac`` accumulation chains overflowed the
    16 MB scoped budget on hardware (67.9 MB requested — first Mosaic
    lowering, 2026-08-18). A rolled loop keeps one iteration's stack live.
    """
    bi = pl.program_id(0)
    ax = ax_ref[bi]
    ay = ay_ref[bi]
    w_win = _round_up(w + 2 * K, 128)
    h_win = _round_up(h + 2 * K, 128)

    # Phase 1 — x-pass, (32-row, W) tiles per channel. The banded matrix is
    # shared by the channels of a block (warp params are per-sample).
    def x_block(j, carry):
        base = bx_ref[bi, j].astype(jnp.float32)
        s_x = band_matrix(ax, base, w, w_win).astype(jnp.bfloat16)
        wgt = wx_ref[0, pl.ds(j * ROWS, ROWS), :]
        for ch in range(channels):
            tile = img_ref[0, ch, pl.ds(j * ROWS, ROWS), :]
            if tile.dtype == jnp.uint8:
                # Mosaic has no uint8->f32 cast inside a fori_loop body
                # (scan lowering); hop through int32, exact for 0..255.
                tile = tile.astype(jnp.int32)
            tile = tile.astype(jnp.float32)
            if norm is not None:
                m255, s255 = norm[ch]
                tile = (tile - m255) / s255   # division: bit-matches
                # ops.augment.normalise_batch so the fused path stays
                # elementwise-identical to normalize->two-pass-kernel.
            # precision pinned on all three dots: the global
            # jax_default_matmul_precision=highest (fp32 parity mode) has
            # no Mosaic lowering for bf16 operands ("Bad lhs type"); these
            # types are the kernel's explicit design, not the knob's call.
            g = jnp.dot(tile.astype(jnp.bfloat16), s_x,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.DEFAULT)
            t_ref[ch, pl.ds(j * ROWS, ROWS), :] = residual_mac(
                g, wgt, w).astype(jnp.bfloat16)
        return carry

    jax.lax.fori_loop(0, h // ROWS, x_block, 0)

    # Phase 2 — y-pass over (H, 32-column) tiles of the scratch. Contracting
    # dim 0 of both operands feeds the MXU the transposed tile: the result
    # rows are the 32 x-positions, lanes the y interpolation window. The
    # (H, 32) tile is pulled out of scratch with a one-hot selection matmul
    # (t[ch] @ E_m) rather than a dynamic LANE-dim slice — Mosaic has no
    # efficient lowering for dynamic lane offsets, and one-hot x bf16 in an
    # fp32-accumulating dot is EXACT, so the two-pass equality contract
    # (tests/test_warp_fused.py) is preserved bit-for-bit.
    def y_block(m, carry):
        base = by_ref[bi, m].astype(jnp.float32)
        s_y = band_matrix(ay, base, h, h_win).astype(jnp.bfloat16)
        wgt = wy_ref[0, pl.ds(m * ROWS, ROWS), :]
        col = jax.lax.broadcasted_iota(jnp.int32, (w, ROWS), 0)
        sel = jax.lax.broadcasted_iota(jnp.int32, (w, ROWS), 1) + m * ROWS
        e_m = (col == sel).astype(jnp.bfloat16)                # (W, 32)
        for ch in range(channels):
            tile = jnp.dot(t_ref[ch], e_m,
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.DEFAULT)  # (H, 32)
            g = jax.lax.dot_general(
                tile.astype(jnp.bfloat16), s_y,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)           # (32, h_win)
            out_ref[0, ch, pl.ds(m * ROWS, ROWS), :] = residual_mac(
                g, wgt, h)
        return carry

    jax.lax.fori_loop(0, w // ROWS, y_block, 0)


def affine_warp_pallas_fused(images: jax.Array, params: dict, *,
                             mean=None, std=None,
                             interpret: bool = False) -> jax.Array:
    """Whole-sample-in-VMEM affine warp; NHWC in/out, fp32.

    Drop-in equivalent of ``affine_warp_pallas`` /
    ``ops.augment.affine_warp_hybrid``. Requires H, W multiples of 32 and a
    sample small enough for VMEM residency (<= ~512² at C=3).

    With ``mean``/``std`` (static per-channel floats, 0-1 scale), ``images``
    may be raw uint8: normalization folds into the kernel's first pass, so
    the only HBM relayout on the input side moves uint8 bytes (4x cheaper
    than the f32 transpose) and the normalized f32 batch never exists in HBM.
    """
    from denoising_diffusion_deep_fake_tpu.ops.augment import (
        _inverse_affine_coeffs)

    b, h, w, c = images.shape
    if h % ROWS or w % ROWS:
        raise ValueError(f"H={h}, W={w} must be multiples of {ROWS}")
    norm = None
    if mean is not None:
        import numpy as np
        mean_l = np.asarray(mean, np.float64).reshape(-1).tolist()
        std_l = np.asarray(std, np.float64).reshape(-1).tolist()
        if len(mean_l) == 1:
            mean_l, std_l = mean_l * c, std_l * c
        norm = tuple((float(m) * 255.0, float(s) * 255.0)
                     for m, s in zip(mean_l, std_l))
    i00, i01, i10, i11, itx, ity = _inverse_affine_coeffs(params, h, w)

    # LDU shear factors (identical to affine_warp_hybrid).
    alpha_x = i00 - i01 * i10 / i11
    vs = jnp.arange(h, dtype=jnp.float32)
    shift_x = ((i01 / i11)[:, None] * vs[None, :]
               + (itx - i01 * ity / i11)[:, None])              # (B, H)
    alpha_y = i11
    xs = jnp.arange(w, dtype=jnp.float32)
    shift_y = i10[:, None] * xs[None, :] + ity[:, None]         # (B, W)

    base_x, wgt_x = pass_scalars(alpha_x, shift_x, w)   # blocks over H rows
    base_y, wgt_y = pass_scalars(alpha_y, shift_y, h)   # blocks over W cols

    img_nchw = jnp.transpose(
        images if norm is not None else images.astype(jnp.float32),
        (0, 3, 1, 2))

    kernel = functools.partial(_fused_warp_kernel, h=h, w=w, channels=c,
                               norm=norm)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,      # alpha_x, alpha_y, base_x, base_y
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, WGT_PAD), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),              # wgt_x
            pl.BlockSpec((1, w, WGT_PAD), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),              # wgt_y
            pl.BlockSpec((1, c, h, w), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),              # image
        ],
        out_specs=pl.BlockSpec((1, c, w, h), lambda i, *_: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((c, h, w), jnp.bfloat16)],
    )
    out_bcwh = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, c, w, h), jnp.float32),
        interpret=interpret,
    )(alpha_x.astype(jnp.float32), alpha_y.astype(jnp.float32),
      base_x, base_y, wgt_x, wgt_y, img_nchw)
    out = jnp.transpose(out_bcwh, (0, 3, 2, 1))
    return out if norm is not None else out.astype(images.dtype)
