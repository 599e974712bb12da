"""Pallas TPU kernel: fused uint8-normalize + variance-preserving noise blend.

The train-loop data path is ``uint8 batch -> normalize -> (augment) ->
x_noisy = sqrt(1-r)x + sqrt(r)eps``. Composed from jnp ops, XLA materializes
the f32 normalized batch and the f32 Gaussian noise tensor between fusions;
this kernel does the whole stage in ONE HBM read (uint8) and ONE HBM write
(f32/bf16):

* pixels stream HBM -> VMEM in (8 images, TILE columns) blocks over a 2-D
  grid (sublane dim 8, lane dim a multiple of 128 — the TPU f32 tiling
  minimum; TILE caps VMEM use at 256²+ resolutions),
* normalization ``(x - mean*255)/(std*255)`` on the VPU,
* Gaussian noise is generated **on-chip** with the per-core PRNG
  (`pltpu.prng_random_bits`) + Box-Muller — no noise tensor ever touches HBM,
* per-sample noise ratios ride as an (8, 1) VMEM column broadcast across
  each tile,
* the VP blend writes the only output.

Shape support: batch divisible by 8 and H*W*C divisible by 128 (all
production configs: 64²/128²/256²/448² x RGB qualify). Callers fall back to
the jnp path otherwise (``supports_shape``).

Mosaic/v5e quirks encoded here: no uint8->f32 or uint32->f32 casts (widen via
int32 and logical shifts); scoped VMEM is ~16 MB, hence the column tiling.

Parity: blend math is exactly `ops/noise.py::blend_noise` (reference
`d3f/train_deep_fake/lit_module.py:208-219`); only the PRNG stream differs,
pinned by moment/normality tests on hardware (the mosaic interpreter stubs
`prng_random_bits` to zeros, so CPU tests cover the deterministic path only).

Measured on TPU v5e (tools/validate_pallas_tpu.py, batch 32 @ 256²):
fused kernel 1.98 ms vs XLA-fused jnp composition 1.27 ms. XLA already fuses
the entire elementwise normalize+threefry+blend chain into one kernel, so the
jnp path remains the default; this kernel is kept as the optional
``use_pallas_noise`` path and as the base for the fully-fused
augment+noise kernel (where XLA cannot fuse across the gather).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TWO_PI = 6.283185307179586
_BLOCK_B = 8
# Largest column tile (multiple of 128): (8, TILE) f32 in/out + noise temps +
# double buffering stays well inside the ~16 MB scoped VMEM.
_MAX_TILE = 32_768


def supports_shape(shape) -> bool:
    b, h, w, c = shape
    return b % _BLOCK_B == 0 and (h * w * c) % 256 == 0


def _column_tile(row: int) -> int:
    # Multiple of 256 so the half-width Box-Muller split stays lane-aligned.
    tile = min(row, _MAX_TILE)
    tile -= tile % 256
    while row % tile:
        tile -= 256
    return tile


def _uniform_from_bits(bits_i32: jax.Array) -> jax.Array:
    """int32 random bits -> float32 uniform in (0, 1): top 24 bits, never 0.

    Mosaic (v5e) lacks uint32->f32 casts, so bits stay int32 and are
    logically shifted — the result fits in 24 bits and casts exactly.
    """
    top24 = jax.lax.shift_right_logical(bits_i32, 8)
    return top24.astype(jnp.float32) * (1.0 / (1 << 24)) + (1.0 / (1 << 25))


def _gaussian_noise(shape) -> jax.Array:
    """On-chip standard normal via Box-Muller over pltpu PRNG bits.

    (A half-width variant producing two normals per (u1,u2) pair via
    cos/sin + lane concatenation hangs the Mosaic compiler on this jax
    version — keep the straightforward two-draw form.)
    """
    u1 = _uniform_from_bits(pltpu.bitcast(pltpu.prng_random_bits(shape),
                                          jnp.int32))
    u2 = _uniform_from_bits(pltpu.bitcast(pltpu.prng_random_bits(shape),
                                          jnp.int32))
    return jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(_TWO_PI * u2)


def _program_seed(seed_ref):
    """Distinct PRNG stream per grid program."""
    return seed_ref[0] + pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)


def _kernel(seed_ref, mean_ref, std_ref, ratio_ref, u8_ref, out_ref):
    pltpu.prng_seed(_program_seed(seed_ref))
    # Mosaic has no direct uint8->f32 cast on v5e; widen via int32 first.
    x = u8_ref[...].astype(jnp.int32).astype(jnp.float32)
    x = (x - mean_ref[...]) / std_ref[...]
    noise = _gaussian_noise(x.shape)
    r = ratio_ref[...]  # (8, 1), broadcasts across the tile
    out = jnp.sqrt(1.0 - r) * x + jnp.sqrt(r) * noise
    out_ref[...] = out.astype(out_ref.dtype)


def _kernel_f32(seed_ref, ratio_ref, x_ref, out_ref):
    pltpu.prng_seed(_program_seed(seed_ref))
    x = x_ref[...].astype(jnp.float32)
    noise = _gaussian_noise(x.shape)
    r = ratio_ref[...]
    out = jnp.sqrt(1.0 - r) * x + jnp.sqrt(r) * noise
    out_ref[...] = out.astype(out_ref.dtype)


def _tiled_specs(tile: int):
    img = pl.BlockSpec((_BLOCK_B, tile), lambda i, j, *_: (i, j),
                       memory_space=pltpu.VMEM)
    ratio = pl.BlockSpec((_BLOCK_B, 1), lambda i, j, *_: (i, 0),
                         memory_space=pltpu.VMEM)
    chan = pl.BlockSpec((tile,), lambda i, j, *_: (j,),
                        memory_space=pltpu.VMEM)
    return img, ratio, chan


def fused_normalise_noise_blend(batch_u8: jax.Array, ratios: jax.Array,
                                mean, std, *, seed,
                                out_dtype=jnp.float32,
                                interpret: bool = False) -> jax.Array:
    """Fused ``normalize -> +noise`` over an NHWC uint8 batch.

    Args:
      batch_u8: (B, H, W, C) uint8, B % 8 == 0, H*W*C % 128 == 0.
      ratios: (B,) float32 per-sample noise ratios in [0, 1].
      mean/std: per-channel, 0-1 scale (multiplied by 255 internally).
      seed: int32 scalar seeding the on-chip PRNG (vary per step).
      interpret: run under the mosaic interpreter (CPU tests; PRNG stubbed).
    """
    b, h, w, c = batch_u8.shape
    if not supports_shape(batch_u8.shape):
        raise ValueError(f"unsupported shape {batch_u8.shape}; "
                         "need B%8==0 and H*W*C%128==0")
    row = h * w * c
    tile = _column_tile(row)
    flat = batch_u8.reshape(b, row)

    mean_row = jnp.tile(jnp.asarray(mean, jnp.float32) * 255.0, h * w)
    std_row = jnp.tile(jnp.asarray(std, jnp.float32) * 255.0, h * w)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    ratio_col = ratios.reshape(b, 1).astype(jnp.float32)

    img_spec, ratio_spec, chan_spec = _tiled_specs(tile)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # seed
        grid=(b // _BLOCK_B, row // tile),
        in_specs=[chan_spec, chan_spec, ratio_spec, img_spec],
        out_specs=img_spec,
    )

    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, row), out_dtype),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(seed_arr, mean_row, std_row, ratio_col, flat)
    return out.reshape(b, h, w, c)


def fused_noise_blend(x: jax.Array, ratios: jax.Array, *, seed,
                      interpret: bool = False) -> jax.Array:
    """Fused VP noise blend of an already-normalized float NHWC batch.

    Drop-in for the noise stage of ``blend_random_amount_of_noise`` with
    on-chip noise generation (ratios still come from the caller so their
    truncated-exponential distribution is exactly `ops/noise.py`'s).
    """
    b, h, w, c = x.shape
    if not supports_shape(x.shape):
        raise ValueError(f"unsupported shape {x.shape}")
    row = h * w * c
    tile = _column_tile(row)
    flat = x.reshape(b, row)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    ratio_col = ratios.reshape(b, 1).astype(jnp.float32)

    img_spec, ratio_spec, _ = _tiled_specs(tile)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // _BLOCK_B, row // tile),
        in_specs=[ratio_spec, img_spec],
        out_specs=img_spec,
    )
    out = pl.pallas_call(
        _kernel_f32,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, row), x.dtype),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(seed_arr, ratio_col, flat)
    return out.reshape(b, h, w, c)


@functools.partial(jax.jit, static_argnames=("mean", "std", "interpret"))
def fused_noise_for_balance(batch_u8, ratio, mean, std, seed,
                            interpret=False):
    """Balance-workload wrapper: fixed ratio broadcast to the batch."""
    b = batch_u8.shape[0]
    ratios = jnp.full((b,), ratio, jnp.float32)
    return fused_normalise_noise_blend(batch_u8, ratios, mean, std,
                                       seed=seed, interpret=interpret)
