"""Validate + micro-bench the Pallas kernels on real TPU hardware.

Run with the chip free:  python tools/validate_pallas_tpu.py
Checks noise statistics, seed determinism, and compares the fused kernel's
step time against the jnp (XLA threefry) composition at a production shape.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from denoising_diffusion_deep_fake_tpu.ops import blend_random_amount_of_noise
from denoising_diffusion_deep_fake_tpu.ops.augment import normalise_batch
from denoising_diffusion_deep_fake_tpu.ops.pallas.noise_kernel import (
    fused_normalise_noise_blend,
)


def timeit(f, *args, iters=30):
    from denoising_diffusion_deep_fake_tpu.utils.timing import timed_fn

    # value-fetch barriers: block_until_ready does not wait on this platform
    return timed_fn(f, *args, steps=iters, warmup=2) * 1e3


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    rng = np.random.default_rng(0)
    b, size = 32, 256
    batch = jnp.asarray(rng.integers(0, 256, (b, size, size, 3),
                                     dtype=np.uint8))
    mean = std = (0.5, 0.5, 0.5)

    # Statistics: pure-noise output must be ~N(0,1).
    ones = jnp.ones((b,), jnp.float32)
    out = np.asarray(fused_normalise_noise_blend(batch, ones, mean, std,
                                                 seed=1))
    print(f"noise stats: mean={out.mean():+.4f} var={out.var():.4f} "
          f"max|x|={np.abs(out).max():.2f}")
    assert abs(out.mean()) < 0.02 and abs(out.var() - 1.0) < 0.02

    # Seed determinism.
    a1 = np.asarray(fused_normalise_noise_blend(batch, ones, mean, std, seed=7))
    a2 = np.asarray(fused_normalise_noise_blend(batch, ones, mean, std, seed=7))
    a3 = np.asarray(fused_normalise_noise_blend(batch, ones, mean, std, seed=8))
    assert np.array_equal(a1, a2) and not np.array_equal(a1, a3)
    print("seed determinism OK")

    # Zero ratio == pure normalization.
    z = np.asarray(fused_normalise_noise_blend(batch, ones * 0, mean, std,
                                               seed=1))
    want = (np.asarray(batch).astype(np.float32) - 127.5) / 127.5
    np.testing.assert_allclose(z, want, atol=1e-5)
    print("normalization parity OK")

    # Micro-bench vs the jnp composition at 256² batch 32.
    half = jnp.full((b,), 0.5, jnp.float32)
    fused = jax.jit(lambda u8: fused_normalise_noise_blend(
        u8, half, mean, std, seed=3))

    @jax.jit
    def xla_path(u8, key):
        x = normalise_batch(u8, mean, std)
        noisy, _ = blend_random_amount_of_noise(key, x, 5.0)
        return noisy

    t_fused = timeit(fused, batch)
    t_xla = timeit(xla_path, batch, jax.random.PRNGKey(0))
    mb = b * size * size * 3 * (1 + 4) / 1e6
    print(f"fused pallas: {t_fused:.3f} ms  ({mb / t_fused:.1f} GB/s eff)")
    print(f"xla compose : {t_xla:.3f} ms")
    print(f"speedup: {t_xla / t_fused:.2f}x")


def validate_warp_kernel():
    """Warp kernel vs XLA hybrid on hardware: agreement + marginal timing.

    Chained (xN inside one jit) timing subtracts the per-dispatch overhead
    of this platform's TPU tunnel (~3 ms — BASELINE.md methodology note).
    """
    from denoising_diffusion_deep_fake_tpu.ops.augment import (
        AffineAugmentConfig, affine_warp_hybrid, sample_affine_params)
    from denoising_diffusion_deep_fake_tpu.ops.pallas.warp_kernel import (
        affine_warp_pallas)
    from denoising_diffusion_deep_fake_tpu.utils.timing import timed_fn

    rng = np.random.default_rng(0)
    cfg = AffineAugmentConfig.random_affine()
    for b, size in ((16, 448), (32, 256)):
        img = jnp.asarray(rng.standard_normal((b, size, size, 3))
                          .astype(np.float32))
        params = sample_affine_params(jax.random.PRNGKey(3), b, cfg)
        hyb = np.asarray(jax.jit(affine_warp_hybrid)(img, params))
        pal = np.asarray(jax.jit(affine_warp_pallas)(img, params))
        mean_diff = np.abs(hyb - pal).mean()
        assert mean_diff < 0.05, mean_diff

        def chain(f, n):
            def run(x):
                for _ in range(n):
                    x = f(x, params)
                return x
            return jax.jit(run)

        t_h = (timeit(chain(affine_warp_hybrid, 8), img, iters=8)
               - timeit(chain(affine_warp_hybrid, 1), img, iters=8)) / 7
        t_p = (timeit(chain(affine_warp_pallas, 8), img, iters=8)
               - timeit(chain(affine_warp_pallas, 1), img, iters=8)) / 7
        print(f"warp {size}x{size}/b{b}: mean diff {mean_diff:.4f}; marginal "
              f"hybrid {t_h:.2f} ms vs pallas {t_p:.2f} ms "
              f"({t_h / max(t_p, 1e-9):.1f}x)")


def validate_fused_warp():
    """Fused whole-sample kernel on hardware: first Mosaic lowering check +
    agreement with the two-pass kernel (bit-identical math; hardware
    tolerance covers MXU feed-order differences of the transposed matmul).
    """
    from denoising_diffusion_deep_fake_tpu.ops.augment import (
        AffineAugmentConfig, normalise_batch, sample_affine_params)
    from denoising_diffusion_deep_fake_tpu.ops.pallas.warp_kernel import (
        affine_warp_pallas)
    from denoising_diffusion_deep_fake_tpu.ops.pallas.warp_fused import (
        affine_warp_pallas_fused)

    rng = np.random.default_rng(0)
    cfg = AffineAugmentConfig.random_affine()
    for b, size in ((16, 448), (32, 256)):
        img = jnp.asarray(rng.standard_normal((b, size, size, 3))
                          .astype(np.float32))
        params = sample_affine_params(jax.random.PRNGKey(3), b, cfg)
        two = np.asarray(jax.jit(affine_warp_pallas)(img, params))
        fused = np.asarray(jax.jit(affine_warp_pallas_fused)(img, params))
        diff = np.abs(two - fused).max()
        print(f"fused warp {size}²/b{b}: max|two_pass - fused| = {diff:.2e}")
        assert diff < 1e-2, diff

    # uint8 norm-fold variant at the reference operating point.
    u8 = jnp.asarray(rng.integers(0, 256, (16, 448, 448, 3), dtype=np.uint8))
    params = sample_affine_params(jax.random.PRNGKey(4), 16, cfg)
    mean = std = (0.5, 0.5, 0.5)
    piped = np.asarray(jax.jit(affine_warp_pallas)(
        normalise_batch(u8, mean, std), params))
    folded = np.asarray(jax.jit(lambda u: affine_warp_pallas_fused(
        u, params, mean=mean, std=std))(u8))
    diff = np.abs(piped - folded).max()
    print(f"fused warp uint8-norm fold 448²/b16: max diff = {diff:.2e}")
    assert diff < 1e-2, diff


if __name__ == "__main__":
    main()
    validate_warp_kernel()
    try:
        validate_fused_warp()
    except Exception as e:  # noqa: BLE001 - new kernel; report, don't kill
        print(f"FUSED WARP VALIDATION FAILED: {type(e).__name__}: {e}")
