"""Fused whole-sample warp kernel vs the shipped two-pass kernel.

Interpret mode on CPU; hardware timing comes from tools/warp_breakdown.py.
The strongest check: the fused kernel reproduces the shipped kernel's output
EXACTLY (same banded-matmul + residual-MAC math, same bf16 rounding points),
so every hardware-validated property of the two-pass kernel transfers.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from denoising_diffusion_deep_fake_tpu.ops.augment import (
    AffineAugmentConfig,
    affine_warp,
    augment_batch,
    sample_affine_params,
)
from denoising_diffusion_deep_fake_tpu.ops.pallas.warp_kernel import (
    affine_warp_pallas,
)
from denoising_diffusion_deep_fake_tpu.ops.pallas.warp_fused import (
    affine_warp_pallas_fused,
)

B, S = 2, 64


@pytest.fixture(scope="module")
def image():
    rng = np.random.default_rng(0)
    y, x = np.mgrid[0:S, 0:S] / S
    base = np.stack([np.sin(4 * x + 2 * y), np.cos(3 * y), x * y], axis=-1)
    return jnp.asarray((base + 0.05 * rng.standard_normal((S, S, 3)))
                       .astype(np.float32)[None].repeat(B, axis=0))


def _params(angle=0.0, scale=1.0, tx=0.0, ty=0.0):
    ones = jnp.ones((B,), jnp.float32)
    return {"angle": ones * angle, "scale": ones * scale, "tx": ones * tx,
            "ty": ones * ty, "apply": jnp.ones((B,), bool)}


def test_matches_two_pass_kernel_exactly(image):
    params = sample_affine_params(jax.random.PRNGKey(3), B,
                                  AffineAugmentConfig.random_affine())
    two_pass = np.asarray(affine_warp_pallas(image, params, interpret=True))
    fused = np.asarray(affine_warp_pallas_fused(image, params,
                                                interpret=True))
    np.testing.assert_array_equal(fused, two_pass)


def test_identity(image):
    out = affine_warp_pallas_fused(image, _params(), interpret=True)
    # bf16 scratch rounding only (the two-pass kernel round-trips the same
    # bf16 cast at its matmul input).
    np.testing.assert_allclose(np.asarray(out), np.asarray(image), atol=5e-3)


def test_pure_shift_matches_gather(image):
    p = _params(tx=0.1, ty=-0.05)
    ref = np.asarray(affine_warp(image, p))
    out = np.asarray(affine_warp_pallas_fused(image, p, interpret=True))
    np.testing.assert_allclose(out, ref, atol=2e-2)


def test_rectangular_shapes(image):
    # H != W exercises the per-axis window sizes and the (B,C,W,H) output
    # orientation.
    rect = jnp.concatenate([image, image[:, :32]], axis=1)      # (B, 96, 64)
    params = sample_affine_params(jax.random.PRNGKey(5), B,
                                  AffineAugmentConfig.random_affine())
    two_pass = np.asarray(affine_warp_pallas(rect, params, interpret=True))
    fused = np.asarray(affine_warp_pallas_fused(rect, params, interpret=True))
    np.testing.assert_array_equal(fused, two_pass)


def test_augment_batch_method(image):
    u8 = jnp.asarray(np.random.default_rng(1).integers(
        0, 256, (B, S, S, 3), dtype=np.uint8))
    cfg = AffineAugmentConfig.random_affine()
    out = augment_batch(jax.random.PRNGKey(0), u8, (0.5,) * 3, (0.5,) * 3,
                        cfg, method="pallas_fused")
    assert out.shape == u8.shape and out.dtype == jnp.float32
    assert bool(jnp.isfinite(out).all())


def test_uint8_norm_fold_bit_matches_pipeline():
    """uint8 in-kernel normalize == normalise_batch -> two-pass kernel."""
    from denoising_diffusion_deep_fake_tpu.ops.augment import normalise_batch

    u8 = jnp.asarray(np.random.default_rng(2).integers(
        0, 256, (B, S, S, 3), dtype=np.uint8))
    mean, std = (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)
    params = sample_affine_params(jax.random.PRNGKey(7), B,
                                  AffineAugmentConfig.random_affine())
    pipeline = np.asarray(affine_warp_pallas(
        normalise_batch(u8, mean, std), params, interpret=True))
    folded = np.asarray(affine_warp_pallas_fused(
        u8, params, mean=mean, std=std, interpret=True))
    np.testing.assert_array_equal(folded, pipeline)


def test_rejects_unaligned():
    img = jnp.zeros((1, 64, 40, 3), jnp.float32)
    params = {k: v[:1] for k, v in _params().items()}
    with pytest.raises(ValueError, match="multiples"):
        affine_warp_pallas_fused(img, params, interpret=True)


def test_warp_method_config_knob(tmp_path):
    """fit_denoiser trains through warp_method=pallas_fused end to end."""
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from helpers import make_image_dataset

    from denoising_diffusion_deep_fake_tpu.config import (
        DenoiserConfig, config_from_dict)
    from denoising_diffusion_deep_fake_tpu.training.runners import (
        fit_denoiser)

    manifest = make_image_dataset(tmp_path, n=8, size=32)
    losses = []
    cfg = config_from_dict(DenoiserConfig, dict(
        input_image_list_path=str(manifest), batch_size=4, image_size=32,
        learning_rate=1e-3, encoder_name="resnet18", max_epochs=1,
        noise_exponential_sampling_lambda=5.0, warp_method="pallas_fused",
        log_dir=str(tmp_path / "runs"), checkpoint_dir=str(tmp_path / "c"),
        last_checkpoint_min_interval_s=1e9, handle_preemption=False))
    fit_denoiser(cfg, max_steps=2, verbose=False,
                 step_callback=lambda s, st, m: losses.append(
                     float(m["loss"])))
    assert len(losses) == 2 and np.isfinite(losses).all()


def test_warp_method_validation():
    from denoising_diffusion_deep_fake_tpu.config import (
        DenoiserConfig, config_from_dict)

    base = dict(input_image_list_path="x", batch_size=4, image_size=32,
                learning_rate=1e-3, encoder_name="resnet18", max_epochs=1)
    with pytest.raises(ValueError, match="unknown warp_method"):
        config_from_dict(DenoiserConfig,
                         dict(base, warp_method="fused")).validate()
    with pytest.raises(ValueError, match="single-device"):
        config_from_dict(DenoiserConfig,
                         dict(base, warp_method="pallas",
                              data_parallel=4)).validate()


def test_kernels_ignore_global_matmul_precision(image):
    """The kernels' bf16 dots are pinned to Precision.DEFAULT: under the
    fp32 parity mode (`matmul_precision: auto` -> global HIGHEST,
    config.py) Mosaic has no lowering for a bf16 dot with HIGHEST ("Bad
    lhs type" — hit by tools/quality_convergence.py at 448^2, 2026-08-18).
    Pinning makes the kernels precision-config-invariant; this asserts the
    output is bit-identical under both global settings (interpret mode;
    the hardware compile was verified on-chip the same day)."""
    params = _params(angle=7.0, scale=1.05, tx=0.02, ty=-0.03)
    out_default = affine_warp_pallas_fused(image, params, interpret=True)
    two_default = affine_warp_pallas(image, params, interpret=True)
    prev = jax.config.jax_default_matmul_precision
    jax.config.update("jax_default_matmul_precision", "highest")
    try:
        out_high = affine_warp_pallas_fused(image, params, interpret=True)
        two_high = affine_warp_pallas(image, params, interpret=True)
    finally:
        jax.config.update("jax_default_matmul_precision", prev)
    np.testing.assert_array_equal(np.asarray(out_default),
                                  np.asarray(out_high))
    np.testing.assert_array_equal(np.asarray(two_default),
                                  np.asarray(two_high))
