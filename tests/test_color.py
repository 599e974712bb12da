"""Color jitter op: torchvision-semantics equivalence + trainer integration.

The reference has no photometric augmentation (its chains are
Normalize+ShiftScaleRotate and RandomAffine only), so these tests pin the op
against an independent numpy/colorsys reference instead of recorded outputs.
"""

import colorsys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from denoising_diffusion_deep_fake_tpu.ops.color import (
    ColorJitterConfig,
    adjust_brightness,
    adjust_contrast,
    adjust_hue,
    adjust_saturation,
    color_jitter,
    color_jitter_normalised,
    sample_color_jitter_params,
)

GRAY_W = np.array([0.299, 0.587, 0.114])


def _img(rng, b=2, size=8):
    return rng.random((b, size, size, 3)).astype(np.float32)


def test_config_validation():
    with pytest.raises(ValueError, match="hue"):
        ColorJitterConfig(hue=0.6)
    with pytest.raises(ValueError, match="brightness"):
        ColorJitterConfig(brightness=-0.1)
    with pytest.raises(ValueError, match="probability"):
        ColorJitterConfig(probability=1.5)
    assert not ColorJitterConfig().enabled
    assert ColorJitterConfig(saturation=0.2).enabled


def test_factor_ranges():
    cfg = ColorJitterConfig(brightness=0.4, contrast=0.3, saturation=2.0,
                            hue=0.25, probability=0.5)
    p = sample_color_jitter_params(jax.random.PRNGKey(0), 2000, cfg)
    assert 0.6 <= float(jnp.min(p["brightness"]))
    assert float(jnp.max(p["brightness"])) <= 1.4
    assert 0.7 <= float(jnp.min(p["contrast"]))
    # saturation strength 2.0: lower bound clamps at 0.
    assert float(jnp.min(p["saturation"])) >= 0.0
    assert float(jnp.max(p["saturation"])) <= 3.0
    assert float(jnp.max(jnp.abs(p["hue"]))) <= 0.25
    frac = float(jnp.mean(p["apply"]))
    assert 0.4 < frac < 0.6


def test_disabled_ops_sample_identity_factors():
    cfg = ColorJitterConfig(brightness=0.5)  # others off
    p = sample_color_jitter_params(jax.random.PRNGKey(1), 16, cfg)
    np.testing.assert_array_equal(np.asarray(p["contrast"]), 1.0)
    np.testing.assert_array_equal(np.asarray(p["saturation"]), 1.0)
    np.testing.assert_array_equal(np.asarray(p["hue"]), 0.0)


def test_identity_when_not_applied():
    rng = np.random.default_rng(0)
    x = jnp.asarray(_img(rng))
    params = {
        "brightness": jnp.full((2,), 1.7), "contrast": jnp.full((2,), 0.3),
        "saturation": jnp.full((2,), 2.0), "hue": jnp.full((2,), 0.4),
        "apply": jnp.zeros((2,), bool),
    }
    np.testing.assert_allclose(np.asarray(color_jitter(x, params)),
                               np.asarray(x), atol=1e-7)


def test_identity_factors_are_noop():
    rng = np.random.default_rng(1)
    x = jnp.asarray(_img(rng))
    params = {
        "brightness": jnp.ones((2,)), "contrast": jnp.ones((2,)),
        "saturation": jnp.ones((2,)), "hue": jnp.zeros((2,)),
        "apply": jnp.ones((2,), bool),
    }
    np.testing.assert_allclose(np.asarray(color_jitter(x, params)),
                               np.asarray(x), atol=1e-5)


def test_brightness_matches_reference_formula():
    rng = np.random.default_rng(2)
    x = _img(rng)
    f = np.array([0.5, 1.5], np.float32)
    out = np.asarray(adjust_brightness(jnp.asarray(x), jnp.asarray(f)))
    ref = np.clip(x * f[:, None, None, None], 0, 1)
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_contrast_matches_reference_formula():
    """torchvision adjust_contrast: blend with the mean of the image's
    BT.601 grayscale."""
    rng = np.random.default_rng(3)
    x = _img(rng)
    f = np.array([0.4, 1.3], np.float32)
    out = np.asarray(adjust_contrast(jnp.asarray(x), jnp.asarray(f)))
    gray_mean = (x @ GRAY_W).mean(axis=(1, 2))[:, None, None, None]
    ref = np.clip(x * f[:, None, None, None]
                  + gray_mean * (1 - f[:, None, None, None]), 0, 1)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_saturation_matches_reference_formula():
    rng = np.random.default_rng(4)
    x = _img(rng)
    f = np.array([0.0, 1.8], np.float32)
    out = np.asarray(adjust_saturation(jnp.asarray(x), jnp.asarray(f)))
    gray = (x @ GRAY_W)[..., None]
    ref = np.clip(x * f[:, None, None, None]
                  + gray * (1 - f[:, None, None, None]), 0, 1)
    np.testing.assert_allclose(out, ref, atol=1e-5)
    # f=0: fully desaturated -> all channels equal the luma.
    np.testing.assert_allclose(out[0, ..., 0], out[0, ..., 1], atol=1e-5)


def test_hue_matches_colorsys():
    """Per-pixel HSV rotation against Python's colorsys (independent impl)."""
    rng = np.random.default_rng(5)
    x = rng.random((1, 4, 4, 3)).astype(np.float32)
    for shift in (-0.4, -0.1, 0.25, 0.5):
        out = np.asarray(adjust_hue(jnp.asarray(x),
                                    jnp.asarray([shift], np.float32)))[0]
        for yy in range(4):
            for xx in range(4):
                h, s, v = colorsys.rgb_to_hsv(*x[0, yy, xx])
                ref = colorsys.hsv_to_rgb((h + shift) % 1.0, s, v)
                np.testing.assert_allclose(out[yy, xx], ref, atol=1e-5)


def test_hue_round_trip():
    rng = np.random.default_rng(6)
    x = jnp.asarray(_img(rng))
    shift = jnp.asarray([0.2, -0.35], np.float32)
    back = adjust_hue(adjust_hue(x, shift), -shift)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-4)


def test_hue_preserves_value_and_gray_pixels():
    rng = np.random.default_rng(7)
    x = _img(rng)
    x[0, 0, 0] = 0.5  # a gray pixel: hue rotation must not touch it
    out = np.asarray(adjust_hue(jnp.asarray(x),
                                jnp.asarray([0.3, 0.3], np.float32)))
    np.testing.assert_allclose(out[0, 0, 0], 0.5, atol=1e-6)
    # V (max channel) is invariant under hue rotation.
    np.testing.assert_allclose(out.max(-1), x.max(-1), atol=1e-5)


def test_color_jitter_normalised_round_trip():
    """Denorm -> jitter -> renorm: identity params return the input exactly
    (mean/std 0.5: the [-1,1] normalized range maps onto [0,1] losslessly)."""
    rng = np.random.default_rng(8)
    x = jnp.asarray((_img(rng) - 0.5) / 0.5)  # normalized, in [-1, 1]
    params = {
        "brightness": jnp.ones((2,)), "contrast": jnp.ones((2,)),
        "saturation": jnp.ones((2,)), "hue": jnp.zeros((2,)),
        "apply": jnp.ones((2,), bool),
    }
    out = color_jitter_normalised(x, params, [0.5] * 3, [0.5] * 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)
    assert out.dtype == x.dtype


def test_color_jitter_normalised_keeps_dtype():
    x = jnp.zeros((1, 4, 4, 3), jnp.bfloat16)
    cfg = ColorJitterConfig(brightness=0.2)
    params = sample_color_jitter_params(jax.random.PRNGKey(0), 1, cfg)
    assert color_jitter_normalised(x, params, [0.5] * 3,
                                   [0.5] * 3).dtype == jnp.bfloat16


def test_jitter_chain_jits_and_is_finite():
    cfg = ColorJitterConfig(brightness=0.3, contrast=0.3, saturation=0.3,
                            hue=0.1)
    rng = np.random.default_rng(9)
    x = jnp.asarray(_img(rng, b=4, size=16))

    @jax.jit
    def run(key, x):
        params = sample_color_jitter_params(key, x.shape[0], cfg)
        return color_jitter(x, params)

    out = np.asarray(run(jax.random.PRNGKey(3), x))
    assert out.shape == x.shape
    assert np.isfinite(out).all()
    assert (out >= 0).all() and (out <= 1).all()
    assert not np.allclose(out, np.asarray(x))  # it actually did something


def test_denoiser_step_with_jitter_runs_and_differs():
    """Config knob -> trainer wiring: jitter on changes the augmented batch
    the loss sees; jitter off preserves the exact legacy key streams (the
    pinned goldens in test_golden.py keep guarding that)."""
    from denoising_diffusion_deep_fake_tpu.config import (
        DenoiserConfig, config_from_dict)
    from denoising_diffusion_deep_fake_tpu.training.denoiser import (
        DenoiserTrainer)

    base = dict(input_image_list_path="x", batch_size=4, learning_rate=1e-3,
                encoder_name="resnet18", compute_dtype="float32",
                noise_exponential_sampling_lambda=3.0)
    batch = np.random.default_rng(0).integers(
        0, 256, (4, 32, 32, 3), dtype=np.uint8)
    key = jax.random.PRNGKey(7)

    losses = {}
    for name, jitter in (("off", (0.0,) * 4), ("on", (0.5, 0.5, 0.5, 0.25))):
        cfg = config_from_dict(DenoiserConfig,
                               dict(base, color_jitter=jitter),
                               validate=False)
        trainer = DenoiserTrainer(cfg, steps_per_epoch=10, image_size=32)
        state = trainer.init_state(jax.random.PRNGKey(0))
        step = trainer.make_train_step(donate=False)
        _, metrics = step(state, batch, key)
        losses[name] = float(metrics["loss"])
    assert np.isfinite(list(losses.values())).all()
    assert losses["on"] != losses["off"]


def test_config_rejects_bad_jitter():
    from denoising_diffusion_deep_fake_tpu.config import (
        DenoiserConfig, config_from_dict)

    cfg = config_from_dict(DenoiserConfig, dict(
        input_image_list_path="x", batch_size=4, learning_rate=1e-3,
        noise_exponential_sampling_lambda=3.0,
        color_jitter=(0.1, 0.1, 0.1, 0.7)), validate=False)
    with pytest.raises(ValueError, match="hue"):
        cfg.validate()
