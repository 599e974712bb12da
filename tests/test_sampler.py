"""DDIM sampler tests: schedule, perfect-predictor recovery, jit/scan."""

import jax
import jax.numpy as jnp
import numpy as np

from denoising_diffusion_deep_fake_tpu.ops.sampler import (
    ddim_ratio_schedule,
    ddim_sample,
    swap_refine,
)


def test_schedule_shape_and_endpoints():
    r = np.asarray(ddim_ratio_schedule(50, r_start=0.7))
    assert r.shape == (51,)
    np.testing.assert_allclose(r[0], 0.7, rtol=1e-6)
    np.testing.assert_allclose(r[-1], 0.0, atol=1e-8)
    assert np.all(np.diff(r) < 0)


def test_perfect_predictor_recovers_x0():
    # If f always returns the true x0, DDIM must return exactly x0.
    x0 = jax.random.uniform(jax.random.PRNGKey(0), (2, 8, 8, 3))
    predict = lambda x: x0
    noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    r0 = 0.7
    x_init = jnp.sqrt(1 - r0) * x0 + jnp.sqrt(r0) * noise
    out = ddim_sample(predict, x_init, ddim_ratio_schedule(10, r_start=r0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-5)


def test_identity_predictor_preserves_signal_direction():
    # With f = identity, each step keeps x0_hat = x; the trajectory re-blends
    # x with its own implied eps and the final output equals the last x.
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 4, 3))
    out = ddim_sample(lambda z: z, x, ddim_ratio_schedule(5, r_start=0.5))
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_swap_refine_jits_and_is_deterministic():
    x0 = jax.random.uniform(jax.random.PRNGKey(3), (2, 8, 8, 3))
    predict = lambda z: x0

    f = jax.jit(lambda real, key: swap_refine(predict, real, key, steps=4))
    out1 = f(x0, jax.random.PRNGKey(0))
    out2 = f(x0, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    np.testing.assert_allclose(np.asarray(out1), np.asarray(x0), atol=1e-5)


def test_bf16_stability():
    x0 = jax.random.uniform(jax.random.PRNGKey(4), (1, 8, 8, 3),
                            dtype=jnp.float32).astype(jnp.bfloat16)
    out = swap_refine(lambda z: x0, x0, jax.random.PRNGKey(5), steps=50,
                      r_start=0.999)
    assert out.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(out, dtype=np.float32)).all()


def test_clip_bounds_amplifying_predictor():
    """A predictor that amplifies (f = 3x) explodes raw DDIM exponentially;
    the default data-range clip keeps every iterate bounded (DDPM-style
    static thresholding — see ddim_sample docstring)."""
    x = jax.random.normal(jax.random.PRNGKey(6), (1, 8, 8, 3)) * 0.5
    ratios = ddim_ratio_schedule(30, r_start=0.7)
    amplify = lambda z: 3.0 * z
    raw = ddim_sample(amplify, x, ratios, clip=None)
    clipped = ddim_sample(amplify, x, ratios)
    assert float(jnp.abs(raw).max()) > 50  # the blow-up clip prevents
    assert float(jnp.abs(clipped).max()) <= 3.0 + 1e-5  # last f(x) of |x|<=1
