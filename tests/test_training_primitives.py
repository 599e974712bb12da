"""Optimizer / EMA / state tests against torch + ema_pytorch semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from denoising_diffusion_deep_fake_tpu.training import (
    EmaConfig,
    ModelState,
    cosine_annealing_lr,
    ema_decay,
    ema_update,
    make_adam_with_cosine,
)
from denoising_diffusion_deep_fake_tpu.training.state import create_model_state


def test_cosine_annealing_endpoints():
    # torch CosineAnnealingLR closed form: lr(0)=base, lr(T_max)=eta_min.
    np.testing.assert_allclose(float(cosine_annealing_lr(0.01, 50, 0)), 0.01,
                               rtol=1e-6)
    np.testing.assert_allclose(float(cosine_annealing_lr(0.01, 50, 50)), 0.0,
                               atol=1e-9)
    np.testing.assert_allclose(float(cosine_annealing_lr(0.01, 50, 25)), 0.005,
                               rtol=1e-6)


def test_adam_matches_torch_single_step():
    # torch Adam step 1: update = lr * m_hat / (sqrt(v_hat) + eps)
    # with m_hat = g, v_hat = g^2 -> update ~= lr * sign(g) for eps<<|g|.
    lr, b1, b2, eps = 0.01, 0.5, 0.999, 1e-8
    tx = make_adam_with_cosine(lr, b1=b1, b2=b2, eps=eps)
    params = {"w": jnp.asarray([1.0, -2.0, 3.0])}
    grads = {"w": jnp.asarray([0.1, -0.2, 0.4])}
    opt_state = tx.init(params)
    updates, _ = tx.update(grads, opt_state, params)
    new = optax.apply_updates(params, updates)
    g = np.asarray([0.1, -0.2, 0.4])
    want = np.asarray([1.0, -2.0, 3.0]) - lr * g / (np.abs(g) + eps)
    np.testing.assert_allclose(np.asarray(new["w"]), want, rtol=1e-5)


def test_adam_cosine_schedule_steps_per_epoch():
    tx = make_adam_with_cosine(0.01, cosine_t_max=10, steps_per_epoch=5)
    params = {"w": jnp.zeros(3)}
    state = tx.init(params)
    grads = {"w": jnp.ones(3)}
    # Take 5 steps (epoch 0) then 1 more (epoch 1): LR must drop between them.
    deltas = []
    for _ in range(6):
        updates, state = tx.update(grads, state, params)
        deltas.append(float(jnp.abs(updates["w"][0])))
    # Steps 2-5 are all epoch 0 (same LR, modulo Adam bias-correction drift);
    # step 6 is epoch 1: cosine drops the LR by ~2.4% — clearly visible.
    np.testing.assert_allclose(deltas[1], deltas[4], rtol=1e-3)
    assert deltas[5] < deltas[4] * 0.99


def test_ema_decay_warmup_schedule():
    cfg = EmaConfig(beta=0.9999, update_after_step=100)
    # Before/at warmup boundary: pure copy.
    assert float(ema_decay(0, cfg)) == 0.0
    assert float(ema_decay(100, cfg)) == 0.0
    assert float(ema_decay(101, cfg)) == 0.0  # epoch == 0 -> 0
    # ema_pytorch ramp: 1 - (1 + epoch)^(-2/3), epoch = step - 101.
    got = float(ema_decay(111, cfg))
    want = 1.0 - (1.0 + 10.0) ** (-2.0 / 3.0)
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # Far along: capped at beta.
    np.testing.assert_allclose(float(ema_decay(10_000_000, cfg)), cfg.beta,
                               rtol=1e-6)


def test_ema_update_copy_then_blend():
    cfg = EmaConfig(beta=0.9, update_after_step=1, inv_gamma=1.0, power=1.0)
    ema = {"w": jnp.zeros(2)}
    online = {"w": jnp.ones(2)}
    # step 0: decay 0 -> copy online.
    ema1, step1 = ema_update(ema, online, jnp.asarray(0), cfg)
    np.testing.assert_allclose(np.asarray(ema1["w"]), 1.0)
    assert int(step1) == 1
    # step 3: epoch = 1, decay = 1 - (1+1)^-1 = 0.5 -> halfway blend.
    ema2, _ = ema_update({"w": jnp.zeros(2)}, online, jnp.asarray(3), cfg)
    np.testing.assert_allclose(np.asarray(ema2["w"]), 0.5)


def test_ema_update_every_skips():
    cfg = EmaConfig(beta=0.9, update_every=2, update_after_step=0)
    ema = {"w": jnp.zeros(2)}
    online = {"w": jnp.ones(2)}
    # Odd step -> skipped (ema unchanged), counter still advances.
    out, step = ema_update(ema, online, jnp.asarray(3), cfg)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.0)
    assert int(step) == 4


def test_model_state_create_and_apply(rng):
    import flax.linen as nn

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train=True):
            return nn.Dense(3)(x)

    tx = make_adam_with_cosine(0.1)
    state = create_model_state(Tiny(), jax.random.PRNGKey(0), (1, 3), tx,
                               with_ema=True)
    assert int(state.step) == 0
    assert state.has_ema
    grads = jax.tree.map(jnp.ones_like, state.params)
    new = state.apply_gradients(grads, tx, state.batch_stats)
    assert int(new.step) == 1
    before = jax.tree.leaves(state.params)
    after = jax.tree.leaves(new.params)
    assert all(not np.allclose(b, a) for b, a in zip(before, after))
    # EMA at step 0 copies online params.
    cfg = EmaConfig(update_after_step=0)
    new2 = new.update_ema(cfg)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(new2.ema_params)[0]),
        np.asarray(jax.tree.leaves(new.params)[0]))


def test_remat_policies_are_math_identical():
    """The remat knob (448² bandwidth lever) must not change any math —
    losses bit-match across none/dots/full on the same inputs."""
    import jax
    import numpy as np

    from denoising_diffusion_deep_fake_tpu.config import (
        DenoiserConfig, config_from_dict)
    from denoising_diffusion_deep_fake_tpu.training.denoiser import (
        DenoiserTrainer)

    batch = np.random.default_rng(0).integers(
        0, 256, (2, 32, 32, 3), dtype=np.uint8)
    key = jax.random.PRNGKey(7)
    losses = {}
    for remat in ("none", "dots", "full"):
        cfg = config_from_dict(DenoiserConfig, dict(
            input_image_list_path="x", batch_size=2, learning_rate=1e-3,
            encoder_name="resnet18", compute_dtype="float32",
            noise_exponential_sampling_lambda=3.0, remat=remat),
            validate=False)
        trainer = DenoiserTrainer(cfg, steps_per_epoch=10, image_size=32)
        state = trainer.init_state(jax.random.PRNGKey(0))
        step = trainer.make_train_step(donate=False)
        _, metrics = step(state, batch, key)
        losses[remat] = float(metrics["loss"])
    assert losses["none"] == losses["dots"] == losses["full"], losses
