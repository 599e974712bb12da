"""Checkpoint tests: save/restore round-trip, retention, modify reset."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from denoising_diffusion_deep_fake_tpu.checkpoint import (
    CheckpointManager,
    load_rng_key,
    reset_for_modify,
    save_np_rng_state,
)
from denoising_diffusion_deep_fake_tpu.training.optim import (
    make_adam_with_cosine,
)
from denoising_diffusion_deep_fake_tpu.training.state import (
    create_model_state,
)


def _tiny_state(with_ema=False, seed=0):
    import flax.linen as nn

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train=True):
            x = nn.Dense(4)(x)
            x = nn.BatchNorm(use_running_average=not train)(x)
            return nn.Dense(2)(x)

    tx = make_adam_with_cosine(0.1)
    state = create_model_state(Tiny(), jax.random.PRNGKey(seed), (2, 3), tx,
                               with_ema=with_ema)
    return state, tx


def test_save_restore_round_trip(tmp_path):
    state, tx = _tiny_state(with_ema=True)
    manager = CheckpointManager(tmp_path / "ckpt", keep=3)
    hparams = {"mode": "swap", "lr": 0.1}
    extra = save_np_rng_state({"epoch": 2}, jax.random.PRNGKey(7))
    manager.save(5, {"a": state}, hparams, extra)

    restored, meta = manager.restore(lambda: {"a": _tiny_state(True)[0]})
    assert meta["hparams"] == hparams
    assert meta["extra"]["epoch"] == 2
    key = load_rng_key(meta["extra"])
    np.testing.assert_array_equal(jax.random.key_data(key),
                                  jax.random.key_data(jax.random.PRNGKey(7)))
    for got, want in zip(jax.tree.leaves(restored["a"].params),
                         jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # Optimizer moments and EMA survive too.
    for got, want in zip(jax.tree.leaves(restored["a"].opt_state),
                         jax.tree.leaves(state.opt_state)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(restored["a"].ema_params)[0]),
        np.asarray(jax.tree.leaves(state.ema_params)[0]))


def test_retention_keeps_latest(tmp_path):
    state, _ = _tiny_state()
    manager = CheckpointManager(tmp_path / "ckpt", keep=2)
    for step in (1, 2, 3):
        manager.save(step, state, {})
    assert manager.all_steps() == [2, 3]
    assert manager.latest_step() == 3


def test_restore_specific_step(tmp_path):
    state, tx = _tiny_state()
    manager = CheckpointManager(tmp_path / "ckpt", keep=5)
    manager.save(1, state, {"v": 1})
    grads = jax.tree.map(jnp.ones_like, state.params)
    state2 = state.apply_gradients(grads, tx, state.batch_stats)
    manager.save(2, state2, {"v": 2})

    restored, meta = manager.restore(lambda: _tiny_state()[0], step=1)
    assert meta["hparams"]["v"] == 1
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(restored.params)[0]),
        np.asarray(jax.tree.leaves(state.params)[0]))


def test_reset_for_modify_fresh_optimizer(tmp_path):
    state, tx = _tiny_state()
    grads = jax.tree.map(jnp.ones_like, state.params)
    state = state.apply_gradients(grads, tx, state.batch_stats)
    assert int(state.step) == 1
    reset = reset_for_modify(state, tx.init)
    assert int(reset.step) == 0
    # Weights kept, Adam moments zeroed.
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(reset.params)[0]),
        np.asarray(jax.tree.leaves(state.params)[0]))
    mu_leaves = jax.tree.leaves(reset.opt_state)
    assert any(np.allclose(np.asarray(l), 0) for l in mu_leaves)


def test_missing_checkpoint_raises(tmp_path):
    manager = CheckpointManager(tmp_path / "empty")
    try:
        manager.restore(lambda: _tiny_state()[0])
        raised = False
    except FileNotFoundError:
        raised = True
    assert raised


def test_async_save_is_consistent(tmp_path):
    """block=False: readers join the in-flight save and see a full ckpt."""
    import jax
    import jax.numpy as jnp

    from denoising_diffusion_deep_fake_tpu.checkpoint import CheckpointManager

    states = {"w": jnp.arange(64, dtype=jnp.float32),
              "step": jnp.zeros((), jnp.int32)}
    manager = CheckpointManager(tmp_path / "ckpt", keep=2)
    manager.save(1, states, {"lr": 0.1}, block=False)
    # read_meta must join the background finish, not race it.
    meta = manager.read_meta()
    assert meta["step"] == 1 and meta["hparams"]["lr"] == 0.1
    # A second async save immediately after must serialize, not overlap.
    manager.save(2, {"w": states["w"] * 2, "step": states["step"] + 1},
                 {"lr": 0.2}, block=False)
    manager.wait_until_finished()
    assert manager.all_steps() == [1, 2]
    restored, meta2 = manager.restore(
        lambda: {"w": jnp.zeros(64, jnp.float32),
                 "step": jnp.zeros((), jnp.int32)})
    assert meta2["step"] == 2
    assert float(jax.numpy.sum(restored["w"])) == float(
        jnp.sum(states["w"] * 2))


def test_async_save_failure_surfaces(tmp_path):
    """A failed background save must raise on the next join, not vanish."""
    import jax.numpy as jnp
    import pytest

    from denoising_diffusion_deep_fake_tpu.checkpoint import CheckpointManager

    manager = CheckpointManager(tmp_path / "ckpt")

    class Boom:
        def save(self, *a, **k):
            pass

        def wait_until_finished(self):
            raise IOError("disk full")

    manager._ckpt = Boom()
    manager.save(1, {"w": jnp.zeros(4)}, {}, block=False)
    with pytest.raises(RuntimeError, match="async checkpoint save failed"):
        manager.wait_until_finished()
    # Error is consumed; manager is usable again afterwards.
    manager.wait_until_finished()
