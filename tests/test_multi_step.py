"""steps_per_call K-step supersteps (training/multi_step.py).

Two layers of pinning:

1. EXACT orchestration tests against a toy step core that uses integer
   sums (order-independent, rounding-free) plus counter-based PRNG draws:
   the scanned program must consume the same batches, the same
   ``state.step`` sequence, and derive the same per-step keys as K single
   dispatches — bit-for-bit.
2. Loose end-to-end equivalence through the real trainers. The scanned
   program fuses differently than the unrolled one, so compiled rounding
   differs at machine epsilon and training dynamics amplify it (measured:
   fp32 1e-6 step-1 differences grow to ~1e-2 by step 6 — same class as
   BASELINE.md round 3's cross-platform fp32 decoherence). A WRONG key,
   step counter, or batch order would produce O(1) loss differences, so a
   5% band cleanly separates "correct modulo rounding" from broken.
"""

from typing import NamedTuple

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from helpers import make_image_dataset

from denoising_diffusion_deep_fake_tpu.config import (
    DeepFakeConfig,
    DenoiserConfig,
    config_from_dict,
)
from denoising_diffusion_deep_fake_tpu.training.loop import (
    LoopContext,
    TrainingDivergedError,
)
from denoising_diffusion_deep_fake_tpu.training.multi_step import (
    make_cached_super_step,
    make_super_step,
)
from denoising_diffusion_deep_fake_tpu.training.runners import (
    fit_deep_fake,
    fit_denoiser,
)

# --------------------------------------------------- exact orchestration


class _ToyState(NamedTuple):
    step: jnp.ndarray
    acc: jnp.ndarray


def _toy_init():
    return _ToyState(jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32))


def _toy_core(state, batch, rng):
    """Mirrors the real cores' step/key contract with EXACT arithmetic:
    integer batch checksum (order-independent) + a counter-derived draw."""
    key = jax.random.fold_in(rng, state.step)
    draw = jax.random.randint(key, (), 0, 1 << 20)
    checksum = jnp.sum(batch.astype(jnp.int32)) + draw
    return (_ToyState(state.step + 1, state.acc + checksum),
            {"checksum": checksum, "step": state.step})


def _toy_pair_core(states, batch_a, batch_b, rng):
    sa, ma = _toy_core(states["a"], batch_a, rng)
    sb, mb = _toy_core(states["b"], batch_b, jax.random.fold_in(rng, 7))
    return {"a": sa, "b": sb}, {"ca": ma["checksum"], "cb": mb["checksum"]}


def _batches(n, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, (2, 4, 4, 3), dtype=np.uint8)
            for _ in range(n)]


def test_super_step_exact_vs_singles():
    k, rng = 3, jax.random.PRNGKey(5)
    batches = _batches(k)
    single = jax.jit(_toy_core)
    state_s = _toy_init()
    rows = []
    for b in batches:
        state_s, m = single(state_s, b, rng)
        rows.append(m)

    super_step = make_super_step(_toy_core, k, donate=False)
    state_k, stacked = super_step(_toy_init(), *batches, rng)

    assert int(state_k.step) == int(state_s.step) == k
    assert int(state_k.acc) == int(state_s.acc)  # exact: same batches+keys
    np.testing.assert_array_equal(
        np.asarray(stacked["checksum"]),
        np.asarray([int(r["checksum"]) for r in rows]))
    np.testing.assert_array_equal(np.asarray(stacked["step"]),
                                  np.arange(k))


def test_super_step_exact_paired():
    k, rng = 2, jax.random.PRNGKey(9)
    a, b = _batches(k, seed=1), _batches(k, seed=2)
    single = jax.jit(_toy_pair_core)
    states = {"a": _toy_init(), "b": _toy_init()}
    rows = []
    for ba, bb in zip(a, b):
        states, m = single(states, ba, bb, rng)
        rows.append(m)

    super_step = make_super_step(_toy_pair_core, k, n_batch_args=2,
                                 donate=False)
    states_k, stacked = super_step({"a": _toy_init(), "b": _toy_init()},
                                   *a, *b, rng)
    assert int(states_k["a"].acc) == int(states["a"].acc)
    assert int(states_k["b"].acc) == int(states["b"].acc)
    for key in ("ca", "cb"):
        np.testing.assert_array_equal(
            np.asarray(stacked[key]),
            np.asarray([int(r[key]) for r in rows]))


def test_cached_super_step_exact_gather_order():
    """The scanned in-jit gather must walk the SAME (state.step-derived)
    dataset positions as K single cached dispatches."""
    from denoising_diffusion_deep_fake_tpu.data.device_cache import (
        gather_batch)

    n, bsz, spe, k = 12, 2, 6, 3
    dataset = jnp.arange(n * 4 * 4 * 3, dtype=jnp.uint8).reshape(n, 4, 4, 3)
    order = jnp.asarray(np.random.default_rng(3).permutation(n), jnp.int32)
    rng = jax.random.PRNGKey(11)

    single = jax.jit(_toy_core)
    state_s = _toy_init()
    rows = []
    for _ in range(k):
        batch = gather_batch(dataset, order, state_s.step, bsz, spe)
        state_s, m = single(state_s, batch, rng)
        rows.append(int(m["checksum"]))

    super_step = make_cached_super_step(_toy_core, k, bsz, spe, donate=False)
    state_k, stacked = super_step(_toy_init(), dataset, order, rng)
    assert int(state_k.acc) == int(state_s.acc)
    np.testing.assert_array_equal(np.asarray(stacked["checksum"]), rows)


# ------------------------------------------------ end-to-end through fits


def _denoiser_cfg(manifest, tmp, **over):
    base = dict(input_image_list_path=str(manifest), batch_size=4,
                image_size=32, learning_rate=1e-3, encoder_name="resnet18",
                max_epochs=20, noise_exponential_sampling_lambda=5.0,
                compute_dtype="float32",
                log_dir=str(tmp / "runs"), checkpoint_dir=str(tmp / "ckpt"),
                last_checkpoint_min_interval_s=1e9, handle_preemption=False)
    base.update(over)
    return config_from_dict(DenoiserConfig, base)


def _disable_image_panels(monkeypatch):
    """Image logging is WALL-CLOCK cadenced (utils/logging_scheduler.py) and
    CPU compiles run tens of seconds, so image steps would fire at
    timing-dependent places and scramble the group/single dispatch pattern
    these tests assert. Grouping math is image-step-independent (the img
    path peels singles); pin the cadence off for determinism."""
    from denoising_diffusion_deep_fake_tpu.utils.logging_scheduler import (
        LoggingScheduler)

    monkeypatch.setattr(LoggingScheduler, "should_we_log_this_step",
                        lambda self: False)


def _run_denoiser(manifest, tmp, sub, *, max_steps, **over):
    """Per-step loss trajectory; superstep groups are flattened in order."""
    losses, steps_seen = [], []

    def cb(step, state, metrics):
        losses.extend(np.ravel(np.asarray(metrics["loss"])).tolist())
        steps_seen.append(step)

    fit_denoiser(_denoiser_cfg(manifest, tmp / sub, **over),
                 max_steps=max_steps, verbose=False, step_callback=cb)
    return losses, steps_seen


def test_config_rejects_nonpositive():
    with pytest.raises(ValueError, match="steps_per_call"):
        config_from_dict(DenoiserConfig, dict(
            input_image_list_path="x", steps_per_call=0))


def test_fit_superstep_grouping_and_trajectory(tmp_path, monkeypatch):
    """k=4 over 6 steps (16 images / batch 4 = 4 batches/epoch: one full
    group, then a 2-step max_steps remainder as singles): the callback
    fires at group boundaries and the loss trajectory tracks k=1 within
    rounding amplification (see module docstring)."""
    _disable_image_panels(monkeypatch)
    manifest = make_image_dataset(tmp_path, n=16, size=32)
    single, steps1 = _run_denoiser(manifest, tmp_path, "k1", max_steps=6)
    grouped, steps4 = _run_denoiser(manifest, tmp_path, "k4", max_steps=6,
                                    steps_per_call=4)
    assert steps1 == [1, 2, 3, 4, 5, 6]
    assert steps4 == [4, 5, 6]  # one group dispatch, then singles
    assert len(single) == len(grouped) == 6
    np.testing.assert_allclose(grouped, single, rtol=0.05)
    assert grouped[0] == pytest.approx(single[0], rel=1e-5)  # pre-update


def test_fit_superstep_epoch_tail(tmp_path, monkeypatch):
    """3 batches/epoch with k=2: group, tail single, group — the epoch tail
    and the max_steps clamp both fall back to single-step programs."""
    _disable_image_panels(monkeypatch)
    manifest = make_image_dataset(tmp_path, n=12, size=32)
    single, _ = _run_denoiser(manifest, tmp_path, "k1", max_steps=5)
    grouped, steps = _run_denoiser(manifest, tmp_path, "k2", max_steps=5,
                                   steps_per_call=2)
    assert steps == [2, 3, 5]
    assert len(grouped) == 5
    np.testing.assert_allclose(grouped, single, rtol=0.05)


def test_fit_superstep_device_cache(tmp_path, monkeypatch):
    """data_cache=device + steps_per_call through the real runner."""
    _disable_image_panels(monkeypatch)
    manifest = make_image_dataset(tmp_path, n=12, size=32)
    single, _ = _run_denoiser(manifest, tmp_path, "k1", max_steps=6,
                              data_cache="device")
    grouped, steps = _run_denoiser(manifest, tmp_path, "k3", max_steps=6,
                                   data_cache="device", steps_per_call=3)
    assert steps == [3, 6]
    np.testing.assert_allclose(grouped, single, rtol=0.05)


def test_fit_superstep_paired_swap(tmp_path, monkeypatch):
    """Two-identity swap trainer under k=2: every logged metric tracks the
    k=1 trajectory."""
    _disable_image_panels(monkeypatch)
    ma = make_image_dataset(tmp_path / "a", n=8, size=32, seed=1)
    mb = make_image_dataset(tmp_path / "b", n=8, size=32, seed=2)

    def run(sub, **over):
        rows = []

        def cb(step, states, metrics):
            rows.append({k: np.ravel(np.asarray(v)) for k, v in
                         metrics.items()})

        cfg = config_from_dict(DeepFakeConfig, dict(
            mode="swap", data_path_a=str(ma), data_path_b=str(mb),
            batch_size=4, image_size=32, learning_rate=1e-3,
            encoder_name="resnet18", max_epochs=20, ema_update_after_step=0,
            compute_dtype="float32",
            log_dir=str(tmp_path / sub / "runs"),
            checkpoint_dir=str(tmp_path / sub / "ckpt"),
            last_checkpoint_min_interval_s=1e9, handle_preemption=False,
            **over))
        fit_deep_fake(cfg, max_steps=4, verbose=False, step_callback=cb)
        return rows

    single = run("k1")
    grouped = run("k2", steps_per_call=2)
    keys = single[0].keys()
    flat_single = {k: np.concatenate([r[k] for r in single]) for k in keys}
    flat_grouped = {k: np.concatenate([r[k] for r in grouped]) for k in keys}
    for k in keys:
        np.testing.assert_allclose(flat_grouped[k], flat_single[k],
                                   rtol=0.05, err_msg=k)


# ------------------------------------------------------ loop integration


def test_nan_guard_reports_mid_group_step(tmp_path):
    """A NaN inside a superstep group surfaces at its TRUE step index."""
    cfg = config_from_dict(DenoiserConfig, dict(
        input_image_list_path="x", log_dir=str(tmp_path / "runs"),
        checkpoint_dir=str(tmp_path / "ckpt")), validate=False)
    ctx = LoopContext(cfg, {}, workload="denoiser")
    ctx.global_step = 10
    ctx.log_step({"loss": jnp.asarray([0.1, float("nan"), 0.3])}, n_steps=3)
    with pytest.raises(TrainingDivergedError, match="step 11"):
        ctx.close()


def test_grouped_scalars_reach_tensorboard(tmp_path):
    """Every sub-step of a group lands as its own TB row (cadence 1)."""
    cfg = config_from_dict(DenoiserConfig, dict(
        input_image_list_path="x", log_dir=str(tmp_path / "runs"),
        checkpoint_dir=str(tmp_path / "ckpt")), validate=False)
    ctx = LoopContext(cfg, {}, workload="denoiser")
    ctx.log_step({"loss": jnp.asarray([0.1, 0.2, 0.3, 0.4])}, n_steps=4)
    ctx.global_step += 4
    ctx.log_step({"loss": jnp.asarray(0.5)})
    ctx.drain_metrics()
    ctx.close()
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator)

    run_dir = str(tmp_path / "runs" / "denoiser")
    acc = EventAccumulator(run_dir)
    acc.Reload()
    rows = acc.Scalars("loss")
    assert [r.step for r in rows] == [0, 1, 2, 3, 4]
    np.testing.assert_allclose([r.value for r in rows],
                               [0.1, 0.2, 0.3, 0.4, 0.5], rtol=1e-6)


def test_fit_superstep_tb_cadence_end_to_end(tmp_path):
    """VERDICT r4 #1 cadence proof at the REAL fit_* level: a k=4 run with
    log_every_n_steps=1 lands one TB scalar row for EVERY step, grouped
    dispatches included (panels off via the log_images knob, so the run is
    dispatch-deterministic without monkeypatching)."""
    manifest = make_image_dataset(tmp_path, n=16, size=32)
    cfg = _denoiser_cfg(manifest, tmp_path / "tb", steps_per_call=4,
                        log_images=False)
    fit_denoiser(cfg, max_steps=8, verbose=False)

    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator)

    acc = EventAccumulator(str(tmp_path / "tb" / "runs" / "denoiser"))
    acc.Reload()
    rows = acc.Scalars("loss")
    assert [r.step for r in rows] == list(range(8))
    assert all(np.isfinite(r.value) for r in rows)
    # lr rides the same cadence.
    assert [r.step for r in acc.Scalars("lr")] == list(range(8))
