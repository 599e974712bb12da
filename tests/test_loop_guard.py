"""Loop machinery tests: NaN guard + checkpoint cadence."""

import jax.numpy as jnp
import numpy as np
import pytest

from denoising_diffusion_deep_fake_tpu.config import (
    DenoiserConfig,
    config_from_dict,
)
from denoising_diffusion_deep_fake_tpu.training.loop import (
    LoopContext,
    TrainingDivergedError,
)


def _ctx(tmp_path, **over):
    cfg = config_from_dict(DenoiserConfig, dict(
        input_image_list_path="x", log_dir=str(tmp_path / "runs"),
        checkpoint_dir=str(tmp_path / "ckpt"), **over), validate=False)
    return LoopContext(cfg, {"k": 1}, workload="denoiser")


def test_nan_metric_raises_and_checkpoints(tmp_path):
    ctx = _ctx(tmp_path)
    state = {"w": jnp.ones(3)}
    rng = jnp.zeros(2, jnp.uint32)
    # The fetch + guard run on the worker thread; divergence surfaces on the
    # next drain/log_step, which has fresh states in hand for the save.
    ctx.log_step({"loss": jnp.asarray(float("nan"))}, states=state, rng=rng)
    with pytest.raises(TrainingDivergedError, match="loss"):
        ctx.drain_metrics(states=state, rng=rng)
    # Emergency checkpoint landed.
    assert ctx.ckpt.latest_step() is not None
    ctx.close()


def test_nan_metric_surfaces_at_close(tmp_path):
    ctx = _ctx(tmp_path)
    ctx.log_step({"loss": jnp.asarray(float("inf"))})
    with pytest.raises(TrainingDivergedError, match="loss"):
        ctx.close()


def test_async_scalars_reach_tensorboard(tmp_path):
    ctx = _ctx(tmp_path)
    for i in range(5):
        ctx.log_step({"loss": jnp.asarray(0.1 * i)})
        ctx.global_step += 1
    ctx.drain_metrics()
    ctx.close()
    # Event files exist and are non-trivial (scalars were written).
    runs = list((tmp_path / "runs").rglob("events.*"))
    assert runs and any(p.stat().st_size > 0 for p in runs)


def test_finite_metrics_pass(tmp_path):
    ctx = _ctx(tmp_path)
    ctx.log_step({"loss": jnp.asarray(0.5)})
    ctx.close()


def test_wall_clock_checkpoint_cadence(tmp_path):
    t = [1000.0]
    cfg = config_from_dict(DenoiserConfig, dict(
        input_image_list_path="x", log_dir=str(tmp_path / "runs"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        checkpoint_every_hours=1.0), validate=False)
    ctx = LoopContext(cfg, {}, workload="denoiser", clock=lambda: t[0])
    state = {"w": jnp.zeros(2)}
    rng = jnp.zeros(2, jnp.uint32)
    ctx.maybe_checkpoint(state, rng)
    assert ctx.ckpt.latest_step() is None  # not yet due
    t[0] += 3601
    ctx.maybe_checkpoint(state, rng)
    assert ctx.ckpt.latest_step() is not None  # 1h elapsed -> saved
    ctx.close()
