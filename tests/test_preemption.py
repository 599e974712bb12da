"""Graceful preemption: SIGTERM -> final checkpoint -> clean exit."""

import os
import signal
import threading

import pytest

cv2 = pytest.importorskip("cv2")

from denoising_diffusion_deep_fake_tpu.config import (
    DenoiserConfig,
    config_from_dict,
)
from denoising_diffusion_deep_fake_tpu.training.loop import PreemptionGuard

from helpers import make_image_dataset


def test_guard_catches_sigterm_and_restores():
    guard = PreemptionGuard()
    try:
        assert not guard.triggered
        os.kill(os.getpid(), signal.SIGTERM)
        assert guard.triggered
    finally:
        guard.restore()
    # After restore the old disposition is back (pytest default: terminate),
    # so only check the handler table, don't raise again.
    assert guard._previous == {}


def test_sigterm_ends_training_with_final_checkpoint(tmp_path):
    from denoising_diffusion_deep_fake_tpu.checkpoint import CheckpointManager
    from denoising_diffusion_deep_fake_tpu.training.runners import fit_denoiser

    manifest = make_image_dataset(tmp_path, n=8, size=32, seed=0)
    cfg = config_from_dict(DenoiserConfig, dict(
        input_image_list_path=str(manifest), batch_size=2,
        learning_rate=1e-3, max_epochs=100_000, encoder_name="resnet18",
        compute_dtype="float32", noise_exponential_sampling_lambda=3.0,
        log_dir=str(tmp_path / "runs"),
        checkpoint_dir=str(tmp_path / "ckpt")))

    # Deliver SIGTERM shortly after start — whether it lands during compile
    # or mid-loop, the runner must stop at the next step boundary instead of
    # burning 100k epochs.
    timer = threading.Timer(3.0, lambda: os.kill(os.getpid(), signal.SIGTERM))
    timer.start()
    try:
        state, trainer, ctx = fit_denoiser(cfg, verbose=False)
    finally:
        timer.cancel()
    assert ctx.preempted()
    steps = CheckpointManager(cfg.checkpoint_dir).all_steps()
    assert steps, "final checkpoint missing after preemption"
    assert steps[-1] == ctx.global_step
