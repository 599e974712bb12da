"""Scale-out evidence one notch beyond the 8-device default (VERDICT r2 #7).

The conftest pins this process to 8 virtual CPU devices, so the 16/32-device
dryruns go through ``dryrun_multichip``'s fresh-subprocess path (the same
mechanism the driver uses); the mesh-shape invariance golden runs in-process
on the 8 devices.
"""

import os
import subprocess
import sys
from pathlib import Path

import jax
import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]


@pytest.mark.slow
@pytest.mark.parametrize("n_devices", [16, 32])
def test_dryrun_larger_virtual_meshes(n_devices):
    """Full sharded deep-fake train step on 16- and 32-device
    (data x spatial) meshes — the driver's dryrun contract at pod-slice-ish
    device counts."""
    env = dict(os.environ, _D3F_DRYRUN_CHILD="1", JAX_PLATFORMS="cpu")
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "").replace(
        "--xla_force_host_platform_device_count=8", "").strip()
        + f" --xla_force_host_platform_device_count={n_devices}").strip()
    proc = subprocess.run(
        [sys.executable, str(REPO / "__graft_entry__.py"), str(n_devices)],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert f"dryrun_multichip({n_devices}) OK" in proc.stdout


def test_mesh_shape_invariance_golden():
    """Same denoiser train-step losses on (8,1), (4,2), and (2,4)
    (data, spatial) meshes — the mesh shape is a deployment knob, not a
    math knob (same inputs, same key, reduction-order tolerance)."""
    from denoising_diffusion_deep_fake_tpu.config import (
        DenoiserConfig, config_from_dict)
    from denoising_diffusion_deep_fake_tpu.parallel import (
        create_mesh, shard_batch, shard_state)
    from denoising_diffusion_deep_fake_tpu.training.denoiser import (
        DenoiserTrainer)

    cfg = config_from_dict(DenoiserConfig, dict(
        input_image_list_path="x", batch_size=8, learning_rate=1e-3,
        encoder_name="resnet18", compute_dtype="float32",
        noise_exponential_sampling_lambda=3.0), validate=False)
    trainer = DenoiserTrainer(cfg, steps_per_epoch=10, image_size=64)
    batch = np.random.default_rng(5).integers(
        0, 256, (8, 64, 64, 3), dtype=np.uint8)
    key = jax.random.PRNGKey(11)

    losses = {}
    for dp, sp in ((8, 1), (4, 2), (2, 4)):
        mesh = create_mesh(dp, spatial=sp)
        state = shard_state(trainer.init_state(jax.random.PRNGKey(0)), mesh)
        step = trainer.make_train_step(donate=False)
        _, metrics = step(state, shard_batch(batch, mesh, spatial=sp > 1),
                          key)
        losses[(dp, sp)] = float(metrics["loss"])
    base = losses[(8, 1)]
    assert all(abs(v - base) < 1e-5 for v in losses.values()), losses


@pytest.mark.slow
def test_two_process_spatial_training(tmp_path):
    """2 processes x spatial=2: the (data=2, spatial=2) mesh spans the
    process boundary — gradient psums cross Gloo while halo exchanges stay
    intra-process (VERDICT r2 #7)."""
    from test_distributed import _run_two_process_workload

    _run_two_process_workload(tmp_path, "spatial",
                              "spatial trained 2 steps OK")
