"""Multi-host layer: env wiring, batch conventions, 2-process CPU run."""

import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from denoising_diffusion_deep_fake_tpu.data import ImageLoader
from denoising_diffusion_deep_fake_tpu.parallel import (
    data_shard,
    local_batch_size,
    maybe_initialize_from_env,
)

from helpers import make_image_dataset


def test_single_process_defaults():
    # Without the launch env, everything degenerates to the local case.
    assert maybe_initialize_from_env() is False
    assert local_batch_size(16) == 16
    assert data_shard() is None


def test_env_partial_config_rejected(monkeypatch):
    monkeypatch.setenv("D3F_COORDINATOR", "localhost:9999")
    monkeypatch.delenv("D3F_NUM_PROCESSES", raising=False)
    with pytest.raises(ValueError, match="D3F_NUM_PROCESSES"):
        maybe_initialize_from_env()


def test_loader_shard_partitions_manifest(tmp_path):
    manifest = make_image_dataset(tmp_path, n=10, size=8, seed=0)
    full = ImageLoader(manifest, 2, shuffle=False)
    shard0 = ImageLoader(manifest, 2, shuffle=False, shard=(0, 2))
    shard1 = ImageLoader(manifest, 2, shuffle=False, shard=(1, 2))
    assert len(shard0.paths) == 5 and len(shard1.paths) == 5
    # Strided, disjoint, covering.
    assert sorted(shard0.paths + shard1.paths) == sorted(full.paths)
    assert set(shard0.paths).isdisjoint(shard1.paths)


@pytest.mark.slow
def test_two_process_cpu_mesh(tmp_path):
    """Launch 2 real processes; 4-device global mesh; cross-process psum."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coordinator = f"127.0.0.1:{port}"
    worker = Path(__file__).parent / "two_process_worker.py"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    repo = str(Path(__file__).resolve().parents[1])
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")

    procs = [subprocess.Popen(
        [sys.executable, str(worker), coordinator, "2", str(i)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=repo, env=env) for i in range(2)]
    outputs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outputs.append(out)
    for i, (p, out) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
    assert "proc 0: primary=True mean=0.5" in outputs[0]
    assert "proc 1: primary=False mean=0.5" in outputs[1]


def test_score_dataset_pads_tail_and_shards(tmp_path):
    """Balancer scoring: mesh-sharded batches, padded tail, exact coverage."""
    import jax

    from denoising_diffusion_deep_fake_tpu.config import (
        BalanceConfig, config_from_dict)
    from denoising_diffusion_deep_fake_tpu.parallel import create_mesh
    from denoising_diffusion_deep_fake_tpu.training.balance import (
        BalanceTrainer)

    manifest = make_image_dataset(tmp_path, n=5, size=32, seed=3)
    cfg = config_from_dict(BalanceConfig, dict(
        data_path=str(manifest), ratio_of_noise=0.7, batch_size=4,
        learning_rate=1e-3, number_of_classes=3, encoder_name="resnet18",
        compute_dtype="float32"), validate=False)
    trainer = BalanceTrainer(cfg, steps_per_epoch=1, image_size=32)
    state = trainer.init_state(jax.random.PRNGKey(0))
    loader = ImageLoader(manifest, 4, shuffle=False, drop_remainder=False)
    mesh = create_mesh(2, devices=jax.devices()[:2])
    idx, losses = trainer.score_dataset(state, loader, jax.random.PRNGKey(1),
                                        mesh=mesh)
    # 5 images, batch 4 -> one full batch + a padded tail; every image scored
    # exactly once, pad rows dropped.
    assert idx.shape == (5,) and losses.shape == (5,)
    assert sorted(idx.tolist()) == [0, 1, 2, 3, 4]
    assert np.isfinite(losses).all()
