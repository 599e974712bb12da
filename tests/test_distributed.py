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


def test_loader_shards_equal_length_on_uneven_manifest(tmp_path):
    # 7 images / 2 processes: both shards MUST have the same length (and so
    # the same batches_per_epoch) or the one with more batches dispatches a
    # collective its peer never joins.
    manifest = make_image_dataset(tmp_path, n=7, size=8, seed=0)
    shard0 = ImageLoader(manifest, 2, shuffle=False, shard=(0, 2))
    shard1 = ImageLoader(manifest, 2, shuffle=False, shard=(1, 2))
    assert len(shard0.paths) == len(shard1.paths) == 3
    assert shard0.batches_per_epoch == shard1.batches_per_epoch
    with pytest.raises(ValueError, match="every process"):
        ImageLoader(manifest, 1, shuffle=False, shard=(0, 8))


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


def _two_proc_env():
    repo = str(Path(__file__).resolve().parents[1])
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    for var in ("D3F_COORDINATOR", "D3F_NUM_PROCESSES", "D3F_PROCESS_ID"):
        env.pop(var, None)
    return repo, env


def _launch_two(workdir, workload: str, *, timeout: int = 600):
    """Start the 2-process training worker pair; returns the live Popens."""
    worker = Path(__file__).parent / "two_process_train_worker.py"
    repo, env = _two_proc_env()
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    return [subprocess.Popen(
        [sys.executable, str(worker), f"127.0.0.1:{port}", "2", str(i),
         str(workdir), workload],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=repo, env=env) for i in range(2)]


def _finish_two(procs, timeout: int = 600):
    outs = [p.communicate(timeout=timeout)[0] for p in procs]
    return outs, [p.returncode for p in procs]


def _launch_two_retrying(workdir, workload: str, *, timeout: int = 600):
    """Launch + wait, retrying ONCE on the Gloo 30 s connect-window flake
    (see _run_two_process_workload). Safe only for workloads whose failed
    first attempt leaves no partial on-disk state behind — the connect
    timeout fires before any training step runs."""
    for attempt in range(2):
        outs, rcs = _finish_two(_launch_two(workdir, workload), timeout)
        if all(rc == 0 for rc in rcs):
            return outs
        flaky = any("timeout" in o.lower() or "timed out" in o.lower()
                    for o in outs)
        assert flaky and attempt == 0, (
            "non-timeout failure:\n" + "\n----\n".join(outs))
    raise AssertionError("retry fell through")


def _run_two_process_workload(tmp_path, workload: str, expect: str):
    """2 real processes run a fit_* runner end to end over a 4-device mesh.

    Retried once: Gloo's fixed 30 s connect window can expire when a
    single-core CI host is saturated (both workers compiling); a second
    attempt distinguishes that infra flake from a real regression.
    """
    worker = Path(__file__).parent / "two_process_train_worker.py"
    repo = str(Path(__file__).resolve().parents[1])
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    for var in ("D3F_COORDINATOR", "D3F_NUM_PROCESSES", "D3F_PROCESS_ID"):
        env.pop(var, None)

    last_outputs = None
    workdir = None
    for attempt in range(2):
        workdir = tmp_path / f"attempt{attempt}"
        workdir.mkdir()
        make_image_dataset(workdir, n=8, size=32, seed=0)
        if workload == "swap":
            make_image_dataset(workdir, n=8, size=32, seed=1, subdir="a",
                               manifest_name="a.txt")
            make_image_dataset(workdir, n=8, size=32, seed=2, subdir="b",
                               manifest_name="b.txt")
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        procs = [subprocess.Popen(
            [sys.executable, str(worker), f"127.0.0.1:{port}", "2", str(i),
             str(workdir), workload],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=repo, env=env) for i in range(2)]
        last_outputs = [p.communicate(timeout=600)[0] for p in procs]
        if all(p.returncode == 0 for p in procs):
            break
        flaky = any("timeout" in out.lower() or "timed out" in out.lower()
                    for out in last_outputs)
        assert flaky and attempt == 0, (
            "non-timeout failure:\n" + "\n----\n".join(last_outputs))
    for i, out in enumerate(last_outputs):
        assert f"proc {i}: {expect}" in out, out
    return workdir


@pytest.mark.slow
def test_two_process_full_training(tmp_path):
    workdir = _run_two_process_workload(tmp_path, "denoiser",
                                        "trained 2 steps OK")
    # Primary wrote the checkpoint; there is exactly one writer.
    from denoising_diffusion_deep_fake_tpu.checkpoint import CheckpointManager

    assert CheckpointManager(workdir / "ckpt").all_steps() == [2]


@pytest.mark.slow
def test_two_process_swap_training(tmp_path):
    """Swap mode across a real 2-process mesh: EMA cross-feed + dual Adam
    (VERDICT r1 item 5)."""
    _run_two_process_workload(tmp_path, "swap", "swap trained 2 steps OK")


@pytest.mark.slow
def test_two_process_device_cache(tmp_path):
    """data_cache='device' across 2 real processes: per-process manifest
    shards pinned axis-0-sharded in local device memory, shard-local in-jit
    gathers (VERDICT r3 #7)."""
    _run_two_process_workload(tmp_path, "devcache", "devcache trained 2 steps OK")


@pytest.mark.slow
def test_two_process_balance_scoring(tmp_path):
    """fit_balance multi-process: replicated scoring pass + manifest write
    (round-1 advisor finding: this path previously fetched non-addressable
    arrays)."""
    workdir = _run_two_process_workload(tmp_path, "balance",
                                        "balance trained 2 steps OK")
    out = (workdir / "balanced.txt").read_text().strip().splitlines()
    assert len(out) == 8 and all("\t" in line for line in out)


def test_data_parallel_step_matches_single_device(tmp_path):
    """DP-sharded train step == unsharded step (same inputs, same key)."""
    import jax
    import jax.numpy as jnp

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
    trainer = DenoiserTrainer(cfg, steps_per_epoch=10, image_size=32)
    batch = np.random.default_rng(0).integers(
        0, 256, (8, 32, 32, 3), dtype=np.uint8)
    key = jax.random.PRNGKey(7)

    results = {}
    for dp in (1, 4):
        mesh = create_mesh(dp, devices=jax.devices()[:dp])
        state = shard_state(trainer.init_state(jax.random.PRNGKey(0)), mesh)
        step = trainer.make_train_step(donate=False)
        new_state, metrics = step(state, shard_batch(batch, mesh), key)
        results[dp] = (float(metrics["loss"]),
                       float(jnp.sum(jnp.abs(
                           jax.tree.leaves(new_state.params)[0]))))
    # Identical math up to reduction-order float differences.
    assert abs(results[1][0] - results[4][0]) < 1e-5, results
    assert abs(results[1][1] - results[4][1]) < 1e-3, results


# ------------------------------------------------ failure paths (VERDICT r3)


@pytest.mark.slow
def test_two_process_preemption_agreement(tmp_path):
    """SIGTERM ONE rank mid-training: the agreement collective
    (training/loop.py preempted()) must make BOTH ranks stop at the same
    step boundary, save one final checkpoint at that step, and exit 0."""
    import re
    import signal
    import time

    from denoising_diffusion_deep_fake_tpu.checkpoint import CheckpointManager

    for attempt in range(2):
        workdir = tmp_path / f"attempt{attempt}"
        workdir.mkdir()
        make_image_dataset(workdir, n=8, size=32, seed=0)
        procs = _launch_two(workdir, "preempt")
        markers = [workdir / f"rank{i}.started" for i in range(2)]
        deadline = time.time() + 540
        while (time.time() < deadline
               and not all(m.exists() for m in markers)
               and all(p.poll() is None for p in procs)):
            time.sleep(0.5)
        if any(p.poll() is not None for p in procs):
            # A rank died before training started — Gloo connect flake path.
            outs, _ = _finish_two(procs, timeout=60)
            flaky = any("timeout" in o.lower() or "timed out" in o.lower()
                        for o in outs)
            assert flaky and attempt == 0, (
                "rank died pre-training:\n" + "\n----\n".join(outs))
            continue
        assert all(m.exists() for m in markers), "training never started"
        procs[0].send_signal(signal.SIGTERM)  # rank 0 ONLY
        outs, rcs = _finish_two(procs, timeout=300)
        assert rcs == [0, 0], "\n----\n".join(outs)
        steps = [int(re.search(r"preempt stopped at (\d+) OK", o).group(1))
                 for o in outs]
        # Both ranks agreed on the SAME stop step, strictly mid-training.
        assert steps[0] == steps[1] > 0, steps
        # Exactly one (final) checkpoint, at the agreed step, by the primary.
        assert CheckpointManager(workdir / "ckpt").all_steps() == [steps[0]]
        return
    raise AssertionError("both attempts hit the connect flake")


@pytest.mark.slow
def test_two_process_nan_guard_lockstep(tmp_path):
    """A NaN metric at the same step on both ranks: the synchronous
    multi-process guard (_sync_metrics, training/loop.py) must raise
    TrainingDivergedError on BOTH ranks at the same step — not one rank
    aborting while its peer hangs in a collective — and the primary must
    write the emergency checkpoint."""
    from denoising_diffusion_deep_fake_tpu.checkpoint import CheckpointManager

    make_image_dataset(tmp_path, n=8, size=32, seed=0)
    outs = _launch_two_retrying(tmp_path, "nanguard")
    for i, out in enumerate(outs):
        assert f"proc {i}: nan lockstep:" in out, out
        assert "'injected'" in out and "at step 2" in out, out
        assert "emergency checkpoint saved" in out, out
    # Emergency save landed at the divergence step, primary-only.
    assert CheckpointManager(tmp_path / "ckpt").all_steps() == [2]


@pytest.mark.slow
def test_two_process_checkpoint_resume_bit_exact(tmp_path):
    """Cross-process island-mode resume: train 2 steps, exit, relaunch BOTH
    processes resuming from the checkpoint, train to step 4. The resumed
    final state must BIT-match an uninterrupted 4-step run (params, EMA
    shadows, Adam moments, BN stats, RNG and data order all continue
    exactly), and both ranks must restore identical state."""
    import re

    from denoising_diffusion_deep_fake_tpu.checkpoint import CheckpointManager

    make_image_dataset(tmp_path, n=8, size=32, seed=0)
    make_image_dataset(tmp_path, n=8, size=32, seed=1, subdir="a",
                       manifest_name="a.txt")
    make_image_dataset(tmp_path, n=8, size=32, seed=2, subdir="b",
                       manifest_name="b.txt")

    ref_outs = _launch_two_retrying(tmp_path, "resume_ref4")
    ref = re.search(r"ref4 step 4 checksum (\S+) OK", ref_outs[0]).group(1)

    phase1 = _launch_two_retrying(tmp_path, "resume_train2")
    for i, out in enumerate(phase1):
        assert f"proc {i}: train2 step 2 OK" in out, out
    assert CheckpointManager(tmp_path / "ckpt").all_steps() == [2]

    phase2 = _launch_two_retrying(tmp_path, "resume_resume4")
    sums = [re.search(r"resume4 step 4 checksum (\S+) OK", o).group(1)
            for o in phase2]
    # Both ranks restored + continued to identical state...
    assert sums[0] == sums[1], sums
    # ...and it bit-matches the uninterrupted run.
    assert sums[0] == ref, (sums[0], ref)
    assert CheckpointManager(tmp_path / "ckpt").all_steps() == [2, 4]
