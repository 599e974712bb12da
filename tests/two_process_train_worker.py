"""Worker: full multi-process training run (2 procs x 2 CPU devices).

Usage: python two_process_train_worker.py <coordinator> <nproc> <pid> <tmpdir>
           [workload]

``workload`` is ``denoiser`` (default), ``swap`` (fit_deep_fake in swap mode:
EMA shadows + dual optimizers across the real 2-process mesh), or ``balance``
(fit_balance incl. the replicated scoring pass + output-manifest write).
Each process runs the REAL runner: distributed init via the D3F_* env path,
per-process manifest shard, global batch assembled from local slices,
primary-only checkpoint/TB writes.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")

import jax

jax.config.update("jax_platforms", "cpu")

_COMMON = dict(batch_size=4,               # global; 2 per process
               learning_rate=1e-3, max_epochs=1, encoder_name="resnet18",
               compute_dtype="float32", image_size=32)


def run_denoiser(tmpdir):
    from denoising_diffusion_deep_fake_tpu.config import (
        DenoiserConfig, config_from_dict)
    from denoising_diffusion_deep_fake_tpu.training.runners import fit_denoiser

    cfg = config_from_dict(DenoiserConfig, dict(
        input_image_list_path=f"{tmpdir}/images.txt",
        noise_exponential_sampling_lambda=3.0,
        log_dir=f"{tmpdir}/runs", checkpoint_dir=f"{tmpdir}/ckpt", **_COMMON))
    _, _, ctx = fit_denoiser(cfg, max_steps=2, verbose=False)
    return f"trained {ctx.global_step} steps OK"


def run_swap(tmpdir):
    from denoising_diffusion_deep_fake_tpu.config import (
        DeepFakeConfig, config_from_dict)
    from denoising_diffusion_deep_fake_tpu.training.runners import (
        fit_deep_fake)

    cfg = config_from_dict(DeepFakeConfig, dict(
        mode="swap", data_path_a=f"{tmpdir}/a.txt",
        data_path_b=f"{tmpdir}/b.txt",
        noise_exponential_sampling_lambda=8.0, ema_update_after_step=0,
        log_dir=f"{tmpdir}/runs", checkpoint_dir=f"{tmpdir}/ckpt", **_COMMON))
    states, _, ctx = fit_deep_fake(cfg, max_steps=2, verbose=False)
    assert set(states) == {"a", "b"}
    assert all(s.ema_params is not None for s in states.values())
    return f"swap trained {ctx.global_step} steps OK"


def run_spatial(tmpdir):
    """Denoiser over a (data=2, spatial=2) mesh SPANNING both processes:
    each process's two local devices hold the H-halves of its data rows, so
    conv halo exchanges ride intra-process transfers while gradient psums
    cross the Gloo process boundary — the layout a real pod slice uses."""
    from denoising_diffusion_deep_fake_tpu.config import (
        DenoiserConfig, config_from_dict)
    from denoising_diffusion_deep_fake_tpu.training.runners import (
        _training_mesh, fit_denoiser)

    cfg = config_from_dict(DenoiserConfig, dict(
        input_image_list_path=f"{tmpdir}/images.txt",
        noise_exponential_sampling_lambda=3.0, spatial_parallel=2,
        log_dir=f"{tmpdir}/runs", checkpoint_dir=f"{tmpdir}/ckpt", **_COMMON))
    # NOTE: do NOT build a mesh before fit — the runner's
    # maybe_initialize_from_env() must run before anything touches the jax
    # backend, or the process initializes single-process with only its
    # local devices.
    _, _, ctx = fit_denoiser(cfg, max_steps=2, verbose=False)
    mesh = _training_mesh(cfg)  # safe now: distributed backend is live
    assert dict(mesh.shape) == {"data": 2, "spatial": 2}, mesh.shape
    return f"spatial trained {ctx.global_step} steps OK"


def _state_checksum(states) -> float:
    """Deterministic host-side checksum of a (replicated) states pytree.

    Same leaf order on every rank (jax.tree.leaves of the state_dict), fp64
    accumulation of |x| sums — bit-identical replicated states produce
    bit-identical checksums, so cross-rank and cross-run equality checks are
    exact, not tolerance-banded.
    """
    import numpy as np
    from flax import serialization

    from denoising_diffusion_deep_fake_tpu.parallel.distributed import (
        fetch_local)

    sd = fetch_local(serialization.to_state_dict(states))
    return float(sum(np.abs(np.asarray(leaf, np.float64)).sum()
                     for leaf in jax.tree.leaves(sd)))


def run_preempt(tmpdir):
    """Run the denoiser open-ended; the parent SIGTERMs rank 0 mid-training.

    Exercises the preemption agreement collective
    (training/loop.py preempted()): both ranks must stop at the SAME step
    boundary, save one final checkpoint, and exit 0 — a rank stopping early
    would strand its peer inside a gradient psum.
    """
    from pathlib import Path

    from denoising_diffusion_deep_fake_tpu.config import (
        DenoiserConfig, config_from_dict)
    from denoising_diffusion_deep_fake_tpu.training.runners import fit_denoiser

    pid = os.environ["D3F_PROCESS_ID"]
    cfg = config_from_dict(DenoiserConfig, dict(
        input_image_list_path=f"{tmpdir}/images.txt",
        noise_exponential_sampling_lambda=3.0,
        log_dir=f"{tmpdir}/runs", checkpoint_dir=f"{tmpdir}/ckpt",
        **dict(_COMMON, max_epochs=500)))

    def mark_started(step, state, metrics):
        if step == 1:
            Path(f"{tmpdir}/rank{pid}.started").touch()

    _, _, ctx = fit_denoiser(cfg, verbose=False, step_callback=mark_started)
    return f"preempt stopped at {ctx.global_step} OK"


def run_nanguard(tmpdir):
    """Inject a NaN metric at the same step on both ranks; both must raise
    TrainingDivergedError in lockstep (the _sync_metrics synchronous guard)
    instead of one aborting while the peer hangs in a collective, and the
    primary must write the emergency checkpoint."""
    import jax.numpy as jnp
    import numpy as np

    from denoising_diffusion_deep_fake_tpu.config import (
        DenoiserConfig, config_from_dict)
    from denoising_diffusion_deep_fake_tpu.training.loop import (
        LoopContext, TrainingDivergedError)
    from denoising_diffusion_deep_fake_tpu.training.runners import fit_denoiser

    # NOTE: do not query jax.process_count() here — touching the backend
    # before fit_denoiser's maybe_initialize_from_env() would initialize
    # single-process (see run_spatial). main() asserts the count after.
    original = LoopContext.log_step

    def poisoned(self, metrics, images=None, states=None, rng=None):
        if self.global_step == 2:
            metrics = dict(metrics)
            metrics["injected"] = jnp.float32(np.nan)
        return original(self, metrics, images, states=states, rng=rng)

    LoopContext.log_step = poisoned
    cfg = config_from_dict(DenoiserConfig, dict(
        input_image_list_path=f"{tmpdir}/images.txt",
        noise_exponential_sampling_lambda=3.0,
        log_dir=f"{tmpdir}/runs", checkpoint_dir=f"{tmpdir}/ckpt",
        **dict(_COMMON, max_epochs=50)))
    try:
        fit_denoiser(cfg, max_steps=20, verbose=False)
    except TrainingDivergedError as e:
        assert jax.process_count() == 2  # _sync_metrics path was active
        return f"nan lockstep: {e} OK"
    raise AssertionError("NaN guard never tripped")


def _resume_cfg(tmpdir, ckpt_subdir):
    from denoising_diffusion_deep_fake_tpu.config import (
        DeepFakeConfig, config_from_dict)

    return config_from_dict(DeepFakeConfig, dict(
        mode="swap", data_path_a=f"{tmpdir}/a.txt",
        data_path_b=f"{tmpdir}/b.txt",
        noise_exponential_sampling_lambda=8.0, ema_update_after_step=0,
        log_dir=f"{tmpdir}/runs", checkpoint_dir=f"{tmpdir}/{ckpt_subdir}",
        **dict(_COMMON, max_epochs=2)))


def run_resume_ref4(tmpdir):
    """Uninterrupted 4-step swap run — the bit-exactness reference."""
    from denoising_diffusion_deep_fake_tpu.training.runners import fit_deep_fake

    states, _, ctx = fit_deep_fake(_resume_cfg(tmpdir, "ckpt_ref"),
                                   max_steps=4, verbose=False)
    return f"ref4 step {ctx.global_step} checksum {_state_checksum(states):.17g} OK"


def run_resume_train2(tmpdir):
    """Phase 1: train 2 steps, checkpoint, exit (simulated kill point)."""
    from denoising_diffusion_deep_fake_tpu.training.runners import fit_deep_fake

    _, _, ctx = fit_deep_fake(_resume_cfg(tmpdir, "ckpt"),
                              max_steps=2, verbose=False)
    return f"train2 step {ctx.global_step} OK"


def run_resume_resume4(tmpdir):
    """Phase 2: island-mode restore across BOTH processes, then 2 more steps.

    The final states must bit-match run_resume_ref4's (params + EMA + Adam
    moments + BN stats + step all continue exactly) — the checksum printed
    here is compared against the reference run's by the parent test.
    """
    from denoising_diffusion_deep_fake_tpu.training.runners import fit_deep_fake

    states, _, ctx = fit_deep_fake(_resume_cfg(tmpdir, "ckpt"),
                                   resume_from=f"{tmpdir}/ckpt",
                                   max_steps=4, verbose=False)
    assert all(s.ema_params is not None for s in states.values())
    return (f"resume4 step {ctx.global_step} "
            f"checksum {_state_checksum(states):.17g} OK")


def run_devcache(tmpdir):
    """Denoiser with the multi-process SHARDED device cache: each process
    pins its manifest shard axis-0-sharded over its 2 local devices; steps
    gather shard-locally (shard_map take). Also cross-checks the cache
    layout: dataset sharded (not replicated), spe matches the host loader's.
    """
    from denoising_diffusion_deep_fake_tpu.config import (
        DenoiserConfig, config_from_dict)
    from denoising_diffusion_deep_fake_tpu.training.runners import fit_denoiser

    cfg = config_from_dict(DenoiserConfig, dict(
        input_image_list_path=f"{tmpdir}/images.txt",
        noise_exponential_sampling_lambda=3.0, data_cache="device",
        log_dir=f"{tmpdir}/runs", checkpoint_dir=f"{tmpdir}/ckpt", **_COMMON))
    state, _, ctx = fit_denoiser(cfg, max_steps=2, verbose=False)
    assert int(jax.device_get(
        state.step.addressable_shards[0].data)) == 2
    return f"devcache trained {ctx.global_step} steps OK"


def run_balance(tmpdir):
    from denoising_diffusion_deep_fake_tpu.config import (
        BalanceConfig, config_from_dict)
    from denoising_diffusion_deep_fake_tpu.training.runners import fit_balance

    cfg = config_from_dict(BalanceConfig, dict(
        data_path=f"{tmpdir}/images.txt",
        output_image_list_path=f"{tmpdir}/balanced.txt",
        ratio_of_noise=0.7, number_of_classes=3,
        log_dir=f"{tmpdir}/runs", checkpoint_dir=f"{tmpdir}/ckpt", **_COMMON))
    _, _, ctx = fit_balance(cfg, max_steps=2, verbose=False)
    return f"balance trained {ctx.global_step} steps OK"


def main(coordinator, nproc, pid, tmpdir, workload="denoiser"):
    os.environ["D3F_COORDINATOR"] = coordinator
    os.environ["D3F_NUM_PROCESSES"] = str(nproc)
    os.environ["D3F_PROCESS_ID"] = str(pid)

    runner = {"denoiser": run_denoiser, "swap": run_swap,
              "balance": run_balance, "spatial": run_spatial,
              "preempt": run_preempt, "nanguard": run_nanguard,
              "devcache": run_devcache,
              "resume_ref4": run_resume_ref4,
              "resume_train2": run_resume_train2,
              "resume_resume4": run_resume_resume4}[workload]
    message = runner(tmpdir)
    assert jax.process_count() == nproc
    print(f"proc {pid}: {message}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4],
         *sys.argv[5:6])
