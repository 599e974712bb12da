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
              "balance": run_balance, "spatial": run_spatial}[workload]
    message = runner(tmpdir)
    assert jax.process_count() == nproc
    print(f"proc {pid}: {message}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4],
         *sys.argv[5:6])
