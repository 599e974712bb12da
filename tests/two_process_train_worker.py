"""Worker: full multi-process training run (2 procs x 2 CPU devices).

Usage: python two_process_train_worker.py <coordinator> <nproc> <pid> <tmpdir>

Each process runs the REAL ``fit_denoiser`` runner: distributed init via the
D3F_* env path, per-process manifest shard, global batch assembled from
local slices, primary-only checkpoint/TB writes.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")

import jax

jax.config.update("jax_platforms", "cpu")


def main(coordinator, nproc, pid, tmpdir):
    os.environ["D3F_COORDINATOR"] = coordinator
    os.environ["D3F_NUM_PROCESSES"] = str(nproc)
    os.environ["D3F_PROCESS_ID"] = str(pid)

    from denoising_diffusion_deep_fake_tpu.config import (
        DenoiserConfig, config_from_dict)
    from denoising_diffusion_deep_fake_tpu.training.runners import fit_denoiser

    cfg = config_from_dict(DenoiserConfig, dict(
        input_image_list_path=f"{tmpdir}/images.txt",
        batch_size=4,                      # global; 2 per process
        learning_rate=1e-3, max_epochs=1, encoder_name="resnet18",
        compute_dtype="float32", noise_exponential_sampling_lambda=3.0,
        image_size=32,
        log_dir=f"{tmpdir}/runs", checkpoint_dir=f"{tmpdir}/ckpt"))
    state, trainer, ctx = fit_denoiser(cfg, max_steps=2, verbose=False)
    assert jax.process_count() == nproc
    print(f"proc {pid}: trained {ctx.global_step} steps OK", flush=True)


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
