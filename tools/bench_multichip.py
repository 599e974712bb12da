"""Multi-chip scaling bench — ready for the day real multi-chip exists.

This host exposes ONE real TPU chip through a tunnel (CLAUDE.md), so the
framework's multi-chip layer has only ever been validated functionally (the
virtual-mesh dryrun + 2-process tests). This tool is the measurement half,
committed ahead of hardware (VERDICT r4 next-round #3b): point it at a
multi-chip host and it captures the weak-scaling ladder in one command.

Per chip-count ``n`` (weak scaling: global batch = per-chip batch x n):

* delivered imgs/sec with value-fetch barriers (``utils/timing.timed_loop``
  — block_until_ready does not wait on tunneled hosts, BASELINE.md
  methodology),
* scaling efficiency vs the 1-chip row (ideal weak scaling = 1.0),
* the compiled step's collective census (parallel/audit.py): count +
  per-step MiB of all-reduce / all-gather / collective-permute — the
  predicted ICI traffic to hold against the measured efficiency.

Validation on THIS host (no multi-chip): run under the virtual CPU mesh
with SMALL shapes (the 1-core host takes ~10 min to compile one b256
resnet34 step; the real-hardware defaults are hopeless there) —
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/bench_multichip.py denoiser64 --chips 1,2,4 \
      --batch 8 --encoder resnet18 --census
(CPU rows are functional smoke, not performance;
tests/test_collective_census.py compile-checks this path in CI. The
real-chip path is proven: an n1 row captured 13,564 imgs/s on this host's
TPU.)

Usage: python tools/bench_multichip.py [denoiser64|swap448|swap448_spatial]
           [--chips 1,2,4] [--steps 12] [--census]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


WORKLOADS = {
    # name: (workload, image_size, per-chip batch, encoder, spatial)
    "denoiser64": ("denoiser", 64, 256, "resnet34", 1),
    "swap448": ("swap", 448, 16, "resnet34", 1),
    # H-sharded variant: chips pair up (data x spatial=2); per-PAIR batch.
    "swap448_spatial": ("swap", 448, 16, "resnet34", 2),
}


def _build(workload: str, mesh, *, image_size: int, batch: int,
           encoder: str):
    """Trainer + jitted step + sharded (states, batches, key) for one mesh."""
    import jax
    import numpy as np

    from denoising_diffusion_deep_fake_tpu.config import (
        DeepFakeConfig, DenoiserConfig, config_from_dict)
    from denoising_diffusion_deep_fake_tpu.parallel import (
        shard_batch, shard_state)

    spatial = mesh.shape.get("spatial", 1) > 1
    common = dict(batch_size=batch, image_size=image_size,
                  learning_rate=1e-3, encoder_name=encoder,
                  compute_dtype="bfloat16",
                  data_parallel=mesh.shape.get("data", 1),
                  spatial_parallel=mesh.shape.get("spatial", 1),
                  noise_exponential_sampling_lambda=8.0)
    rng = np.random.default_rng(0)

    def mk_batch(seed):
        return shard_batch(np.random.default_rng(seed).integers(
            0, 256, (batch, image_size, image_size, 3), dtype=np.uint8),
            mesh, spatial=spatial)

    if workload == "swap":
        from denoising_diffusion_deep_fake_tpu.training.deep_fake import (
            DeepFakeTrainer)

        cfg = config_from_dict(DeepFakeConfig, dict(
            mode="swap", data_path_a="x", data_path_b="y",
            ema_update_after_step=0, **common), validate=False)
        trainer = DeepFakeTrainer(cfg, steps_per_epoch=1000,
                                  image_size=image_size)
        states = shard_state(trainer.init_states(jax.random.PRNGKey(0)),
                             mesh)
        step = trainer.make_train_step(with_images=False)
        batches = (mk_batch(1), mk_batch(2))
        frames_per_step = 2 * batch
    else:
        from denoising_diffusion_deep_fake_tpu.training.denoiser import (
            DenoiserTrainer)

        cfg = config_from_dict(DenoiserConfig, dict(
            input_image_list_path="x", **common), validate=False)
        trainer = DenoiserTrainer(cfg, steps_per_epoch=1000,
                                  image_size=image_size)
        states = shard_state(trainer.init_state(jax.random.PRNGKey(0)), mesh)
        step = trainer.make_train_step(with_images=False)
        batches = (mk_batch(1),)
        frames_per_step = batch
    del rng
    return step, states, batches, frames_per_step


def bench_row(name: str, n_chips: int, *, steps: int, warmup: int,
              census: bool, batch_override: int | None = None,
              encoder_override: str | None = None) -> dict:
    import jax

    from denoising_diffusion_deep_fake_tpu.parallel import create_mesh
    from denoising_diffusion_deep_fake_tpu.utils.timing import timed_loop

    workload, size, per_chip, encoder, spatial = WORKLOADS[name]
    per_chip = batch_override or per_chip
    encoder = encoder_override or encoder
    if n_chips % spatial:
        raise ValueError(f"{name} needs chips % {spatial} == 0")
    mesh = create_mesh(n_chips // spatial, spatial=spatial,
                       devices=jax.devices()[:n_chips])
    # Weak scaling: the data axis carries per-chip batch per data rank (a
    # spatial pair shares one batch slice's H halves).
    batch = per_chip * (n_chips // spatial)
    step, states, batches, frames = _build(
        workload, mesh, image_size=size, batch=batch, encoder=encoder)
    key = jax.random.PRNGKey(0)

    def one(states):
        out = step(states, *batches, key)
        return out[0]

    dt, _ = timed_loop(one, states, steps=steps, warmup=warmup)
    row = {
        "metric": f"multichip_{name}_n{n_chips}",
        "value": round(frames / dt, 1), "unit": "imgs/sec",
        "chips": n_chips, "step_ms": round(dt * 1e3, 2),
        "global_batch": batch,
    }
    if census:
        from denoising_diffusion_deep_fake_tpu.parallel.audit import (
            census_summary, collective_census, lower_train_step_hlo)

        text = lower_train_step_hlo(workload, mesh, image_size=size,
                                    batch_size=batch, encoder_name=encoder,
                                    compute_dtype="bfloat16")
        row["collectives"] = census_summary(collective_census(text))
    return row


def main() -> None:
    import os

    if os.environ.get("JAX_PLATFORMS"):
        # This image's jax ignores the env var (CLAUDE.md); re-apply so the
        # documented CPU-mesh validation line actually lands on CPU.
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax

    p = argparse.ArgumentParser()
    p.add_argument("workload", nargs="?", default="denoiser64",
                   choices=sorted(WORKLOADS))
    p.add_argument("--chips", default=None,
                   help="comma list of chip counts (default: 1,2,4,... up "
                        "to what exists)")
    p.add_argument("--steps", type=int, default=12)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--batch", type=int, default=None,
                   help="override per-chip batch (CPU validation: use 8)")
    p.add_argument("--encoder", default=None,
                   help="override encoder (CPU validation: resnet18)")
    p.add_argument("--census", action="store_true",
                   help="also compile-audit each row's collectives "
                        "(parallel/audit.py; one extra compile per row)")
    args = p.parse_args()

    avail = len(jax.devices())
    if args.chips:
        chip_counts = [int(c) for c in args.chips.split(",")]
    else:
        chip_counts = [n for n in (1, 2, 4, 8, 16, 32, 64) if n <= avail]
    spatial = WORKLOADS[args.workload][4]
    chip_counts = [n for n in chip_counts if n % spatial == 0] or [spatial]

    base = None
    for n in chip_counts:
        if n > avail:
            print(json.dumps({"metric": f"multichip_{args.workload}_n{n}",
                              "skipped": f"only {avail} device(s)"}),
                  flush=True)
            continue
        row = bench_row(args.workload, n, steps=args.steps,
                        warmup=args.warmup, census=args.census,
                        batch_override=args.batch,
                        encoder_override=args.encoder)
        if base is None:
            base = row["value"] / row["chips"]
        row["scaling_efficiency"] = round(
            (row["value"] / row["chips"]) / base, 3)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
