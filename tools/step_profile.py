"""Trace-level attribution of the 448² step residual (round-4 gap).

The chained-marginal anatomy (`tools/step_anatomy.py`, BASELINE.md r4) left a
~50 ms residual (full step − sum of homogeneous parts) ATTRIBUTED to
"heterogeneous-program scheduling + the elementwise tail" but not measured.
This tool pins it from the device's own timeline: it captures a
`jax.profiler` trace of N full train steps chained in ONE jit (so host
dispatch can't pollute in-program gaps), parses the XPlane proto, and
reports, per step:

  * device busy time on the "XLA Ops" line (union of op intervals),
  * in-module gap = module wall − ops busy (true scheduling bubbles),
  * per-category op time (fusion / convolution / copy / all-reduce / ...),
  * the top-k individual ops by total device time.

Reading the output against the anatomy table: if ops-busy ≈ the homogeneous
parts sum and the module wall ≈ the measured full step, the residual IS
individually-small elementwise/copy ops plus bubbles — each visible here by
name — rather than a single optimizable sink.

Usage (chip free):  python tools/step_profile.py [size batch workload nsteps]
Defaults: 448 16 swap 3 (the reference's `denoise_config.yml:13-14` shape).
"""

from __future__ import annotations

import glob
import json
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np

from denoising_diffusion_deep_fake_tpu.utils.profiling import (  # noqa: F401
    analyze_xspace, categorize, union_ps)
from denoising_diffusion_deep_fake_tpu.utils.timing import value_barrier


def build_chain(size: int, batch: int, workload: str, nsteps: int):
    """The full fused train step, ``nsteps`` of them traced into one jit
    (same construction as `tools/step_anatomy.py` chain_full)."""
    from denoising_diffusion_deep_fake_tpu.config import (
        DeepFakeConfig, config_from_dict)
    from denoising_diffusion_deep_fake_tpu.training.deep_fake import (
        DeepFakeTrainer)

    cfg = config_from_dict(DeepFakeConfig, dict(
        mode=workload, data_path_a="unused", data_path_b="unused",
        batch_size=batch, learning_rate=1e-3, encoder_name="resnet34",
        compute_dtype="bfloat16", noise_exponential_sampling_lambda=8.0,
        ema_update_after_step=0), validate=False)
    trainer = DeepFakeTrainer(cfg, steps_per_epoch=100, image_size=size)
    states = trainer.init_states(jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(7)
    da = jax.device_put(np.random.default_rng(1).integers(
        0, 256, (batch, size, size, 3), dtype=np.uint8))
    db = jax.device_put(np.random.default_rng(2).integers(
        0, 256, (batch, size, size, 3), dtype=np.uint8))
    loss_key = ("loss_swap/train_a" if workload == "swap"
                else "loss_denoise/train_a")

    @jax.jit
    def chain():
        s, m = states, None
        for _ in range(nsteps):
            s, m = trainer._train_step(s, da, db, rng, with_images=False)
        return s["a"].params, m[loss_key]

    return chain


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 448
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    workload = sys.argv[3] if len(sys.argv) > 3 else "swap"
    nsteps = int(sys.argv[4]) if len(sys.argv) > 4 else 3

    chain = build_chain(size, batch, workload, nsteps)
    value_barrier(chain())  # compile + warm outside the trace
    trace_dir = tempfile.mkdtemp(prefix="step_profile_")
    import time

    jax.profiler.start_trace(trace_dir)
    t0 = time.perf_counter()
    value_barrier(chain())
    wall_ms = (time.perf_counter() - t0) * 1e3
    jax.profiler.stop_trace()
    print(json.dumps({"metric": f"profile_wall_{size}px_b{batch}",
                      "value": round(wall_ms / nsteps, 2),
                      "unit": "ms/step", "nsteps": nsteps,
                      "trace_dir": trace_dir}), flush=True)

    paths = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    if not paths:
        print(json.dumps({"metric": "profile_error",
                          "error": f"no .xplane.pb under {trace_dir}"}),
              flush=True)
        return
    report = analyze_xspace(paths[0], nsteps)
    print(json.dumps({"metric": f"profile_xplane_{size}px_b{batch}",
                      **report}, indent=2), flush=True)

    # VERDICT r4 weak #2: name the "copy" and "other" buckets. Re-lower the
    # SAME chain (deterministic compilation -> same op names) and print each
    # top copy/other/transpose op's HLO definition — shape, operands,
    # source metadata — so every >=1 ms residual op is attributable.
    from denoising_diffusion_deep_fake_tpu.utils.profiling import (
        hlo_definitions)

    hlo_text = chain.lower().compile().as_text()
    for plane, rep in report.items():
        if not isinstance(rep, dict) or "top_ops_per_category" not in rep:
            continue
        for cat in ("copy", "other", "transpose", "dynamic-slice"):
            ops = rep["top_ops_per_category"].get(cat)
            if not ops:
                continue
            defs = hlo_definitions(hlo_text, list(ops))
            print(json.dumps({
                "metric": f"profile_attribution_{cat}_{size}px_b{batch}",
                "ops": {name: {"ms_per_step": ms,
                               "hlo": defs.get(name, "<not found>")}
                        for name, ms in ops.items()}}, indent=2),
                flush=True)


if __name__ == "__main__":
    main()
