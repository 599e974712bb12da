"""Benchmark: denoiser training throughput (imgs/sec/chip) on real hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The headline metric matches BASELINE.md's north star — denoiser train
throughput per chip. ``vs_baseline`` is measured against the driver-set
target of 10x the CPU reference; the CPU reference throughput is estimated
once on this host (see BASELINE.md; the torch reference publishes no numbers,
so the first measured runs establish the baseline).

Capture hardening (VERDICT r2 item 2): this host reaches the TPU through a
tunnel that can be transiently down — round 2's capture recorded rc=1 from a
backend-init outage with bench.py unchanged since a passing run. ``main``
therefore runs the measurement in a TIMEOUT-BOUNDED subprocess (a hung
backend init cannot be interrupted in-process; the observed outage hung 35
minutes) with bounded retries + backoff on retryable tunnel errors, and on
persistent failure emits a machine-readable diagnostic JSON line
(``{"error": "tpu_unavailable", ...}``) so a driver capture can distinguish
"tunnel down" from "code broken". Knobs (for tests): D3F_BENCH_ATTEMPTS,
D3F_BENCH_BACKOFF_S, D3F_BENCH_TIMEOUT_S, D3F_BENCH_CMD.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def bench_denoiser_throughput(batch_size: int = 256, image_size: int = 64,
                              steps: int = 15, warmup: int = 3) -> dict:
    # batch 256 is the measured single-chip sweet spot at 64² (~5.7k imgs/s
    # with value-fetch barriers; larger batches lose to HBM pressure).
    import jax
    import jax.numpy as jnp
    import numpy as np

    from denoising_diffusion_deep_fake_tpu.config import (
        DenoiserConfig, config_from_dict)
    from denoising_diffusion_deep_fake_tpu.training.denoiser import (
        DenoiserTrainer)

    from denoising_diffusion_deep_fake_tpu.utils.timing import timed_loop

    cfg = config_from_dict(DenoiserConfig, dict(
        input_image_list_path="unused", batch_size=batch_size,
        learning_rate=1e-3, encoder_name="resnet34",
        compute_dtype="bfloat16",
        noise_exponential_sampling_lambda=5.0), validate=False)
    trainer = DenoiserTrainer(cfg, steps_per_epoch=1000, image_size=image_size)
    state = trainer.init_state(jax.random.PRNGKey(0))
    step = trainer.make_train_step(with_images=False)

    rng = np.random.default_rng(0)
    batch = jnp.asarray(rng.integers(0, 256, (batch_size, image_size,
                                              image_size, 3), dtype=np.uint8))

    # Constant base key: per-step keys derive inside the jitted step from the
    # step counter (a host-side PRNGKey per step costs a tunnel round-trip).
    # Timing uses value-fetch barriers — block_until_ready does not actually
    # wait on this platform (utils/timing.py).
    key = jax.random.PRNGKey(0)
    last_metrics = {}

    def one(state):
        new_state, metrics = step(state, batch, key)
        last_metrics["m"] = metrics
        return new_state

    dt, state = timed_loop(one, state, steps=steps, warmup=warmup)
    return {"imgs_per_sec": batch_size / dt, "step_ms": dt * 1e3,
            "loss": float(last_metrics["m"]["loss"])}


def run_once() -> None:
    """One measurement attempt in THIS process; prints the result JSON line."""
    result = bench_denoiser_throughput()
    # Baseline: the north star asks for >10x the CPU reference per chip.
    # The measured CPU reference (tools/torch_cpu_baseline.py — torch CPU
    # train step, identical architecture/shape, this host) is 22.1 imgs/sec
    # (BASELINE.md), so the target baseline is 221 imgs/sec; vs_baseline is
    # the multiple of that target we achieve.
    target = 221.0
    print(json.dumps({
        "metric": "denoiser_train_imgs_per_sec_per_chip_64px_bf16",
        "value": round(result["imgs_per_sec"], 1),
        "unit": "imgs/sec",
        "vs_baseline": round(result["imgs_per_sec"] / target, 2),
    }))


# stderr markers that mean "the TPU/tunnel is down", not "the code is broken"
# (observed wording of the axon outage + the usual grpc retryable statuses).
_RETRYABLE_MARKERS = (
    "UNAVAILABLE",
    "Unable to initialize backend",
    "DEADLINE_EXCEEDED",
    "failed to connect",
    "Connection reset",
    "Socket closed",
)


def _classify(stderr: str) -> str:
    return ("tpu_unavailable"
            if any(m in stderr for m in _RETRYABLE_MARKERS) else "code_error")


def main() -> int:
    attempts = int(os.environ.get("D3F_BENCH_ATTEMPTS", "3"))
    backoff_s = float(os.environ.get("D3F_BENCH_BACKOFF_S", "90"))
    timeout_s = float(os.environ.get("D3F_BENCH_TIMEOUT_S", "900"))
    # Test hook: substitute the child command to force failures/hangs.
    cmd = (os.environ["D3F_BENCH_CMD"].split()
           if "D3F_BENCH_CMD" in os.environ
           else [sys.executable, os.path.abspath(__file__), "--once"])

    history = []
    for attempt in range(1, attempts + 1):
        try:
            proc = subprocess.run(cmd, capture_output=True, text=True,
                                  timeout=timeout_s)
            rc, out, err = proc.returncode, proc.stdout, proc.stderr
        except subprocess.TimeoutExpired as e:
            rc, out = None, (e.stdout or "")
            err = (e.stderr or "") + f"\n[bench] attempt timed out after " \
                                     f"{timeout_s:.0f}s (hung backend init?)"
        if rc == 0 and out.strip():
            print(out.strip().splitlines()[-1])  # the child's one JSON line
            return 0
        reason = "timeout" if rc is None else _classify(err)
        history.append({"attempt": attempt, "rc": rc, "reason": reason,
                        "stderr_tail": err.strip()[-400:]})
        print(f"[bench] attempt {attempt}/{attempts} failed ({reason})",
              file=sys.stderr)
        sys.stderr.write(err[-2000:] + "\n")
        if reason == "code_error":
            break  # a real bug won't heal with backoff — fail fast
        if attempt < attempts:
            time.sleep(backoff_s)
    print(json.dumps({
        "error": history[-1]["reason"],
        "metric": "denoiser_train_imgs_per_sec_per_chip_64px_bf16",
        "attempts": history,
    }))
    return 1


if __name__ == "__main__":
    if "--once" in sys.argv[1:]:
        run_once()
    else:
        sys.exit(main())
