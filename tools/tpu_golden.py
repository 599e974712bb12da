"""TPU hardware golden: pin first-N-step losses so silent numeric
regressions fail in minutes, not as diverged multi-hour quality runs.

    python tools/tpu_golden.py capture   # write artifacts/tpu_golden.json
    python tools/tpu_golden.py compare   # re-run, diff against the pin

Why this exists: every pinned golden in tests/ runs on CPU. The round-3
precision bug (the TPU backend silently rounding fp32 conv inputs to
one-pass bf16 under the default matmul precision) produced CPU-identical
tests and a training run that silently diverged — it was caught only by a
failed 872-second converged-quality run (BASELINE.md "TPU precision").
This tool is the minutes-scale tripwire for that whole class: it runs a few
fixed-seed train steps of the two operating points that matter — the 64²
denoiser and the reference-shaped 448² swap step
(`/root/reference/d3f/train_deep_fake/denoise_config.yml:13-14`), each in
both compute dtypes — on the real chip and compares the per-step losses
against the pinned capture within a tolerance band.

Determinism note: same chip generation + same jax/XLA version reproduces
losses bit-exactly in practice; the band (default rel 1e-3, bf16 rows 1e-2)
absorbs compiler-version fusion drift while remaining far tighter than any
real precision regression (the round-3 bug moved step-5 losses by >10x the
band within a handful of steps).

Run with the chip free (never two TPU processes — CLAUDE.md).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

GOLDEN_PATH = Path(__file__).resolve().parent.parent / "artifacts" / "tpu_golden.json"
N_STEPS = 6

# (name, workload, size, batch, compute_dtype)
ROWS = [
    ("denoiser64_bf16", "denoiser", 64, 32, "bfloat16"),
    ("denoiser64_fp32", "denoiser", 64, 8, "float32"),
    ("swap448_bf16", "swap", 448, 4, "bfloat16"),
    ("swap448_fp32", "swap", 448, 2, "float32"),
]
# Per-row relative tolerance for compare: fp32 rows are near-deterministic;
# bf16 rows get headroom for compiler fusion-order drift.
TOLERANCE = {"float32": 1e-3, "bfloat16": 1e-2}


def _fixed_batch(size: int, batch: int, seed: int) -> np.ndarray:
    return np.random.default_rng(seed).integers(
        0, 256, (batch, size, size, 3), dtype=np.uint8)


def run_row(name: str, workload: str, size: int, batch: int,
            dtype: str) -> list[float]:
    """N_STEPS fixed-seed train-step losses on the current backend."""
    import jax

    from denoising_diffusion_deep_fake_tpu.config import (
        DeepFakeConfig, DenoiserConfig, config_from_dict)

    losses: list[float] = []
    if workload == "denoiser":
        from denoising_diffusion_deep_fake_tpu.training.denoiser import (
            DenoiserTrainer)

        cfg = config_from_dict(DenoiserConfig, dict(
            input_image_list_path="unused", batch_size=batch,
            learning_rate=1e-3, encoder_name="resnet34",
            compute_dtype=dtype, noise_exponential_sampling_lambda=5.0),
            validate=False)
        trainer = DenoiserTrainer(cfg, steps_per_epoch=100, image_size=size)
        state = trainer.init_state(jax.random.PRNGKey(0))
        step = trainer.make_train_step()
        key = jax.random.PRNGKey(7)
        data = _fixed_batch(size, batch, seed=1)
        with jax.default_matmul_precision(
                cfg.resolved_matmul_precision() or "default"):
            for _ in range(N_STEPS):
                state, metrics = step(state, data, key)
                losses.append(float(metrics["loss"]))
    else:
        from denoising_diffusion_deep_fake_tpu.training.deep_fake import (
            DeepFakeTrainer)

        cfg = config_from_dict(DeepFakeConfig, dict(
            mode="swap", data_path_a="unused", data_path_b="unused",
            batch_size=batch, learning_rate=1e-3, encoder_name="resnet34",
            compute_dtype=dtype, noise_exponential_sampling_lambda=8.0,
            ema_update_after_step=0), validate=False)
        trainer = DeepFakeTrainer(cfg, steps_per_epoch=100, image_size=size)
        states = trainer.init_states(jax.random.PRNGKey(0))
        step = trainer.make_train_step()
        key = jax.random.PRNGKey(7)
        da = _fixed_batch(size, batch, seed=1)
        db = _fixed_batch(size, batch, seed=2)
        with jax.default_matmul_precision(
                cfg.resolved_matmul_precision() or "default"):
            for _ in range(N_STEPS):
                states, metrics = step(states, da, db, key)
                losses.append(float(metrics["loss_swap/train_a"]))
    return losses


def capture() -> dict:
    import jax

    out = {"backend": jax.default_backend(), "jax": jax.__version__,
           "n_steps": N_STEPS, "rows": {}}
    for name, workload, size, batch, dtype in ROWS:
        print(f"# capturing {name} ...", flush=True)
        out["rows"][name] = {
            "losses": run_row(name, workload, size, batch, dtype),
            "workload": workload, "size": size, "batch": batch,
            "compute_dtype": dtype, "rel_tol": TOLERANCE[dtype],
        }
        print(f"#   {out['rows'][name]['losses']}", flush=True)
    return out


def compare(pinned: dict) -> int:
    failures = []
    for name, row in pinned["rows"].items():
        fresh = run_row(name, row["workload"], row["size"], row["batch"],
                        row["compute_dtype"])
        ref = np.asarray(row["losses"])
        got = np.asarray(fresh)
        rel = np.abs(got - ref) / np.maximum(np.abs(ref), 1e-12)
        worst = float(rel.max())
        ok = worst <= row["rel_tol"] and np.isfinite(got).all()
        print(json.dumps({"row": name, "max_rel_dev": round(worst, 6),
                          "rel_tol": row["rel_tol"],
                          "status": "OK" if ok else "FAIL",
                          "pinned": row["losses"], "fresh": fresh}),
              flush=True)
        if not ok:
            failures.append(name)
    if failures:
        print(f"# TPU GOLDEN FAILURES: {failures} — a numeric regression of "
              "the round-3 'TPU precision' class, or a deliberate math "
              "change (re-capture after verifying)", flush=True)
        return 1
    print("# all TPU golden rows within tolerance", flush=True)
    return 0


def main() -> int:
    mode = sys.argv[1] if len(sys.argv) > 1 else "compare"
    if mode == "capture":
        data = capture()
        GOLDEN_PATH.parent.mkdir(parents=True, exist_ok=True)
        GOLDEN_PATH.write_text(json.dumps(data, indent=2))
        print(f"# wrote {GOLDEN_PATH}", flush=True)
        return 0
    if mode == "compare":
        if not GOLDEN_PATH.exists():
            print(f"no pin at {GOLDEN_PATH}; run capture first", flush=True)
            return 2
        return compare(json.loads(GOLDEN_PATH.read_text()))
    print(__doc__)
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
