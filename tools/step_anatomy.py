"""Anatomy of the full train step at the reference operating point.

VERDICT r3 #2: do for the 448² b16 swap step what round 1 did for 64² —
a chained-marginal cost split of the WHOLE step plus an XLA cost-analysis
roofline, so the top sink is known before optimizing (and "at envelope"
claims are defended with numbers, not vibes).

Components measured as chained-in-one-jit marginals (the only trustworthy
timing on this tunnel — BASELINE.md methodology):

  full_step     — the real fused DeepFakeTrainer._train_step (swap mode):
                  2x augment, 2x EMA update+forward, 2x noise blend,
                  2x grad forward+backward, 2x Adam + EMA param update
  augment_x2    — both identities' normalize+warp chains only
  ema_fwd_x2    — both EMA (fake-generating) forwards only
  noise_x2      — both noise blends only
  grad_x2       — both loss forward+backwards only (no optimizer)
  adam_x2       — both Adam updates + EMA merges only (fixed grads)

The residual (full - sum of parts) is XLA fusion overlap/scheduling gain
(negative residual = parts overlap inside the full program).

Roofline: `compiled.cost_analysis()` FLOPs + bytes over the measured step
time, against peak MXU FLOPs and the saxpy-calibrated achievable HBM
bandwidth recorded in BASELINE.md.

Usage (chip free):  python tools/step_anatomy.py [size batch workload]
Defaults: 448 16 swap (the reference's `denoise_config.yml:13-14` shape with
its swap-phase batch).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from denoising_diffusion_deep_fake_tpu.utils.timing import value_barrier

PEAK_BF16_TFLOPS = 197.0   # TPU v5e MXU peak (2 MXUs x bf16)
ACHIEVABLE_HBM_GBPS = 180.0  # saxpy-calibrated on this chip (BASELINE.md r1)


def marginal_ms(make_chain, n_small: int, n_big: int, reps: int) -> float:
    def run(n):
        fn = jax.jit(make_chain(n))
        value_barrier(fn())
        t0 = time.perf_counter()
        for _ in range(reps):
            value_barrier(fn())
        return (time.perf_counter() - t0) / reps

    return (run(n_big) - run(n_small)) / (n_big - n_small) * 1e3


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 448
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    workload = sys.argv[3] if len(sys.argv) > 3 else "swap"

    from denoising_diffusion_deep_fake_tpu.config import (
        DeepFakeConfig, config_from_dict)
    from denoising_diffusion_deep_fake_tpu.ops.augment import augment_batch
    from denoising_diffusion_deep_fake_tpu.ops.noise import (
        blend_random_amount_of_noise)
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

    # Pre-materialized augmented batch for the component chains (bf16 like
    # the step's compute dtype).
    key = jax.random.PRNGKey(3)
    xa = jax.jit(lambda: augment_batch(key, da, cfg.mean_a, cfg.std_a,
                                       trainer.aug, dtype=jnp.bfloat16))()
    state_a, state_b = states["a"], states["b"]

    def chain_full(n):
        def fn():
            s = states
            m = None
            for _ in range(n):
                s, m = trainer._train_step(s, da, db, rng, with_images=False)
            return s["a"].params, m["loss_swap/train_a"] if workload == "swap" \
                else m["loss_denoise/train_a"]
        return fn

    def chain_augment(n):
        def fn():
            x = None
            k = key
            for i in range(n):
                k = jax.random.fold_in(k, i)
                a = augment_batch(k, da, cfg.mean_a, cfg.std_a, trainer.aug,
                                  dtype=jnp.bfloat16)
                b = augment_batch(jax.random.fold_in(k, 1), db, cfg.mean_b,
                                  cfg.std_b, trainer.aug, dtype=jnp.bfloat16)
                x = a + b if x is None else x + a + b
            return x
        return fn

    def chain_ema_fwd(n):
        def fn():
            x = xa
            for _ in range(n):
                x = trainer._ema_forward(state_a, x)
                x = trainer._ema_forward(state_b, x)
            return x
        return fn

    def chain_noise(n):
        def fn():
            x = xa
            k = key
            for i in range(n):
                k = jax.random.fold_in(k, i)
                x, _ = blend_random_amount_of_noise(
                    k, x, cfg.noise_exponential_sampling_lambda)
                x, _ = blend_random_amount_of_noise(
                    jax.random.fold_in(k, 1), x,
                    cfg.noise_exponential_sampling_lambda)
            return x
        return fn

    def chain_grad(n):
        from denoising_diffusion_deep_fake_tpu.ops.losses import mse_ssim_loss

        def grad_one(state, x):
            def loss_fn(params):
                pred, _ = trainer._forward_train(params, state.batch_stats, x)
                return mse_ssim_loss(pred, x)
            return jax.grad(loss_fn)(state.params)

        def fn():
            x = xa
            acc = None
            for i in range(n):
                ga = grad_one(state_a, x + 1e-6 * i)
                gb = grad_one(state_b, x + 1e-6 * i)
                leaf = (jax.tree.leaves(ga)[0] + jax.tree.leaves(gb)[0])
                acc = leaf if acc is None else acc + leaf
                x = x + 1e-6 * acc.mean().astype(x.dtype)  # sequentialize
            return acc
        return fn

    def chain_adam(n):
        grads_a = jax.tree.map(lambda p: jnp.ones_like(p) * 1e-6,
                               state_a.params)

        def fn():
            sa, sb = state_a, state_b
            for _ in range(n):
                sa = sa.apply_gradients(grads_a, trainer.tx, sa.batch_stats)
                sb = sb.apply_gradients(grads_a, trainer.tx, sb.batch_stats)
            return sa.params, sb.params
        return fn

    rows = {}
    plans = [
        ("full_step", chain_full, 1, 3, 4),
        ("augment_x2", chain_augment, 2, 8, 6),
        ("ema_fwd_x2", chain_ema_fwd, 2, 8, 6),
        ("noise_x2", chain_noise, 2, 12, 6),
        ("grad_x2", chain_grad, 1, 4, 4),
        ("adam_x2", chain_adam, 2, 8, 6),
    ]
    for name, chain, n_small, n_big, reps in plans:
        try:
            ms = marginal_ms(chain, n_small, n_big, reps)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"metric": f"anatomy_{name}_{size}px_b{batch}",
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)
            continue
        rows[name] = round(ms, 2)
        print(json.dumps({"metric": f"anatomy_{name}_{size}px_b{batch}",
                          "value": rows[name], "unit": "ms"}), flush=True)

    if "full_step" in rows:
        parts = {k: v for k, v in rows.items() if k != "full_step"}
        print(json.dumps({
            "metric": f"anatomy_summary_{size}px_b{batch}",
            "full_ms": rows["full_step"],
            "parts_sum_ms": round(sum(parts.values()), 2),
            "shares": {k: round(v / rows["full_step"], 3)
                       for k, v in parts.items()}}), flush=True)

    # Roofline from the compiled full step.
    step = jax.jit(lambda s, a, b, r: trainer._train_step(
        s, a, b, r, with_images=False))
    compiled = step.lower(states, da, db, rng).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = float(ca.get("flops", 0.0))
    bytes_hbm = float(ca.get("bytes accessed", 0.0))
    if "full_step" in rows and flops:
        t_s = rows["full_step"] / 1e3
        mxu = flops / t_s / (PEAK_BF16_TFLOPS * 1e12)
        bw = bytes_hbm / t_s / (ACHIEVABLE_HBM_GBPS * 1e9)
        print(json.dumps({
            "metric": f"anatomy_roofline_{size}px_b{batch}",
            "flops_per_step": flops, "bytes_per_step": bytes_hbm,
            "mxu_utilization_vs_peak": round(mxu, 4),
            "hbm_share_vs_achievable": round(bw, 4),
            "compute_bound_time_ms": round(
                flops / (PEAK_BF16_TFLOPS * 1e12) * 1e3, 2),
            "bandwidth_bound_time_ms": round(
                bytes_hbm / (ACHIEVABLE_HBM_GBPS * 1e9) * 1e3, 2)}),
            flush=True)


if __name__ == "__main__":
    main()
