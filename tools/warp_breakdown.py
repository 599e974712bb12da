"""Warp-kernel cost breakdown at the reference operating point (448², b16).

VERDICT r2 #8 asks for a both-axis/whole-sample-in-VMEM warp kernel *or a
measured negative result*. This tool produces the measurement that decides:
chained-in-one-jit marginals (the only trustworthy timing on this tunnel —
BASELINE.md methodology; dispatch overhead is ~1.5-3 ms, the same order as
the op itself) for

  pallas_full   — affine_warp_pallas as shipped: NHWC->(B,H,C,W) transpose,
                  x-pass kernel, (B,H,C,W)->(B,W,C,H) transpose, y-pass
                  kernel, transpose back to NHWC
  pallas_kernels— the two Pallas axis passes ONLY (data kept in the kernel
                  layout) — isolates MXU/VPU kernel cost
  transposes    — the three XLA relayouts ONLY — isolates the HBM traffic a
                  fused whole-sample kernel could eliminate
  xla_hybrid    — the XLA formulation (auto fallback / non-TPU path)

If (transposes) is a small share of (pallas_full), a fused kernel's ceiling
is correspondingly small and the negative result is grounded; if it
dominates, fusion is worth building. Run with the chip free:

    python tools/warp_breakdown.py [size batch chain]
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

from denoising_diffusion_deep_fake_tpu.ops.augment import (
    AffineAugmentConfig,
    affine_warp_hybrid,
    sample_affine_params,
)
from denoising_diffusion_deep_fake_tpu.ops.pallas.warp_kernel import (
    affine_warp_pallas,
    warp_axis_pass_pallas,
)
from denoising_diffusion_deep_fake_tpu.ops.pallas.warp_fused import (
    affine_warp_pallas_fused,
)
from denoising_diffusion_deep_fake_tpu.utils.timing import value_barrier


def marginal_ms(make_chain, n_small: int = 4, n_big: int = 12,
                reps: int = 8) -> float:
    """Marginal per-op time from chained-xN-in-one-jit runs (cancels
    dispatch overhead AND the fixed in/out transfer)."""

    def run(n):
        fn = jax.jit(make_chain(n))
        out = fn()
        value_barrier(out)           # compile + first run
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
            value_barrier(out)
        return (time.perf_counter() - t0) / reps

    return (run(n_big) - run(n_small)) / (n_big - n_small) * 1e3


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 448
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    key = jax.random.PRNGKey(0)
    x0 = jax.device_put(
        np.random.default_rng(0).random((batch, size, size, 3),
                                        np.float32))
    params = sample_affine_params(key, batch, AffineAugmentConfig())

    def chain_full(n):
        def fn():
            x = x0
            for i in range(n):
                x = affine_warp_pallas(x, params)
                x = x + 1e-6 * i     # keep iterations distinct/sequential
            return x
        return fn

    def chain_kernels(n):
        # Stay in (B, H, C, W): x-pass, then y-pass reuses the same layout
        # with swapped axes semantics — NOT the real warp (no transposes),
        # purely the kernel cost at identical shapes.
        alpha = params["scale"]
        t0_ = jnp.transpose(x0, (0, 1, 3, 2))
        shift = jnp.zeros((batch, size))

        def fn():
            x = t0_
            for i in range(n):
                x = warp_axis_pass_pallas(x, alpha, shift)
                x = warp_axis_pass_pallas(x, alpha, shift)
                x = x + 1e-6 * i
            return x
        return fn

    def chain_transposes(n):
        def fn():
            x = jnp.transpose(x0, (0, 1, 3, 2))      # NHWC -> B,H,C,W
            for i in range(n):
                y = jnp.transpose(x, (0, 3, 2, 1))   # B,H,C,W -> B,W,C,H
                z = jnp.transpose(y, (0, 3, 1, 2))   # -> B,H,W,C (NHWC)
                x = jnp.transpose(z + 1e-6 * i, (0, 1, 3, 2))
            return x
        return fn

    def chain_hybrid(n):
        def fn():
            x = x0
            for i in range(n):
                x = affine_warp_hybrid(x, params)
                x = x + 1e-6 * i
            return x
        return fn

    def chain_fused(n):
        # Whole-sample-in-VMEM kernel: both passes + intermediate in one
        # pallas_call; only the NCHW edge transposes remain in XLA.
        def fn():
            x = x0
            for i in range(n):
                x = affine_warp_pallas_fused(x, params)
                x = x + 1e-6 * i
            return x
        return fn

    rows = {}
    for name, chain in (("pallas_full", chain_full),
                        ("pallas_fused", chain_fused),
                        ("pallas_kernels", chain_kernels),
                        ("transposes_x3", chain_transposes),
                        ("xla_hybrid", chain_hybrid)):
        # One variant failing to lower (e.g. a Mosaic rejection of a new
        # kernel) must not cost the other rows.
        try:
            ms = marginal_ms(chain)
        except Exception as e:  # noqa: BLE001 - report and continue
            print(json.dumps({"metric": f"warp_{name}_{size}px_b{batch}",
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)
            continue
        rows[name] = round(ms, 3)
        print(json.dumps({"metric": f"warp_{name}_{size}px_b{batch}",
                          "value": rows[name], "unit": "ms/op"}),
              flush=True)
    if "transposes_x3" in rows and "pallas_full" in rows:
        share = rows["transposes_x3"] / max(rows["pallas_full"], 1e-9)
        print(json.dumps({"metric": "transpose_share_of_full_warp",
                          "value": round(share, 3),
                          "verdict": ("fuse" if share > 0.4
                                      else "negative-result: fusion ceiling "
                                           "too small")}), flush=True)
    if "pallas_fused" in rows and "pallas_full" in rows:
        print(json.dumps({"metric": "fused_speedup_vs_two_pass",
                          "value": round(rows["pallas_full"]
                                         / max(rows["pallas_fused"], 1e-9),
                                         3),
                          "unit": "x"}), flush=True)


if __name__ == "__main__":
    main()
