"""K-step supersteps: one dispatched program per ``steps_per_call`` steps.

Why this exists (BASELINE.md round-4 "trace-level 448² attribution"): on
this host's TPU tunnel the compiled 448² swap step is 175.4 ms of device
work inside a 208-215 ms wall — the difference is per-program dispatch
overhead that scales with the link, not the program, and at small shapes it
dominates outright (64² b256 devcache: 30.4 ms delivered vs 15.2 ms bare
step). The reference has no counterpart: PyTorch Lightning dispatches
eagerly per op (`/root/reference/d3f/train_deep_fake/start_training.py:43-53`
relies on CUDA stream pipelining). The TPU-native fix is compile-level:
``lax.scan`` K train steps into ONE XLA program, so K steps cost one
dispatch and one stacked metric fetch.

Correctness invariant: the per-step PRNG key derives from ``state.step``
INSIDE the step core (training/denoiser.py:80, CLAUDE.md style rules), and
the device-cache gather position likewise derives from ``state.step``
(data/device_cache.py) — so a K-step scan runs the SAME per-step function
on the SAME (state, batch, key) sequence as K single dispatches. Numerics:
the scanned program fuses differently than the unrolled one, so compiled
rounding differs at machine epsilon — under bf16 compute the two
trajectories decohere within a few steps (the cross-platform fp32
decoherence class BASELINE.md round 3 documents), while fp32 trajectories
agree to <1e-4 over 6 steps (test_multi_step.py pins this for all three
workloads). Metrics come back with a leading ``(K,)`` axis; the loop
(training/loop.py) fetches the whole group in one transfer and fans the
rows out to per-step TensorBoard scalars, preserving the reference's
``log_every_n_steps=1`` cadence exactly.

Host-fed batches arrive as K separate device arrays (the prefetch thread
uploaded them individually, overlapped with compute); they are stacked
INSIDE jit — no extra host copy, no extra transfer, and the stack is
elided into the scan's slicing by XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def make_super_step(train_step_core, k: int, *, n_batch_args: int = 1,
                    donate: bool = True):
    """Host-loader path: ``core(state, b0..b{n-1}, rng)`` becomes
    ``step(state, *k_batches_per_arg, rng)``.

    The flattened batch operands are grouped per POSITION: for the paired
    trainer (``n_batch_args=2``) the call is
    ``step(states, a0..a{k-1}, b0..b{k-1}, rng)``.
    """

    def step(state, *args):
        rng = args[-1]
        batches = args[:-1]
        assert len(batches) == n_batch_args * k, (len(batches), n_batch_args, k)
        xs = tuple(jnp.stack(batches[i * k:(i + 1) * k])
                   for i in range(n_batch_args))

        def body(carry, per_step):
            carry, metrics = train_step_core(carry, *per_step, rng)
            return carry, metrics

        return jax.lax.scan(body, state, xs)

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_cached_super_step(train_step_core, k: int, batch_size: int,
                           steps_per_epoch: int, *, paired: bool = False,
                           mesh=None, sharded: bool = False,
                           donate: bool = True):
    """Device-cache path: the K-step analogue of ``cached.make_cached_step``.

    The operands (HBM-pinned dataset(s) + this epoch's order vector(s)) are
    CONSTANT across the group — each scan iteration gathers its own batch
    from ``state.step``, which the core increments. K steps therefore
    dispatch one program with ZERO host->device image bytes and no
    per-iteration operands at all.
    """
    from denoising_diffusion_deep_fake_tpu.training.cached import _gatherer

    gather = _gatherer(mesh, batch_size, steps_per_epoch, sharded)

    if paired:
        def step(states, ds_a, ds_b, order_a, order_b, rng):
            def body(carry, _):
                counter = carry["a"].step
                carry, metrics = train_step_core(
                    carry, gather(ds_a, order_a, counter),
                    gather(ds_b, order_b, counter), rng)
                return carry, metrics

            return jax.lax.scan(body, states, None, length=k)
    else:
        def step(state, dataset_u8, order, rng):
            def body(carry, _):
                carry, metrics = train_step_core(
                    carry, gather(dataset_u8, order, carry.step), rng)
                return carry, metrics

            return jax.lax.scan(body, state, None, length=k)

    return jax.jit(step, donate_argnums=(0,) if donate else ())
