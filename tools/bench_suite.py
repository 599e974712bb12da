"""Extended benchmark suite over the BASELINE.json config ladder.

Measures, on the real chip (run with the TPU free):
  1. 64²  single-identity denoiser train step        (configs[0] shape)
  2. 128² two-identity swap train step               (configs[1])
  3. 256² denoiser with fused on-device augmentation (configs[2])
  4. 256² batched 50-step DDIM swap inference, bf16  (configs[3])
  5. 448² video-shape single-pass swap forward       (configs[4] core op)

All timings use value-fetch barriers (utils/timing.py) — block_until_ready
does not wait on this platform. Prints one JSON line per row; bench.py stays
the driver's single headline. Run individual rows by name:
``python tools/bench_suite.py denoiser64 ddim256``.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from denoising_diffusion_deep_fake_tpu.utils.timing import timed_fn, timed_loop


def report(name, value, unit, **extra):
    print(json.dumps({"metric": name, "value": round(value, 2), "unit": unit,
                      **extra}), flush=True)


def bench_denoiser(size, batch, encoder="resnet34", steps=10, jitter=None):
    from denoising_diffusion_deep_fake_tpu.config import (
        DenoiserConfig, config_from_dict)
    from denoising_diffusion_deep_fake_tpu.training.denoiser import (
        DenoiserTrainer)

    cfg = config_from_dict(DenoiserConfig, dict(
        input_image_list_path="x", batch_size=batch, learning_rate=1e-3,
        encoder_name=encoder, compute_dtype="bfloat16",
        noise_exponential_sampling_lambda=5.0,
        color_jitter=jitter or (0.0,) * 4), validate=False)
    tr = DenoiserTrainer(cfg, steps_per_epoch=1000, image_size=size)
    state = tr.init_state(jax.random.PRNGKey(0))
    step = tr.make_train_step()
    rng = np.random.default_rng(0)
    u8 = jnp.asarray(rng.integers(0, 256, (batch, size, size, 3),
                                  dtype=np.uint8))
    key = jax.random.PRNGKey(1)

    dt, _ = timed_loop(lambda s: step(s, u8, key)[0], state, steps=steps)
    tag = "_jitter" if jitter else ""
    report(f"denoiser_train_{size}px_b{batch}{tag}", batch / dt, "imgs/sec",
           step_ms=round(dt * 1e3, 2))


def bench_jitter_op(size, batch):
    """Chained marginal of the fused color-jitter op alone (448² b16 op
    point): the photometric chain is elementwise + one mean, so the target
    is ~HBM-roundtrip cost; compare against the in-step delta
    (denoiser448 vs denoiser448_jitter) to see what XLA fusion absorbs."""
    import time

    from denoising_diffusion_deep_fake_tpu.ops.color import (
        ColorJitterConfig, color_jitter_normalised, sample_color_jitter_params)
    from denoising_diffusion_deep_fake_tpu.utils.timing import value_barrier

    cfg = ColorJitterConfig(brightness=0.4, contrast=0.4, saturation=0.4,
                            hue=0.1)
    x0 = jnp.asarray(np.random.default_rng(0).random(
        (batch, size, size, 3), np.float32) * 2 - 1, jnp.bfloat16)
    base = jax.random.PRNGKey(0)

    def make_chain(n):
        def fn():
            x = x0
            for i in range(n):
                params = sample_color_jitter_params(
                    jax.random.fold_in(base, i), batch, cfg)
                x = color_jitter_normalised(x, params, [0.5] * 3, [0.5] * 3)
            return x
        return fn

    def run(n):
        fn = jax.jit(make_chain(n))
        value_barrier(fn())
        t0 = time.perf_counter()
        for _ in range(8):
            value_barrier(fn())
        return (time.perf_counter() - t0) / 8

    ms = (run(12) - run(4)) / 8 * 1e3
    report(f"color_jitter_op_{size}px_b{batch}", ms, "ms/op")


def bench_swap_train(size, batch, encoder="resnet34", steps=8,
                     remat="none"):
    from denoising_diffusion_deep_fake_tpu.config import (
        DeepFakeConfig, config_from_dict)
    from denoising_diffusion_deep_fake_tpu.training.deep_fake import (
        DeepFakeTrainer)

    cfg = config_from_dict(DeepFakeConfig, dict(
        mode="swap", data_path_a="x", data_path_b="y", batch_size=batch,
        learning_rate=1e-3, encoder_name=encoder, compute_dtype="bfloat16",
        noise_exponential_sampling_lambda=8.0, ema_update_after_step=0,
        remat=remat), validate=False)
    tr = DeepFakeTrainer(cfg, steps_per_epoch=1000, image_size=size)
    states = tr.init_states(jax.random.PRNGKey(0))
    step = tr.make_train_step()
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, 256, (batch, size, size, 3), dtype=np.uint8))
    b = jnp.asarray(rng.integers(0, 256, (batch, size, size, 3), dtype=np.uint8))
    key = jax.random.PRNGKey(1)

    dt, _ = timed_loop(lambda s: step(s, a, b, key)[0], states, steps=steps)
    # Two models each see `batch` images per step.
    tag = f"_remat_{remat}" if remat != "none" else ""
    report(f"swap_train_{size}px_b{batch}_two_models{tag}", 2 * batch / dt,
           "imgs/sec", step_ms=round(dt * 1e3, 2))


def bench_ddim_swap(size, batch, sampler_steps=50, encoder="resnet34"):
    from denoising_diffusion_deep_fake_tpu.models import create_unet
    from denoising_diffusion_deep_fake_tpu.ops.sampler import swap_refine

    model = create_unet(encoder, dtype=jnp.bfloat16)
    x = jnp.zeros((batch, size, size, 3), jnp.bfloat16)
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
        jax.random.PRNGKey(0), x)

    @jax.jit
    def swap(x, key):
        predict = lambda z: model.apply(variables, z, train=False).astype(
            jnp.bfloat16)
        return swap_refine(predict, x, key, steps=sampler_steps, r_start=0.7)

    key = jax.random.PRNGKey(1)
    dt = timed_fn(swap, x, key, steps=4, warmup=2)
    report(f"ddim{sampler_steps}_swap_{size}px_b{batch}_bf16", batch / dt,
           "imgs/sec", step_ms=round(dt * 1e3, 2),
           sampler_steps_per_sec=round(sampler_steps / dt, 1))


def bench_single_pass_swap(size, batch, encoder="resnet34"):
    from denoising_diffusion_deep_fake_tpu.models import create_unet

    model = create_unet(encoder, dtype=jnp.bfloat16)
    x = jnp.zeros((batch, size, size, 3), jnp.float32)
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
        jax.random.PRNGKey(0), x)
    fwd = jax.jit(lambda x: model.apply(variables, x, train=False))
    dt = timed_fn(fwd, x, steps=8, warmup=3)
    report(f"single_pass_swap_{size}px_b{batch}", batch / dt, "frames/sec",
           step_ms=round(dt * 1e3, 2))


BENCHES = {
    "denoiser64": lambda: bench_denoiser(64, 256),
    "swap128": lambda: bench_swap_train(128, 32),
    # The reference's actual operating point: 448² crops, batch 16,
    # two-identity swap (`denoise_config.yml:13-14`; VERDICT r1 item 3).
    "swap448_train": lambda: bench_swap_train(448, 16, steps=6),
    "denoiser256": lambda: bench_denoiser(256, 32),
    "ddim256": lambda: bench_ddim_swap(256, 8, 50),
    "ddim256_b32": lambda: bench_ddim_swap(256, 32, 50),   # offline throughput
    "swap448": lambda: bench_single_pass_swap(448, 16),
    "swap448_b32": lambda: bench_single_pass_swap(448, 32),
    # Remat at the 448 operating point (VERDICT r3 #2: attack the top sink —
    # grad fwd+bwd is 53% of the step; remat trades recompute for the
    # backward pass's activation reads).
    "swap448_remat_dots": lambda: bench_swap_train(448, 16, steps=6,
                                                   remat="dots"),
    "swap448_remat_full": lambda: bench_swap_train(448, 16, steps=6,
                                                   remat="full"),
    "swap448_b32_train": lambda: bench_swap_train(448, 32, steps=4),
    "swap448_b8_train": lambda: bench_swap_train(448, 8, steps=8),
    # Color-jitter marginal (VERDICT r3 #4): the op alone + the in-step cost.
    "jitter448_op": lambda: bench_jitter_op(448, 16),
    "denoiser448": lambda: bench_denoiser(448, 16, steps=6),
    "denoiser448_jitter": lambda: bench_denoiser(
        448, 16, steps=6, jitter=(0.4, 0.4, 0.4, 0.1)),
}


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    names = sys.argv[1:] or list(BENCHES)
    for name in names:
        BENCHES[name]()


if __name__ == "__main__":
    main()
