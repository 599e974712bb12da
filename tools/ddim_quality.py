"""DDIM-refinement quality evidence: is N-step sampling better than 1-pass?

The reference's swap inference is a SINGLE forward (SURVEY.md §3.4); the
scanned DDIM sampler (`ops/sampler.py`) is this framework's extension. This
tool produces the evidence for whether the extension *improves* anything
(VERDICT r1 weak #7), on real hardware:

1. **Denoise reconstruction** (ground truth exists): train a denoiser, then
   on held-out images corrupted at noise ratios r ∈ {0.3, 0.5, 0.7} compare
   PSNR/SSIM of the single forward vs 10- and 50-step DDIM refinement
   started from the same corrupted input.
2. **Swap structure preservation** (no ground-truth fake exists): after the
   two-phase demo flow (denoise -> modify -> swap), compare PSNR of
   single-pass ``predict_fake`` vs ``swap_refine`` (10/50 steps, r_start
   0.7) against the held-out REAL frame — higher = more structure kept
   while identity statistics shift.

Run with the chip free:  python tools/ddim_quality.py [train_steps] [size]
[batch]. Defaults 300/64/16; the VERDICT-r3 evidence shapes are 256 (the
BASELINE.json configs[3] DDIM operating point) and 448 (the reference's own
data shape) — drop batch accordingly (e.g. 300 256 8, 300 448 4).
Prints one JSON line; record the outcome in BASELINE.md (keep single-pass
the default if refinement does not win — and say so).
"""

from __future__ import annotations

import json
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from train_smoke import make_blob_dataset


def psnr(a, b, peak=2.0):
    mse = float(np.mean((np.asarray(a, np.float32) - np.asarray(b, np.float32)) ** 2))
    return float(10.0 * np.log10(peak ** 2 / mse)) if mse > 0 else float("inf")


def main():
    train_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 16

    import jax
    import jax.numpy as jnp

    from denoising_diffusion_deep_fake_tpu.config import (
        DeepFakeConfig, config_from_dict, config_to_dict, overlay_config)
    from denoising_diffusion_deep_fake_tpu.ops.noise import blend_noise
    from denoising_diffusion_deep_fake_tpu.ops.sampler import (
        ddim_ratio_schedule, ddim_sample, swap_refine)
    from denoising_diffusion_deep_fake_tpu.ops.ssim import ssim
    from denoising_diffusion_deep_fake_tpu.training.runners import fit_deep_fake

    tmp = Path(tempfile.mkdtemp(prefix="ddim_quality_"))
    m_a = make_blob_dataset(tmp / "a", size=size, seed=1,
                            tint=(0.75, 0.35, 0.30))
    m_b = make_blob_dataset(tmp / "b", size=size, seed=2,
                            tint=(0.30, 0.40, 0.75))

    base = dict(
        mode="denoise", data_path_a=str(m_a), data_path_b=str(m_b),
        batch_size=batch, learning_rate=1e-3, max_epochs=10_000,
        encoder_name="resnet34", compute_dtype="bfloat16",
        noise_exponential_sampling_lambda=3.0, ema_update_after_step=0,
        log_dir=str(tmp / "runs"), checkpoint_dir=str(tmp / "ckpt"),
        log_every_n_steps=50)
    cfg = config_from_dict(DeepFakeConfig, base)
    states, trainer, _ = fit_deep_fake(cfg, max_steps=train_steps,
                                       verbose=False)

    # Held-out identity-A images (fresh seed), normalized like training.
    rng = np.random.default_rng(99)
    m_test = make_blob_dataset(tmp / "test", size=size, seed=7,
                               tint=(0.75, 0.35, 0.30))
    from denoising_diffusion_deep_fake_tpu.data import ImageLoader

    test_u8, _ = next(ImageLoader(m_test, batch, shuffle=False).epoch(0))
    x = jnp.asarray(test_u8, jnp.float32) / 255.0 * 2.0 - 1.0  # mean/std 0.5

    state_a = states["a"]

    def predict(z):
        return trainer.model.apply(
            {"params": state_a.params, "batch_stats": state_a.batch_stats},
            z, train=False).astype(z.dtype)

    def ssim01(a, b):
        return float(ssim(jnp.clip((a + 1) / 2, 0, 1),
                          jnp.clip((b + 1) / 2, 0, 1)))

    results = {}
    key = jax.random.PRNGKey(0)
    for r in (0.3, 0.5, 0.7):
        noise = jax.random.normal(jax.random.fold_in(key, int(r * 10)),
                                  x.shape, x.dtype)
        r0 = jnp.full((x.shape[0], 1, 1, 1), r, x.dtype)
        x_r = blend_noise(x, noise, r0)
        single = jax.jit(predict)(x_r)
        row = {"single_psnr": round(psnr(single, x), 2),
               "single_ssim": round(ssim01(single, x), 4)}
        for steps in (10, 50):
            refined = jax.jit(lambda z: ddim_sample(
                predict, z, ddim_ratio_schedule(steps, r_start=r)))(x_r)
            row[f"ddim{steps}_psnr"] = round(psnr(refined, x), 2)
            row[f"ddim{steps}_ssim"] = round(ssim01(refined, x), 4)
        results[f"denoise_r{r}"] = row

    # Phase 2: swap training, then structure preservation of the fake.
    swap_cfg = overlay_config(
        DeepFakeConfig, config_to_dict(cfg),
        {"mode": "swap", "noise_exponential_sampling_lambda": 8.0,
         "log_dir": str(tmp / "runs_swap")})
    states, trainer, _ = fit_deep_fake(swap_cfg, modify_from=cfg.checkpoint_dir,
                                       max_steps=train_steps, verbose=False)
    state_a = states["a"]

    fake_single = jax.jit(predict)(x)
    row = {"single_psnr_vs_real": round(psnr(fake_single, x), 2)}
    for steps in (10, 50):
        fake_ddim = jax.jit(lambda z, k: swap_refine(
            predict, z, k, steps=steps, r_start=0.7))(x, key)
        row[f"ddim{steps}_psnr_vs_real"] = round(psnr(fake_ddim, x), 2)
    results["swap_structure"] = row

    print(json.dumps({"metric": f"ddim_quality_evidence_{size}",
                      "train_steps": train_steps, "size": size,
                      "batch": batch, **results}))


if __name__ == "__main__":
    main()
