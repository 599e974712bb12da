"""Learning-dynamics smoke: train the 64² denoiser on-chip, watch loss fall.

Exercises the FULL production path — native C++ decode, prefetch threads,
on-device augment+noise, fused train step, TB logging, checkpointing — on
real hardware, and verifies the model actually learns (loss drops
substantially from its first-step value).

Run with the chip free:  python tools/train_smoke.py [steps]
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def make_blob_dataset(root: Path, n=64, size=64, seed=0, tint=None) -> Path:
    """Smooth random blobs — learnable structure, unlike pure noise.

    ``tint`` (RGB triple in [0,1]) biases every image toward one identity's
    color statistics (the e2e swap demo's two-identity datasets)."""
    import cv2
    import numpy as np

    rng = np.random.default_rng(seed)
    root.mkdir(parents=True, exist_ok=True)
    names = []
    for i in range(n):
        small = rng.random((8, 8, 3)).astype(np.float32)
        img = cv2.resize(small, (size, size), interpolation=cv2.INTER_CUBIC)
        if tint is not None:
            img = 0.35 * img + 0.65 * np.asarray(tint, np.float32)
        img = np.clip(img * 255, 0, 255).astype(np.uint8)
        cv2.imwrite(str(root / f"{i:04d}.jpg"), img,
                    [cv2.IMWRITE_JPEG_QUALITY, 95])
        names.append(f"{i:04d}.jpg")
    manifest = root / "images.txt"
    manifest.write_text("".join(f"{x}\n" for x in names))
    return manifest


def main():
    max_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 150

    from denoising_diffusion_deep_fake_tpu.config import (
        DenoiserConfig, config_from_dict)
    from denoising_diffusion_deep_fake_tpu.training.runners import fit_denoiser

    tmp = Path(tempfile.mkdtemp(prefix="train_smoke_"))
    manifest = make_blob_dataset(tmp / "data", n=64, size=64)

    cfg = config_from_dict(DenoiserConfig, dict(
        input_image_list_path=str(manifest), batch_size=32,
        learning_rate=1e-3, max_epochs=1000, encoder_name="resnet34",
        compute_dtype="bfloat16", noise_exponential_sampling_lambda=5.0,
        log_dir=str(tmp / "runs"), checkpoint_dir=str(tmp / "ckpt"),
        log_every_n_steps=10))

    t0 = time.perf_counter()
    state, trainer, ctx = fit_denoiser(cfg, max_steps=max_steps, verbose=False)
    elapsed = time.perf_counter() - t0

    # Read back the logged losses from TensorBoard events.
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator)

    run_dir = str(Path(cfg.log_dir) / "denoiser")
    acc = EventAccumulator(run_dir)
    acc.Reload()
    losses = [(e.step, e.value) for e in acc.Scalars("loss")]
    first, last = losses[0][1], losses[-1][1]
    print(json.dumps({
        "metric": "denoiser_train_smoke_64px",
        "steps": max_steps, "wall_s": round(elapsed, 1),
        "first_loss": round(first, 4), "last_loss": round(last, 4),
        "loss_drop_pct": round(100 * (1 - last / first), 1),
        "learned": bool(last < 0.6 * first),
    }))


if __name__ == "__main__":
    main()
