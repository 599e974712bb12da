"""Converged-model quality evidence (VERDICT r2 #6): train the two-identity
swap workload to convergence on structured synthetic data, then measure

1. **e2e frame parity** — swapped uint8 frames from OUR full device pipeline
   vs the torch replica running the reference's ``predict_fake`` math
   (`/root/reference/d3f/train_deep_fake/lit_module.py:251-300`) on the SAME
   weights (via ``utils/torch_export.py``). North-star gate: PSNR > 40 dB.
2. **swap capability** — the converged model actually maps identity A frames
   into identity B's statistics (tint distance collapses toward B), and
   denoising reconstruction PSNR on held-out frames.
3. a rendered side-by-side real|fake **video artifact**.

Synthetic faces (not pure noise): smooth blob background + identity-specific
face geometry (A: wide warm ellipse, round eyes; B: narrow cool ellipse,
slit eyes), randomly placed — enough shared structure that the denoisers
must learn shape + color statistics, so the EMA cross-feed produces real
identity mapping rather than color-shift alone.

Usage:  python tools/quality_convergence.py [denoise_steps swap_steps size
        batch]
Defaults 1500/2500/64; runs on whatever jax.devices() offers (TPU when the
tunnel is up — CPU works for a miniature smoke at ~50/50 steps).
Prints one JSON line; writes artifacts under artifacts/quality/.
"""

from __future__ import annotations

import json
import math
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

SIZE_DEFAULT = 64


# ---------------------------------------------------------------- synthetic


def draw_face(size: int, rng, identity: str) -> np.ndarray:
    """One synthetic 'face' frame: blob background + identity geometry."""
    import cv2

    small = rng.random((6, 6, 3)).astype(np.float32) * 0.25 + 0.1
    img = cv2.resize(small, (size, size), interpolation=cv2.INTER_CUBIC)

    cx = int(size * (0.5 + 0.12 * (rng.random() - 0.5)))
    cy = int(size * (0.5 + 0.12 * (rng.random() - 0.5)))
    if identity == "a":
        axes = (int(size * 0.30), int(size * 0.36))
        face_color = (0.85, 0.62, 0.50)   # warm
        eye = "round"
    else:
        axes = (int(size * 0.20), int(size * 0.38))
        face_color = (0.55, 0.62, 0.85)   # cool
        eye = "slit"
    cv2.ellipse(img, (cx, cy), axes, 0, 0, 360, face_color, -1)
    for dx in (-1, 1):
        ex = cx + dx * axes[0] // 2
        ey = cy - axes[1] // 4
        if eye == "round":
            cv2.circle(img, (ex, ey), max(2, size // 16), (0.1, 0.1, 0.15),
                       -1)
        else:
            cv2.ellipse(img, (ex, ey), (max(2, size // 10),
                                        max(1, size // 32)), 0, 0, 360,
                        (0.1, 0.1, 0.15), -1)
    cv2.ellipse(img, (cx, cy + axes[1] // 2), (axes[0] // 2, size // 20),
                0, 0, 180, (0.35, 0.15, 0.15), -1)
    return np.clip(img * 255, 0, 255).astype(np.uint8)


def make_face_dataset(root: Path, identity: str, n: int, size: int,
                      seed: int) -> Path:
    import cv2

    rng = np.random.default_rng(seed)
    root.mkdir(parents=True, exist_ok=True)
    names = []
    for i in range(n):
        cv2.imwrite(str(root / f"{i:04d}.jpg"),
                    cv2.cvtColor(draw_face(size, rng, identity),
                                 cv2.COLOR_RGB2BGR),
                    [cv2.IMWRITE_JPEG_QUALITY, 95])
        names.append(f"{i:04d}.jpg")
    manifest = root / "images.txt"
    manifest.write_text("".join(f"{x}\n" for x in names))
    return manifest


# ---------------------------------------------------------------- metrics


def psnr(a: np.ndarray, b: np.ndarray, peak: float = 255.0) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    return float("inf") if mse == 0 else 10.0 * math.log10(peak * peak / mse)


def ssim_u8(a: np.ndarray, b: np.ndarray) -> float:
    """SSIM via the framework's own piqa-parity op (ops/ssim.py)."""
    import jax.numpy as jnp

    from denoising_diffusion_deep_fake_tpu.ops.ssim import ssim

    return float(ssim(jnp.asarray(a, jnp.float32)[None] / 255.0,
                      jnp.asarray(b, jnp.float32)[None] / 255.0))


def torch_reference_swap(ckpt_export_path, frames_u8: np.ndarray,
                         identity: str, hparams: dict) -> np.ndarray:
    """The reference's predict_fake math on the torch replica: normalize a
    frame with the model's input stats, one eval forward through the
    EXPORTED weights, denormalize with the other identity's stats, trunc to
    uint8 (`lit_module.py:251-300`; ``.type(torch.uint8)`` truncates)."""
    import torch

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from torch_cpu_baseline import UnetSMP

    ckpt = torch.load(ckpt_export_path, map_location="cpu",
                      weights_only=False)
    sd = {}
    prefix = f"model_{identity}."
    for k, v in ckpt["state_dict"].items():
        if not k.startswith(prefix):
            continue
        k = k[len(prefix):]
        k = k.replace("decoder.blocks.", "blocks.")
        k = k.replace("segmentation_head.0.", "head.")
        if k.startswith("encoder.layer"):
            li = int(k[len("encoder.layer")])
            k = f"encoder.layers.{li - 1}" + k[len("encoder.layerX"):]
            k = k.replace(".downsample.", ".down.")
        sd[k] = v
    model = UnetSMP(hparams["encoder_name"])
    missing, unexpected = model.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected
    model.eval()

    # The reference normalizes AND denormalizes with the OTHER identity's
    # statistics (predict_fake('a') passes mean_b/std_b for both directions,
    # `lit_module.py:253-254, 262-266`) — same stats in, same stats out.
    other = "b" if identity == "a" else "a"
    mean = np.asarray(hparams[f"mean_{other}"], np.float32) * 255.0
    std = np.asarray(hparams[f"std_{other}"], np.float32) * 255.0

    x = (frames_u8.astype(np.float32) - mean) / std
    with torch.no_grad():
        y = model(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    y = np.transpose(y, (0, 2, 3, 1)) * std + mean
    return np.clip(np.trunc(y), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------- main


def main():
    denoise_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
    swap_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 2500
    size = int(sys.argv[3]) if len(sys.argv) > 3 else SIZE_DEFAULT
    # Train batch override: the fp32 default of 32 exceeds HBM at the
    # reference's 448^2 operating point; pass e.g. 8 there.
    batch = int(sys.argv[4]) if len(sys.argv) > 4 else 32

    import jax

    from denoising_diffusion_deep_fake_tpu.config import (
        DeepFakeConfig, config_from_dict, config_to_dict, overlay_config)
    from denoising_diffusion_deep_fake_tpu.inference import (
        load_swap_model, make_device_pipeline)
    from denoising_diffusion_deep_fake_tpu.utils.torch_export import (
        export_reference_checkpoint)

    tmp = Path(tempfile.mkdtemp(prefix="quality_"))
    artifacts = Path(__file__).resolve().parent.parent / "artifacts" / \
        "quality"
    artifacts.mkdir(parents=True, exist_ok=True)

    n_train = 128
    m_a = make_face_dataset(tmp / "a", "a", n_train, size, seed=10)
    m_b = make_face_dataset(tmp / "b", "b", n_train, size, seed=20)

    base = dict(
        mode="denoise", data_path_a=str(m_a), data_path_b=str(m_b),
        batch_size=batch, learning_rate=1e-3, max_epochs=100_000,
        encoder_name="resnet34", compute_dtype="float32", image_size=size,
        noise_exponential_sampling_lambda=3.0, ema_update_after_step=0,
        log_dir=str(tmp / "runs"), checkpoint_dir=str(tmp / "ckpt"),
        log_every_n_steps=50)
    cfg = config_from_dict(DeepFakeConfig, base)

    from denoising_diffusion_deep_fake_tpu.training.runners import (
        fit_deep_fake)

    t0 = time.perf_counter()
    losses = {"denoise": [], "swap": [], "swap_difference": []}

    def track_denoise(step, states, metrics):
        losses["denoise"].append(float(metrics["loss_denoise/train_a"]))

    def track_swap(step, states, metrics):
        losses["swap"].append(float(metrics["loss_swap/train_a"]))
        losses["swap_difference"].append(
            float(metrics["swap_difference/a"]))

    fit_deep_fake(cfg, max_steps=denoise_steps, verbose=False,
                  step_callback=track_denoise)
    swap_cfg = overlay_config(
        DeepFakeConfig, config_to_dict(cfg),
        {"mode": "swap", "noise_exponential_sampling_lambda": 8.0,
         "log_dir": str(tmp / "runs_swap")})
    fit_deep_fake(swap_cfg, modify_from=cfg.checkpoint_dir,
                  max_steps=swap_steps, verbose=False,
                  step_callback=track_swap)
    train_s = time.perf_counter() - t0

    # Held-out frames of identity A.
    rng = np.random.default_rng(99)
    frames_a = np.stack([draw_face(size, rng, "a") for _ in range(16)])

    # OUR pipeline: uint8 -> normalize -> forward -> denormalize -> uint8.
    model = load_swap_model(cfg.checkpoint_dir, "a", image_size=size)
    pipeline = make_device_pipeline(model, sampler_steps=0)
    import jax.numpy as jnp
    ours = np.asarray(pipeline(jnp.asarray(frames_a), jax.random.PRNGKey(0),
                               jnp.zeros((), jnp.int32)))

    # Reference math on the SAME weights via export.
    export_path = tmp / "exported.ckpt"
    export_reference_checkpoint(cfg.checkpoint_dir, export_path)
    hparams = config_to_dict(
        config_from_dict(DeepFakeConfig, config_to_dict(swap_cfg)))
    theirs = torch_reference_swap(export_path, frames_a, "a", hparams)

    frame_psnr = psnr(ours, theirs)
    frame_ssim = float(np.mean([ssim_u8(o, t) for o, t in
                                zip(ours, theirs)]))

    # Capability: swapped frames move toward identity B's color statistics.
    tint_a = np.asarray([draw_face(size, rng, "a") for _ in range(8)]) \
        .mean(axis=(0, 1, 2))
    tint_b = np.asarray([draw_face(size, rng, "b") for _ in range(8)]) \
        .mean(axis=(0, 1, 2))
    fake_tint = ours.mean(axis=(0, 1, 2))
    d_real_a = float(np.linalg.norm(tint_a - tint_b))
    d_fake_b = float(np.linalg.norm(fake_tint - tint_b))

    # Video artifact: feed identity-A frames as an mp4, render real|fake.
    import cv2

    from denoising_diffusion_deep_fake_tpu.data.video import (
        VideoWriter, render_fake_video)

    src_video = tmp / "a_src.mp4"
    with VideoWriter(str(src_video), fps=12, width=size,
                     height=size) as writer:
        vid_rng = np.random.default_rng(7)
        for _ in range(48):
            writer.write(cv2.cvtColor(draw_face(size, vid_rng, "a"),
                                      cv2.COLOR_RGB2BGR))
    out_video = artifacts / f"swap_a_to_b_{size}.mp4"
    render_fake_video(src_video, cfg.checkpoint_dir, "a", width=size,
                      height=size, output_path=out_video,
                      batch_size=16, progress=False)

    result = {
        "metric": "e2e_frame_parity_psnr_db",
        "value": round(frame_psnr, 1),
        "unit": "dB",
        "gate": "north-star > 40 dB",
        "frame_ssim": round(frame_ssim, 4),
        "denoise_loss_first_last": [round(losses["denoise"][0], 4),
                                    round(losses["denoise"][-1], 4)],
        "swap_loss_first_last": [round(losses["swap"][0], 4),
                                 round(losses["swap"][-1], 4)],
        "swap_difference_first_last": [
            round(losses["swap_difference"][0], 4),
            round(losses["swap_difference"][-1], 4)],
        "tint_dist_realA_to_B": round(d_real_a, 2),
        "tint_dist_fake_to_B": round(d_fake_b, 2),
        "steps": [denoise_steps, swap_steps],
        "size": size,
        "batch": batch,
        "train_seconds": round(train_s, 1),
        "video_artifact": str(out_video),
        "platform": jax.devices()[0].platform,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
