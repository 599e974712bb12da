"""Video tools: dataset prep and batched face-swap rendering.

Rebuilds the reference's loose script tools as framework components
(SURVEY.md §2 #14-17):

* ``video_to_center_cropped_images`` — decode, center-crop to target aspect,
  cubic resize, write frames + manifest
  (`/root/reference/d3f/script_tools/video_to_center_cropped_images.py:27-131`),
* ``VideoWriter`` context manager
  (`d3f/script_tools/video_writer_context_manager.py:4-25`),
* ``render_fake_video`` — the swap renderer
  (`d3f/script_tools/put_video_through_fake_model.py:33-145`), re-architected
  for TPU: the reference runs one frame at a time with a host<->device
  round-trip per frame (SURVEY.md §3.4 calls this the throughput bottleneck);
  here frames are **batched**, normalization/denormalization run on-device,
  transfers are uint8, and decode overlaps device compute via a reader thread.
  Single-forward parity mode by default; ``sampler_steps > 0`` switches to the
  scanned DDIM refinement.
"""

from __future__ import annotations

import queue
import threading
from pathlib import Path

import numpy as np

from denoising_diffusion_deep_fake_tpu.ops.image import center_crop


class VideoWriter:
    """Context-managed cv2 mp4 writer (parity with the reference CM)."""

    def __init__(self, path, fps: float, width: int, height: int):
        self.path = str(path)
        self.fps = fps
        self.size = (width, height)
        self.writer = None

    def __enter__(self):
        import cv2

        fourcc = cv2.VideoWriter_fourcc(*"mp4v")
        self.writer = cv2.VideoWriter(self.path, fourcc, self.fps, self.size)
        return self.writer

    def __exit__(self, *exc):
        if self.writer is not None:
            self.writer.release()
        return False


def video_to_center_cropped_images(video_path, output_dir, width: int,
                                   height: int, *, ext: str = "jpg") -> Path:
    """Decode a video into center-cropped, resized frames + manifest."""
    import cv2

    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    capture = cv2.VideoCapture(str(video_path))
    if not capture.isOpened():
        raise IOError(f"cannot open video: {video_path}")
    names = []
    index = 0
    try:
        while True:
            ok, frame = capture.read()
            if not ok:
                break
            frame = center_crop(frame, width, height)
            frame = cv2.resize(frame, (width, height),
                               interpolation=cv2.INTER_CUBIC)
            name = f"{index:06d}.{ext}"
            cv2.imwrite(str(output_dir / name), frame)
            names.append(name)
            index += 1
    finally:
        capture.release()
    manifest = output_dir / "images.txt"
    manifest.write_text("".join(f"{n}\n" for n in names))
    return manifest


def _frame_reader(video_path, width, height, batch_size, out_queue):
    """Reader thread: decode+crop+resize frames into uint8 BGR batches."""
    import cv2

    capture = cv2.VideoCapture(str(video_path))
    try:
        frames = []
        while True:
            ok, frame = capture.read()
            if not ok:
                break
            frame = center_crop(frame, width, height)
            frame = cv2.resize(frame, (width, height),
                               interpolation=cv2.INTER_CUBIC)
            frames.append(frame)
            if len(frames) == batch_size:
                out_queue.put(np.stack(frames))
                frames = []
        if frames:
            out_queue.put(np.stack(frames))
        out_queue.put(None)
    finally:
        capture.release()


def probe_fps(video_path) -> float:
    import cv2

    capture = cv2.VideoCapture(str(video_path))
    try:
        fps = capture.get(cv2.CAP_PROP_FPS)
    finally:
        capture.release()
    return fps or 24.0


def render_fake_video(video_path, checkpoint_path, model_a_or_b: str, *,
                      width: int = 448, height: int = 448,
                      output_path=None, batch_size: int = 8,
                      sampler_steps: int = 0, use_ema: bool | None = None,
                      progress: bool = True) -> Path:
    """Stream a video through the swap model; write side-by-side real|fake.

    Identity mapping parity (`put_video_through_fake_model.py` +
    `lit_module.py:251-257`): model "a" swaps through model_a but
    de/normalizes with identity B's statistics, and vice versa.
    """
    import cv2
    import jax
    import jax.numpy as jnp

    from denoising_diffusion_deep_fake_tpu.checkpoint import CheckpointManager
    from denoising_diffusion_deep_fake_tpu.config import (
        DeepFakeConfig, config_from_dict)
    from denoising_diffusion_deep_fake_tpu.ops.augment import normalise_batch
    from denoising_diffusion_deep_fake_tpu.ops.sampler import swap_refine
    from denoising_diffusion_deep_fake_tpu.training.deep_fake import (
        DeepFakeTrainer)

    manager = CheckpointManager(checkpoint_path)
    meta = manager.read_meta()
    cfg = config_from_dict(DeepFakeConfig, meta["hparams"], validate=False)
    trainer = DeepFakeTrainer(cfg, steps_per_epoch=1,
                              image_size=cfg.image_size or height)
    states, _ = manager.restore(
        lambda: trainer.init_states(jax.random.PRNGKey(0)))

    if model_a_or_b == "a":
        state, mean, std = states["a"], cfg.mean_b, cfg.std_b
    else:
        state, mean, std = states["b"], cfg.mean_a, cfg.std_a
    if use_ema is None:
        use_ema = False  # reference swaps through the online model
    predict = trainer.make_predict_fake(use_ema=use_ema)

    if sampler_steps > 0:
        def swap_batch(x, key):
            return swap_refine(lambda z: predict(state, z), x, key,
                               steps=sampler_steps)
    else:
        def swap_batch(x, key):
            return predict(state, x)

    swap_batch = jax.jit(swap_batch)

    mean_arr = np.asarray(mean, np.float32).reshape(1, 1, 1, 3) * 255.0
    std_arr = np.asarray(std, np.float32).reshape(1, 1, 1, 3) * 255.0

    if output_path is None:
        v = Path(video_path)
        output_path = v.with_name(f"{v.stem}_fake_{model_a_or_b}.mp4")

    fps = probe_fps(video_path)
    frame_queue: queue.Queue = queue.Queue(maxsize=4)
    reader = threading.Thread(
        target=_frame_reader,
        args=(video_path, width, height, batch_size, frame_queue), daemon=True)
    reader.start()

    key = jax.random.PRNGKey(0)
    n_frames = 0
    with VideoWriter(output_path, fps, width * 2, height) as writer:
        batch_idx = 0
        while True:
            frames_bgr = frame_queue.get()
            if frames_bgr is None:
                break
            # BGR -> RGB on host (cheap channel flip), normalize on device.
            rgb = frames_bgr[..., ::-1]
            x = normalise_batch(jnp.asarray(rgb), mean, std)
            fake = swap_batch(x, jax.random.fold_in(key, batch_idx))
            # Denormalize + truncate + clamp like the reference (on device),
            # transfer uint8.
            fake_u8 = np.asarray(jnp.clip(
                jnp.trunc(fake * std_arr + mean_arr), 0, 255).astype(jnp.uint8))
            for real_bgr, fake_rgb in zip(frames_bgr, fake_u8):
                fake_bgr = fake_rgb[..., ::-1]
                writer.write(cv2.hconcat([real_bgr, np.ascontiguousarray(fake_bgr)]))
                n_frames += 1
            batch_idx += 1
            if progress and batch_idx % 10 == 0:
                print(f"rendered {n_frames} frames", flush=True)
    return Path(output_path)
