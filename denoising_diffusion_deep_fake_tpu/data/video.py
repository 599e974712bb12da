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


def _frame_reader(video_path, width, height, batch_size, out_queue,
                  transfer="rgb"):
    """Reader thread: decode+crop+resize frames into uint8 batches.

    Each queue item is ``(frames_bgr, upload, n_valid)``: the BGR stack for
    the side-by-side display half plus the device upload array — NHWC RGB
    for ``transfer="rgb"``, or (B, H*3/2, W) packed I420 (cv2's SIMD
    converter) for the half-bytes wire format.
    """
    import cv2

    def emit(frames, n_valid):
        stack = np.stack(frames)
        if transfer == "i420":
            upload = np.stack([cv2.cvtColor(f, cv2.COLOR_BGR2YUV_I420)
                               for f in frames])
        else:
            upload = np.ascontiguousarray(stack[..., ::-1])
        out_queue.put((stack, upload, n_valid))

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
                emit(frames, batch_size)
                frames = []
        if frames:
            # Pad the tail to the static batch shape — a different batch
            # size would force a fresh XLA compile (30s+) for one batch.
            n_valid = len(frames)
            frames.extend([frames[-1]] * (batch_size - n_valid))
            emit(frames, n_valid)
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
                      transfer: str = "rgb", progress: bool = True,
                      stats_out: dict | None = None) -> Path:
    """Stream a video through the swap model; write side-by-side real|fake.

    Identity mapping parity (`put_video_through_fake_model.py` +
    `lit_module.py:251-257`): model "a" swaps through model_a but
    de/normalizes with identity B's statistics, and vice versa.

    ``transfer="i420"`` halves host<->device bytes (4:2:0-packed uint8 both
    ways — the same chroma subsampling the mp4 encoder applies afterwards);
    use it on transfer-limited links.
    """
    import cv2
    import jax
    import jax.numpy as jnp

    from denoising_diffusion_deep_fake_tpu.inference import (
        load_swap_model, make_device_pipeline)

    if use_ema is None:
        use_ema = False  # reference swaps through the online model
    model = load_swap_model(checkpoint_path, model_a_or_b, use_ema=use_ema,
                            image_size=height)
    device_pipeline = make_device_pipeline(model, sampler_steps=sampler_steps,
                                           transfer=transfer)

    if output_path is None:
        v = Path(video_path)
        output_path = v.with_name(f"{v.stem}_fake_{model_a_or_b}.mp4")

    fps = probe_fps(video_path)
    frame_queue: queue.Queue = queue.Queue(maxsize=4)
    reader = threading.Thread(
        target=_frame_reader,
        args=(video_path, width, height, batch_size, frame_queue, transfer),
        daemon=True)
    reader.start()

    key = jax.random.PRNGKey(0)
    # Pipelined render (the reference runs strictly sequentially, one frame
    # at a time — SURVEY.md §3.4): a reader thread decodes, the main thread
    # uploads + dispatches device batches, and a writer thread fetches
    # results + encodes. Host<->device transfers release the GIL, so upload
    # of batch k+1 overlaps download of batch k — on transfer-limited links
    # (this TPU tunnel) that doubles throughput.
    result_queue: queue.Queue = queue.Queue(maxsize=3)
    counters = {"frames": 0}

    def writer_main():
        import time as _t

        with VideoWriter(output_path, fps, width * 2, height) as writer:
            while True:
                item = result_queue.get()
                if item is None:
                    return
                frames_bgr, fake_dev, n_valid = item
                fake_u8 = np.asarray(fake_dev)[:n_valid]  # device->host
                frames_bgr = frames_bgr[:n_valid]
                for real_bgr, fake in zip(frames_bgr, fake_u8):
                    if transfer == "i420":
                        fake_bgr = cv2.cvtColor(fake, cv2.COLOR_YUV2BGR_I420)
                    else:
                        fake_bgr = np.ascontiguousarray(fake[..., ::-1])
                    writer.write(cv2.hconcat([real_bgr, fake_bgr]))
                    counters["frames"] += 1
                # Delivered-throughput bookkeeping: batch 0 absorbs the XLA
                # compile, so steady state is measured from its completion.
                now = _t.perf_counter()
                counters.setdefault("t_first_done", now)
                counters["t_last_done"] = now
                counters["delivered_after_first"] = (
                    counters["frames"] - counters.get("first_batch_frames",
                                                      counters["frames"]))
                counters.setdefault("first_batch_frames", counters["frames"])

    import time as _time

    writer_thread = threading.Thread(target=writer_main, daemon=True)
    writer_thread.start()
    batch_idx = 0
    batch_times = []
    t_prev = _time.perf_counter()
    try:
        while True:
            item = frame_queue.get()
            if item is None:
                break
            frames_bgr, upload, n_valid = item
            fake_dev = device_pipeline(jnp.asarray(upload), key, batch_idx)
            result_queue.put((frames_bgr, fake_dev, n_valid))
            now = _time.perf_counter()
            batch_times.append(now - t_prev)
            t_prev = now
            batch_idx += 1
            if progress and batch_idx % 10 == 0:
                print(f"rendered {counters['frames']} frames", flush=True)
    finally:
        result_queue.put(None)
        writer_thread.join()
    if stats_out is not None:
        steady = batch_times[2:] or batch_times
        stats_out["batches"] = batch_idx
        stats_out["first_batch_s"] = batch_times[0] if batch_times else 0.0
        stats_out["steady_batch_s"] = sum(steady) / len(steady) if steady else 0.0
        # Dispatch rate (upper bound; the dispatch loop can run ahead of the
        # writer when the result queue has room):
        stats_out["steady_fps"] = (batch_size / stats_out["steady_batch_s"]
                                   if stats_out["steady_batch_s"] else 0.0)
        # DELIVERED rate: frames actually fetched+encoded after the
        # compile-bearing first batch — the honest end-to-end number.
        span = (counters.get("t_last_done", 0.0)
                - counters.get("t_first_done", 0.0))
        delivered = counters.get("delivered_after_first", 0)
        stats_out["delivered_fps"] = delivered / span if span > 0 else 0.0
        stats_out["frames"] = counters["frames"]
    return Path(output_path)
