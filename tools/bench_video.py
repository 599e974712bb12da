"""End-to-end video face-swap throughput: decode -> swap -> encode fps.

BASELINE.json configs[4]: "Video frame-stream face swap at 24 fps". This
measures the real pipeline (`data/video.render_fake_video`): host decode +
center-crop + resize on a reader thread, batched device swap, host encode.

Run with the chip free:
    python tools/bench_video.py [n_frames] [size] [batch]
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 240
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 448
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    transfer = sys.argv[4] if len(sys.argv) > 4 else "rgb"

    import numpy as np
    import jax

    from denoising_diffusion_deep_fake_tpu.config import (
        DeepFakeConfig, config_from_dict, config_to_dict)
    from denoising_diffusion_deep_fake_tpu.checkpoint import CheckpointManager
    from denoising_diffusion_deep_fake_tpu.data.video import (
        VideoWriter, render_fake_video)
    from denoising_diffusion_deep_fake_tpu.training.deep_fake import (
        DeepFakeTrainer)

    tmp = Path(tempfile.mkdtemp(prefix="bench_video_"))

    # Synthesize an input video at the target size.
    rng = np.random.default_rng(0)
    video = tmp / "in.mp4"
    with VideoWriter(video, 24.0, size, size) as writer:
        frame = rng.integers(0, 256, (size, size, 3), dtype=np.uint8)
        for i in range(n_frames):
            # cheap motion: roll the frame so the codec has work to do
            writer.write(np.roll(frame, i * 3, axis=1))

    # Fresh checkpoint (weights random — throughput is shape-bound). Init at
    # 64² in denoise mode: params are resolution-independent (fully conv)
    # and the video path loads one model's weights only, so this cuts bench
    # SETUP from ~7 min (two 448² on-device inits + ~600 MB state fetch over
    # the ~20 MB/s tunnel) to under a minute without changing what is
    # measured.
    cfg = config_from_dict(DeepFakeConfig, dict(
        mode="denoise", data_path_a="x", data_path_b="y", batch_size=batch,
        encoder_name="resnet34", compute_dtype="bfloat16", image_size=size,
        checkpoint_dir=str(tmp / "ckpt")), validate=False)
    trainer = DeepFakeTrainer(cfg, steps_per_epoch=1, image_size=64)
    states = trainer.init_states(jax.random.PRNGKey(0))
    CheckpointManager(cfg.checkpoint_dir).save(0, states,
                                               config_to_dict(cfg))

    stats: dict = {}
    t0 = time.perf_counter()
    out = render_fake_video(video, cfg.checkpoint_dir, "a", width=size,
                            height=size, output_path=tmp / "out.mp4",
                            batch_size=batch, progress=False,
                            transfer=transfer, stats_out=stats)
    elapsed = time.perf_counter() - t0
    assert out.exists()
    fps = n_frames / elapsed
    print(json.dumps({
        "metric": f"video_swap_end_to_end_{size}px_{transfer}",
        "value": round(fps, 1), "unit": "fps",
        "steady_fps_dispatch": round(stats.get("steady_fps", 0.0), 1),
        "delivered_fps": round(stats.get("delivered_fps", 0.0), 1),
        "first_batch_s": round(stats.get("first_batch_s", 0.0), 1),
        "n_frames": n_frames, "batch": batch,
        "vs_24fps_target": round(stats.get("delivered_fps", fps) / 24.0, 2),
        "note": "delivered_fps = fetched+encoded frames/s after the compile batch",
    }))


if __name__ == "__main__":
    main()
