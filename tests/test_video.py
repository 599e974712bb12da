"""Video tool tests: prep geometry + manifest, writer CM, fps probe."""

import numpy as np
import pytest

from denoising_diffusion_deep_fake_tpu.data.video import (
    VideoWriter,
    probe_fps,
    video_to_center_cropped_images,
)

cv2 = pytest.importorskip("cv2")


def _write_test_video(path, n_frames=6, w=64, h=48, fps=12.0):
    with VideoWriter(path, fps, w, h) as writer:
        rng = np.random.default_rng(0)
        for _ in range(n_frames):
            writer.write(rng.integers(0, 256, (h, w, 3), dtype=np.uint8))
    return path


def test_video_writer_and_probe(tmp_path):
    path = _write_test_video(tmp_path / "t.mp4")
    assert path.exists() and path.stat().st_size > 0
    assert probe_fps(path) == pytest.approx(12.0, rel=0.01)


def test_video_prep_writes_frames_and_manifest(tmp_path):
    path = _write_test_video(tmp_path / "t.mp4", n_frames=5, w=64, h=48)
    out = tmp_path / "frames"
    manifest = video_to_center_cropped_images(path, out, 32, 32)
    assert manifest.exists()
    lines = manifest.read_text().strip().split("\n")
    assert len(lines) == 5
    frame = cv2.imread(str(out / lines[0]))
    assert frame.shape == (32, 32, 3)


def test_prep_center_crops_wide_video(tmp_path):
    # 64x48 -> square target: crop x to center 48 then resize.
    path = _write_test_video(tmp_path / "t.mp4", n_frames=2, w=64, h=48)
    out = tmp_path / "frames"
    manifest = video_to_center_cropped_images(path, out, 24, 24)
    frame = cv2.imread(str(out / manifest.read_text().split()[0]))
    assert frame.shape == (24, 24, 3)


def test_missing_video_raises(tmp_path):
    with pytest.raises(IOError):
        video_to_center_cropped_images(tmp_path / "nope.mp4", tmp_path, 8, 8)
