"""End-to-end video face swap: train -> checkpoint -> render side-by-side."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from denoising_diffusion_deep_fake_tpu.config import (
    DeepFakeConfig,
    config_from_dict,
)
from denoising_diffusion_deep_fake_tpu.data.video import (
    VideoWriter,
    render_fake_video,
)
from denoising_diffusion_deep_fake_tpu.training.runners import fit_deep_fake

from helpers import make_image_dataset


@pytest.fixture(scope="module")
def trained_checkpoint(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("swap_e2e")
    m_a = make_image_dataset(tmp / "a", n=4, size=32, seed=1)
    m_b = make_image_dataset(tmp / "b", n=4, size=32, seed=2)
    cfg = config_from_dict(DeepFakeConfig, dict(
        mode="denoise", data_path_a=str(m_a), data_path_b=str(m_b),
        noise_exponential_sampling_lambda=3.0, batch_size=2,
        learning_rate=1e-3, max_epochs=1, encoder_name="resnet18",
        compute_dtype="float32", log_dir=str(tmp / "runs"),
        checkpoint_dir=str(tmp / "ckpt")))
    fit_deep_fake(cfg, max_steps=1, verbose=False)
    return tmp, cfg


def _make_video(path, n_frames=5, w=48, h=32):
    rng = np.random.default_rng(3)
    with VideoWriter(path, 12.0, w, h) as writer:
        for _ in range(n_frames):
            writer.write(rng.integers(0, 256, (h, w, 3), dtype=np.uint8))


def test_render_single_pass(trained_checkpoint):
    tmp, cfg = trained_checkpoint
    video = tmp / "in.mp4"
    _make_video(video)
    out = render_fake_video(video, cfg.checkpoint_dir, "a", width=32,
                            height=32, output_path=tmp / "out.mp4",
                            batch_size=4, progress=False)
    assert out.exists() and out.stat().st_size > 0
    cap = cv2.VideoCapture(str(out))
    ok, frame = cap.read()
    n = 1
    while True:
        ok2, _ = cap.read()
        if not ok2:
            break
        n += 1
    cap.release()
    assert ok
    # Side-by-side layout: width doubled.
    assert frame.shape == (32, 64, 3)
    assert n == 5  # every input frame swapped


def test_render_with_ddim_sampler(trained_checkpoint):
    tmp, cfg = trained_checkpoint
    video = tmp / "in2.mp4"
    _make_video(video, n_frames=3)
    out = render_fake_video(video, cfg.checkpoint_dir, "b", width=32,
                            height=32, output_path=tmp / "out_ddim.mp4",
                            batch_size=4, sampler_steps=4, progress=False)
    assert out.exists() and out.stat().st_size > 0
