"""Checkpoint -> inference-ready swap model, shared by video and serving.

The reference's only inference surface is ``predict_fake`` on the deep-fake
LitModule (`/root/reference/d3f/train_deep_fake/lit_module.py:251-300`):
load checkpoint, eval mode, normalize a BGR frame with the *other* identity's
statistics, one U-Net forward, denormalize. This module is the framework
equivalent, factored so both the batch video renderer (``data/video.py``) and
the long-running inference server (``serving/``) share one loading + device
pipeline path.

TPU design points:
* **partial restore** — only the chosen identity's weights + BN stats come
  off disk and onto the device (~1/6th of the checkpoint bytes; matters on
  transfer-limited links),
* **uint8 in / uint8 out** — normalization, the swap forward, optional DDIM
  refinement, and denormalization are one jitted program; host<->device
  transfers carry 4x fewer bytes than float32,
* **on-device PRNG** — the DDIM key derives from a batch counter inside jit,
  so steady-state serving never round-trips a key.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class SwapModel:
    """An inference-ready single-identity face-swap model."""

    trainer: Any                 # DeepFakeTrainer (model topology + predict)
    state: Any                   # ModelState: params + batch_stats only
    mean: tuple                  # de/normalization statistics (other identity,
    std: tuple                   #   reference parity — lit_module.py:253-257)
    cfg: Any                     # DeepFakeConfig from checkpoint hparams
    identity: str                # "a" or "b" — which model swaps


def load_swap_model(checkpoint_path, model_a_or_b: str, *,
                    use_ema: bool = False,
                    image_size: int | None = None) -> SwapModel:
    """Load one identity's swap model from an Orbax checkpoint.

    Parity (`put_video_through_fake_model.py:48-52` + `lit_module.py:251-257`):
    model "a" swaps through model_a but de/normalizes with identity B's
    statistics, and vice versa. ``use_ema`` swaps through the EMA shadow
    (an extension; only available for swap-mode checkpoints).
    """
    from flax import serialization

    from denoising_diffusion_deep_fake_tpu.checkpoint import CheckpointManager
    from denoising_diffusion_deep_fake_tpu.config import (
        DeepFakeConfig, config_from_dict)
    from denoising_diffusion_deep_fake_tpu.training.deep_fake import (
        DeepFakeTrainer)
    from denoising_diffusion_deep_fake_tpu.training.state import ModelState

    if model_a_or_b not in ("a", "b"):
        raise ValueError(f"model_a_or_b must be 'a' or 'b', got {model_a_or_b}")

    manager = CheckpointManager(checkpoint_path)
    meta = manager.read_meta()
    cfg = config_from_dict(DeepFakeConfig, meta["hparams"], validate=False)
    # Checkpoint-first precedence (matches the reference video path,
    # `put_video_through_fake_model.py:48-52`): the trained image_size wins
    # over the caller's display size — the U-Nets are fully convolutional,
    # so trainer.image_size only shapes init/eval_shape, but any future
    # size-dependent parameter must come from the checkpoint, not the caller.
    trainer = DeepFakeTrainer(cfg, steps_per_epoch=1,
                              image_size=cfg.image_size or image_size or 448)

    # Partial restore: only the chosen model's weights + BN stats (plus EMA
    # if requested) — skips optimizer moments and the other identity.
    ckpt_mode = meta["hparams"].get("mode", cfg.mode)
    if use_ema and ckpt_mode != "swap":
        raise ValueError(
            f"checkpoint at {checkpoint_path} was saved in mode="
            f"{ckpt_mode!r} and has no EMA shadows — drop use_ema, or "
            "train in swap mode first")
    shapes = jax.eval_shape(
        lambda: trainer.init_states(jax.random.PRNGKey(0),
                                    with_ema=ckpt_mode == "swap"))
    full_sd = serialization.to_state_dict(shapes)
    wanted_keys = (["ema_params", "ema_batch_stats"] if use_ema
                   else ["params", "batch_stats"])
    subtree = {model_a_or_b: {k: full_sd[model_a_or_b][k]
                              for k in wanted_keys}}
    raw = manager.restore_partial(subtree)[model_a_or_b]
    state = ModelState(step=jnp.zeros((), jnp.int32),
                       params=raw.get("params", raw.get("ema_params")),
                       batch_stats=raw.get("batch_stats",
                                           raw.get("ema_batch_stats")),
                       opt_state=None)

    if model_a_or_b == "a":
        mean, std = cfg.mean_b, cfg.std_b
    else:
        mean, std = cfg.mean_a, cfg.std_a
    return SwapModel(trainer=trainer, state=state, mean=mean, std=std,
                     cfg=cfg, identity=model_a_or_b)


def make_device_pipeline(model: SwapModel, *, sampler_steps: int = 0,
                         transfer: str = "rgb", device=None
                         ) -> Callable[[jax.Array, jax.Array, jax.Array],
                                       jax.Array]:
    """Jit the full uint8->uint8 swap pipeline for one SwapModel.

    Returns ``f(frames_u8, base_key, batch_idx) -> fake_u8``:
    normalize -> swap forward (+ optional scanned DDIM refinement) ->
    denormalize + trunc + clamp, all one XLA program. ``trunc`` (not round)
    matches the reference's float->uint8 cast
    (`lit_module.py:285-300` uses ``.type(torch.uint8)``).

    ``transfer`` picks the host<->device wire format:
    * ``"rgb"`` (default, reference parity): NHWC RGB uint8 both ways.
    * ``"i420"``: 4:2:0-packed uint8 (B, H*3/2, W) both ways — HALF the
      bytes per frame; hosts convert with cv2's I420 routines. Chroma is
      subsampled exactly as the mp4 encoder will anyway, so the rendered
      video keeps full quality while a transfer-limited link doubles fps.
    """
    from denoising_diffusion_deep_fake_tpu.ops.augment import normalise_batch
    from denoising_diffusion_deep_fake_tpu.ops.image import (
        i420_to_rgb, rgb_to_i420)
    from denoising_diffusion_deep_fake_tpu.ops.sampler import swap_refine

    if transfer not in ("rgb", "i420"):
        raise ValueError(f"transfer must be 'rgb' or 'i420', got {transfer!r}")
    predict = model.trainer.make_predict_fake(use_ema=False)
    state = model.state
    if device is not None:
        # Replica placement (multi-device serving): pin the weights to this
        # chip; callers commit the frame batches to the same chip and the
        # compiled program runs there — one independent pipeline per device.
        state = jax.device_put(state, device)
    mean, std = model.mean, model.std
    mean_dev = jnp.asarray(mean, jnp.float32).reshape(1, 1, 1, 3) * 255.0
    std_dev = jnp.asarray(std, jnp.float32).reshape(1, 1, 1, 3) * 255.0

    if sampler_steps > 0:
        # Clip bounds for the DDIM x0-thresholding follow the model's own
        # normalization: pixels in [0,1] map to ((0-m)/s, (1-m)/s). The old
        # hardcoded (-1, 1) was only right for mean=std=0.5; with e.g.
        # ImageNet stats it would clamp legitimate values every step.
        clip = (min((0.0 - m) / s for m, s in zip(mean, std)),
                max((1.0 - m) / s for m, s in zip(mean, std)))

        def swap_batch(x, key):
            return swap_refine(lambda z: predict(state, z), x, key,
                               steps=sampler_steps, clip=clip)
    else:
        def swap_batch(x, key):
            return predict(state, x)

    @jax.jit
    def device_pipeline(frames_u8, key, batch_idx):
        if transfer == "i420":
            rgb255 = i420_to_rgb(frames_u8)
            x = (rgb255 - mean_dev) / std_dev
        else:
            x = normalise_batch(frames_u8, mean, std)
        fake = swap_batch(x, jax.random.fold_in(key, batch_idx))
        fake255 = jnp.clip(jnp.trunc(fake * std_dev + mean_dev), 0, 255)
        if transfer == "i420":
            return rgb_to_i420(fake255)
        return fake255.astype(jnp.uint8)

    prec = model.cfg.resolved_matmul_precision()
    if prec is None:
        return device_pipeline

    # fp32 checkpoints promise reference-parity math: trace under the
    # config's resolved precision so the TPU backend's one-pass-bf16 conv
    # default can't round the forward (config.matmul_precision note). The
    # context must be live at TRACE time, i.e. around the first call.
    def precise_pipeline(frames_u8, key, batch_idx):
        with jax.default_matmul_precision(prec):
            return device_pipeline(frames_u8, key, batch_idx)

    return precise_pipeline


def prepare_frame(frame_bgr: np.ndarray, width: int, height: int) -> np.ndarray:
    """BGR frame of any size -> center-cropped, resized RGB uint8 (H, W, 3).

    Geometry parity with the video prep tool (`video_to_center_cropped_images
    .py:83-100`): crop to the target aspect at the center, cubic resize.
    """
    import cv2

    from denoising_diffusion_deep_fake_tpu.ops.image import center_crop

    frame = center_crop(frame_bgr, width, height)
    if frame.shape[:2] != (height, width):
        frame = cv2.resize(frame, (width, height),
                           interpolation=cv2.INTER_CUBIC)
    return np.ascontiguousarray(frame[..., ::-1])
