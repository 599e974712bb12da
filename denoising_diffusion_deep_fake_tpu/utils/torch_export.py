"""Export native checkpoints back to the reference's (torch/Lightning) format.

The inverse of ``utils/torch_import.py``: users migrating INTO this framework
keep their old ``.ckpt`` files working via ``d3f-tpu import``; this module
closes the loop the other way — a model trained (or fine-tuned) here can be
handed back to anyone still running the reference
(`/root/reference/d3f/train_deep_fake/lit_module.py` loads Lightning
checkpoints whose ``state_dict`` uses smp-Unet key names with
``model_a./model_b./ema_model_{a,b}.ema_model.`` prefixes).

It is also the evidence path for the north-star e2e frame-parity number:
train here, export, run the torch replica pipeline on the SAME weights, and
compare swapped frames (tools/quality_convergence.py; BASELINE.md quality
section).

Scope: the resnet/resnext/wide_resnet encoder family + decoder + head — the
reference's own configs all use resnet34 (`denoise_config.yml`). Exporting
another family raises with a pointer here (the per-family inverse renames
are additive work; import covers ALL families).
"""

from __future__ import annotations

import re
from typing import Any

import numpy as np


def _kernel_to_torch(k: np.ndarray) -> np.ndarray:
    """HWIO (flax) -> OIHW (torch)."""
    return np.ascontiguousarray(np.transpose(np.asarray(k), (3, 2, 0, 1)))


def _flatten(tree: dict, prefix: tuple = ()) -> dict[tuple, np.ndarray]:
    out = {}
    for key, value in tree.items():
        path = prefix + (key,)
        if isinstance(value, dict):
            out.update(_flatten(value, path))
        else:
            out[path] = np.asarray(value)
    return out


_BN_PARAM = {"scale": "weight", "bias": "bias"}
_BN_STAT = {"mean": "running_mean", "var": "running_var"}


def export_smp_unet_state_dict(params: dict, batch_stats: dict
                               ) -> dict[str, np.ndarray]:
    """Our Flax U-Net variables -> torch smp-Unet state_dict (numpy values).

    Exact inverse of ``convert_smp_unet_state_dict`` for the resnet family;
    round-trip tested (tests/test_torch_export.py).
    """
    sd: dict[str, np.ndarray] = {}

    def put_bn(torch_prefix: str, leaf: str, value: np.ndarray,
               stat: bool) -> None:
        table = _BN_STAT if stat else _BN_PARAM
        sd[f"{torch_prefix}.{table[leaf]}"] = value

    for stat, tree in ((False, params), (True, batch_stats)):
        for path, value in _flatten(tree).items():
            name, rest = path[0], path[1:]
            if name == "encoder":
                sub = rest[0]
                m = re.fullmatch(r"layer(\d)_(\d+)", sub)
                if m:
                    base = f"encoder.layer{m.group(1)}.{m.group(2)}"
                    child = rest[1]
                    if child == "downsample_conv":
                        sd[f"{base}.downsample.0.weight"] = \
                            _kernel_to_torch(value)
                    elif child == "downsample_bn":
                        put_bn(f"{base}.downsample.1", rest[2], value, stat)
                    elif rest[-1] == "kernel":
                        sd[f"{base}.{child}.weight"] = _kernel_to_torch(value)
                    else:
                        put_bn(f"{base}.{child}", rest[-1], value, stat)
                elif sub == "conv1":
                    sd["encoder.conv1.weight"] = _kernel_to_torch(value)
                elif sub == "bn1":
                    put_bn("encoder.bn1", rest[1], value, stat)
                else:
                    raise ValueError(
                        f"export supports the resnet encoder family only "
                        f"(reference configs use resnet34); cannot map "
                        f"encoder key {'.'.join(path)} — extend "
                        f"utils/torch_export.py for this family")
            elif name.startswith("decoder_block"):
                i = name[len("decoder_block"):]
                conv_block = rest[0]               # conv1 | conv2
                base = f"decoder.blocks.{i}.{conv_block}"
                if rest[1] == "conv":
                    sd[f"{base}.0.weight"] = _kernel_to_torch(value)
                else:
                    put_bn(f"{base}.1", rest[-1], value, stat)
            elif name == "segmentation_head":
                if rest[0] == "kernel":
                    sd["segmentation_head.0.weight"] = _kernel_to_torch(value)
                else:
                    sd["segmentation_head.0.bias"] = np.asarray(value)
            else:
                raise ValueError(f"unmapped flax key {'.'.join(path)}")
    return sd


def export_reference_checkpoint(ckpt_dir, output_path, *,
                                step: int | None = None) -> dict:
    """Native (Orbax) checkpoint -> reference-loadable Lightning ``.ckpt``.

    Produces ``{"state_dict", "hyper_parameters", "epoch", "global_step",
    "pytorch-lightning_version"}`` with smp key names under
    ``model_{a,b}.`` and (swap mode) ``ema_model_{a,b}.ema_model.``
    prefixes, plus ema_pytorch's ``initted``/``step`` buffers. NO
    ``online_model.*`` keys are emitted: the reference constructs its EMA
    with ``include_online_model=False`` (`lit_module.py:63-70`), which
    keeps the online copy OUT of ema_pytorch's state_dict — emitting them
    would make the reference's strict load fail on unexpected keys.
    Caveat: if the installed piqa version registers its SSIM window as a
    persistent buffer (``criterion.*`` keys), the reference must load this
    file with ``strict=False`` (its own ``modify`` flow already does);
    we cannot know piqa's buffer names offline, so none are fabricated.
    Returns the metadata written (for logging/tests).
    """
    import jax
    import torch

    from denoising_diffusion_deep_fake_tpu.checkpoint import CheckpointManager
    from denoising_diffusion_deep_fake_tpu.config import (
        DeepFakeConfig, config_from_dict)
    from denoising_diffusion_deep_fake_tpu.training.deep_fake import (
        DeepFakeTrainer)

    manager = CheckpointManager(ckpt_dir)
    meta = manager.read_meta(step)
    hparams, extra = meta["hparams"], meta.get("extra", {})
    cfg = config_from_dict(DeepFakeConfig, hparams, validate=False)
    trainer = DeepFakeTrainer(cfg, steps_per_epoch=1,
                              image_size=cfg.image_size or 64)
    with_ema = hparams.get("mode", cfg.mode) == "swap"
    states, _ = manager.restore(
        lambda: trainer.init_states(jax.random.PRNGKey(0),
                                    with_ema=with_ema), step=step)

    sd: dict[str, Any] = {}
    for ident in sorted(states):
        state = states[ident]
        model_sd = export_smp_unet_state_dict(state.params,
                                              state.batch_stats)
        for k, v in model_sd.items():
            sd[f"model_{ident}.{k}"] = torch.from_numpy(np.array(v))
        if getattr(state, "ema_params", None) is not None:
            ema_stats = (state.ema_batch_stats
                         if state.ema_batch_stats is not None
                         else state.batch_stats)
            ema_sd = export_smp_unet_state_dict(state.ema_params, ema_stats)
            for k, v in ema_sd.items():
                sd[f"ema_model_{ident}.ema_model.{k}"] = \
                    torch.from_numpy(np.array(v))
            sd[f"ema_model_{ident}.initted"] = torch.tensor(True)
            sd[f"ema_model_{ident}.step"] = torch.tensor(
                int(np.asarray(state.ema_step or 0)))

    global_step = int(extra.get("global_step", meta.get("step", 0)))
    ckpt = {
        "state_dict": sd,
        "hyper_parameters": hparams,
        "epoch": int(extra.get("epoch", 0)),
        "global_step": global_step,
        "pytorch-lightning_version": "1.8.0",  # reference era (SURVEY §1)
    }
    torch.save(ckpt, output_path)
    return {"keys": len(sd), "global_step": global_step,
            "identities": sorted(states)}
