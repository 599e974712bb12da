"""Import reference (torch/Lightning) checkpoints into this framework.

The reference trains ``segmentation_models_pytorch.Unet`` models inside
Lightning modules (`/root/reference/d3f/train_deep_fake/lit_module.py:53-59`),
so existing users have ``.ckpt`` files with torch state_dicts. This module
maps those weights onto our Flax U-Net (whose topology is an exact parity
rebuild — see ``models/unet.py``), enabling:

* bit-comparable fp32 forward parity checks against the reference (the
  north-star PSNR > 40 dB gate is measured with imported weights), and
* migration: swap videos through an existing reference checkpoint on TPU.

Layout conventions translated:
* conv weights  OIHW (torch) -> HWIO (flax): ``transpose(2, 3, 1, 0)``,
* BN ``weight/bias`` -> ``scale/bias`` params; ``running_mean/var`` ->
  ``batch_stats`` ``mean/var``,
* torchvision encoder naming (``layer1.0.conv1``) -> our flat block names
  (``layer1_0/conv1``); smp decoder ``blocks.N.convK.{0,1}`` (Sequential
  conv/bn) -> ``decoder_blockN/convK/{conv,bn}``.

Only numpy is required here; loading the ``.ckpt`` needs torch (baked in,
CPU-only is fine).
"""

from __future__ import annotations

import re
from typing import Any

import numpy as np


def _set(tree: dict, path: list[str], value: np.ndarray) -> None:
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = value


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


_BN_PARAM = {"weight": "scale", "bias": "bias"}
_BN_STAT = {"running_mean": "mean", "running_var": "var"}


def convert_smp_unet_state_dict(sd: dict[str, np.ndarray]) -> tuple[dict, dict]:
    """torch smp-Unet state_dict (numpy values) -> (params, batch_stats)."""
    params: dict = {}
    stats: dict = {}
    unused = []
    # VGG encoders interleave convs (which have biases) and BNs in one flat
    # ``features`` list — which indices are BNs is only visible from their
    # running stats, so scan once up front.
    vgg_bn_indices = {p[2] for k in sd
                      if (p := k.split("."))[0] == "encoder"
                      and len(p) == 4 and p[1] == "features"
                      and p[3] == "running_mean"}
    for name, value in sd.items():
        parts = name.split(".")
        if parts[-1] == "num_batches_tracked":
            continue
        handled = _convert_entry(parts, np.asarray(value), params, stats,
                                 vgg_bn_indices)
        if not handled:
            unused.append(name)
    if unused:
        raise ValueError(f"unmapped torch keys: {unused[:8]}"
                         f"{'...' if len(unused) > 8 else ''}")
    return params, stats


def _convert_entry(parts: list[str], value: np.ndarray, params: dict,
                   stats: dict, vgg_bn_indices: set | frozenset = frozenset()
                   ) -> bool:
    leaf = parts[-1]

    # ---- encoder ----
    if parts[0] == "encoder":
        if parts[1] == "features":
            return _features_entry(parts, leaf, value, params, stats,
                                   vgg_bn_indices)
        # EfficientNet (efficientnet-pytorch naming): encoder._conv_stem /
        # ._bn0 / ._blocks.{i}._{module}.{leaf} -> flattened flax names
        # (models/efficientnet.py).
        if parts[1] == "_conv_stem" and leaf == "weight":
            _set(params, ["encoder", "conv_stem", "kernel"],
                 _conv_kernel(value))
            return True
        if parts[1] == "_bn0":
            return _bn_entry(["encoder", "bn0"], leaf, value, params, stats)
        if parts[1] == "_blocks" and len(parts) == 5:
            name = f"blocks_{parts[2]}_{parts[3].lstrip('_')}"
            if "conv" in parts[3] or "_se_" in parts[3]:
                if leaf == "weight":
                    _set(params, ["encoder", name, "kernel"],
                         _conv_kernel(value))
                    return True
                if leaf == "bias":  # SE convs carry biases
                    _set(params, ["encoder", name, "bias"], value)
                    return True
                return False
            return _bn_entry(["encoder", name], leaf, value, params, stats)
        if parts[1] == "conv1" and leaf == "weight":
            _set(params, ["encoder", "conv1", "kernel"], _conv_kernel(value))
            return True
        if parts[1] == "bn1":
            return _bn_entry(["encoder", "bn1"], leaf, value, params, stats)
        # SE-Net stem (pretrainedmodels): encoder.layer0.{conv,bn}{i}.<leaf>
        # -> flattened layer0_conv{i} / layer0_bn{i} (models/senet.py).
        if parts[1] == "layer0":
            if parts[2].startswith("conv") and leaf == "weight":
                _set(params, ["encoder", f"layer0_{parts[2]}", "kernel"],
                     _conv_kernel(value))
                return True
            if parts[2].startswith("bn"):
                return _bn_entry(["encoder", f"layer0_{parts[2]}"], leaf,
                                 value, params, stats)
            return False
        # Inception-ResNet-v2 (Cadene named attributes): BasicConv2d stems
        # (conv2d_*), mixed_5b/6a/7a branch modules, repeat/repeat_1/repeat_2
        # Sequentials of residual blocks (flattened to repeat[_k]_{i}), and
        # the standalone block8 (distinguished from xception's block8 by its
        # branch*/conv2d children).
        if parts[1].startswith("conv2d_") or parts[1].startswith("mixed_"):
            return _ir_module_entry(["encoder", parts[1]], parts[2:], leaf,
                                    value, params, stats)
        if parts[1] in ("repeat", "repeat_1", "repeat_2") and len(parts) > 3:
            return _ir_module_entry(["encoder", f"{parts[1]}_{parts[2]}"],
                                    parts[3:], leaf, value, params, stats)
        if parts[1] == "block8" and parts[2] in ("branch0", "branch1",
                                                 "conv2d"):
            return _ir_module_entry(["encoder", "block8"], parts[2:], leaf,
                                    value, params, stats)
        # Xception (Cadene naming; models/xception.py mirrors the torch
        # Sequential indices): encoder.block{i}.rep.{j}.{conv1|pointwise}
        # (SeparableConv2d) or a BN directly at index j; skip/skipbn;
        # stem conv2/bn2 and the deep conv3/conv4 SeparableConvs + bn3/bn4.
        if re.fullmatch(r"block\d+", parts[1]):
            blk = parts[1]
            if parts[2] == "rep":
                name = f"rep{parts[3]}"
                if len(parts) == 6 and parts[4] in ("conv1", "pointwise"):
                    if leaf == "weight":
                        _set(params, ["encoder", blk, name, parts[4],
                                      "kernel"], _conv_kernel(value))
                        return True
                    return False
                return _bn_entry(["encoder", blk, name], leaf, value,
                                 params, stats)
            if parts[2] == "skip" and leaf == "weight":
                _set(params, ["encoder", blk, "skip", "kernel"],
                     _conv_kernel(value))
                return True
            if parts[2] == "skipbn":
                return _bn_entry(["encoder", blk, "skipbn"], leaf, value,
                                 params, stats)
            return False
        if parts[1] == "conv2" and len(parts) == 3 and leaf == "weight":
            _set(params, ["encoder", "conv2", "kernel"], _conv_kernel(value))
            return True
        if parts[1] in ("bn2", "bn3", "bn4"):
            return _bn_entry(["encoder", parts[1]], leaf, value, params,
                             stats)
        if (parts[1] in ("conv3", "conv4") and len(parts) == 4
                and parts[2] in ("conv1", "pointwise") and leaf == "weight"):
            _set(params, ["encoder", parts[1], parts[2], "kernel"],
                 _conv_kernel(value))
            return True
        m = re.fullmatch(r"layer(\d)", parts[1])
        if m:
            block = f"layer{m.group(1)}_{parts[2]}"
            sub = parts[3]
            if sub == "se_module":
                # encoder.layerL.i.se_module.fc{1,2}.{weight,bias} -> se_fc{k}
                if leaf == "weight":
                    _set(params, ["encoder", block, f"se_{parts[4]}",
                                  "kernel"], _conv_kernel(value))
                    return True
                if leaf == "bias":
                    _set(params, ["encoder", block, f"se_{parts[4]}", "bias"],
                         value)
                    return True
                return False
            if sub.startswith("conv") and leaf == "weight":
                _set(params, ["encoder", block, sub, "kernel"],
                     _conv_kernel(value))
                return True
            if sub.startswith("bn"):
                return _bn_entry(["encoder", block, sub], leaf, value,
                                 params, stats)
            if sub == "downsample":
                if parts[4] == "0" and leaf == "weight":
                    _set(params, ["encoder", block, "downsample_conv",
                                  "kernel"], _conv_kernel(value))
                    return True
                if parts[4] == "1":
                    return _bn_entry(["encoder", block, "downsample_bn"],
                                     leaf, value, params, stats)
        return False

    # ---- decoder ----
    if parts[0] == "decoder" and parts[1] == "center":
        # vgg-only CenterBlock: decoder.center.<i>.{0,1}.<leaf> with i the
        # Conv2dReLU index (0|1), 0=conv / 1=bn -> center_conv{i+1}/{conv,bn}.
        block = f"center_conv{int(parts[2]) + 1}"
        if parts[3] == "0" and leaf == "weight":
            _set(params, [block, "conv", "kernel"], _conv_kernel(value))
            return True
        if parts[3] == "1":
            return _bn_entry([block, "bn"], leaf, value, params, stats)
        return False
    if parts[0] == "decoder" and parts[1] == "blocks":
        block = f"decoder_block{parts[2]}"
        conv_block = parts[3]  # conv1 | conv2
        which = parts[4]       # 0 = conv, 1 = bn (smp Conv2dReLU Sequential)
        if which == "0" and leaf == "weight":
            _set(params, [block, conv_block, "conv", "kernel"],
                 _conv_kernel(value))
            return True
        if which == "1":
            return _bn_entry([block, conv_block, "bn"], leaf, value,
                             params, stats)
        return False

    # ---- segmentation head ----
    if parts[0] == "segmentation_head" and parts[1] == "0":
        if leaf == "weight":
            _set(params, ["segmentation_head", "kernel"], _conv_kernel(value))
            return True
        if leaf == "bias":
            _set(params, ["segmentation_head", "bias"], value)
            return True
    return False


def _ir_module_entry(base: list[str], rest: list[str], leaf: str,
                     value: np.ndarray, params: dict, stats: dict) -> bool:
    """Keys inside one Cadene inception-resnet module (after its name):
    ``{conv,bn}.<leaf>`` (BasicConv2d body), ``conv2d.<leaf>`` (the plain
    biased up-projection), ``branchX[.j].{conv,bn}.<leaf>``."""
    if len(rest) == 2 and rest[0] in ("conv", "bn"):
        if rest[0] == "conv":
            if leaf == "weight":
                _set(params, base + ["conv", "kernel"], _conv_kernel(value))
                return True
            return False
        return _bn_entry(base + ["bn"], leaf, value, params, stats)
    if len(rest) == 2 and rest[0] == "conv2d":
        if leaf == "weight":
            _set(params, base + ["conv2d", "kernel"], _conv_kernel(value))
            return True
        if leaf == "bias":
            _set(params, base + ["conv2d", "bias"], value)
            return True
        return False
    if rest and rest[0].startswith("branch"):
        if len(rest) == 3:
            name, sub = rest[0], rest[1]
        elif len(rest) == 4:
            name, sub = f"{rest[0]}_{rest[1]}", rest[2]
        else:
            return False
        if sub == "conv" and leaf == "weight":
            _set(params, base + [name, "conv", "kernel"],
                 _conv_kernel(value))
            return True
        if sub == "bn":
            return _bn_entry(base + [name, "bn"], leaf, value, params, stats)
    return False


def _features_entry(parts: list[str], leaf: str, value: np.ndarray,
                    params: dict, stats: dict,
                    vgg_bn_indices: set | frozenset) -> bool:
    """``encoder.features.*`` keys: VGG's flat conv/bn list, MobileNetV2's
    stem/InvertedResidual/head Sequentials, and DenseNet's named children
    (conv0/norm0, denseblock/denselayer, transition, norm5).

    Flax module names mirror the torchvision indices (``features_{i}``,
    ``conv_{k}[_{j}]`` — see models/vgg.py and models/mobilenet.py), so this
    is a mechanical rename plus the usual OIHW->HWIO kernel transpose.
    """
    idx = parts[2]

    # DenseNet: named (non-numeric) children of ``features``.
    if not idx.isdigit():
        if idx == "conv0" and leaf == "weight":
            _set(params, ["encoder", "conv0", "kernel"], _conv_kernel(value))
            return True
        if idx in ("norm0", "norm5"):
            return _bn_entry(["encoder", idx], leaf, value, params, stats)
        if idx.startswith("denseblock") and len(parts) == 6:
            # encoder.features.denseblock{i}.denselayer{j}.<mod>.<leaf>
            name = f"{idx}_{parts[3]}_{parts[4]}"
            if parts[4].startswith("conv"):
                if leaf == "weight":
                    _set(params, ["encoder", name, "kernel"],
                         _conv_kernel(value))
                    return True
                return False
            return _bn_entry(["encoder", name], leaf, value, params, stats)
        if idx.startswith("transition") and len(parts) == 5:
            name = f"{idx}_{parts[3]}"
            if parts[3] == "conv":
                if leaf == "weight":
                    _set(params, ["encoder", name, "kernel"],
                         _conv_kernel(value))
                    return True
                return False
            return _bn_entry(["encoder", name], leaf, value, params, stats)
        # DPN (pretrainedmodels OrderedDict features): conv1_1 stem (flat
        # names here), convK_i blocks with BnActConv2d / CatBnAct children,
        # conv5_bn_ac tail, dpn68b's plain c1x1_c1/c1x1_c2 convs.
        if idx == "conv1_1":
            if parts[3] == "conv" and leaf == "weight":
                _set(params, ["encoder", "conv1_1_conv", "kernel"],
                     _conv_kernel(value))
                return True
            if parts[3] == "bn":
                return _bn_entry(["encoder", "conv1_1_bn"], leaf, value,
                                 params, stats)
            return False
        if idx == "conv5_bn_ac" and parts[3] == "bn":
            return _bn_entry(["encoder", "conv5_bn_ac", "bn"], leaf, value,
                             params, stats)
        if re.fullmatch(r"conv\d_\d+", idx):
            sub = parts[3]
            if (sub in ("c1x1_c1", "c1x1_c2") and len(parts) == 5
                    and leaf == "weight"):
                _set(params, ["encoder", idx, sub, "kernel"],
                     _conv_kernel(value))
                return True
            if len(parts) == 6 and parts[4] == "conv" and leaf == "weight":
                _set(params, ["encoder", idx, sub, "conv", "kernel"],
                     _conv_kernel(value))
                return True
            if len(parts) == 6 and parts[4] == "bn":
                return _bn_entry(["encoder", idx, sub, "bn"], leaf, value,
                                 params, stats)
        return False

    block = f"features_{idx}"

    # VGG: encoder.features.<i>.<leaf> — conv (weight+bias) or BN, telling
    # them apart only by whether index <i> carries running stats.
    if len(parts) == 4:
        if idx in vgg_bn_indices:
            return _bn_entry(["encoder", block], leaf, value, params, stats)
        if leaf == "weight":
            _set(params, ["encoder", block, "kernel"], _conv_kernel(value))
            return True
        if leaf == "bias":
            _set(params, ["encoder", block, "bias"], value)
            return True
        return False

    # MobileNetV2 stem/head ConvBNReLU: encoder.features.<i>.{0,1}.<leaf>.
    if len(parts) == 5 and parts[3] in ("0", "1"):
        if parts[3] == "0" and leaf == "weight":
            _set(params, ["encoder", block, "0", "kernel"],
                 _conv_kernel(value))
            return True
        if parts[3] == "1":
            return _bn_entry(["encoder", block, "1"], leaf, value, params,
                             stats)
        return False

    # InceptionV4 (Cadene): stem BasicConv2d (features.<i>.{conv,bn}.<leaf>),
    # Mixed_3a/5a 'conv' BasicConv2d (features.<i>.conv.{conv,bn}.<leaf>),
    # and branch modules — single BasicConv2d (features.<i>.branchX.{conv,bn})
    # or Sequential (features.<i>.branchX.<j>.{conv,bn}) -> branchX_<j>.
    if len(parts) == 5 and parts[3] in ("conv", "bn"):
        if parts[3] == "conv":
            if leaf == "weight":
                _set(params, ["encoder", block, "conv", "kernel"],
                     _conv_kernel(value))
                return True
            return False
        return _bn_entry(["encoder", block, "bn"], leaf, value, params, stats)
    if len(parts) == 6 and parts[3] == "conv" and parts[4] in ("conv", "bn"):
        if parts[4] == "conv":
            if leaf == "weight":
                _set(params, ["encoder", block, "conv", "conv", "kernel"],
                     _conv_kernel(value))
                return True
            return False
        return _bn_entry(["encoder", block, "conv", "bn"], leaf, value,
                         params, stats)
    if parts[3].startswith("branch"):
        if len(parts) == 7:
            name, sub = f"{parts[3]}_{parts[4]}", parts[5]
        elif len(parts) == 6:
            name, sub = parts[3], parts[4]
        else:
            return False
        if sub == "conv" and leaf == "weight":
            _set(params, ["encoder", block, name, "conv", "kernel"],
                 _conv_kernel(value))
            return True
        if sub == "bn":
            return _bn_entry(["encoder", block, name, "bn"], leaf, value,
                             params, stats)
        return False

    # MobileNetV2 InvertedResidual: encoder.features.<i>.conv.<k>[.<j>].<leaf>
    if parts[3] == "conv":
        k = parts[4]
        if len(parts) == 7:  # ConvBNReLU pair inside the block Sequential
            if parts[5] == "0" and leaf == "weight":
                _set(params, ["encoder", block, f"conv_{k}_0", "kernel"],
                     _conv_kernel(value))
                return True
            if parts[5] == "1":
                return _bn_entry(["encoder", block, f"conv_{k}_1"], leaf,
                                 value, params, stats)
            return False
        if len(parts) == 6:  # bare linear-projection conv or its BN
            if leaf == "weight" and value.ndim == 4:
                _set(params, ["encoder", block, f"conv_{k}", "kernel"],
                     _conv_kernel(value))
                return True
            return _bn_entry(["encoder", block, f"conv_{k}"], leaf, value,
                             params, stats)
    return False


def _bn_entry(path: list[str], leaf: str, value: np.ndarray, params: dict,
              stats: dict) -> bool:
    if leaf in _BN_PARAM:
        _set(params, path + [_BN_PARAM[leaf]], value)
        return True
    if leaf in _BN_STAT:
        _set(stats, path + [_BN_STAT[leaf]], value)
        return True
    return False


def split_lightning_state_dict(sd: dict[str, Any]) -> dict[str, dict]:
    """Group a Lightning checkpoint state_dict by model prefix.

    Returns e.g. ``{"model_a": {...}, "model_b": {...},
    "ema_model_a": {...}}`` with per-model smp-relative keys. EMA entries are
    ema_pytorch's ``ema_model_a.ema_model.<smp key>``; its ``initted``/``step``
    buffers are dropped.
    """
    groups: dict[str, dict] = {}
    for name, value in sd.items():
        parts = name.split(".", 1)
        if len(parts) != 2:
            continue
        prefix, rest = parts
        if prefix.startswith("ema_model"):
            sub = rest.split(".", 1)
            if sub[0] != "ema_model" or len(sub) != 2:
                continue  # initted/step buffers or online copy
            rest = sub[1]
        elif prefix == "criterion":
            continue  # SSIM window buffers — recomputed here
        groups.setdefault(prefix, {})[rest] = np.asarray(value)
    return groups


def load_reference_checkpoint(ckpt_path) -> dict:
    """Load a reference ``.ckpt``; returns {model_name: (params, stats)}."""
    import torch

    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    sd = {k: v.numpy() if hasattr(v, "numpy") else v
          for k, v in ckpt["state_dict"].items()}
    out = {}
    for model_name, model_sd in split_lightning_state_dict(sd).items():
        out[model_name] = convert_smp_unet_state_dict(model_sd)
    out["hyper_parameters"] = dict(ckpt.get("hyper_parameters", {}))
    out["lightning_meta"] = {"epoch": int(ckpt.get("epoch", 0)),
                             "global_step": int(ckpt.get("global_step", 0))}
    return out


def import_reference_checkpoint(ckpt_path, output_dir, *,
                                keep: int = 8) -> "Path":
    """Convert a reference Lightning ``.ckpt`` into this framework's
    (Orbax) checkpoint layout — the migration path for existing users.

    Weights, EMA shadows, BN stats, hyperparameters, and the epoch /
    global-step counters all carry over; optimizer moments start fresh
    (Adam state is not portable across frameworks — equivalent to the
    reference's own ``modify`` flow, SURVEY.md §3.5). The result feeds every
    consumer of native checkpoints: ``train resume/modify``, ``video swap``,
    ``serve``.
    """
    import jax
    import jax.numpy as jnp

    from denoising_diffusion_deep_fake_tpu.checkpoint import CheckpointManager
    from denoising_diffusion_deep_fake_tpu.config import (
        DeepFakeConfig, config_from_dict, config_to_dict)
    from denoising_diffusion_deep_fake_tpu.training.optim import (
        make_adam_with_cosine)
    from denoising_diffusion_deep_fake_tpu.training.state import ModelState

    imported = load_reference_checkpoint(ckpt_path)
    hp = imported.pop("hyper_parameters")
    lightning_meta = imported.pop("lightning_meta")
    has_ema = any(k.startswith("ema_model") for k in imported)
    cfg = config_from_dict(DeepFakeConfig, hp, validate=False)
    if has_ema:
        cfg.mode = "swap"  # EMA shadows only exist in swap mode
    tx = make_adam_with_cosine(cfg.learning_rate, b1=cfg.adam_b1,
                               b2=cfg.adam_b2, cosine_t_max=cfg.cosine_t_max,
                               steps_per_epoch=1)

    def build_state(name: str) -> ModelState:
        params, stats = imported[f"model_{name}"]
        params = jax.tree.map(jnp.asarray, params)
        stats = jax.tree.map(jnp.asarray, stats)
        state = ModelState(step=jnp.zeros((), jnp.int32), params=params,
                           batch_stats=stats, opt_state=tx.init(params))
        if has_ema:
            ema_params, ema_stats = imported[f"ema_model_{name}"]
            state = state.replace(
                ema_params=jax.tree.map(jnp.asarray, ema_params),
                ema_batch_stats=jax.tree.map(jnp.asarray, ema_stats),
                ema_step=jnp.zeros((), jnp.int32))
        return state

    states = {"a": build_state("a"), "b": build_state("b")}
    manager = CheckpointManager(output_dir, keep=keep)
    extra = {"epoch": lightning_meta["epoch"],
             "global_step": lightning_meta["global_step"],
             "workload": "deep_fake",
             "imported_from": str(ckpt_path)}
    return manager.save(lightning_meta["global_step"], states,
                        config_to_dict(cfg), extra)
