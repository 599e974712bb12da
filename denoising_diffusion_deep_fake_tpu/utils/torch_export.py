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

Two paths, both exact:

- ``export_smp_unet_state_dict`` — handwritten inverse renames for the
  resnet/resnext/wide_resnet family (the reference's own configs all use
  resnet34, `denoise_config.yml`); round-trip tested bit-for-bit.
- ``export_smp_unet_state_dict_any`` — EVERY family the importer supports
  (~50 encoder names), by *probe inversion*: fill a key/shape template (the
  in-package torch replica, `utils/torch_replica.py`) with globally-unique
  per-element index values, run it through the importer
  (``convert_smp_unet_state_dict``), and read back, for each flax leaf
  element, exactly which torch element it came from. The recovered
  per-element permutation IS the importer's mapping — any rename/transpose/
  reshape/split/concat the importer performs is inverted mechanically, and
  integrality + full-coverage + no-duplicate checks fail loudly if the
  importer ever did arithmetic instead of moving values. The resnet34
  cross-check (handwritten == probe-inverted, bit-for-bit) is pinned in
  tests/test_torch_export.py.
"""

from __future__ import annotations

import functools
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
                        f"handwritten export covers the resnet encoder "
                        f"family only; cannot map encoder key "
                        f"{'.'.join(path)} — use "
                        f"export_smp_unet_state_dict_any (any family) or "
                        f"the export_unet_state_dict dispatcher")
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


@functools.lru_cache(maxsize=2)
def _inversion_plan(encoder_name: str):
    """Recover the importer's torch-element -> flax-element permutation.

    Returns ``(plan, shapes, int_keys)`` where ``plan`` maps each flax leaf
    path ``("params"|"batch_stats", *tree_path)`` to ``(leaf_shape,
    [(torch_key, torch_flat_indices, leaf_flat_indices), ...])``, ``shapes``
    maps torch keys to their tensor shapes, and ``int_keys`` lists the
    integer buffers the importer drops (BN ``num_batches_tracked``).
    """
    import torch

    from denoising_diffusion_deep_fake_tpu.utils.torch_import import (
        convert_smp_unet_state_dict)
    from denoising_diffusion_deep_fake_tpu.utils.torch_replica import (
        UnetSMP, smp_named_state_dict)

    with torch.no_grad():
        template = smp_named_state_dict(UnetSMP(encoder_name))
    int_keys = [k for k in template if k.endswith("num_batches_tracked")]
    float_keys = [k for k in template if k not in set(int_keys)]
    shapes = {k: tuple(template[k].shape) for k in float_keys}
    sizes = np.array([int(np.prod(shapes[k], dtype=np.int64))
                      for k in float_keys], dtype=np.int64)
    offsets = np.concatenate([[0], np.cumsum(sizes)])
    total = int(offsets[-1])

    # float64 keeps every index exact up to 2^53 elements (dpn107 is ~9e7).
    probe: dict[str, np.ndarray] = {
        k: np.asarray(template[k]) for k in int_keys}
    for k, off in zip(float_keys, offsets[:-1]):
        n = int(np.prod(shapes[k], dtype=np.int64))
        probe[k] = (np.arange(n, dtype=np.float64) + off).reshape(shapes[k])

    p_params, p_stats = convert_smp_unet_state_dict(probe)

    plan: dict[tuple, tuple] = {}
    seen = {k: np.zeros(int(np.prod(shapes[k], dtype=np.int64)), dtype=bool)
            for k in float_keys}
    for tree_name, tree in (("params", p_params), ("batch_stats", p_stats)):
        for path, pv in _flatten(tree).items():
            flat = np.ravel(pv)
            ids = flat.astype(np.int64)
            if (not np.array_equal(ids.astype(np.float64), flat)
                    or ids.min(initial=0) < 0
                    or ids.max(initial=0) >= total):
                raise ValueError(
                    f"importer transform for {'.'.join(path)} is not a pure "
                    f"element permutation — probe inversion cannot export "
                    f"{encoder_name}")
            key_idx = np.searchsorted(offsets, ids, side="right") - 1
            local = ids - offsets[key_idx]
            entries = []
            for ki in np.unique(key_idx):
                sel = np.flatnonzero(key_idx == ki)
                loc = local[sel]
                key = float_keys[int(ki)]
                # A fancy read of still-False entries cannot catch duplicates
                # *within* one leaf's loc array — check per-entry uniqueness
                # first so a broadcasting importer fails loudly instead of
                # silently writing last-wins.
                if len(np.unique(loc)) != len(loc):
                    raise ValueError(
                        f"duplicate indices within flax leaf "
                        f"{'.'.join(path)} mapping into torch key {key}")
                if seen[key][loc].any():
                    raise ValueError(
                        f"duplicate mapping into torch key {key} from flax "
                        f"leaf {'.'.join(path)}")
                seen[key][loc] = True
                entries.append((key, loc, sel))
            plan[(tree_name,) + path] = (pv.shape, entries)

    uncovered = {k: int((~m).sum()) for k, m in seen.items() if not m.all()}
    if uncovered:
        raise ValueError(
            f"torch elements never produced by the importer for "
            f"{encoder_name} (export would leave them uninitialized): "
            f"{uncovered}")
    return plan, shapes, tuple(int_keys)


def export_smp_unet_state_dict_any(params: dict, batch_stats: dict,
                                   encoder_name: str
                                   ) -> dict[str, np.ndarray]:
    """Flax U-Net variables -> torch smp state_dict, for ANY encoder family.

    Mechanical inverse of ``convert_smp_unet_state_dict`` via the cached
    probe-inversion plan (see module docstring). Emits BN
    ``num_batches_tracked`` buffers as int64 zeros so the reference's
    strict ``load_state_dict`` sees no missing keys.
    """
    plan, shapes, int_keys = _inversion_plan(encoder_name)
    flat_in = {("params",) + p: v for p, v in _flatten(params).items()}
    flat_in.update(
        {("batch_stats",) + p: v for p, v in _flatten(batch_stats).items()})
    if set(flat_in) != set(plan):
        missing = sorted(".".join(p) for p in set(plan) - set(flat_in))
        extra = sorted(".".join(p) for p in set(flat_in) - set(plan))
        raise ValueError(
            f"flax variable tree does not match {encoder_name} template "
            f"(missing={missing[:5]}, extra={extra[:5]})")
    out = {k: np.empty(int(np.prod(s, dtype=np.int64)), np.float32)
           for k, s in shapes.items()}
    for path, (shape, entries) in plan.items():
        v = np.asarray(flat_in[path], np.float32)
        if v.shape != shape:
            raise ValueError(
                f"shape mismatch at {'.'.join(path)}: got {v.shape}, "
                f"template has {shape}")
        fv = np.ravel(v)
        for key, loc, sel in entries:
            out[key][loc] = fv[sel]
    sd = {k: out[k].reshape(shapes[k]) for k in out}
    for k in int_keys:
        sd[k] = np.zeros((), np.int64)
    return sd


_RESNET_FAMILY = re.compile(
    r"^(resnet\d+|resnext\d+_\d+x\d+d|wide_resnet\d+_\d+)$")


def export_unet_state_dict(params: dict, batch_stats: dict,
                           encoder_name: str) -> dict[str, np.ndarray]:
    """Family dispatch: handwritten resnet inverse (no torch-model build
    needed) or the generic probe-inversion path. Both emit
    ``num_batches_tracked`` buffers."""
    if _RESNET_FAMILY.match(encoder_name):
        sd = export_smp_unet_state_dict(params, batch_stats)
        for k in [k for k in sd if k.endswith(".running_mean")]:
            sd[k[:-len("running_mean")] + "num_batches_tracked"] = \
                np.zeros((), np.int64)
        return sd
    return export_smp_unet_state_dict_any(params, batch_stats, encoder_name)


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
    if int(hparams.get("patchify_stem", 1) or 1) > 1:
        raise ValueError(
            "this checkpoint was trained with patchify_stem > 1 — a "
            "TPU-native non-parity architecture the reference's smp.Unet "
            "cannot represent; export is not possible (config.py "
            "patchify_stem note)")
    cfg = config_from_dict(DeepFakeConfig, hparams, validate=False)
    trainer = DeepFakeTrainer(cfg, steps_per_epoch=1,
                              image_size=cfg.image_size or 64)
    with_ema = hparams.get("mode", cfg.mode) == "swap"
    states, _ = manager.restore(
        lambda: trainer.init_states(jax.random.PRNGKey(0),
                                    with_ema=with_ema), step=step)

    sd: dict[str, Any] = {}
    encoder_name = cfg.encoder_name
    for ident in sorted(states):
        state = states[ident]
        model_sd = export_unet_state_dict(state.params, state.batch_stats,
                                          encoder_name)
        for k, v in model_sd.items():
            sd[f"model_{ident}.{k}"] = torch.from_numpy(np.array(v))
        if getattr(state, "ema_params", None) is not None:
            ema_stats = (state.ema_batch_stats
                         if state.ema_batch_stats is not None
                         else state.batch_stats)
            ema_sd = export_unet_state_dict(state.ema_params, ema_stats,
                                            encoder_name)
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
