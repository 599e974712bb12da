"""Typed config system (YAML -> validated dataclasses).

The reference splats ``yaml.safe_load`` dicts straight into ``LitModule(**kw)``
with no schema — unknown keys pass silently and missing keys fail at first
attribute access (`/root/reference/d3f/train_deep_fake/start_training.py:34-36`,
SURVEY.md §5 "Config / flag system"). This rebuild keeps the reference's YAML
key names (existing configs load unchanged) but adds:

* per-workload dataclass schemas with defaults and validation at load time,
* warnings (not silence) for unknown keys,
* the ``modify`` overlay semantics — checkpoint hparams + YAML overrides —
  as an explicit, testable function instead of Lightning's ``strict=False``,
* TPU-specific knobs (static ``image_size``, ``compute_dtype``, data-parallel
  mesh shape) that the torch version never needed.

Note the reference's ``create_dataloader(p.data_path_a, p.mean_a, p.mean_a)``
std:=mean typo (SURVEY.md appendix #1) is deliberately *not* reproduced: std
comes from ``std_*`` keys here.
"""

from __future__ import annotations

import dataclasses
import warnings
from pathlib import Path

import yaml


def read_yaml_file_into_dict(path) -> dict:
    with open(path) as f:
        data = yaml.safe_load(f)
    if not isinstance(data, dict):
        raise ValueError(f"config {path} did not parse to a mapping")
    return data


@dataclasses.dataclass
class BaseConfig:
    """Knobs shared by all three workloads."""

    batch_size: int = 16
    learning_rate: float = 0.01
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    max_epochs: int = 100
    cosine_scheduler_max_epoch: int | None = None
    num_workers: int = 8
    encoder_name: str = "resnet34"

    # --- TPU-native additions ---
    image_size: int | None = None      # None -> inferred from the first image
    compute_dtype: str = "bfloat16"    # "float32" for parity runs
    data_parallel: int = 1             # devices on the batch axis of the mesh
    # Devices on the 'spatial' mesh axis: conv feature maps are H-sharded
    # across them (XLA GSPMD derives the halo exchanges) — the TPU-native
    # scaling axis for large resolutions (SURVEY.md §2 "TPU-native
    # equivalents"; the reference trains 448² crops single-device).
    spatial_parallel: int = 1
    seed: int = 0
    log_dir: str = "runs"
    checkpoint_dir: str = "checkpoints"
    log_every_n_steps: int = 1
    # TB image-panel logging (the reference's throttled grids,
    # LoggingScheduler cadence). False disables panels entirely: no image
    # steps, no image-variant compile, no panel transfers — used by
    # headless/bench runs where the panels' tens-of-MB fetches (and, with
    # steps_per_call > 1, the single-step fallback dispatches) would
    # perturb the measurement. Scalars are unaffected.
    log_images: bool = True
    checkpoint_every_hours: float = 2.0   # mirrors the 2h ModelCheckpoint cadence
    keep_checkpoints: int = 8             # mirrors save_top_k=8
    # Epoch-end 'last' saves are rate-limited to this spacing: Lightning's
    # per-epoch 'last' checkpoint assumed long epochs + local disk; with
    # short epochs or slow links per-epoch saves can dominate wall time.
    last_checkpoint_min_interval_s: float = 600.0
    steps_per_epoch: int | None = None    # None -> derived from dataset size
    # Sample uniformly over difficulty classes when the manifest carries them
    # (the balancer's output) — the consumer half of `d3f-tpu balance`.
    class_balanced_sampling: bool = False
    # SIGTERM -> final checkpoint -> clean exit (TPU maintenance events /
    # scheduler preemption). Resume with `train resume` afterwards.
    handle_preemption: bool = True
    # Host->device wire format for TRAINING batches. "i420" ships 4:2:0-packed
    # uint8 (half the bytes of RGB) and converts to RGB on-device before
    # normalize/augment — the JPEG sources are already chroma-subsampled, so
    # ~zero information is lost while transfer-limited hosts roughly double
    # delivered imgs/s (BASELINE.md r3). "rgb" (default) is the parity path.
    # The balancer's once-per-epoch scoring pass always uses rgb.
    upload_format: str = "rgb"
    # Where training batches come from each step:
    #   "host"   — host loader + prefetch/upload thread (parity default),
    #   "device" — the whole decoded uint8 dataset lives in HBM and each
    #              step GATHERS its batch inside the jitted program: zero
    #              per-step host->device image bytes. TPU-native mode for
    #              datasets that fit HBM (the reference's face datasets are
    #              thousands of fixed crops: 10k 448² frames = ~6 GB vs 16).
    #              Single-process: epoch shuffle matches the host loader
    #              exactly (same seeded permutation). Multi-process: each
    #              process pins its manifest shard axis-0-sharded over its
    #              local devices (HBM cost /= n_devices, shard-local
    #              gathers); shuffle is per-device within fixed sub-shards.
    #              See data/device_cache.py.
    data_cache: str = "host"
    # Refuse to device-cache datasets larger than this (HBM headroom for
    # params/activations comes first).
    device_cache_limit_bytes: int = 8 << 30
    # Affine-warp implementation (ops/augment.py augment_batch):
    #   auto (default) picks per shape/backend/mesh; explicit choices:
    #   gather (direct 4-tap bilinear, parity semantics), shear (windowed
    #   MAC, small shapes), hybrid (scale matmul + block roll, large
    #   shapes), pallas (VMEM two-pass kernel), pallas_fused (whole-sample
    #   one-kernel warp incl. in-kernel uint8 normalize).
    warp_method: str = "auto"
    # Gradient-path rematerialization (jax.checkpoint) policy: none | dots |
    # full. "dots" saves MXU outputs and recomputes elementwise/BN chains in
    # the backward pass — trades FLOPs for HBM reads, relevant only at large
    # spatial shapes (448²+); at 64² XLA fusion already minimizes traffic
    # (BASELINE.md round-1 negative result; round-4 "448² step anatomy" for
    # the large-shape measurement).
    remat: str = "none"
    # Photometric augmentation (the north-star chain's "color jitter" leg;
    # the reference has none, so the parity default is OFF): Kornia
    # ColorJitter strengths (brightness, contrast, saturation, hue<=0.5),
    # applied per sample with probability color_jitter_p AFTER the affine
    # warp, on-device, fused into the step (ops/color.py). The balance
    # workload has no augmentation chain and ignores these.
    color_jitter: tuple = (0.0, 0.0, 0.0, 0.0)
    color_jitter_p: float = 1.0
    # Host-dispatch amortization: how many train steps one dispatched
    # program runs (``lax.scan`` over k stacked batches — see
    # training/multi_step.py). Per-step PRNG keys derive from ``state.step``
    # inside the step, so a k-step program is step-for-step identical to k
    # single dispatches; only dispatch count and metric-fetch count change.
    # Pays on high-latency host links (this TPU tunnel: ~1.5-3 ms/dispatch,
    # BASELINE.md "performance characterization") and with
    # ``data_cache: device`` (zero upload bytes -> dispatch is the whole
    # loop overhead). Per-step TB scalar cadence is preserved exactly (the
    # loop fans the stacked (k,) metrics out to per-step rows);
    # checkpoint-due and SIGTERM-preemption checks run once per dispatched
    # GROUP, so their response latency grows to up to k-1 extra steps —
    # keep k * step_wall_time well inside your scheduler's SIGTERM grace
    # window (e.g. 448² at ~180 ms/step: k=8 adds <1.5 s; k=256 would add
    # ~45 s). validate() warns above 64. Image-panel steps and epoch tails
    # fall back to single-step programs.
    steps_per_call: int = 1
    # OPT-IN, NON-PARITY: run the whole U-Net at H/p x W/p via a p x p
    # pixel-unshuffle input stem + pixel-shuffle output head
    # (models.unet.PatchifiedUnet). Targets the 448² trace's top sink —
    # bandwidth-bound full-resolution stem/decoder elementwork — by
    # shrinking every full-res map p² in area. CHANGES THE MODEL (each
    # output pixel is predicted jointly with its p x p block): no reference
    # counterpart, no torch-replica export, quality must be re-evaluated.
    # 1 = off (default, reference-parity). H and W must divide 32*p.
    patchify_stem: int = 1
    # MXU input precision for matmuls/convs (jax.default_matmul_precision):
    #   auto (default): "highest" when compute_dtype is float32 — the TPU
    #   backend otherwise rounds fp32 conv inputs to one-pass bf16, which
    #   breaks fp32-parity semantics and measurably DIVERGES this workload's
    #   training (BASELINE.md round-3 "TPU precision"); backend default when
    #   compute_dtype is bfloat16 (the fast path — loss math is always fp32,
    #   see ops/losses.py). Explicit values: default | high | highest.
    matmul_precision: str = "auto"

    def validate(self) -> None:
        if self.batch_size <= 0:
            raise ValueError("batch_size must be positive")
        if self.learning_rate <= 0:
            raise ValueError("learning_rate must be positive")
        if not 0 <= self.adam_b1 < 1 or not 0 <= self.adam_b2 < 1:
            raise ValueError("adam betas must be in [0, 1)")
        if self.compute_dtype not in ("float32", "bfloat16"):
            raise ValueError(f"compute_dtype {self.compute_dtype!r} not supported")
        if self.data_parallel <= 0:
            raise ValueError("data_parallel must be positive")
        if self.batch_size % self.data_parallel != 0:
            raise ValueError("batch_size must divide evenly across data_parallel")
        if self.spatial_parallel <= 0:
            raise ValueError("spatial_parallel must be positive")
        if (self.image_size is not None
                and self.image_size % self.spatial_parallel != 0):
            raise ValueError(
                "image_size must divide evenly across spatial_parallel")
        if self.upload_format not in ("rgb", "i420"):
            raise ValueError(
                f"upload_format must be 'rgb' or 'i420', got "
                f"{self.upload_format!r}")
        if self.upload_format == "i420":
            if self.spatial_parallel > 1:
                # The packed (B, H*3/2, W) layout interleaves luma/chroma
                # planes along dim 1 — H-sharding it would split planes
                # incoherently. Use rgb uploads when spatially sharding.
                raise ValueError(
                    "upload_format='i420' is incompatible with "
                    "spatial_parallel > 1 — use upload_format='rgb'")
            if self.image_size is not None and (self.image_size % 4 != 0):
                raise ValueError(
                    "upload_format='i420' needs image_size % 4 == 0, got "
                    f"{self.image_size}")
        if self.data_cache not in ("host", "device"):
            raise ValueError(
                f"data_cache must be 'host' or 'device', got "
                f"{self.data_cache!r}")
        if self.data_cache == "device" and self.upload_format != "rgb":
            # There is no per-step upload to compress: batches are gathered
            # from the HBM-resident uint8 dataset inside the step.
            raise ValueError(
                "data_cache='device' already eliminates per-step uploads — "
                "use upload_format='rgb' with it")
        if self.data_cache == "device" and self.spatial_parallel > 1:
            raise ValueError(
                "data_cache='device' supports the data axis only; use "
                "data_cache='host' with spatial_parallel > 1")
        if self.warp_method not in ("auto", "gather", "shear", "hybrid",
                                    "pallas", "pallas_fused"):
            raise ValueError(f"unknown warp_method {self.warp_method!r}")
        if (self.warp_method in ("pallas", "pallas_fused")
                and (self.data_parallel > 1 or self.spatial_parallel > 1)):
            # pallas_call has no GSPMD partitioning rule: inside a
            # multi-device-sharded step it breaks or forces an all-gather
            # (see ops/augment.py auto notes and the multi-host pitfalls).
            raise ValueError(
                f"warp_method={self.warp_method!r} is single-device; "
                "use 'auto' (which guards) or an XLA method when sharding")
        if self.matmul_precision not in ("auto", "default", "high",
                                         "highest"):
            raise ValueError(
                f"unknown matmul_precision {self.matmul_precision!r}")
        if self.remat not in ("none", "dots", "full"):
            raise ValueError(f"unknown remat policy {self.remat!r}")
        if self.steps_per_call < 1:
            raise ValueError("steps_per_call must be >= 1")
        if self.steps_per_call > 64:
            import warnings

            warnings.warn(
                f"steps_per_call={self.steps_per_call}: checkpoint/"
                "preemption checks run once per dispatched group, so the "
                "SIGTERM response latency grows by (k-1) steps — make sure "
                "the group's wall time stays well inside the preemption "
                "grace window (see config field note)", stacklevel=2)
        if self.patchify_stem < 1:
            raise ValueError("patchify_stem must be >= 1")
        if self.patchify_stem > 1 and self.image_size % (
                32 * self.patchify_stem):
            raise ValueError(
                f"patchify_stem={self.patchify_stem} needs image_size "
                f"divisible by {32 * self.patchify_stem} "
                f"(got {self.image_size})")
        if len(tuple(self.color_jitter)) != 4:
            raise ValueError(
                "color_jitter must be (brightness, contrast, saturation, "
                f"hue), got {self.color_jitter!r}")
        from denoising_diffusion_deep_fake_tpu.ops.color import (
            ColorJitterConfig)

        ColorJitterConfig(*self.color_jitter,  # range validation
                          probability=self.color_jitter_p)

    def resolved_matmul_precision(self) -> str | None:
        """The jax.default_matmul_precision value to trace under, or None
        for the backend default (see the ``matmul_precision`` field note)."""
        if self.matmul_precision == "auto":
            return "highest" if self.compute_dtype == "float32" else None
        if self.matmul_precision == "default":
            return None
        return self.matmul_precision

    @property
    def cosine_t_max(self) -> int:
        return (self.cosine_scheduler_max_epoch
                if self.cosine_scheduler_max_epoch is not None
                else self.max_epochs)


@dataclasses.dataclass
class DeepFakeConfig(BaseConfig):
    """Two-identity trainer (reference `d3f train`, denoise + swap modes)."""

    mode: str = "denoise"
    data_path_a: str = ""
    data_path_b: str = ""
    mean_a: tuple = (0.5, 0.5, 0.5)
    std_a: tuple = (0.5, 0.5, 0.5)
    mean_b: tuple = (0.5, 0.5, 0.5)
    std_b: tuple = (0.5, 0.5, 0.5)
    noise_exponential_sampling_lambda: float = 5.0
    ema_beta: float = 0.9999
    ema_update_every: int = 1
    ema_update_after_step: int = 100   # ema_pytorch default, made explicit
    # albumentations ShiftScaleRotate parity (lit_module.py:99-111) — applied
    # on-device here instead of in CPU dataloader workers.
    aug_shift_limit: float = 0.2
    aug_scale_limit: float = 0.1
    aug_rotate_limit: float = 15.0
    aug_probability: float = 0.7

    def validate(self) -> None:
        super().validate()
        if self.mode not in ("denoise", "swap"):
            raise ValueError(f"mode must be 'denoise' or 'swap', got {self.mode!r}")
        if not self.data_path_a or not self.data_path_b:
            raise ValueError("data_path_a and data_path_b are required")
        if self.noise_exponential_sampling_lambda <= 0:
            raise ValueError("noise_exponential_sampling_lambda must be positive")


def _rescale_mean_std(cfg) -> None:
    """Auto-convert 0-255-scale mean/std (the reference's denoiser/balance
    configs use [128,128,128] — SURVEY.md appendix #2) to 0-1 scale."""
    if any(v > 1.0 for v in cfg.mean) or any(v > 1.0 for v in cfg.std):
        warnings.warn(
            "mean/std look 0-255-scaled; dividing by 255 (the reference's "
            "denoiser configs predate its albumentations switch)", stacklevel=3)
        cfg.mean = tuple(v / 255.0 for v in cfg.mean)
        cfg.std = tuple(v / 255.0 for v in cfg.std)


@dataclasses.dataclass
class DenoiserConfig(BaseConfig):
    """Single-model denoiser pretrainer (reference `d3f denoise`)."""

    input_image_list_path: str = ""
    mean: tuple = (0.5, 0.5, 0.5)
    std: tuple = (0.5, 0.5, 0.5)
    noise_exponential_sampling_lambda: float = 5.0
    # Kornia RandomAffine parity (train_denoiser/lit_module.py:55-65).
    aug_degrees: float = 15.0
    aug_translate: float = 0.2
    aug_scale_min: float = 0.8
    aug_scale_max: float = 1.2

    def validate(self) -> None:
        super().validate()
        if not self.input_image_list_path:
            raise ValueError("input_image_list_path is required")
        _rescale_mean_std(self)


@dataclasses.dataclass
class BalanceConfig(BaseConfig):
    """Difficulty balancer (reference `d3f balance`) — including the
    output-list write the reference promised but never implemented
    (SURVEY.md §2 #7)."""

    data_path: str = ""
    output_image_list_path: str = ""
    mean: tuple = (0.5, 0.5, 0.5)
    std: tuple = (0.5, 0.5, 0.5)
    ratio_of_noise: float = 0.7
    number_of_classes: int = 10

    def validate(self) -> None:
        super().validate()
        if not self.data_path:
            raise ValueError("data_path is required")
        if not 0.0 <= self.ratio_of_noise <= 1.0:
            raise ValueError("ratio_of_noise must be in [0, 1]")
        if self.number_of_classes <= 0:
            raise ValueError("number_of_classes must be positive")
        _rescale_mean_std(self)


# Reference-config keys that this rebuild intentionally ignores.
_IGNORED_KEYS = {"num_workers"}  # accepted (in schema) but host threading differs


def config_from_dict(cls, data: dict, *, validate: bool = True):
    """Build a config dataclass from a (YAML) dict, warning on unknown keys."""
    field_names = {f.name for f in dataclasses.fields(cls)}
    known = {}
    for key, value in data.items():
        if key in field_names:
            if isinstance(value, list):
                value = tuple(value)
            known[key] = value
        else:
            warnings.warn(f"unknown config key {key!r} ignored", stacklevel=2)
    cfg = cls(**known)
    if validate:
        cfg.validate()
    return cfg


def config_to_dict(cfg) -> dict:
    d = dataclasses.asdict(cfg)
    return {k: (list(v) if isinstance(v, tuple) else v) for k, v in d.items()}


def load_config(cls, yaml_path, overrides: dict | None = None):
    """YAML -> config, with optional CLI/``modify`` overrides applied on top."""
    data = read_yaml_file_into_dict(yaml_path)
    if overrides:
        data.update({k: v for k, v in overrides.items() if v is not None})
    return config_from_dict(cls, data)


def overlay_config(cls, base: dict, new: dict):
    """``modify`` semantics: checkpoint hparams + YAML overrides on top.

    Mirrors `LitModule.load_from_checkpoint(..., strict=False, **hparams)`
    (`/root/reference/d3f/train_deep_fake/start_training.py:25-31`): new keys
    override, absent keys keep the checkpoint values.
    """
    merged = dict(base)
    merged.update(new)
    return config_from_dict(cls, merged)


def resolve_manifest_path(path) -> Path:
    p = Path(path)
    if not p.exists():
        raise FileNotFoundError(f"image manifest not found: {p}")
    return p
