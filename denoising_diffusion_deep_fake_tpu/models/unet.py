"""U-Net (smp-topology parity) in Flax linen, NHWC, TPU-first.

Rebuilds ``segmentation_models_pytorch.Unet(encoder_name=..., in_channels=3,
classes=3, activation=None)`` — the reference's only model
(`/root/reference/d3f/train_deep_fake/lit_module.py:53-59`). Crucially the
network has **no timestep/noise-level conditioning**: it is a blind
x0-predictor for any noise level, which is why a single forward pass suffices
at swap inference (SURVEY.md §2 model note).

Topology parity (resnet34 default):
* encoder pyramid channels (3, 64, 64, 128, 256, 512),
* decoder channels (256, 128, 64, 32, 16); each block: 2x nearest upsample,
  concat skip, two Conv3x3+BN+ReLU; the deepest skip (layer4) is the head
  input, the last block has no skip,
* segmentation head Conv3x3 -> ``classes`` channels, no activation.

Init parity with smp's ``initialize()``: decoder convs kaiming-uniform fan-in,
head conv xavier-uniform, all biases zero, BN ones/zeros.

TPU notes: nearest x2 upsampling is two ``jnp.repeat``s (layout-preserving,
fuses with the following concat+conv under XLA); all convs run on the MXU in
whatever layout XLA picks; use ``dtype=bfloat16`` for the compute dtype to
double MXU throughput while keeping fp32 params.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from denoising_diffusion_deep_fake_tpu.models.densenet import (
    DENSENET_SPECS,
    DenseNetEncoder,
)
from denoising_diffusion_deep_fake_tpu.models.efficientnet import (
    EFFICIENTNET_SPECS,
    EfficientNetEncoder,
)
from denoising_diffusion_deep_fake_tpu.models.mobilenet import (
    MobileNetV2Encoder,
)
from denoising_diffusion_deep_fake_tpu.models.senet import (
    SENET_SPECS,
    SENetEncoder,
)
from denoising_diffusion_deep_fake_tpu.models.resnet import (
    RESNET_SPECS,
    ResNetEncoder,
)
from denoising_diffusion_deep_fake_tpu.models.vgg import VGG_SPECS, VGGEncoder
from denoising_diffusion_deep_fake_tpu.models.dpn import (
    DPN_SPECS,
    DPNEncoder,
)
from denoising_diffusion_deep_fake_tpu.models.inceptionresnetv2 import (
    InceptionResNetV2Encoder,
)
from denoising_diffusion_deep_fake_tpu.models.inceptionv4 import (
    InceptionV4Encoder,
)
from denoising_diffusion_deep_fake_tpu.models.xception import XceptionEncoder


def make_encoder(encoder_name: str, in_channels: int = 3,
                 dtype: Any = jnp.float32) -> nn.Module:
    """Encoder factory over every supported smp encoder family.

    All encoders share one contract: ``encoder(x, train)`` returns a
    six-level feature pyramid at strides (1, 2, 4, 8, 16, 32) whose first
    level the decoder drops (smp ``UnetDecoder.forward``'s ``features[1:]``).
    ``dtype`` is the conv compute dtype (bf16 in training; BN normalization
    stays fp32) — without it flax's dtype=None promotes every encoder conv
    back to fp32 against the fp32 params, silently doubling MXU time and
    activation bytes.
    """
    if encoder_name in RESNET_SPECS:
        return ResNetEncoder(encoder_name=encoder_name,
                             in_channels=in_channels,
                             dtype=dtype, name="encoder")
    if encoder_name in VGG_SPECS:
        return VGGEncoder(encoder_name=encoder_name,
                          in_channels=in_channels,
                          dtype=dtype, name="encoder")
    if encoder_name in DENSENET_SPECS:
        return DenseNetEncoder(encoder_name=encoder_name,
                               in_channels=in_channels,
                               dtype=dtype, name="encoder")
    if encoder_name in SENET_SPECS:
        return SENetEncoder(encoder_name=encoder_name,
                            in_channels=in_channels,
                            dtype=dtype, name="encoder")
    if encoder_name in EFFICIENTNET_SPECS:
        return EfficientNetEncoder(encoder_name=encoder_name,
                                   in_channels=in_channels,
                                   dtype=dtype, name="encoder")
    if encoder_name == "mobilenet_v2":
        return MobileNetV2Encoder(in_channels=in_channels, dtype=dtype,
                                  name="encoder")
    if encoder_name == "xception":
        return XceptionEncoder(in_channels=in_channels, dtype=dtype,
                               name="encoder")
    if encoder_name == "inceptionv4":
        return InceptionV4Encoder(in_channels=in_channels, dtype=dtype,
                                  name="encoder")
    if encoder_name == "inceptionresnetv2":
        return InceptionResNetV2Encoder(in_channels=in_channels, dtype=dtype,
                                        name="encoder")
    if encoder_name in DPN_SPECS:
        return DPNEncoder(encoder_name=encoder_name, in_channels=in_channels,
                          dtype=dtype, name="encoder")
    available = (sorted(RESNET_SPECS) + sorted(VGG_SPECS)
                 + sorted(DENSENET_SPECS) + sorted(EFFICIENTNET_SPECS)
                 + sorted(SENET_SPECS) + sorted(DPN_SPECS)
                 + ["inceptionresnetv2", "inceptionv4", "mobilenet_v2",
                    "xception"])
    raise ValueError(
        f"unsupported encoder_name {encoder_name!r}; available: {available}")

# smp initialize_decoder: kaiming_uniform_(mode="fan_in", nonlinearity="relu")
_decoder_init = nn.initializers.variance_scaling(2.0, "fan_in", "uniform")
# smp initialize_head: xavier_uniform_
_head_init = nn.initializers.variance_scaling(1.0, "fan_avg", "uniform")


def _upsample_nearest_2x(x: jax.Array) -> jax.Array:
    """Nearest-neighbor 2x upsample of NHWC (== torch interpolate 'nearest')."""
    x = jnp.repeat(x, 2, axis=1)
    return jnp.repeat(x, 2, axis=2)


class Conv2dReLU(nn.Module):
    """Conv3x3 (no bias) -> BN -> ReLU, smp's decoder building block."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    kernel_init=_decoder_init, dtype=self.dtype,
                    name="conv")(x)
        # Stats always fp32 (flax promotes); dtype = output dtype, so the
        # decoder's materialized activations stay bf16 in training.
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(y)
        return nn.relu(y)


class DecoderBlock(nn.Module):
    """Upsample 2x, concat skip, two Conv2dReLU (smp DecoderBlock)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, skip: jax.Array | None,
                 train: bool) -> jax.Array:
        y = _upsample_nearest_2x(x)
        if skip is not None:
            y = jnp.concatenate([y, skip.astype(y.dtype)], axis=-1)
        y = Conv2dReLU(self.features, dtype=self.dtype, name="conv1")(y, train)
        y = Conv2dReLU(self.features, dtype=self.dtype, name="conv2")(y, train)
        return y


class Unet(nn.Module):
    """smp-parity U-Net: ResNet encoder + (256,128,64,32,16) decoder."""

    encoder_name: str = "resnet34"
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    in_channels: int = 3
    classes: int = 3
    dtype: Any = jnp.float32  # compute dtype; params stay fp32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        features = make_encoder(self.encoder_name, self.in_channels,
                                self.dtype)(x.astype(self.dtype), train)
        # smp UnetDecoder: head = deepest feature; skips are the shallower
        # pyramid levels in reverse, excluding the raw input.
        head, skips = features[-1], features[1:-1][::-1]
        y = head
        if self.encoder_name.startswith("vgg"):
            # smp Unet sets center=True for vgg encoders: a CenterBlock of
            # two Conv2dReLU at head channels runs before the decoder
            # (smp decoders/unet/model.py `center=encoder_name.startswith
            # ("vgg")`; CenterBlock(head_channels, head_channels)).
            y = Conv2dReLU(y.shape[-1], dtype=self.dtype,
                           name="center_conv1")(y, train)
            y = Conv2dReLU(y.shape[-1], dtype=self.dtype,
                           name="center_conv2")(y, train)
        for i, ch in enumerate(self.decoder_channels):
            skip = skips[i] if i < len(skips) else None
            y = DecoderBlock(ch, dtype=self.dtype, name=f"decoder_block{i}")(
                y, skip, train)
        y = nn.Conv(self.classes, (3, 3), padding=1, use_bias=True,
                    kernel_init=_head_init, bias_init=nn.initializers.zeros,
                    dtype=self.dtype, name="segmentation_head")(y)
        return y.astype(jnp.float32)


def space_to_depth(x: jax.Array, p: int) -> jax.Array:
    """NHWC [B,H,W,C] -> [B,H/p,W/p,C*p*p] (pixel-unshuffle)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // p, p, w // p, p, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // p, w // p,
                                                 p * p * c)


def depth_to_space(x: jax.Array, p: int) -> jax.Array:
    """Inverse of ``space_to_depth`` (pixel-shuffle)."""
    b, h, w, cpp = x.shape
    c = cpp // (p * p)
    x = x.reshape(b, h, w, p, p, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * p, w * p, c)


class PatchifiedUnet(nn.Module):
    """Opt-in NON-PARITY variant: pixel-unshuffle the input p×p, run the
    whole U-Net at H/p × W/p, pixel-shuffle the head back to full res.

    Motivation (BASELINE.md round-4 448² trace): the top device-time sink
    is bandwidth-bound full-resolution stem/decoder elementwork on
    [B,448,448,~16] tensors; running the network at H/p shrinks every
    full-res map p² in area. This changes the MODEL (each output pixel is
    predicted jointly with its p×p block), so it is off by default, has no
    reference counterpart, and checkpoints cannot be exported to the
    torch replica. Enable with ``patchify_stem: p`` in configs.
    """

    encoder_name: str = "resnet34"
    patch: int = 2
    classes: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        p = self.patch
        if x.shape[1] % (32 * p) or x.shape[2] % (32 * p):
            raise ValueError(
                f"patchify_stem={p}: H/W must be divisible by {32 * p} "
                f"(got {x.shape[1]}x{x.shape[2]}) so the patched encoder "
                "pyramid stays integral")
        y = space_to_depth(x.astype(self.dtype), p)
        y = Unet(encoder_name=self.encoder_name, in_channels=3 * p * p,
                 classes=self.classes * p * p, dtype=self.dtype,
                 name="unet")(y, train)
        return depth_to_space(y, p).astype(jnp.float32)


def create_unet(encoder_name: str = "resnet34", *, in_channels: int = 3,
                classes: int = 3, dtype: Any = jnp.float32,
                patchify: int = 1) -> nn.Module:
    """Factory mirroring the reference's ``create_model_instance``
    (`/root/reference/d3f/train_deep_fake/lit_module.py:49-60`).
    ``patchify > 1`` returns the opt-in non-parity ``PatchifiedUnet``."""
    if patchify > 1:
        make_encoder(encoder_name, in_channels * patchify * patchify, dtype)
        return PatchifiedUnet(encoder_name=encoder_name, patch=patchify,
                              classes=classes, dtype=dtype)
    make_encoder(encoder_name, in_channels, dtype)  # raise early on unknown names
    return Unet(encoder_name=encoder_name, in_channels=in_channels,
                classes=classes, dtype=dtype)
