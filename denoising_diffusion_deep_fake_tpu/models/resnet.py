"""ResNet encoders (NHWC, Flax linen) with torchvision-topology parity.

The reference's only model is ``segmentation_models_pytorch.Unet`` whose
encoder is a torchvision-style ResNet (`/root/reference/d3f/train_deep_fake/
lit_module.py:53-59`, ``encoder_name="resnet34"`` in every config). This module
rebuilds that encoder family TPU-first:

* NHWC layout (dense lane dimension for the VPU; XLA picks MXU-friendly conv
  layouts),
* batch norm with torch semantics (eps 1e-5, torch momentum 0.1 == flax
  momentum 0.9, batch stats in training mode),
* init parity with torchvision: He-normal fan-out for convs, ones/zeros for BN,
* returns the 6-element feature pyramid smp's UnetDecoder consumes
  (identity, conv1-relu at 1/2, layer1 at 1/4, layer2 at 1/8, layer3 at 1/16,
  layer4 at 1/32).

Supported: the full smp resnet encoder family — resnet18/34 (BasicBlock),
resnet50/101/152 (Bottleneck), resnext50_32x4d / resnext101_32x8d (grouped
Bottleneck), wide_resnet50_2 / wide_resnet101_2 — every resnet-family name
smp's ``Unet(encoder_name=...)`` accepts (the reference passes the name
straight through, `lit_module.py:53-59`).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from typing import NamedTuple


class ResNetSpec(NamedTuple):
    """One torchvision-family encoder variant (smp's resnet catalog,
    `segmentation_models_pytorch/encoders/resnet.py` — every name smp's
    ``Unet(encoder_name=...)`` accepts from the resnet family)."""

    kind: str                   # "basic" | "bottleneck"
    blocks: tuple               # blocks per stage
    widths: tuple = (64, 128, 256, 512)   # stage planes
    expansion: int = 1
    groups: int = 1             # ResNeXt cardinality
    base_width: int = 64        # ResNeXt/wide bottleneck width basis


RESNET_SPECS = {
    "resnet18": ResNetSpec("basic", (2, 2, 2, 2)),
    "resnet34": ResNetSpec("basic", (3, 4, 6, 3)),
    "resnet50": ResNetSpec("bottleneck", (3, 4, 6, 3), expansion=4),
    "resnet101": ResNetSpec("bottleneck", (3, 4, 23, 3), expansion=4),
    "resnet152": ResNetSpec("bottleneck", (3, 8, 36, 3), expansion=4),
    "resnext50_32x4d": ResNetSpec("bottleneck", (3, 4, 6, 3), expansion=4,
                                  groups=32, base_width=4),
    "resnext101_32x8d": ResNetSpec("bottleneck", (3, 4, 23, 3), expansion=4,
                                   groups=32, base_width=8),
    "wide_resnet50_2": ResNetSpec("bottleneck", (3, 4, 6, 3), expansion=4,
                                  base_width=128),
    "wide_resnet101_2": ResNetSpec("bottleneck", (3, 4, 23, 3), expansion=4,
                                   base_width=128),
}

# torchvision kaiming_normal_(mode="fan_out", nonlinearity="relu")
_conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def _bn(name: str, train: bool, dtype=jnp.float32):
    # flax BatchNorm computes batch statistics in fp32 regardless of dtype
    # (flax _compute_stats promotes); dtype only sets the OUTPUT dtype, so
    # bf16 here halves the materialized activation bytes without degrading
    # the normalization math.
    return nn.BatchNorm(name=name, use_running_average=not train,
                        momentum=0.9, epsilon=1e-5, dtype=dtype)


class BasicBlock(nn.Module):
    """3x3 -> 3x3 residual block (torchvision BasicBlock)."""

    features: int
    strides: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        residual = x
        y = nn.Conv(self.features, (3, 3), strides=(self.strides,) * 2,
                    padding=1, use_bias=False, kernel_init=_conv_init, dtype=self.dtype,
                    name="conv1")(x)
        y = _bn("bn1", train, self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    kernel_init=_conv_init, dtype=self.dtype, name="conv2")(y)
        y = _bn("bn2", train, self.dtype)(y)
        if self.strides != 1 or x.shape[-1] != self.features:
            residual = nn.Conv(self.features, (1, 1),
                               strides=(self.strides,) * 2, use_bias=False,
                               kernel_init=_conv_init, dtype=self.dtype,
                               name="downsample_conv")(x)
            residual = _bn("downsample_bn", train, self.dtype)(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 residual block (torchvision Bottleneck, expansion 4).

    ``groups``/``base_width`` follow torchvision exactly: the inner width is
    ``int(planes * base_width / 64) * groups`` and the 3x3 conv is grouped —
    covering ResNeXt (groups=32) and wide (base_width=128) variants.
    """

    features: int
    strides: int = 1
    expansion: int = 4
    groups: int = 1
    base_width: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        width = int(self.features * self.base_width / 64) * self.groups
        out = self.features * self.expansion
        residual = x
        y = nn.Conv(width, (1, 1), use_bias=False,
                    kernel_init=_conv_init, dtype=self.dtype, name="conv1")(x)
        y = nn.relu(_bn("bn1", train, self.dtype)(y))
        y = nn.Conv(width, (3, 3), strides=(self.strides,) * 2,
                    padding=1, use_bias=False, kernel_init=_conv_init, dtype=self.dtype,
                    feature_group_count=self.groups, name="conv2")(y)
        y = nn.relu(_bn("bn2", train, self.dtype)(y))
        y = nn.Conv(out, (1, 1), use_bias=False, kernel_init=_conv_init, dtype=self.dtype,
                    name="conv3")(y)
        y = _bn("bn3", train, self.dtype)(y)
        if self.strides != 1 or x.shape[-1] != out:
            residual = nn.Conv(out, (1, 1), strides=(self.strides,) * 2,
                               use_bias=False, kernel_init=_conv_init, dtype=self.dtype,
                               name="downsample_conv")(x)
            residual = _bn("downsample_bn", train, self.dtype)(residual)
        return nn.relu(y + residual)


class ResNetEncoder(nn.Module):
    """Feature-pyramid ResNet encoder (smp ``get_stages`` semantics).

    Returns ``[x, c1, c2, c3, c4, c5]`` at strides (1, 2, 4, 8, 16, 32).
    """

    encoder_name: str = "resnet34"
    in_channels: int = 3
    dtype: Any = jnp.float32  # conv compute dtype; BN normalization stays fp32

    @property
    def out_channels(self) -> Sequence[int]:
        spec = RESNET_SPECS[self.encoder_name]
        return (self.in_channels, 64) + tuple(
            w * spec.expansion for w in spec.widths)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> list[jax.Array]:
        spec = RESNET_SPECS[self.encoder_name]

        features = [x]
        y = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    kernel_init=_conv_init, dtype=self.dtype, name="conv1")(x)
        y = nn.relu(_bn("bn1", train, self.dtype)(y))
        features.append(y)

        # torch MaxPool2d(kernel_size=3, stride=2, padding=1); -inf padding so
        # the pad never wins the max.
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        for stage_idx, (n_blocks, width) in enumerate(
                zip(spec.blocks, spec.widths)):
            for block_idx in range(n_blocks):
                strides = 2 if (stage_idx > 0 and block_idx == 0) else 1
                name = f"layer{stage_idx + 1}_{block_idx}"
                if spec.kind == "basic":
                    y = BasicBlock(features=width, strides=strides,
                                   dtype=self.dtype, name=name)(y, train)
                else:
                    y = Bottleneck(features=width, strides=strides,
                                   expansion=spec.expansion,
                                   groups=spec.groups,
                                   base_width=spec.base_width,
                                   dtype=self.dtype, name=name)(y, train)
            features.append(y)
        return features
