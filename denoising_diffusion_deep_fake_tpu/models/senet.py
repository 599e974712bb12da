"""SE-Net encoders (NHWC, Flax linen) with smp/pretrainedmodels parity.

The reference passes ``encoder_name`` straight through to
``segmentation_models_pytorch.Unet`` (`/root/reference/d3f/train_deep_fake/
lit_module.py:53-59`), so smp's senet family — ``se_resnet50/101/152``,
``se_resnext50_32x4d``, ``se_resnext101_32x4d``, ``senet154`` — is
config-reachable. smp's ``SENetEncoder`` wraps Cadene/pretrainedmodels'
``SENet`` with stages

    stage 0: identity (raw input)
    stage 1: layer0 WITHOUT its trailing maxpool              @ 1/2
    stage 2: that maxpool + layer1                            @ 1/4
    stage 3: layer2                                           @ 1/8
    stage 4: layer3                                           @ 1/16
    stage 5: layer4                                           @ 1/32

Parity details carried over from pretrainedmodels ``senet.py``:
* SEModule: global-avgpool -> 1x1 ``fc1`` (C -> C/reduction, WITH bias) ->
  ReLU -> 1x1 ``fc2`` (back to C, WITH bias) -> sigmoid, multiplied into the
  bottleneck output BEFORE the residual add (``se_module(out) + residual``),
  reduction 16 everywhere,
* ``SEResNetBottleneck`` puts the STRIDE ON conv1 (the 1x1!) — a documented
  Caffe-port quirk of pretrainedmodels, unlike torchvision's stride-on-3x3,
* ``SEResNeXtBottleneck``: width = floor(planes * base_width/64) * groups
  (base_width 4, groups 32), stride on conv2 (the grouped 3x3),
* ``SEBottleneck`` (senet154): conv1 1x1 -> planes*2, conv2 grouped 3x3
  (stride) -> planes*4, conv3 1x1 -> planes*4; groups 64,
* stem: se_resnet/se_resnext use conv7x7/2 (``layer0.conv1``) + BN + ReLU
  with inplanes 64; senet154 uses the 3x conv3x3 stem (64, 64, 128) with
  inplanes 128 (``input_3x3=True``),
* the stem maxpool is ``MaxPool2d(3, stride=2, ceil_mode=True)`` —
  NO padding, ceil mode (window may overrun the right/bottom edge; torch
  maxes over the valid part only, equivalent to -inf padding on that edge),
  unlike torchvision resnet's pad-1 floor pool,
* layer1's residual downsample is always 1x1/pad 0; senet154's layers 2-4
  use 3x3/pad 1 downsamples (``downsample_kernel_size=3``),
* init: pretrainedmodels never overrides torch defaults — conv weights
  kaiming-uniform(a=sqrt(5)) == variance_scaling(1/3, fan_in, uniform),
  SE fc biases uniform(+-1/sqrt(fan_in)), BN ones/zeros,
* dead classifier pieces (``avg_pool``, ``dropout``, ``last_linear``) are
  omitted (smp deletes ``last_linear``; none is used in ``forward``).

Param counts are pinned against pretrainedmodels' published totals
(se_resnet50: 28,088,024 incl. the 2,049,000-param fc we omit; verified
analytically: resnet50's 25,557,032 + 2,530,992 of SE params).

Param-tree names flatten the torch paths (``layer2.0.se_module.fc1`` ->
``layer2_0/se_fc1``) so checkpoint import (`utils/torch_import.py`) is a
mechanical rename.

TPU note: the SE global-mean is a tiny reduce feeding two 1x1 convs on the
MXU; the broadcast-multiply fuses into the residual add. All heavy convs
are standard MXU work like the resnet family.
"""

from __future__ import annotations

import math
from typing import Any, NamedTuple, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class SENetSpec(NamedTuple):
    """One pretrainedmodels SENet variant (smp's senet catalog)."""

    block: str                  # "se_resnet" | "se_resnext" | "se_bottleneck"
    layers: tuple               # blocks per stage
    groups: int = 1
    reduction: int = 16
    inplanes: int = 64
    input_3x3: bool = False     # senet154's 3-conv stem
    downsample_3x3: bool = False  # senet154: 3x3 downsamples in layers 2-4
    base_width: int = 4         # se_resnext bottleneck width basis


SENET_SPECS = {
    "se_resnet50": SENetSpec("se_resnet", (3, 4, 6, 3)),
    "se_resnet101": SENetSpec("se_resnet", (3, 4, 23, 3)),
    "se_resnet152": SENetSpec("se_resnet", (3, 8, 36, 3)),
    "se_resnext50_32x4d": SENetSpec("se_resnext", (3, 4, 6, 3), groups=32),
    "se_resnext101_32x4d": SENetSpec("se_resnext", (3, 4, 23, 3), groups=32),
    "senet154": SENetSpec("se_bottleneck", (3, 8, 36, 3), groups=64,
                          inplanes=128, input_3x3=True, downsample_3x3=True),
}

# torch Conv2d default init (pretrainedmodels defines no custom init).
_conv_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def _torch_bias_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _bn(name: str, train: bool, dtype=jnp.float32) -> nn.BatchNorm:
    # Stats always fp32 (flax promotes); dtype sets only the output dtype.
    return nn.BatchNorm(name=name, use_running_average=not train,
                        momentum=0.9, epsilon=1e-5, dtype=dtype)


def _ceil_maxpool_3x3_s2(x: jax.Array) -> jax.Array:
    """torch ``MaxPool2d(3, stride=2, ceil_mode=True)`` (no padding): the
    output length is ceil((n-3)/2)+1 and the final window may overrun the
    edge — emulated with exactly the needed -inf padding on the high side.
    """

    def high_pad(n: int) -> int:
        out = -(-(n - 3) // 2) + 1
        return max(2 * (out - 1) + 3 - n, 0)

    pad = ((0, high_pad(x.shape[1])), (0, high_pad(x.shape[2])))
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=pad)


class SEBottleneckBlock(nn.Module):
    """pretrainedmodels Bottleneck with an SEModule before the residual add.

    ``kind`` selects the three conv wirings (se_resnet / se_resnext /
    senet154's se_bottleneck) — see the module docstring for the quirks.
    """

    planes: int
    kind: str
    strides: int = 1
    groups: int = 1
    reduction: int = 16
    base_width: int = 4
    downsample_3x3: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        p = self.planes
        out_ch = p * 4
        if self.kind == "se_resnet":
            # Caffe-port quirk: stride lives on the 1x1 conv1.
            widths = (p, p)
            strides = (self.strides, 1)
            groups = 1
        elif self.kind == "se_resnext":
            w = math.floor(p * (self.base_width / 64)) * self.groups
            widths = (w, w)
            strides = (1, self.strides)
            groups = self.groups
        else:  # senet154 SEBottleneck
            widths = (p * 2, p * 4)
            strides = (1, self.strides)
            groups = self.groups

        y = nn.Conv(widths[0], (1, 1), strides=(strides[0],) * 2,
                    use_bias=False, kernel_init=_conv_init, dtype=self.dtype,
                    name="conv1")(x)
        y = nn.relu(_bn("bn1", train, self.dtype)(y))
        y = nn.Conv(widths[1], (3, 3), strides=(strides[1],) * 2, padding=1,
                    feature_group_count=groups, use_bias=False,
                    kernel_init=_conv_init, dtype=self.dtype, name="conv2")(y)
        y = nn.relu(_bn("bn2", train, self.dtype)(y))
        y = nn.Conv(out_ch, (1, 1), use_bias=False, kernel_init=_conv_init,
                    dtype=self.dtype, name="conv3")(y)
        y = _bn("bn3", train, self.dtype)(y)

        # SEModule (reduction 16): pooled 1x1 convs WITH biases.
        se_ch = out_ch // self.reduction
        se = jnp.mean(y, axis=(1, 2), keepdims=True)
        se = nn.Conv(se_ch, (1, 1), kernel_init=_conv_init,
                     bias_init=_torch_bias_init(out_ch), dtype=self.dtype,
                     name="se_fc1")(se)
        se = nn.Conv(out_ch, (1, 1), kernel_init=_conv_init,
                     bias_init=_torch_bias_init(se_ch), dtype=self.dtype,
                     name="se_fc2")(nn.relu(se))
        y = y * nn.sigmoid(se)

        residual = x
        if self.strides != 1 or x.shape[-1] != out_ch:
            k = 3 if self.downsample_3x3 else 1
            residual = nn.Conv(out_ch, (k, k), strides=(self.strides,) * 2,
                               padding=(k - 1) // 2, use_bias=False,
                               kernel_init=_conv_init, dtype=self.dtype,
                               name="downsample_conv")(x)
            residual = _bn("downsample_bn", train, self.dtype)(residual)
        return nn.relu(y + residual)


class SENetEncoder(nn.Module):
    """Feature-pyramid SE-Net encoder (smp ``SENetEncoder`` stage split)."""

    encoder_name: str = "se_resnet50"
    in_channels: int = 3
    dtype: Any = jnp.float32  # conv compute dtype; BN normalization stays fp32

    @property
    def out_channels(self) -> Sequence[int]:
        spec = SENET_SPECS[self.encoder_name]
        return (self.in_channels, spec.inplanes, 256, 512, 1024, 2048)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> list[jax.Array]:
        spec = SENET_SPECS[self.encoder_name]
        features = [x]
        if spec.input_3x3:
            # senet154 stem: 3x conv3x3 (64, 64, 128), stride 2 on the first.
            y = x
            for i, (ch, s) in enumerate(((64, 2), (64, 1), (128, 1)), start=1):
                y = nn.Conv(ch, (3, 3), strides=(s, s), padding=1,
                            use_bias=False, kernel_init=_conv_init,
                            dtype=self.dtype, name=f"layer0_conv{i}")(y)
                y = nn.relu(_bn(f"layer0_bn{i}", train, self.dtype)(y))
        else:
            y = nn.Conv(spec.inplanes, (7, 7), strides=(2, 2), padding=3,
                        use_bias=False, kernel_init=_conv_init,
                        dtype=self.dtype, name="layer0_conv1")(x)
            y = nn.relu(_bn("layer0_bn1", train, self.dtype)(y))
        features.append(y)

        y = _ceil_maxpool_3x3_s2(y)
        for stage_idx, (n_blocks, planes) in enumerate(
                zip(spec.layers, (64, 128, 256, 512)), start=1):
            for block_idx in range(n_blocks):
                strides = 2 if (stage_idx > 1 and block_idx == 0) else 1
                y = SEBottleneckBlock(
                    planes=planes, kind=spec.block, strides=strides,
                    groups=spec.groups, reduction=spec.reduction,
                    base_width=spec.base_width,
                    downsample_3x3=spec.downsample_3x3 and stage_idx > 1,
                    dtype=self.dtype,
                    name=f"layer{stage_idx}_{block_idx}")(y, train)
            features.append(y)
        return features
