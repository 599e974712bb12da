"""Inception-ResNet-v2 encoder (NHWC, Flax linen) with smp parity.

The reference passes ``encoder_name`` straight through to
``segmentation_models_pytorch.Unet`` (`/root/reference/d3f/train_deep_fake/
lit_module.py:53-59`), so smp's ``inceptionresnetv2``
(Cadene/pretrainedmodels) is config-reachable. smp's
``InceptionResNetV2Encoder`` stages with
``out_channels=(3, 64, 192, 320, 1088, 1536)``:

    stage 1: conv2d_1a + conv2d_2a + conv2d_2b            @ 1/2, 64ch
    stage 2: maxpool_3a + conv2d_3b + conv2d_4a           @ 1/4, 192
    stage 3: maxpool_5a + mixed_5b + repeat (10x block35) @ 1/8, 320
    stage 4: mixed_6a + repeat_1 (20x block17)            @ 1/16, 1088
    stage 5: mixed_7a + repeat_2 (9x block8) + block8 + conv2d_7b  @ 1/32, 1536

Parity details carried over from pretrainedmodels ``inceptionresnetv2.py``
+ smp's ``encoders/inceptionresnetv2.py``:
* smp "corrects paddings" exactly as for inceptionv4: every 3x3 conv and
  every maxpool gets pad 1 (5x5 keeps its pad 2; the (1,7)/(7,1)/(1,3)/(3,1)
  convs keep their asymmetric pads),
* ``BasicConv2d`` = no-bias conv + BN(eps 1e-3) + ReLU (shared with
  ``models/inceptionv4.py``),
* the residual blocks' up-projection ``conv2d`` is a PLAIN conv WITH bias
  and NO BN; the residual update is ``relu(x + scale * conv2d(branches))``
  with scales 0.17 (block35), 0.10 (block17), 0.20 (repeat_2's block8) and
  the final standalone ``block8`` using scale 1.0 and **no ReLU**
  (``noReLU=True``),
* branch avgpool is ``AvgPool2d(3, 1, 1, count_include_pad=False)``,
* init: torch defaults (pretrainedmodels defines none) — kaiming-uniform
  (a=sqrt(5)); plain-conv biases uniform(+-1/sqrt(fan_in)),
* dead classifier (``avgpool_1a``, ``last_linear``) omitted; encoder + that
  1000-class head reconstructs the published total (test_models.py).

Param-tree names mirror the torch paths (``repeat.3.branch1.0.conv`` ->
``repeat_3/branch1_0/conv``) so checkpoint import is mechanical.

TPU note: the residual blocks are 1x1-dominated MXU work; the scale-add
fuses into the conv epilogue under XLA. Static shapes; bf16 via ``dtype``.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from denoising_diffusion_deep_fake_tpu.models.inceptionv4 import (
    BasicConv2d,
    _maxpool_3x3_s2_p1,
    avg_pool_3x3_no_pad_count,
)

INCEPTIONRESNETV2_OUT_CHANNELS = (3, 64, 192, 320, 1088, 1536)

_conv_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def _torch_bias_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _basic(features, kernel=(1, 1), strides=1, padding=0, *, dtype, name):
    return BasicConv2d(features=features, kernel=kernel, strides=strides,
                       padding=padding, dtype=dtype, name=name)


class ResidualBlock(nn.Module):
    """Cadene Block35 / Block17 / Block8: inception branches -> 1x1 biased
    ``conv2d`` up-projection -> ``x + scale * out`` (+ ReLU unless the final
    standalone block8)."""

    kind: str              # "block35" | "block17" | "block8"
    scale: float
    relu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        d = self.dtype

        def seq(name, *convs):
            y = x
            for i, c in enumerate(convs):
                y = _basic(*c, dtype=d, name=f"{name}_{i}")(y, train)
            return y

        if self.kind == "block35":
            branches = [
                _basic(32, dtype=d, name="branch0")(x, train),
                seq("branch1", (32, (1, 1), 1, 0), (32, (3, 3), 1, 1)),
                seq("branch2", (32, (1, 1), 1, 0), (48, (3, 3), 1, 1),
                    (64, (3, 3), 1, 1)),
            ]
            out_ch = 320
        elif self.kind == "block17":
            branches = [
                _basic(192, dtype=d, name="branch0")(x, train),
                seq("branch1", (128, (1, 1), 1, 0),
                    (160, (1, 7), 1, (0, 3)), (192, (7, 1), 1, (3, 0))),
            ]
            out_ch = 1088
        else:
            branches = [
                _basic(192, dtype=d, name="branch0")(x, train),
                seq("branch1", (192, (1, 1), 1, 0),
                    (224, (1, 3), 1, (0, 1)), (256, (3, 1), 1, (1, 0))),
            ]
            out_ch = 2080
        cat = jnp.concatenate(branches, axis=-1)
        up = nn.Conv(out_ch, (1, 1), use_bias=True, kernel_init=_conv_init,
                     bias_init=_torch_bias_init(cat.shape[-1]),
                     dtype=self.dtype, name="conv2d")(cat)
        y = x + self.scale * up
        return nn.relu(y) if self.relu else y


class _Mixed(nn.Module):
    """mixed_5b / mixed_6a / mixed_7a (torch wiring + smp pad patches)."""

    kind: str
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        d = self.dtype

        def seq(name, *convs):
            y = x
            for i, c in enumerate(convs):
                y = _basic(*c, dtype=d, name=f"{name}_{i}")(y, train)
            return y

        if self.kind == "mixed_5b":
            return jnp.concatenate([
                _basic(96, dtype=d, name="branch0")(x, train),
                seq("branch1", (48, (1, 1), 1, 0), (64, (5, 5), 1, 2)),
                seq("branch2", (64, (1, 1), 1, 0), (96, (3, 3), 1, 1),
                    (96, (3, 3), 1, 1)),
                _basic(64, dtype=d, name="branch3_1")(
                    avg_pool_3x3_no_pad_count(x), train),
            ], axis=-1)
        if self.kind == "mixed_6a":
            return jnp.concatenate([
                _basic(384, (3, 3), 2, 1, dtype=d, name="branch0")(x, train),
                seq("branch1", (256, (1, 1), 1, 0), (256, (3, 3), 1, 1),
                    (384, (3, 3), 2, 1)),
                _maxpool_3x3_s2_p1(x),
            ], axis=-1)
        # mixed_7a
        return jnp.concatenate([
            seq("branch0", (256, (1, 1), 1, 0), (384, (3, 3), 2, 1)),
            seq("branch1", (256, (1, 1), 1, 0), (288, (3, 3), 2, 1)),
            seq("branch2", (256, (1, 1), 1, 0), (288, (3, 3), 1, 1),
                (320, (3, 3), 2, 1)),
            _maxpool_3x3_s2_p1(x),
        ], axis=-1)


class InceptionResNetV2Encoder(nn.Module):
    """Feature-pyramid Inception-ResNet-v2 encoder (smp stage split)."""

    encoder_name: str = "inceptionresnetv2"
    in_channels: int = 3
    dtype: Any = jnp.float32  # conv compute dtype; BN normalization stays fp32

    @property
    def out_channels(self) -> Sequence[int]:
        return (self.in_channels,) + INCEPTIONRESNETV2_OUT_CHANNELS[1:]

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> list[jax.Array]:
        d = self.dtype
        features = [x]
        y = _basic(32, (3, 3), 2, 1, dtype=d, name="conv2d_1a")(x, train)
        y = _basic(32, (3, 3), 1, 1, dtype=d, name="conv2d_2a")(y, train)
        y = _basic(64, (3, 3), 1, 1, dtype=d, name="conv2d_2b")(y, train)
        features.append(y)

        y = _maxpool_3x3_s2_p1(y)
        y = _basic(80, dtype=d, name="conv2d_3b")(y, train)
        y = _basic(192, (3, 3), 1, 1, dtype=d, name="conv2d_4a")(y, train)
        features.append(y)

        y = _maxpool_3x3_s2_p1(y)
        y = _Mixed(kind="mixed_5b", dtype=d, name="mixed_5b")(y, train)
        for i in range(10):
            y = ResidualBlock(kind="block35", scale=0.17, dtype=d,
                              name=f"repeat_{i}")(y, train)
        features.append(y)

        y = _Mixed(kind="mixed_6a", dtype=d, name="mixed_6a")(y, train)
        for i in range(20):
            y = ResidualBlock(kind="block17", scale=0.10, dtype=d,
                              name=f"repeat_1_{i}")(y, train)
        features.append(y)

        y = _Mixed(kind="mixed_7a", dtype=d, name="mixed_7a")(y, train)
        for i in range(9):
            y = ResidualBlock(kind="block8", scale=0.20, dtype=d,
                              name=f"repeat_2_{i}")(y, train)
        y = ResidualBlock(kind="block8", scale=1.0, relu=False, dtype=d,
                          name="block8")(y, train)
        y = _basic(1536, dtype=d, name="conv2d_7b")(y, train)
        features.append(y)
        return features
