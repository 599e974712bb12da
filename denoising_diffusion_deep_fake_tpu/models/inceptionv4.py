"""InceptionV4 encoder (NHWC, Flax linen) with smp/pretrainedmodels parity.

The reference passes ``encoder_name`` straight through to
``segmentation_models_pytorch.Unet`` (`/root/reference/d3f/train_deep_fake/
lit_module.py:53-59`), so smp's ``inceptionv4`` (Cadene/pretrainedmodels) is
config-reachable. smp's ``InceptionV4Encoder`` wraps the 22-module
``features`` Sequential with ``stage_idxs=(3, 5, 9, 15)`` and
``out_channels=(3, 64, 192, 384, 1024, 1536)``:

    stage 1: features[0:3]   stem convs                        @ 1/2, 64ch
    stage 2: features[3:5]   Mixed_3a + Mixed_4a               @ 1/4, 192
    stage 3: features[5:9]   Mixed_5a + 3x Inception_A         @ 1/8, 384
    stage 4: features[9:15]  Inception_A + Reduction_A + 4x B  @ 1/16, 1024
    stage 5: features[15:]   3x Inception_B + Reduction_B + 3x C  @ 1/32, 1536

(the 4th Inception_A and 3 of the 7 Inception_B land in the NEXT stage —
smp's split is positional, not architectural.)

Parity details carried over from pretrainedmodels ``inceptionv4.py`` + smp's
``encoders/inceptionv4.py``:
* smp "corrects paddings": every 3x3 Conv2d gets ``padding=(1,1)`` and every
  MaxPool2d gets ``padding=(1,1)`` (the Cadene originals are pad-0, which
  would break the exact /2 pyramid); the (1,7)/(7,1)/(1,3)/(3,1) convs keep
  their own asymmetric pads,
* ``BasicConv2d`` = conv (no bias) + BN(eps=1e-3, momentum 0.1) + ReLU,
* branch AvgPool2d(3, stride=1, padding=1, **count_include_pad=False**) —
  edge windows divide by the VALID element count (4/6/9), emulated with a
  static per-position count map,
* concat orders follow the torch ``forward``s exactly (e.g. Mixed_3a pools
  FIRST, Mixed_5a convs first),
* init: pretrainedmodels defines no custom init — torch Conv2d default
  kaiming-uniform(a=sqrt(5)) == variance_scaling(1/3, fan_in, uniform),
* the dead ``last_linear`` (1536->1001) is omitted (smp sets it to None);
  encoder + that head reconstructs the published total (test_models.py).

Param-tree names mirror the torch paths (``features.6.branch1.0.conv`` ->
``features_6/branch1_0/conv``) so checkpoint import is mechanical.

TPU note: the many small branch convs are 1x1/7x1-style MXU matmuls; XLA
fuses BN+ReLU into each and the concats are free (layout ops). Static
shapes throughout; bf16 via ``dtype``.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

INCEPTIONV4_OUT_CHANNELS = (3, 64, 192, 384, 1024, 1536)

# torch Conv2d default init (pretrainedmodels defines no custom init).
_conv_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def avg_pool_3x3_no_pad_count(x: jax.Array) -> jax.Array:
    """torch ``AvgPool2d(3, stride=1, padding=1, count_include_pad=False)``:
    zero-pad sum pool divided by the number of VALID window elements
    (static per-position map — 9 interior, 6 edges, 4 corners)."""
    h, w = x.shape[1], x.shape[2]
    summed = jax.lax.reduce_window(
        x, jnp.zeros((), x.dtype), jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)))
    rows = np.minimum(np.arange(h) + 2, h) - np.maximum(np.arange(h) - 1, 0)
    cols = np.minimum(np.arange(w) + 2, w) - np.maximum(np.arange(w) - 1, 0)
    counts = jnp.asarray(np.outer(rows, cols), x.dtype)
    return summed / counts[None, :, :, None]


def _maxpool_3x3_s2_p1(x: jax.Array) -> jax.Array:
    """MaxPool2d(3, stride=2) after smp's pad-1 patch."""
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))


class BasicConv2d(nn.Module):
    """Cadene BasicConv2d: conv (no bias) + BN(eps 1e-3) + ReLU.

    ``padding`` follows the torch module AFTER smp's patch (3x3 -> pad 1).
    """

    features: int
    kernel: tuple[int, int] = (1, 1)
    strides: int = 1
    padding: Any = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        else:
            pad = tuple((p, p) for p in pad)
        y = nn.Conv(self.features, self.kernel, strides=(self.strides,) * 2,
                    padding=pad, use_bias=False, kernel_init=_conv_init,
                    dtype=self.dtype, name="conv")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-3, dtype=self.dtype, name="bn")(y)
        return nn.relu(y)


def _basic(features, kernel=(1, 1), strides=1, padding=0, *, dtype, name):
    return BasicConv2d(features=features, kernel=kernel, strides=strides,
                       padding=padding, dtype=dtype, name=name)


class _Branches(nn.Module):
    """One inception mixed module; ``kind`` selects the torch wiring."""

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

        k = self.kind
        if k == "mixed_3a":
            return jnp.concatenate(
                [_maxpool_3x3_s2_p1(x),
                 _basic(96, (3, 3), 2, 1, dtype=d, name="conv")(x, train)],
                axis=-1)
        if k == "mixed_4a":
            b0 = seq("branch0", (64, (1, 1), 1, 0),
                     (96, (3, 3), 1, 1))
            b1 = seq("branch1", (64, (1, 1), 1, 0),
                     (64, (1, 7), 1, (0, 3)),
                     (64, (7, 1), 1, (3, 0)),
                     (96, (3, 3), 1, 1))
            return jnp.concatenate([b0, b1], axis=-1)
        if k == "mixed_5a":
            return jnp.concatenate(
                [_basic(192, (3, 3), 2, 1, dtype=d, name="conv")(x, train),
                 _maxpool_3x3_s2_p1(x)], axis=-1)
        if k == "inception_a":
            b0 = _basic(96, dtype=d, name="branch0")(x, train)
            b1 = seq("branch1", (64, (1, 1), 1, 0),
                     (96, (3, 3), 1, 1))
            b2 = seq("branch2", (64, (1, 1), 1, 0),
                     (96, (3, 3), 1, 1), (96, (3, 3), 1, 1))
            b3 = _basic(96, dtype=d, name="branch3_1")(
                avg_pool_3x3_no_pad_count(x), train)
            return jnp.concatenate([b0, b1, b2, b3], axis=-1)
        if k == "reduction_a":
            b0 = _basic(384, (3, 3), 2, 1, dtype=d, name="branch0")(x, train)
            b1 = seq("branch1", (192, (1, 1), 1, 0),
                     (224, (3, 3), 1, 1), (256, (3, 3), 2, 1))
            return jnp.concatenate([b0, b1, _maxpool_3x3_s2_p1(x)], axis=-1)
        if k == "inception_b":
            b0 = _basic(384, dtype=d, name="branch0")(x, train)
            b1 = seq("branch1", (192, (1, 1), 1, 0),
                     (224, (1, 7), 1, (0, 3)),
                     (256, (7, 1), 1, (3, 0)))
            b2 = seq("branch2", (192, (1, 1), 1, 0),
                     (192, (7, 1), 1, (3, 0)),
                     (224, (1, 7), 1, (0, 3)),
                     (224, (7, 1), 1, (3, 0)),
                     (256, (1, 7), 1, (0, 3)))
            b3 = _basic(128, dtype=d, name="branch3_1")(
                avg_pool_3x3_no_pad_count(x), train)
            return jnp.concatenate([b0, b1, b2, b3], axis=-1)
        if k == "reduction_b":
            b0 = seq("branch0", (192, (1, 1), 1, 0),
                     (192, (3, 3), 2, 1))
            b1 = seq("branch1", (256, (1, 1), 1, 0),
                     (256, (1, 7), 1, (0, 3)),
                     (320, (7, 1), 1, (3, 0)),
                     (320, (3, 3), 2, 1))
            return jnp.concatenate([b0, b1, _maxpool_3x3_s2_p1(x)], axis=-1)
        # inception_c
        b0 = _basic(256, dtype=d, name="branch0")(x, train)
        b1_0 = _basic(384, dtype=d, name="branch1_0")(x, train)
        b1 = jnp.concatenate(
            [_basic(256, (1, 3), 1, (0, 1), dtype=d, name="branch1_1a")(
                b1_0, train),
             _basic(256, (3, 1), 1, (1, 0), dtype=d, name="branch1_1b")(
                b1_0, train)], axis=-1)
        b2 = _basic(384, dtype=d, name="branch2_0")(x, train)
        b2 = _basic(448, (3, 1), 1, (1, 0), dtype=d, name="branch2_1")(
            b2, train)
        b2 = _basic(512, (1, 3), 1, (0, 1), dtype=d, name="branch2_2")(
            b2, train)
        b2 = jnp.concatenate(
            [_basic(256, (1, 3), 1, (0, 1), dtype=d, name="branch2_3a")(
                b2, train),
             _basic(256, (3, 1), 1, (1, 0), dtype=d, name="branch2_3b")(
                b2, train)], axis=-1)
        b3 = _basic(256, dtype=d, name="branch3_1")(
            avg_pool_3x3_no_pad_count(x), train)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


# The 22 features modules in torch Sequential order: (kind,) or a stem conv.
_FEATURES = (("stem", 32, 2), ("stem", 32, 1), ("stem", 64, 1, 1),
             ("mixed_3a",), ("mixed_4a",), ("mixed_5a",),
             *((("inception_a",),) * 4), ("reduction_a",),
             *((("inception_b",),) * 7), ("reduction_b",),
             *((("inception_c",),) * 3))
INCEPTIONV4_STAGE_IDXS = (3, 5, 9, 15)


class InceptionV4Encoder(nn.Module):
    """Feature-pyramid InceptionV4 encoder (smp stage_idxs (3, 5, 9, 15))."""

    encoder_name: str = "inceptionv4"
    in_channels: int = 3
    dtype: Any = jnp.float32  # conv compute dtype; BN normalization stays fp32

    @property
    def out_channels(self) -> Sequence[int]:
        return (self.in_channels,) + INCEPTIONV4_OUT_CHANNELS[1:]

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> list[jax.Array]:
        features = [x]
        y = x
        bounds = set(INCEPTIONV4_STAGE_IDXS)
        for i, spec in enumerate(_FEATURES):
            if i in bounds:
                features.append(y)
            if spec[0] == "stem":
                ch, stride = spec[1], spec[2]
                pad = spec[3] if len(spec) > 3 else 1  # smp pad-1 patch
                y = _basic(ch, (3, 3), stride, pad, dtype=self.dtype,
                           name=f"features_{i}")(y, train)
            else:
                y = _Branches(kind=spec[0], dtype=self.dtype,
                              name=f"features_{i}")(y, train)
        features.append(y)
        return features
