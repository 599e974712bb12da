"""Xception encoder (NHWC, Flax linen) with smp/pretrainedmodels parity.

The reference passes ``encoder_name`` straight through to
``segmentation_models_pytorch.Unet`` (`/root/reference/d3f/train_deep_fake/
lit_module.py:53-59`), so smp's ``xception`` (Cadene/pretrainedmodels
``xception.py``, the aligned-Xception ImageNet variant) is config-reachable.
smp's ``XceptionEncoder`` wraps it with stages

    stage 0: identity (raw input)
    stage 1: conv1/bn1/relu + conv2/bn2/relu                    @ 1/2, 64ch
    stage 2: block1                                             @ 1/4, 128
    stage 3: block2                                             @ 1/8, 256
    stage 4: block3..block11                                    @ 1/16, 728
    stage 5: block12 + conv3/bn3/relu + conv4/bn4               @ 1/32, 2048

Parity details carried over from pretrainedmodels ``xception.py`` + smp's
``encoders/xception.py`` patches:
* smp sets ``conv1.padding = conv2.padding = (1, 1)`` ("modify padding to
  maintain output shape") — the Cadene originals are pad-0, which would break
  the exact /2 pyramid the U-Net decoder needs; all in-block convs already
  pad 1,
* ``SeparableConv2d`` = depthwise 3x3 (groups=cin, bias=False) named
  ``conv1`` + pointwise 1x1 (bias=False) named ``pointwise``,
* ``Block(in, out, reps, stride, start_with_relu, grow_first)`` builds its
  ``rep`` Sequential exactly as Cadene does: grow_first prepends
  [ReLU, sep(in->out), BN] then (reps-1)x [ReLU, sep(out->out), BN];
  grow_first=False appends the growing trio last; ``start_with_relu=False``
  (block1 only) DROPS the leading ReLU, shifting all Sequential indices —
  our flax param names mirror the torch indices (``rep1_conv1`` etc.) so
  checkpoint import stays a mechanical rename,
* a stride-2 block ends with ``MaxPool2d(3, stride=2, padding=1)`` and takes
  a 1x1/stride-2 conv+BN skip (``skip``/``skipbn``); stride-1 blocks with
  in==out use the identity skip (block4-11),
* block12 is ``Block(728, 1024, 2, 2, grow_first=False)``: sep(728->728)
  then sep(728->1024),
* the deepest stage ends at ``bn4`` with NO trailing ReLU — mirroring
  ``Xception.features()`` which returns ``bn4``'s output (the classifier
  ``logits()`` applies the ReLU; smp inherits ``features``' ending, same as
  its densenet encoder ending at ``norm5`` without ReLU). Recorded as an
  audit item in docs/PARITY.md,
* init: Cadene's custom loop — conv weights N(0, sqrt(2/n)) with
  n = k*k*out_channels (REGARDLESS of groups) == flax
  ``variance_scaling(2.0, "fan_out", "normal")`` on HWIO kernels; BN
  ones/zeros; the dead ``fc`` is omitted (smp deletes it).

TPU note: depthwise 3x3s run on the VPU-adjacent conv path, pointwise 1x1s
are pure MXU matmuls; XLA fuses each depthwise into the following pointwise's
input. All shapes static; bf16 compute via ``dtype``.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

XCEPTION_OUT_CHANNELS = (3, 64, 128, 256, 728, 2048)

# Cadene xception init: normal_(0, sqrt(2/n)), n = kH*kW*out_channels.
_conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def _bn(name: str, train: bool, dtype=jnp.float32) -> nn.BatchNorm:
    return nn.BatchNorm(name=name, use_running_average=not train,
                        momentum=0.9, epsilon=1e-5, dtype=dtype)


def block_rep_layout(cin: int, cout: int, reps: int, *,
                     start_with_relu: bool = True, grow_first: bool = True,
                     stride: int = 1) -> list[tuple]:
    """The torch ``Block.rep`` Sequential as (index, kind, *args) tuples.

    Reproduces Cadene's construction ORDER (including the leading-ReLU drop
    for ``start_with_relu=False``) so that the tuple index equals the torch
    Sequential index — the single source of truth shared by the flax module,
    the torch replica (tools/torch_cpu_baseline.py) and the checkpoint
    importer (utils/torch_import.py handles the names mechanically).
    Kinds: ("relu",), ("sep", cin, cout), ("bn", ch), ("pool",).
    """
    ops: list[tuple] = []
    if grow_first:
        ops += [("relu",), ("sep", cin, cout), ("bn", cout)]
        filters = cout
    else:
        filters = cin
    for _ in range(reps - 1):
        ops += [("relu",), ("sep", filters, filters), ("bn", filters)]
    if not grow_first:
        ops += [("relu",), ("sep", cin, cout), ("bn", cout)]
    if not start_with_relu:
        ops = ops[1:]
    indexed = list(enumerate(ops))
    if stride != 1:
        indexed.append((len(ops), ("pool",)))
    return indexed


class SeparableConv(nn.Module):
    """Cadene SeparableConv2d: depthwise 3x3 (``conv1``) + pointwise 1x1
    (``pointwise``), both bias-free."""

    features: int
    strides: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cin = x.shape[-1]
        y = nn.Conv(cin, (3, 3), strides=(self.strides,) * 2, padding=1,
                    feature_group_count=cin, use_bias=False,
                    kernel_init=_conv_init, dtype=self.dtype, name="conv1")(x)
        return nn.Conv(self.features, (1, 1), use_bias=False,
                       kernel_init=_conv_init, dtype=self.dtype,
                       name="pointwise")(y)


class XceptionBlock(nn.Module):
    """Cadene ``Block``: rep Sequential + conv/identity skip."""

    cin: int
    cout: int
    reps: int
    strides: int = 1
    start_with_relu: bool = True
    grow_first: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        y = x
        for idx, op in block_rep_layout(
                self.cin, self.cout, self.reps,
                start_with_relu=self.start_with_relu,
                grow_first=self.grow_first, stride=self.strides):
            kind = op[0]
            if kind == "relu":
                y = nn.relu(y)
            elif kind == "sep":
                y = SeparableConv(op[2], dtype=self.dtype,
                                  name=f"rep{idx}")(y)
            elif kind == "bn":
                y = _bn(f"rep{idx}", train, self.dtype)(y)
            else:  # pool: MaxPool2d(3, stride, padding=1)
                y = nn.max_pool(y, (3, 3), strides=(self.strides,) * 2,
                                padding=((1, 1), (1, 1)))
        if self.strides != 1 or self.cin != self.cout:
            skip = nn.Conv(self.cout, (1, 1), strides=(self.strides,) * 2,
                           use_bias=False, kernel_init=_conv_init,
                           dtype=self.dtype, name="skip")(x)
            skip = _bn("skipbn", train, self.dtype)(skip)
        else:
            skip = x
        return y + skip


# (cin, cout, reps, stride, start_with_relu, grow_first) per Cadene block1-12.
_XCEPTION_BLOCKS = (
    (64, 128, 2, 2, False, True),
    (128, 256, 2, 2, True, True),
    (256, 728, 2, 2, True, True),
    *(((728, 728, 3, 1, True, True),) * 8),     # block4..block11
    (728, 1024, 2, 2, True, False),             # block12 (grow_first=False)
)


class XceptionEncoder(nn.Module):
    """Feature-pyramid Xception encoder (smp ``XceptionEncoder`` stages)."""

    encoder_name: str = "xception"
    in_channels: int = 3
    dtype: Any = jnp.float32  # conv compute dtype; BN normalization stays fp32

    @property
    def out_channels(self) -> Sequence[int]:
        return (self.in_channels,) + XCEPTION_OUT_CHANNELS[1:]

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> list[jax.Array]:
        features = [x]
        # Stem (smp patches both convs to padding 1).
        y = nn.Conv(32, (3, 3), strides=(2, 2), padding=1, use_bias=False,
                    kernel_init=_conv_init, dtype=self.dtype, name="conv1")(x)
        y = nn.relu(_bn("bn1", train, self.dtype)(y))
        y = nn.Conv(64, (3, 3), padding=1, use_bias=False,
                    kernel_init=_conv_init, dtype=self.dtype, name="conv2")(y)
        y = nn.relu(_bn("bn2", train, self.dtype)(y))
        features.append(y)

        blocks = [XceptionBlock(cin=ci, cout=co, reps=r, strides=s,
                                start_with_relu=swr, grow_first=gf,
                                dtype=self.dtype, name=f"block{i}")
                  for i, (ci, co, r, s, swr, gf)
                  in enumerate(_XCEPTION_BLOCKS, start=1)]
        y = blocks[0](y, train)          # stage 2: block1
        features.append(y)
        y = blocks[1](y, train)          # stage 3: block2
        features.append(y)
        for blk in blocks[2:11]:         # stage 4: block3..block11
            y = blk(y, train)
        features.append(y)
        y = blocks[11](y, train)         # stage 5: block12 + conv3/4
        y = SeparableConv(1536, dtype=self.dtype, name="conv3")(y)
        y = nn.relu(_bn("bn3", train, self.dtype)(y))
        y = SeparableConv(2048, dtype=self.dtype, name="conv4")(y)
        y = _bn("bn4", train, self.dtype)(y)  # features() ends WITHOUT relu
        features.append(y)
        return features
