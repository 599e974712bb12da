"""EfficientNet-b0..b7 encoders (NHWC, Flax linen) with smp parity.

The reference passes ``encoder_name`` straight through to
``segmentation_models_pytorch.Unet`` (`/root/reference/d3f/train_deep_fake/
lit_module.py:53-59`), so smp's ``efficientnet-b{0..7}`` family (wrapping
lukemelas/EfficientNet-PyTorch) is config-reachable. smp's
``EfficientNetEncoder.get_stages`` splits the backbone as

    stage 0: identity (raw input)
    stage 1: swish(bn0(conv_stem 3x3/2))            @ 1/2
    stage 2: blocks[:i0]      (through the 24-ch group)   @ 1/4
    stage 3: blocks[i0:i1]    (the 40-ch group)           @ 1/8
    stage 4: blocks[i1:i2]    (80 + 112-ch groups)        @ 1/16
    stage 5: blocks[i2:]      (192 + 320-ch groups)       @ 1/32

with the stage indices at the cumulative (depth-scaled) repeat boundaries.
Channel/repeat scaling reproduces the EfficientNet compound rules:
``round_filters`` (x width, snapped to multiples of 8 with the 0.9 guard)
and ``round_repeats`` (ceil of depth x repeats).

Parity details carried over from efficientnet-pytorch:
* MBConv = [1x1 expand conv + BN + swish when expand_ratio != 1] ->
  depthwise kxk (stride s) + BN + swish -> squeeze-excite
  (global-mean -> 1x1 reduce (bias) -> swish -> 1x1 expand (bias) ->
  sigmoid gate; SE width = max(1, int(block_input * 0.25))) ->
  1x1 project conv + BN (linear); residual add when stride 1 and
  channels match, with stochastic depth (drop_connect) on the branch,
* TF "same" padding computed from the static input extent (the torch side
  is Conv2dStaticSamePadding; shapes are static under jit so the asymmetric
  pads are compile-time constants here),
* BN eps 1e-3, momentum 0.01 (torch) == 0.99 (flax),
* conv/SE weights keep torch's DEFAULT init (kaiming-uniform a=sqrt(5) ==
  variance_scaling(1/3, fan_in, uniform); bias uniform(+-1/sqrt(fan_in))) —
  efficientnet-pytorch never overrides reset_parameters,
* drop_connect (rate 0.2 x block_index / num_blocks, per smp's forward) is
  applied only when ``train=True`` AND a ``"dropout"`` PRNG collection is
  provided to ``apply`` — parity tests run without one (deterministic).

Unused classifier pieces (``_conv_head``/``_bn1``/``_fc``) are omitted: smp
deletes ``_fc`` and never calls the head in ``forward``; we drop the dead
parameters entirely (recorded in docs/PARITY.md).

Param-tree names flatten the torch paths (``_blocks.3._se_reduce`` ->
``blocks_3_se_reduce``) so checkpoint import (`utils/torch_import.py`) is a
mechanical rename.

TPU note: depthwise convs are VPU work, but the 1x1 expand/project convs
(the bulk of the FLOPs) are MXU matmuls; the SE global-mean is a tiny
reduce. Asymmetric same-padding folds into the conv's padding attribute —
no extra pad op is materialized.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

# (repeats, kernel, stride, expand_ratio, in_filters, out_filters) at b0
# scale; se_ratio is 0.25 throughout (the EfficientNet base block args).
_BASE_BLOCKS = (
    (1, 3, 1, 1, 32, 16),
    (2, 3, 2, 6, 16, 24),
    (2, 5, 2, 6, 24, 40),
    (3, 3, 2, 6, 40, 80),
    (3, 5, 1, 6, 80, 112),
    (4, 5, 2, 6, 112, 192),
    (1, 3, 1, 6, 192, 320),
)

# name -> (width_coefficient, depth_coefficient)
EFFICIENTNET_SPECS = {
    "efficientnet-b0": (1.0, 1.0),
    "efficientnet-b1": (1.0, 1.1),
    "efficientnet-b2": (1.1, 1.2),
    "efficientnet-b3": (1.2, 1.4),
    "efficientnet-b4": (1.4, 1.8),
    "efficientnet-b5": (1.6, 2.2),
    "efficientnet-b6": (1.8, 2.6),
    "efficientnet-b7": (2.0, 3.1),
}

_DROP_CONNECT_RATE = 0.2  # efficientnet-pytorch GlobalParams default

# torch Conv2d default reset_parameters: kaiming_uniform_(a=sqrt(5)) ==
# U(+-sqrt(1/fan_in)) -> variance 1/(3 fan_in).
_conv_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def _torch_bias_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def round_filters(filters: int, width: float, divisor: int = 8) -> int:
    """EfficientNet width scaling (efficientnet-pytorch round_filters)."""
    filters *= width
    new = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new < 0.9 * filters:
        new += divisor
    return int(new)


def round_repeats(repeats: int, depth: float) -> int:
    return int(math.ceil(depth * repeats))


def block_layout(encoder_name: str) -> list[dict]:
    """Per-block (kernel, stride, expand, cin, cout) after compound scaling."""
    width, depth = EFFICIENTNET_SPECS[encoder_name]
    blocks = []
    for repeats, k, s, e, cin, cout in _BASE_BLOCKS:
        cin, cout = round_filters(cin, width), round_filters(cout, width)
        for j in range(round_repeats(repeats, depth)):
            blocks.append(dict(kernel=k, stride=s if j == 0 else 1,
                               expand=e, cin=cin if j == 0 else cout,
                               cout=cout))
    return blocks


# smp's published efficient_net_encoders catalog stage_idxs (first three
# entries; the fourth is the total block count). For b1-b7 these equal the
# cumulative depth-scaled repeat boundaries after the 24 / 40 / 112 groups,
# but b0 is (3, 5, 9): smp takes the 1/16 skip after the FIRST 112-ch block
# (cumulative boundary would be 11). Hardcoded so imported smp checkpoints
# tap identical skip features (ADVICE r2 medium; audit note in docs/PARITY.md).
_SMP_STAGE_IDXS = {
    "efficientnet-b0": (3, 5, 9),
    "efficientnet-b1": (5, 8, 16),
    "efficientnet-b2": (5, 8, 16),
    "efficientnet-b3": (5, 8, 18),
    "efficientnet-b4": (6, 10, 22),
    "efficientnet-b5": (8, 13, 27),
    "efficientnet-b6": (9, 15, 31),
    "efficientnet-b7": (11, 18, 38),
}


def stage_idxs(encoder_name: str) -> tuple[int, int, int]:
    """smp stage_idxs: block-list boundaries of the 1/4, 1/8, 1/16 skips."""
    return _SMP_STAGE_IDXS[encoder_name]


def _same_padding(h: int, w: int, k: int, s: int):
    """TF 'same' pads for a kxk/s conv on an (h, w) map (static shapes)."""

    def one(n: int):
        p = max((-(-n // s) - 1) * s + k - n, 0)
        return (p // 2, p - p // 2)

    return (one(h), one(w))


def _swish(x: jax.Array) -> jax.Array:
    return x * nn.sigmoid(x)


def _bn(name: str, train: bool, dtype=jnp.float32) -> nn.BatchNorm:
    # efficientnet-pytorch: bn_mom = 1 - 0.99 (torch momentum 0.01), eps 1e-3.
    # Stats always fp32 (flax promotes); dtype sets only the output dtype.
    return nn.BatchNorm(name=name, use_running_average=not train,
                        momentum=0.99, epsilon=1e-3, dtype=dtype)


class EfficientNetEncoder(nn.Module):
    """Feature-pyramid EfficientNet encoder (smp get_stages semantics).

    Returns ``[x, s1, ..., s5]`` at strides (1, 2, 4, 8, 16, 32). Stochastic
    depth activates only when ``train=True`` and the caller passes a
    ``"dropout"`` rng collection (``apply(..., rngs={"dropout": key})``).
    """

    encoder_name: str = "efficientnet-b0"
    in_channels: int = 3
    dtype: Any = jnp.float32  # conv compute dtype; BN normalization stays fp32

    @property
    def out_channels(self) -> Sequence[int]:
        width, _ = EFFICIENTNET_SPECS[self.encoder_name]
        return (self.in_channels,) + tuple(
            round_filters(c, width) for c in (32, 24, 40, 112, 320))

    def _mbconv(self, x: jax.Array, idx: int, spec: dict, rate: float,
                train: bool) -> jax.Array:
        """efficientnet-pytorch MBConvBlock (flattened param names)."""
        prefix = f"blocks_{idx}"
        k, s, e = spec["kernel"], spec["stride"], spec["expand"]
        cin, cout = spec["cin"], spec["cout"]
        hidden = cin * e
        y = x
        if e != 1:
            y = nn.Conv(hidden, (1, 1), use_bias=False,
                        kernel_init=_conv_init, dtype=self.dtype,
                        name=f"{prefix}_expand_conv")(y)
            y = _swish(_bn(f"{prefix}_bn0", train, self.dtype)(y))
        pad = _same_padding(y.shape[1], y.shape[2], k, s)
        y = nn.Conv(hidden, (k, k), strides=(s, s), padding=pad,
                    feature_group_count=hidden, use_bias=False,
                    kernel_init=_conv_init, dtype=self.dtype,
                    name=f"{prefix}_depthwise_conv")(y)
        y = _swish(_bn(f"{prefix}_bn1", train, self.dtype)(y))
        # Squeeze-excite: width from the BLOCK INPUT channels (se_ratio 0.25).
        se_ch = max(1, int(cin * 0.25))
        se = jnp.mean(y, axis=(1, 2), keepdims=True)
        se = nn.Conv(se_ch, (1, 1), kernel_init=_conv_init, dtype=self.dtype,
                     bias_init=_torch_bias_init(hidden),
                     name=f"{prefix}_se_reduce")(se)
        se = nn.Conv(hidden, (1, 1), kernel_init=_conv_init, dtype=self.dtype,
                     bias_init=_torch_bias_init(se_ch),
                     name=f"{prefix}_se_expand")(_swish(se))
        y = y * nn.sigmoid(se)
        y = nn.Conv(cout, (1, 1), use_bias=False, kernel_init=_conv_init, dtype=self.dtype,
                    name=f"{prefix}_project_conv")(y)
        y = _bn(f"{prefix}_bn2", train, self.dtype)(y)
        if s == 1 and cin == cout:
            if rate > 0 and train and self.has_rng("dropout"):
                keep = 1.0 - rate
                mask = jax.random.bernoulli(
                    self.make_rng("dropout"), keep, (y.shape[0], 1, 1, 1))
                y = y * (mask.astype(y.dtype) / keep)
            y = y + x
        return y

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> list[jax.Array]:
        width, _ = EFFICIENTNET_SPECS[self.encoder_name]
        blocks = block_layout(self.encoder_name)
        i0, i1, i2 = stage_idxs(self.encoder_name)
        features = [x]
        pad = _same_padding(x.shape[1], x.shape[2], 3, 2)
        y = nn.Conv(round_filters(32, width), (3, 3), strides=(2, 2),
                    padding=pad, use_bias=False, kernel_init=_conv_init, dtype=self.dtype,
                    name="conv_stem")(x)
        y = _swish(_bn("bn0", train, self.dtype)(y))
        features.append(y)
        for idx, spec in enumerate(blocks):
            # smp forward: drop_connect_rate scaled by global block index.
            rate = _DROP_CONNECT_RATE * idx / len(blocks)
            y = self._mbconv(y, idx, spec, rate, train)
            if idx + 1 in (i0, i1, i2):
                features.append(y)
        features.append(y)
        return features
