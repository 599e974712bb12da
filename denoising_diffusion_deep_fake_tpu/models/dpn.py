"""Dual Path Network (DPN) encoders (NHWC, Flax linen) with smp parity.

The reference passes ``encoder_name`` straight through to
``segmentation_models_pytorch.Unet`` (`/root/reference/d3f/train_deep_fake/
lit_module.py:53-59`), so smp's dpn family — ``dpn68/68b/92/98/107/131``
(Cadene/pretrainedmodels ``dpn.py``, originally rwightman's port) — is
config-reachable. Every DPN block carries TWO paths: a ResNet-style residual
(fixed ``bw`` channels) and a DenseNet-style dense path that grows by
``inc`` channels per block; the smp encoder concatenates both at each stage
boundary.

smp's ``DPNEncoder`` stages (``stage_idxs`` index the features list):

    stage 0: identity (raw input)
    stage 1: conv1_1.conv + .bn + .act  (stem WITHOUT its maxpool)   @ 1/2
    stage 2: conv1_1.pool + conv2_*                                  @ 1/4
    stage 3: conv3_*                                                 @ 1/8
    stage 4: conv4_*                                                 @ 1/16
    stage 5: conv5_* + conv5_bn_ac                                   @ 1/32

where a tuple stage output is emitted as ``relu(cat(res, dense))`` (smp's
``forward``; stage 5 is already a tensor via ``CatBnAct``).

Parity details carried over from pretrainedmodels ``dpn.py``:
* ``BnActConv2d`` = BN(eps 1e-3) -> ReLU -> conv (no bias) — pre-activation
  ordering, so stage-boundary tuples are raw pre-BN accumulations,
* ``DualPathBlock``: projection ``c1x1_w_s1``/``c1x1_w_s2`` (name encodes
  the stride!) produces ``bw + 2*inc`` channels split into the residual base
  and the dense seed; main path ``c1x1_a`` (r ch) -> grouped 3x3 ``c3x3_b``
  (r ch, stride on 'down' blocks) -> ``c1x1_c`` (bw + inc, split);
  ``b=True`` (dpn68b) replaces the last conv with ``CatBnAct`` + two plain
  no-bias convs ``c1x1_c1``/``c1x1_c2``,
* widths: ``bw = {64,128,256,512} * (1 if small else 4)``,
  ``r = k_r * bw / (64 * bw_factor)`` (so r doubles each stage),
* stem: 7x7/2 conv (3x3/2 when ``small``) + BN + ReLU + MaxPool(3,2,1),
* init: torch defaults (no custom init in pretrainedmodels),
* the dead classifier (``last_linear`` 1x1 conv) is omitted (smp deletes
  it); encoder + that head reconstructs published totals where available
  (tests/test_models.py).

Param-tree names mirror the torch paths
(``features.conv2_1.c1x1_a.conv`` -> ``conv2_1/c1x1_a/conv``).

TPU note: DPN is 1x1-conv dominated (pure MXU matmuls); the grouped 3x3 is
the only spatial conv per block. The dense-path concats are layout ops XLA
folds into the next BN+conv. Static shapes; bf16 via ``dtype``.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

# torch Conv2d default init (pretrainedmodels defines no custom init).
_conv_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


class DPNSpec(NamedTuple):
    stage_idxs: tuple      # smp slice boundaries into the features list
    out_channels: tuple
    small: bool            # 3x3 stem + bw_factor 1
    init_features: int
    k_r: int
    groups: int
    b: bool                # dpn68b's CatBnAct + split-conv variant
    k_sec: tuple           # blocks per stage
    inc_sec: tuple         # dense-path growth per stage


DPN_SPECS = {
    "dpn68": DPNSpec((4, 8, 20, 24), (3, 10, 144, 320, 704, 832), True, 10,
                     128, 32, False, (3, 4, 12, 3), (16, 32, 32, 64)),
    "dpn68b": DPNSpec((4, 8, 20, 24), (3, 10, 144, 320, 704, 832), True, 10,
                      128, 32, True, (3, 4, 12, 3), (16, 32, 32, 64)),
    "dpn92": DPNSpec((4, 8, 28, 32), (3, 64, 336, 704, 1552, 2688), False,
                     64, 96, 32, False, (3, 4, 20, 3), (16, 32, 24, 128)),
    "dpn98": DPNSpec((4, 10, 30, 34), (3, 96, 336, 768, 1728, 2688), False,
                     96, 160, 40, False, (3, 6, 20, 3), (16, 32, 32, 128)),
    "dpn107": DPNSpec((5, 13, 33, 37), (3, 128, 376, 1152, 2432, 2688),
                      False, 128, 200, 50, False, (4, 8, 20, 3),
                      (20, 64, 64, 128)),
    "dpn131": DPNSpec((5, 13, 41, 45), (3, 128, 352, 832, 1984, 2688),
                      False, 128, 160, 40, False, (4, 8, 28, 3),
                      (16, 32, 32, 128)),
}


class CatBnAct(nn.Module):
    """pretrainedmodels CatBnAct: BN(eps 1e-3) + ReLU (concat done by the
    caller); child named ``bn`` to mirror the torch key shape."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-3, dtype=self.dtype, name="bn")(x)
        return nn.relu(y)


class BnActConv(nn.Module):
    """pretrainedmodels BnActConv2d: BN(eps 1e-3) -> ReLU -> no-bias conv."""

    features: int
    kernel: tuple[int, int] = (1, 1)
    strides: int = 1
    groups: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-3, dtype=self.dtype, name="bn")(x)
        y = nn.relu(y)
        pad = (self.kernel[0] - 1) // 2
        return nn.Conv(self.features, self.kernel,
                       strides=(self.strides,) * 2, padding=pad,
                       feature_group_count=self.groups, use_bias=False,
                       kernel_init=_conv_init, dtype=self.dtype,
                       name="conv")(y)


class DualPathBlock(nn.Module):
    """One DPN block over a (residual, dense) pair of feature maps."""

    r: int                  # num_1x1_a == num_3x3_b
    bw: int                 # num_1x1_c (residual width)
    inc: int                # dense growth
    groups: int
    block_type: str         # "proj" | "down" | "normal"
    b: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        stride = 2 if self.block_type == "down" else 1
        has_proj = self.block_type in ("proj", "down")
        x_in = (jnp.concatenate(x, axis=-1) if isinstance(x, (tuple, list))
                else x)
        if has_proj:
            proj_name = "c1x1_w_s2" if stride == 2 else "c1x1_w_s1"
            x_s = BnActConv(self.bw + 2 * self.inc, (1, 1), stride,
                            dtype=self.dtype, name=proj_name)(x_in, train)
            x_s1, x_s2 = x_s[..., :self.bw], x_s[..., self.bw:]
        else:
            x_s1, x_s2 = x
        y = BnActConv(self.r, (1, 1), dtype=self.dtype,
                      name="c1x1_a")(x_in, train)
        y = BnActConv(self.r, (3, 3), stride, self.groups, dtype=self.dtype,
                      name="c3x3_b")(y, train)
        if self.b:
            # CatBnAct + two plain no-bias convs (dpn68b).
            y = CatBnAct(dtype=self.dtype, name="c1x1_c")(y, train)
            out1 = nn.Conv(self.bw, (1, 1), use_bias=False,
                           kernel_init=_conv_init, dtype=self.dtype,
                           name="c1x1_c1")(y)
            out2 = nn.Conv(self.inc, (1, 1), use_bias=False,
                           kernel_init=_conv_init, dtype=self.dtype,
                           name="c1x1_c2")(y)
        else:
            y = BnActConv(self.bw + self.inc, (1, 1), dtype=self.dtype,
                          name="c1x1_c")(y, train)
            out1, out2 = y[..., :self.bw], y[..., self.bw:]
        resid = x_s1 + out1
        dense = jnp.concatenate([x_s2, out2], axis=-1)
        return resid, dense


def _dpn_block_plan(spec: DPNSpec) -> list[tuple[str, dict]]:
    """(torch features key, DualPathBlock kwargs) for conv2_1..conv5_k —
    the single source of truth shared with the replica and the importer."""
    bw_factor = 1 if spec.small else 4
    plan = []
    for stage, base in enumerate((64, 128, 256, 512), start=2):
        bw = base * bw_factor
        inc = spec.inc_sec[stage - 2]
        r = (spec.k_r * bw) // (64 * bw_factor)
        first = "proj" if stage == 2 else "down"
        for i in range(1, spec.k_sec[stage - 2] + 1):
            plan.append((f"conv{stage}_{i}",
                         dict(r=r, bw=bw, inc=inc, groups=spec.groups,
                              block_type=first if i == 1 else "normal",
                              b=spec.b)))
    return plan


class DPNEncoder(nn.Module):
    """Feature-pyramid DPN encoder (smp ``DPNEncoder`` staging)."""

    encoder_name: str = "dpn68"
    in_channels: int = 3
    dtype: Any = jnp.float32  # conv compute dtype; BN normalization stays fp32

    @property
    def out_channels(self) -> Sequence[int]:
        return ((self.in_channels,)
                + DPN_SPECS[self.encoder_name].out_channels[1:])

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> list[jax.Array]:
        spec = DPN_SPECS[self.encoder_name]
        d = self.dtype
        features = [x]
        # Stem: conv/2 + BN + ReLU is stage 1; its pool opens stage 2.
        k = 3 if spec.small else 7
        y = nn.Conv(spec.init_features, (k, k), strides=(2, 2),
                    padding=(k - 1) // 2, use_bias=False,
                    kernel_init=_conv_init, dtype=d, name="conv1_1_conv")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-3, dtype=d, name="conv1_1_bn")(y)
        y = nn.relu(y)
        features.append(y)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        plan = _dpn_block_plan(spec)
        stage_of = {f"conv{s}_1": s for s in (3, 4, 5)}
        for key, kwargs in plan:
            if key in stage_of:  # stage boundary: emit relu(cat(res, dense))
                features.append(nn.relu(jnp.concatenate(y, axis=-1)))
            y = DualPathBlock(dtype=d, name=key, **kwargs)(y, train)
        # conv5_bn_ac: CatBnAct on the final tuple.
        y = jnp.concatenate(y, axis=-1)
        features.append(CatBnAct(dtype=d, name="conv5_bn_ac")(y, train))
        return features
