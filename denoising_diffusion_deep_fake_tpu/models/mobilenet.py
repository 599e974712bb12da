"""MobileNetV2 encoder (NHWC, Flax linen) with smp/torchvision parity.

smp's ``mobilenet_v2`` encoder (``encoders/mobilenet.py``) wraps torchvision
``MobileNetV2.features`` and slices it into stages
``[Identity, features[:2], features[2:4], features[4:7], features[7:14],
features[14:]]`` — six pyramid levels with channels (3, 16, 24, 32, 96, 1280)
at strides (1, 2, 4, 8, 16, 32). The reference reaches it by name through
``smp.Unet(encoder_name=...)`` (`/root/reference/d3f/train_deep_fake/
lit_module.py:53-59`).

Parity details carried over from torchvision MobileNetV2:
* stem ConvBNReLU6(3->32, stride 2); 17 InvertedResidual blocks
  (t,c,n,s) = (1,16,1,1)(6,24,2,2)(6,32,3,2)(6,64,4,2)(6,96,3,1)
  (6,160,3,2)(6,320,1,1); head ConvBNReLU6(320->1280, 1x1),
* InvertedResidual: [1x1 expand ConvBNReLU6 when t>1] -> depthwise 3x3
  ConvBNReLU6 -> 1x1 project conv + BN (linear); residual add when stride 1
  and channels match,
* ReLU6 activations; all convs bias-free,
* init: kaiming-normal fan-out conv weights, BN ones/zeros.

Module names mirror torchvision ``features`` indices and the InvertedResidual
``conv`` Sequential indices (``features_{i}`` / ``conv_{k}[_{j}]``) so
checkpoint import (`utils/torch_import.py`) is a mechanical rename.

TPU note: depthwise 3x3s run as ``feature_group_count=channels`` convs —
bandwidth-bound on the VPU rather than MXU work, but tiny next to the U-Net
decoder convs this encoder feeds.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

# (expand_ratio t, out_channels c, repeats n, first_stride s)
_INVERTED_RESIDUAL_SETTING = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)

# torchvision: nn.init.kaiming_normal_(m.weight, mode="fan_out")
# (default nonlinearity "leaky_relu" with a=0 == gain sqrt(2), same scaling).
_conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def _relu6(x: jax.Array) -> jax.Array:
    return jnp.minimum(nn.relu(x), 6.0)


def _bn(name: str, train: bool, dtype=jnp.float32) -> nn.BatchNorm:
    # Stats always fp32 (flax promotes); dtype sets only the output dtype.
    return nn.BatchNorm(name=name, use_running_average=not train,
                        momentum=0.9, epsilon=1e-5, dtype=dtype)


class _ConvBNReLU6(nn.Module):
    """torchvision ConvBNReLU (used for the stem and the 1280 head)."""

    features: int
    kernel: int = 3
    strides: int = 1
    dtype: Any = jnp.float32
    # Names of the conv/bn children match the torch Sequential indices.
    conv_name: str = "0"
    bn_name: str = "1"

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        pad = (self.kernel - 1) // 2
        y = nn.Conv(self.features, (self.kernel,) * 2,
                    strides=(self.strides,) * 2, padding=pad, use_bias=False,
                    kernel_init=_conv_init, dtype=self.dtype, name=self.conv_name)(x)
        return _relu6(_bn(self.bn_name, train, self.dtype)(y))


class InvertedResidual(nn.Module):
    """torchvision InvertedResidual (MobileNetV2 building block)."""

    features: int
    strides: int = 1
    expand_ratio: int = 6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        cin = x.shape[-1]
        hidden = int(round(cin * self.expand_ratio))
        use_residual = self.strides == 1 and cin == self.features
        y = x
        idx = 0
        if self.expand_ratio != 1:
            y = nn.Conv(hidden, (1, 1), use_bias=False,
                        kernel_init=_conv_init, dtype=self.dtype, name=f"conv_{idx}_0")(y)
            y = _relu6(_bn(f"conv_{idx}_1", train, self.dtype)(y))
            idx += 1
        # Depthwise 3x3.
        y = nn.Conv(hidden, (3, 3), strides=(self.strides,) * 2, padding=1,
                    feature_group_count=hidden, use_bias=False,
                    kernel_init=_conv_init, dtype=self.dtype, name=f"conv_{idx}_0")(y)
        y = _relu6(_bn(f"conv_{idx}_1", train, self.dtype)(y))
        idx += 1
        # Linear 1x1 projection.
        y = nn.Conv(self.features, (1, 1), use_bias=False,
                    kernel_init=_conv_init, dtype=self.dtype, name=f"conv_{idx}")(y)
        y = _bn(f"conv_{idx + 1}", train, self.dtype)(y)
        return x + y if use_residual else y


class MobileNetV2Encoder(nn.Module):
    """Feature-pyramid MobileNetV2 encoder (smp stage-slice semantics).

    Returns ``[x, s1, s2, s3, s4, s5]`` at strides (1, 2, 4, 8, 16, 32) with
    channels (in_channels, 16, 24, 32, 96, 1280); stage boundaries fall after
    torchvision ``features`` indices (1, 3, 6, 13, 18).
    """

    encoder_name: str = "mobilenet_v2"
    in_channels: int = 3
    dtype: Any = jnp.float32  # conv compute dtype; BN normalization stays fp32

    @property
    def out_channels(self) -> Sequence[int]:
        return (self.in_channels, 16, 24, 32, 96, 1280)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> list[jax.Array]:
        features = [x]
        boundaries = {1, 3, 6, 13}  # smp slice ends (stage 5 = through 18)
        y = _ConvBNReLU6(32, kernel=3, strides=2, dtype=self.dtype,
                         name="features_0")(x, train)
        idx = 1
        for t, c, n, s in _INVERTED_RESIDUAL_SETTING:
            for block in range(n):
                y = InvertedResidual(c, strides=s if block == 0 else 1,
                                     expand_ratio=t, dtype=self.dtype,
                                     name=f"features_{idx}")(y, train)
                if idx in boundaries:
                    features.append(y)
                idx += 1
        y = _ConvBNReLU6(1280, kernel=1, dtype=self.dtype,
                         name=f"features_{idx}")(y, train)
        features.append(y)
        return features
