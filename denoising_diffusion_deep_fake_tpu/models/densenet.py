"""DenseNet encoders (NHWC, Flax linen) with smp/torchvision parity.

The reference passes ``encoder_name`` straight through to
``segmentation_models_pytorch.Unet`` (`/root/reference/d3f/train_deep_fake/
lit_module.py:53-59`), so smp's densenet family is config-reachable. smp's
``DenseNetEncoder`` (``encoders/densenet.py``) wraps torchvision
``DenseNet.features`` with a stage split that takes each transition's
**post-ReLU, pre-1x1-conv** activation as the skip (``TransitionWithSkip``
captures ``x`` right after the ``nn.ReLU``), while the main path continues
through the transition's channel-halving conv + 2x2 avgpool:

    stage 0: identity (raw input)
    stage 1: relu(norm0(conv0 7x7/2))                     64g  @ 1/2
    stage 2: maxpool0 + denseblock1 + transition1 skip         @ 1/4
    stage 3: denseblock2 + transition2 skip                    @ 1/8
    stage 4: denseblock3 + transition3 skip                    @ 1/16
    stage 5: denseblock4 + norm5 (BN, **no ReLU**)             @ 1/32

Parity details carried over from torchvision DenseNet:
* DenseLayer = BN -> ReLU -> 1x1 conv (bn_size*growth = 4*growth) -> BN ->
  ReLU -> 3x3 conv (growth), output CONCATENATED onto the running features,
* Transition = BN -> ReLU -> 1x1 conv (floor(ch/2)) -> AvgPool2d(2, 2),
* all convs bias-free; init kaiming-normal (torchvision densenet uses the
  fan_in default, unlike resnet's explicit fan_out), BN ones/zeros.

Module names flatten the torchvision ``features`` paths
(``denseblock{i}_denselayer{j}_norm1`` ...) so checkpoint import
(`utils/torch_import.py`) is a mechanical rename.

TPU note: the dense-concat pattern is bandwidth-heavy (every layer re-reads
the growing feature map), but XLA fuses the BN+ReLU into the following conv
and the concats are layout no-ops in NHWC; all 1x1/3x3 convs hit the MXU.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

# name -> (block_config, growth_rate, num_init_features)
# (torchvision densenet121/161/169/201 constructor arguments)
DENSENET_SPECS = {
    "densenet121": ((6, 12, 24, 16), 32, 64),
    "densenet161": ((6, 12, 36, 24), 48, 96),
    "densenet169": ((6, 12, 32, 32), 32, 64),
    "densenet201": ((6, 12, 48, 32), 32, 64),
}

# torchvision DenseNet.__init__: nn.init.kaiming_normal_(m.weight) — the
# torch DEFAULT mode is fan_in (resnet uses fan_out; densenet does not).
_conv_init = nn.initializers.variance_scaling(2.0, "fan_in", "normal")


def _bn(name: str, train: bool, dtype=jnp.float32) -> nn.BatchNorm:
    # Stats always fp32 (flax promotes); dtype sets only the output dtype.
    return nn.BatchNorm(name=name, use_running_average=not train,
                        momentum=0.9, epsilon=1e-5, dtype=dtype)


class DenseNetEncoder(nn.Module):
    """Feature-pyramid DenseNet encoder (smp ``TransitionWithSkip`` semantics).

    Returns ``[x, s1, ..., s5]`` at strides (1, 2, 4, 8, 16, 32); the skip
    levels are the transitions' post-ReLU activations (full dense-block
    channels, BEFORE the halving conv), and the deepest level is norm5's
    BN output without a ReLU — both exactly smp's stage outputs.
    """

    encoder_name: str = "densenet121"
    in_channels: int = 3
    dtype: Any = jnp.float32  # conv compute dtype; BN normalization stays fp32

    @property
    def out_channels(self) -> Sequence[int]:
        block_config, growth, ch = DENSENET_SPECS[self.encoder_name]
        out = [self.in_channels, ch]
        for i, layers in enumerate(block_config):
            ch += layers * growth
            out.append(ch)
            if i != len(block_config) - 1:
                ch = ch // 2  # transition halves (floor) the channels
        return tuple(out)

    def _dense_layer(self, y: jax.Array, block: int, layer: int, growth: int,
                     train: bool) -> jax.Array:
        """torchvision _DenseLayer: BN-ReLU-conv1x1(4g)-BN-ReLU-conv3x3(g)."""
        prefix = f"denseblock{block}_denselayer{layer}"
        z = nn.relu(_bn(f"{prefix}_norm1", train, self.dtype)(y))
        z = nn.Conv(4 * growth, (1, 1), use_bias=False,
                    kernel_init=_conv_init, dtype=self.dtype, name=f"{prefix}_conv1")(z)
        z = nn.relu(_bn(f"{prefix}_norm2", train, self.dtype)(z))
        z = nn.Conv(growth, (3, 3), padding=1, use_bias=False,
                    kernel_init=_conv_init, dtype=self.dtype, name=f"{prefix}_conv2")(z)
        return jnp.concatenate([y, z], axis=-1)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> list[jax.Array]:
        block_config, growth, init_ch = DENSENET_SPECS[self.encoder_name]
        features = [x]
        y = nn.Conv(init_ch, (7, 7), strides=(2, 2), padding=3,
                    use_bias=False, kernel_init=_conv_init, dtype=self.dtype,
                    name="conv0")(x)
        y = nn.relu(_bn("norm0", train, self.dtype)(y))
        features.append(y)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for i, layers in enumerate(block_config, start=1):
            for j in range(1, layers + 1):
                y = self._dense_layer(y, i, j, growth, train)
            if i != len(block_config):
                # Transition: the post-ReLU map is the smp stage output
                # (TransitionWithSkip); the halving conv + avgpool continue.
                y = nn.relu(_bn(f"transition{i}_norm", train, self.dtype)(y))
                features.append(y)
                y = nn.Conv(y.shape[-1] // 2, (1, 1), use_bias=False,
                            kernel_init=_conv_init, dtype=self.dtype,
                            name=f"transition{i}_conv")(y)
                y = nn.avg_pool(y, (2, 2), strides=(2, 2))
            else:
                # Final stage: norm5 BN output, NO ReLU (smp stage 5 is
                # Sequential(denseblock4, norm5)).
                features.append(_bn("norm5", train, self.dtype)(y))
        return features
