"""VGG encoders (NHWC, Flax linen) with smp/torchvision-topology parity.

The reference passes ``encoder_name`` straight through to
``segmentation_models_pytorch.Unet`` (`/root/reference/d3f/train_deep_fake/
lit_module.py:53-59`), so smp's whole encoder catalog is config-reachable.
This module rebuilds the VGG family (smp ``encoders/vgg.py``): torchvision
``make_layers`` conv stacks split into stages at each MaxPool — smp's
``VGGEncoder.get_stages`` puts the pool at the HEAD of the next stage, so the
six stage outputs are the activations before each of the five pools plus the
final pooled map, with channels (64, 128, 256, 512, 512, 512) at strides
(1, 2, 4, 8, 16, 32). Unlike the resnet family there is no raw-input level:
the full-resolution 64-channel conv output is the (dropped) stage-0 feature.

Parity details carried over from torchvision VGG:
* 3x3 convs WITH bias (even in the _bn variants), MaxPool2d(2, 2),
* plain ReLU between convs; optional BatchNorm (``*_bn`` names),
* init: kaiming-normal fan-out for conv weights, zero biases, BN ones/zeros.

Module names mirror torchvision ``features`` indices (``features_{i}``) so
checkpoint import (`utils/torch_import.py`) is a mechanical rename.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

# torchvision cfgs A/B/D/E (torchvision.models.vgg.cfgs).
_VGG_LAYOUTS = {
    "vgg11": (64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"),
    "vgg13": (64, 64, "M", 128, 128, "M", 256, 256, "M", 512, 512, "M",
              512, 512, "M"),
    "vgg16": (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
              512, 512, 512, "M", 512, 512, 512, "M"),
    "vgg19": (64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
              512, 512, 512, 512, "M", 512, 512, 512, 512, "M"),
}

# name -> (layout, batch_norm) — every vgg name smp's Unet accepts.
VGG_SPECS = {}
for _name, _layout in _VGG_LAYOUTS.items():
    VGG_SPECS[_name] = (_layout, False)
    VGG_SPECS[_name + "_bn"] = (_layout, True)

# torchvision VGG._initialize_weights: kaiming_normal_(fan_out, relu).
_conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class VGGEncoder(nn.Module):
    """Feature-pyramid VGG encoder (smp ``VGGEncoder.get_stages`` semantics).

    Returns the six stage outputs at strides (1, 2, 4, 8, 16, 32) with
    channels ``out_channels`` — stage 0 is the pre-pool 64-channel conv
    output (NOT the raw input, unlike the resnet family).
    """

    encoder_name: str = "vgg16"
    in_channels: int = 3
    dtype: Any = jnp.float32  # conv compute dtype; BN normalization stays fp32

    @property
    def out_channels(self) -> Sequence[int]:
        return (64, 128, 256, 512, 512, 512)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> list[jax.Array]:
        layout, batch_norm = VGG_SPECS[self.encoder_name]
        features = []
        y, idx = x, 0
        for entry in layout:
            if entry == "M":
                features.append(y)
                y = nn.max_pool(y, (2, 2), strides=(2, 2))
                idx += 1
                continue
            y = nn.Conv(entry, (3, 3), padding=1, use_bias=True,
                        kernel_init=_conv_init, dtype=self.dtype,
                        bias_init=nn.initializers.zeros,
                        name=f"features_{idx}")(y)
            idx += 1
            if batch_norm:
                # Stats always fp32 (flax promotes); dtype = output dtype.
                y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, dtype=self.dtype,
                                 name=f"features_{idx}")(y)
                idx += 1
            y = nn.relu(y)
            idx += 1  # the ReLU consumes a torchvision features index
        features.append(y)  # after the final pool: 512 @ 1/32
        return features
