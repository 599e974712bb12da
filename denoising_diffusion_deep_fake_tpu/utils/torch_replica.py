"""Reference-equivalent torch U-Net replica (the interop/parity anchor).

A faithful torch reimplementation of ``segmentation_models_pytorch.Unet``
(the reference's model, `/root/reference/d3f/train_deep_fake/lit_module.py:53-59`)
for every classic encoder family the reference's ``encoder_name`` knob can
reach — built from smp's published source because smp itself is not
installable offline. Three consumers:

1. **Parity tests** (`tests/test_full_model_parity.py`, `tests/test_models.py`)
   pin the flax models' topology/param counts against it, anchored by
   published param totals (BASELINE.md round-2/3 tables).
2. **Checkpoint export** (`utils/torch_export.py`) uses it as the key/shape
   TEMPLATE when inverting the importer's mapping for any family.
3. **Quality evidence** (`tools/quality_convergence.py`) runs the
   reference's ``predict_fake`` math on it with exported weights.

``smp_named_state_dict`` renames this replica's state_dict keys to the
exact smp/torchvision convention the reference's Lightning checkpoints use
(and `utils/torch_import.convert_smp_unet_state_dict` consumes).

The CPU train-throughput baseline CLI lives in `tools/torch_cpu_baseline.py`
(a thin shim over this module).
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn


def conv_bn_relu(cin, cout):
    return nn.Sequential(nn.Conv2d(cin, cout, 3, 1, 1, bias=False),
                         nn.BatchNorm2d(cout), nn.ReLU(inplace=True))


class BasicBlock(nn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.down = (nn.Sequential(nn.Conv2d(cin, cout, 1, stride, bias=False),
                                   nn.BatchNorm2d(cout))
                     if (stride != 1 or cin != cout) else None)

    def forward(self, x):
        idt = x if self.down is None else self.down(x)
        y = torch.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return torch.relu(y + idt)


class Bottleneck(nn.Module):
    """torchvision Bottleneck (1x1 -> grouped 3x3 -> 1x1, expansion 4)."""

    expansion = 4

    def __init__(self, cin, planes, stride, groups=1, base_width=64):
        super().__init__()
        width = int(planes * base_width / 64) * groups
        out = planes * self.expansion
        self.conv1 = nn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, stride, 1, groups=groups,
                               bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        self.conv3 = nn.Conv2d(width, out, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(out)
        self.down = (nn.Sequential(nn.Conv2d(cin, out, 1, stride, bias=False),
                                   nn.BatchNorm2d(out))
                     if (stride != 1 or cin != out) else None)

    def forward(self, x):
        idt = x if self.down is None else self.down(x)
        y = torch.relu(self.bn1(self.conv1(x)))
        y = torch.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return torch.relu(y + idt)


# Mirrors models/resnet.py RESNET_SPECS (torchvision / smp resnet family).
ENCODER_SPECS = {
    "resnet18": ("basic", (2, 2, 2, 2), 1, 1, 64),
    "resnet34": ("basic", (3, 4, 6, 3), 1, 1, 64),
    "resnet50": ("bottleneck", (3, 4, 6, 3), 4, 1, 64),
    "resnext50_32x4d": ("bottleneck", (3, 4, 6, 3), 4, 32, 4),
    "wide_resnet50_2": ("bottleneck", (3, 4, 6, 3), 4, 1, 128),
}


class ResnetEncoder(nn.Module):
    def __init__(self, name="resnet34"):
        super().__init__()
        kind, blocks, exp, groups, base_width = ENCODER_SPECS[name]
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        widths = (64, 128, 256, 512)
        cin = 64
        self.layers = nn.ModuleList()
        for li, (n, w) in enumerate(zip(blocks, widths)):
            stage = []
            for bi in range(n):
                stride = 2 if (li > 0 and bi == 0) else 1
                if kind == "basic":
                    stage.append(BasicBlock(cin, w, stride))
                    cin = w
                else:
                    stage.append(Bottleneck(cin, w, stride, groups, base_width))
                    cin = w * exp
            self.layers.append(nn.Sequential(*stage))
        self.out_channels = (3, 64) + tuple(w * exp for w in widths)

    def forward(self, x):
        feats = [x]
        y = torch.relu(self.bn1(self.conv1(x)))
        feats.append(y)
        y = self.maxpool(y)
        for layer in self.layers:
            y = layer(y)
            feats.append(y)
        return feats


Resnet34Encoder = ResnetEncoder  # back-compat alias


# Mirrors models/vgg.py _VGG_LAYOUTS (torchvision cfgs A/B/D/E).
VGG_LAYOUTS = {
    "vgg11": (64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"),
    "vgg13": (64, 64, "M", 128, 128, "M", 256, 256, "M", 512, 512, "M",
              512, 512, "M"),
    "vgg16": (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
              512, 512, 512, "M", 512, 512, 512, "M"),
    "vgg19": (64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
              512, 512, 512, 512, "M", 512, 512, 512, 512, "M"),
}


class VGGEncoder(nn.Module):
    """torchvision VGG ``features`` with smp get_stages slicing: the six
    stage outputs are the pre-pool activations plus the final pooled map."""

    def __init__(self, name="vgg16"):
        super().__init__()
        base, _, bn = name.partition("_")
        layers, cin = [], 3
        for v in VGG_LAYOUTS[base]:
            if v == "M":
                layers.append(nn.MaxPool2d(2, 2))
                continue
            layers.append(nn.Conv2d(cin, v, 3, padding=1))
            if bn == "bn":
                layers.append(nn.BatchNorm2d(v))
            layers.append(nn.ReLU(inplace=True))
            cin = v
        self.features = nn.Sequential(*layers)
        self.out_channels = (64, 128, 256, 512, 512, 512)

    def forward(self, x):
        feats = []
        for m in self.features:
            if isinstance(m, nn.MaxPool2d):
                feats.append(x)
            x = m(x)
        feats.append(x)
        return feats


class ConvBNReLU6(nn.Sequential):
    def __init__(self, cin, cout, k=3, stride=1, groups=1):
        super().__init__(
            nn.Conv2d(cin, cout, k, stride, (k - 1) // 2, groups=groups,
                      bias=False),
            nn.BatchNorm2d(cout), nn.ReLU6(inplace=True))


class InvertedResidual(nn.Module):
    def __init__(self, cin, cout, stride, t):
        super().__init__()
        hidden = int(round(cin * t))
        self.use_res = stride == 1 and cin == cout
        layers = [] if t == 1 else [ConvBNReLU6(cin, hidden, k=1)]
        layers += [ConvBNReLU6(hidden, hidden, stride=stride, groups=hidden),
                   nn.Conv2d(hidden, cout, 1, bias=False),
                   nn.BatchNorm2d(cout)]
        self.conv = nn.Sequential(*layers)

    def forward(self, x):
        y = self.conv(x)
        return x + y if self.use_res else y


class MobileNetV2Encoder(nn.Module):
    """torchvision MobileNetV2 ``features`` with smp stage slicing
    ``[x, :2, 2:4, 4:7, 7:14, 14:]`` (see models/mobilenet.py)."""

    _SETTING = ((1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
                (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1))

    def __init__(self, name="mobilenet_v2"):
        super().__init__()
        feats, cin = [ConvBNReLU6(3, 32, stride=2)], 32
        for t, c, n, s in self._SETTING:
            for i in range(n):
                feats.append(InvertedResidual(cin, c, s if i == 0 else 1, t))
                cin = c
        feats.append(ConvBNReLU6(cin, 1280, k=1))
        self.features = nn.Sequential(*feats)
        self.out_channels = (3, 16, 24, 32, 96, 1280)

    def forward(self, x):
        feats, y = [x], x
        for i, m in enumerate(self.features):
            y = m(y)
            if i in (1, 3, 6, 13, 18):
                feats.append(y)
        return feats


# Mirrors models/densenet.py DENSENET_SPECS (torchvision constructor args).
DENSENET_SPECS = {
    "densenet121": ((6, 12, 24, 16), 32, 64),
    "densenet161": ((6, 12, 36, 24), 48, 96),
    "densenet169": ((6, 12, 32, 32), 32, 64),
    "densenet201": ((6, 12, 48, 32), 32, 64),
}


class DenseLayer(nn.Module):
    """torchvision _DenseLayer: BN-ReLU-conv1x1(4g)-BN-ReLU-conv3x3(g)."""

    def __init__(self, cin, growth):
        super().__init__()
        self.norm1 = nn.BatchNorm2d(cin)
        self.conv1 = nn.Conv2d(cin, 4 * growth, 1, bias=False)
        self.norm2 = nn.BatchNorm2d(4 * growth)
        self.conv2 = nn.Conv2d(4 * growth, growth, 3, padding=1, bias=False)

    def forward(self, x):
        y = self.conv1(nn.functional.relu(self.norm1(x)))
        y = self.conv2(nn.functional.relu(self.norm2(y)))
        return torch.cat([x, y], dim=1)


class DenseNetEncoder(nn.Module):
    """torchvision DenseNet.features with smp TransitionWithSkip staging:
    skips are the transitions' post-ReLU (pre-conv) maps; the deepest level
    is norm5's BN output with NO ReLU (see models/densenet.py)."""

    def __init__(self, name="densenet121"):
        super().__init__()
        block_config, growth, ch = DENSENET_SPECS[name]
        features = nn.Module()
        features.conv0 = nn.Conv2d(3, ch, 7, 2, 3, bias=False)
        features.norm0 = nn.BatchNorm2d(ch)
        out = [3, ch]
        for i, layers in enumerate(block_config, start=1):
            block = nn.Module()
            for j in range(1, layers + 1):
                block.add_module(f"denselayer{j}", DenseLayer(ch, growth))
                ch += growth
            features.add_module(f"denseblock{i}", block)
            out.append(ch)
            if i != len(block_config):
                trans = nn.Module()
                trans.norm = nn.BatchNorm2d(ch)
                trans.conv = nn.Conv2d(ch, ch // 2, 1, bias=False)
                features.add_module(f"transition{i}", trans)
                ch = ch // 2
        features.norm5 = nn.BatchNorm2d(ch)
        self.features = features
        self.block_config = block_config
        self.out_channels = tuple(out)

    def forward(self, x):
        f = self.features
        feats = [x]
        y = nn.functional.relu(f.norm0(f.conv0(x)))
        feats.append(y)
        y = nn.functional.max_pool2d(y, 3, 2, 1)
        for i in range(1, len(self.block_config) + 1):
            block = getattr(f, f"denseblock{i}")
            for j in range(1, self.block_config[i - 1] + 1):
                y = getattr(block, f"denselayer{j}")(y)
            if i != len(self.block_config):
                trans = getattr(f, f"transition{i}")
                y = nn.functional.relu(trans.norm(y))
                feats.append(y)
                y = nn.functional.avg_pool2d(trans.conv(y), 2, 2)
            else:
                feats.append(f.norm5(y))
        return feats


# Mirrors models/efficientnet.py (compound-scaling rules; b0 base blocks).
EFFICIENTNET_SPECS = {
    "efficientnet-b0": (1.0, 1.0), "efficientnet-b1": (1.0, 1.1),
    "efficientnet-b2": (1.1, 1.2), "efficientnet-b3": (1.2, 1.4),
    "efficientnet-b4": (1.4, 1.8), "efficientnet-b5": (1.6, 2.2),
    "efficientnet-b6": (1.8, 2.6), "efficientnet-b7": (2.0, 3.1),
}
EFFICIENTNET_BASE_BLOCKS = (
    (1, 3, 1, 1, 32, 16), (2, 3, 2, 6, 16, 24), (2, 5, 2, 6, 24, 40),
    (3, 3, 2, 6, 40, 80), (3, 5, 1, 6, 80, 112), (4, 5, 2, 6, 112, 192),
    (1, 3, 1, 6, 192, 320),
)


def _round_filters(f, width, divisor=8):
    f *= width
    new = max(divisor, int(f + divisor / 2) // divisor * divisor)
    if new < 0.9 * f:
        new += divisor
    return int(new)


class SamePadConv2d(nn.Conv2d):
    """efficientnet-pytorch Conv2dStaticSamePadding (TF 'same', computed
    from the input extent at forward time)."""

    def forward(self, x):
        k, s = self.kernel_size[0], self.stride[0]
        pads = []
        for n in (x.shape[-1], x.shape[-2]):  # F.pad order: W then H
            p = max((math.ceil(n / s) - 1) * s + k - n, 0)
            pads += [p // 2, p - p // 2]
        x = nn.functional.pad(x, pads)
        return nn.functional.conv2d(x, self.weight, self.bias, self.stride,
                                    0, self.dilation, self.groups)


class MBConv(nn.Module):
    """efficientnet-pytorch MBConvBlock (underscore attr names = smp keys)."""

    def __init__(self, k, s, e, cin, cout):
        super().__init__()
        hidden = cin * e
        bn = lambda c: nn.BatchNorm2d(c, momentum=0.01, eps=1e-3)  # noqa: E731
        if e != 1:
            self._expand_conv = SamePadConv2d(cin, hidden, 1, bias=False)
            self._bn0 = bn(hidden)
        self._depthwise_conv = SamePadConv2d(hidden, hidden, k, s,
                                             groups=hidden, bias=False)
        self._bn1 = bn(hidden)
        se = max(1, int(cin * 0.25))
        self._se_reduce = SamePadConv2d(hidden, se, 1)
        self._se_expand = SamePadConv2d(se, hidden, 1)
        self._project_conv = SamePadConv2d(hidden, cout, 1, bias=False)
        self._bn2 = bn(cout)
        self.expand, self.stride, self.cin, self.cout = e, s, cin, cout

    def forward(self, x, drop_rate=0.0):
        swish = nn.functional.silu
        y = x
        if self.expand != 1:
            y = swish(self._bn0(self._expand_conv(y)))
        y = swish(self._bn1(self._depthwise_conv(y)))
        se = y.mean((2, 3), keepdim=True)
        se = self._se_expand(swish(self._se_reduce(se)))
        y = torch.sigmoid(se) * y
        y = self._bn2(self._project_conv(y))
        if self.stride == 1 and self.cin == self.cout:
            if drop_rate > 0 and self.training:
                keep = 1.0 - drop_rate
                mask = torch.floor(keep + torch.rand(
                    y.shape[0], 1, 1, 1, dtype=y.dtype, device=y.device))
                y = y / keep * mask
            y = y + x
        return y


class EfficientNetEncoder(nn.Module):
    """smp EfficientNetEncoder: stem + MBConv list, stages split at the
    24/40/112-group boundaries; dead classifier head omitted (see
    models/efficientnet.py docstring)."""

    def __init__(self, name="efficientnet-b0"):
        super().__init__()
        width, depth = EFFICIENTNET_SPECS[name]
        stem = _round_filters(32, width)
        self._conv_stem = SamePadConv2d(3, stem, 3, 2, bias=False)
        self._bn0 = nn.BatchNorm2d(stem, momentum=0.01, eps=1e-3)
        self._blocks = nn.ModuleList()
        reps, out = [], [3, stem]
        for r, k, s, e, cin, cout in EFFICIENTNET_BASE_BLOCKS:
            cin, cout = _round_filters(cin, width), _round_filters(cout, width)
            n = math.ceil(depth * r)
            reps.append(n)
            out.append(cout)
            for j in range(n):
                self._blocks.append(
                    MBConv(k, s if j == 0 else 1, e, cin if j == 0 else cout,
                           cout))
        # smp's published catalog values (NOT the cumulative-repeat formula:
        # b0 is (3, 5, 9) — the 1/16 skip taps after the FIRST 112-ch block).
        self.stage_idxs = {
            "efficientnet-b0": (3, 5, 9), "efficientnet-b1": (5, 8, 16),
            "efficientnet-b2": (5, 8, 16), "efficientnet-b3": (5, 8, 18),
            "efficientnet-b4": (6, 10, 22), "efficientnet-b5": (8, 13, 27),
            "efficientnet-b6": (9, 15, 31), "efficientnet-b7": (11, 18, 38),
        }[name]
        self.out_channels = (3, stem, out[3], out[4], out[6], out[8])
        self.drop_connect_rate = 0.2  # set 0 for deterministic train-mode

    def forward(self, x):
        feats = [x]
        y = nn.functional.silu(self._bn0(self._conv_stem(x)))
        feats.append(y)
        for i, block in enumerate(self._blocks):
            y = block(y, self.drop_connect_rate * i / len(self._blocks))
            if i + 1 in self.stage_idxs:
                feats.append(y)
        feats.append(y)
        return feats


# Mirrors models/senet.py SENET_SPECS (pretrainedmodels senet.py wiring).
SENET_SPECS = {
    # block, layers, groups, inplanes, input_3x3, downsample_3x3
    "se_resnet50": ("se_resnet", (3, 4, 6, 3), 1, 64, False, False),
    "se_resnet101": ("se_resnet", (3, 4, 23, 3), 1, 64, False, False),
    "se_resnet152": ("se_resnet", (3, 8, 36, 3), 1, 64, False, False),
    "se_resnext50_32x4d": ("se_resnext", (3, 4, 6, 3), 32, 64, False, False),
    "se_resnext101_32x4d": ("se_resnext", (3, 4, 23, 3), 32, 64, False, False),
    "senet154": ("se_bottleneck", (3, 8, 36, 3), 64, 128, True, True),
}


class SEModule(nn.Module):
    def __init__(self, channels, reduction=16):
        super().__init__()
        self.fc1 = nn.Conv2d(channels, channels // reduction, 1)
        self.fc2 = nn.Conv2d(channels // reduction, channels, 1)

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        s = self.fc2(torch.relu(self.fc1(s)))
        return x * torch.sigmoid(s)


class SENetBottleneck(nn.Module):
    """pretrainedmodels SEResNet/SEResNeXt/SE bottlenecks (see
    models/senet.py docstring for the per-kind conv wirings and the
    stride-on-conv1 Caffe quirk)."""

    def __init__(self, cin, planes, kind, stride=1, groups=1, base_width=4,
                 downsample_3x3=False):
        super().__init__()
        out = planes * 4
        if kind == "se_resnet":
            widths, strides, g = (planes, planes), (stride, 1), 1
        elif kind == "se_resnext":
            w = math.floor(planes * (base_width / 64)) * groups
            widths, strides, g = (w, w), (1, stride), groups
        else:
            widths, strides, g = (planes * 2, planes * 4), (1, stride), groups
        self.conv1 = nn.Conv2d(cin, widths[0], 1, strides[0], bias=False)
        self.bn1 = nn.BatchNorm2d(widths[0])
        self.conv2 = nn.Conv2d(widths[0], widths[1], 3, strides[1], 1,
                               groups=g, bias=False)
        self.bn2 = nn.BatchNorm2d(widths[1])
        self.conv3 = nn.Conv2d(widths[1], out, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(out)
        self.se_module = SEModule(out)
        self.downsample = None
        if stride != 1 or cin != out:
            k = 3 if downsample_3x3 else 1
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, out, k, stride, (k - 1) // 2, bias=False),
                nn.BatchNorm2d(out))

    def forward(self, x):
        residual = x if self.downsample is None else self.downsample(x)
        y = torch.relu(self.bn1(self.conv1(x)))
        y = torch.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return torch.relu(self.se_module(y) + residual)


class SENetEncoder(nn.Module):
    """smp SENetEncoder: layer0 stem (sans pool) is stage 1; the ceil-mode
    3x3/2 maxpool (NO padding) + layer1 is stage 2; dead classifier
    omitted."""

    def __init__(self, name="se_resnet50"):
        super().__init__()
        kind, layers, groups, inplanes, input_3x3, down3 = SENET_SPECS[name]
        layer0 = nn.Module()
        if input_3x3:
            layer0.conv1 = nn.Conv2d(3, 64, 3, 2, 1, bias=False)
            layer0.bn1 = nn.BatchNorm2d(64)
            layer0.conv2 = nn.Conv2d(64, 64, 3, 1, 1, bias=False)
            layer0.bn2 = nn.BatchNorm2d(64)
            layer0.conv3 = nn.Conv2d(64, 128, 3, 1, 1, bias=False)
            layer0.bn3 = nn.BatchNorm2d(128)
        else:
            layer0.conv1 = nn.Conv2d(3, inplanes, 7, 2, 3, bias=False)
            layer0.bn1 = nn.BatchNorm2d(inplanes)
        self.layer0 = layer0
        self.input_3x3 = input_3x3
        cin = inplanes
        for li, (n, planes) in enumerate(zip(layers, (64, 128, 256, 512)),
                                         start=1):
            blocks = []
            for bi in range(n):
                stride = 2 if (li > 1 and bi == 0) else 1
                blocks.append(SENetBottleneck(
                    cin, planes, kind, stride, groups,
                    downsample_3x3=down3 and li > 1))
                cin = planes * 4
            setattr(self, f"layer{li}", nn.Sequential(*blocks))
        self.out_channels = (3, inplanes, 256, 512, 1024, 2048)

    def forward(self, x):
        feats = [x]
        l0 = self.layer0
        y = torch.relu(l0.bn1(l0.conv1(x)))
        if self.input_3x3:
            y = torch.relu(l0.bn2(l0.conv2(y)))
            y = torch.relu(l0.bn3(l0.conv3(y)))
        feats.append(y)
        y = nn.functional.max_pool2d(y, 3, 2, 0, ceil_mode=True)
        for li in range(1, 5):
            y = getattr(self, f"layer{li}")(y)
            feats.append(y)
        return feats


# Mirrors models/xception.py (Cadene xception.py + smp padding patches).


class SeparableConv2d(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cin, 3, stride, 1, groups=cin, bias=False)
        self.pointwise = nn.Conv2d(cin, cout, 1, bias=False)

    def forward(self, x):
        return self.pointwise(self.conv1(x))


class XceptionBlock(nn.Module):
    """Cadene Block: the rep Sequential is built with the SAME index layout
    as models/xception.py's ``block_rep_layout`` (leading-ReLU drop shifts
    indices for block1)."""

    def __init__(self, cin, cout, reps, stride=1, start_with_relu=True,
                 grow_first=True):
        super().__init__()
        rep = []
        filters = cin
        if grow_first:
            rep += [nn.ReLU(inplace=False), SeparableConv2d(cin, cout),
                    nn.BatchNorm2d(cout)]
            filters = cout
        for _ in range(reps - 1):
            rep += [nn.ReLU(inplace=False), SeparableConv2d(filters, filters),
                    nn.BatchNorm2d(filters)]
        if not grow_first:
            rep += [nn.ReLU(inplace=False), SeparableConv2d(cin, cout),
                    nn.BatchNorm2d(cout)]
        if not start_with_relu:
            rep = rep[1:]
        if stride != 1:
            rep.append(nn.MaxPool2d(3, stride, 1))
        self.rep = nn.Sequential(*rep)
        self.skip = self.skipbn = None
        if stride != 1 or cin != cout:
            self.skip = nn.Conv2d(cin, cout, 1, stride, bias=False)
            self.skipbn = nn.BatchNorm2d(cout)

    def forward(self, x):
        skip = self.skipbn(self.skip(x)) if self.skip is not None else x
        return self.rep(x) + skip


class XceptionEncoder(nn.Module):
    """smp XceptionEncoder: stem(pad-1 patched)/block1/block2/block3-11/
    block12+conv3,4; deepest stage ends at bn4 with NO trailing ReLU
    (``Xception.features()`` ending; see models/xception.py)."""

    _BLOCKS = ((64, 128, 2, 2, False, True), (128, 256, 2, 2, True, True),
               (256, 728, 2, 2, True, True),
               *(((728, 728, 3, 1, True, True),) * 8),
               (728, 1024, 2, 2, True, False))

    def __init__(self, name="xception"):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 32, 3, 2, 1, bias=False)  # smp pad patch
        self.bn1 = nn.BatchNorm2d(32)
        self.conv2 = nn.Conv2d(32, 64, 3, 1, 1, bias=False)  # smp pad patch
        self.bn2 = nn.BatchNorm2d(64)
        for i, args in enumerate(self._BLOCKS, start=1):
            setattr(self, f"block{i}", XceptionBlock(*args))
        self.conv3 = SeparableConv2d(1024, 1536)
        self.bn3 = nn.BatchNorm2d(1536)
        self.conv4 = SeparableConv2d(1536, 2048)
        self.bn4 = nn.BatchNorm2d(2048)
        self.out_channels = (3, 64, 128, 256, 728, 2048)

    def forward(self, x):
        feats = [x]
        y = torch.relu(self.bn1(self.conv1(x)))
        y = torch.relu(self.bn2(self.conv2(y)))
        feats.append(y)
        y = self.block1(y)
        feats.append(y)
        y = self.block2(y)
        feats.append(y)
        for i in range(3, 12):
            y = getattr(self, f"block{i}")(y)
        feats.append(y)
        y = self.block12(y)
        y = torch.relu(self.bn3(self.conv3(y)))
        y = self.bn4(self.conv4(y))
        feats.append(y)
        return feats


# Mirrors models/inceptionv4.py (Cadene inceptionv4.py + smp pad patches:
# every 3x3 conv and every maxpool gets padding 1).


class BasicConv2dI(nn.Module):
    """Cadene BasicConv2d (inception families): conv+BN(eps 1e-3)+ReLU."""

    def __init__(self, cin, cout, kernel_size, stride=1, padding=0):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, kernel_size, stride, padding,
                              bias=False)
        self.bn = nn.BatchNorm2d(cout, eps=1e-3)

    def forward(self, x):
        return torch.relu(self.bn(self.conv(x)))


class _AvgPoolNC(nn.Module):
    def forward(self, x):
        return nn.functional.avg_pool2d(x, 3, 1, 1, count_include_pad=False)


class _IV4Mixed(nn.Module):
    """One inceptionv4 features module; ``kind`` picks the torch wiring
    (see models/inceptionv4.py). Attribute names match Cadene exactly."""

    def __init__(self, kind):
        super().__init__()
        self.kind = kind
        B, S = BasicConv2dI, nn.Sequential
        if kind == "mixed_3a":
            self.maxpool = nn.MaxPool2d(3, 2, 1)
            self.conv = B(64, 96, 3, 2, 1)
        elif kind == "mixed_4a":
            self.branch0 = S(B(160, 64, 1), B(64, 96, 3, 1, 1))
            self.branch1 = S(B(160, 64, 1), B(64, 64, (1, 7), 1, (0, 3)),
                             B(64, 64, (7, 1), 1, (3, 0)), B(64, 96, 3, 1, 1))
        elif kind == "mixed_5a":
            self.conv = B(192, 192, 3, 2, 1)
            self.maxpool = nn.MaxPool2d(3, 2, 1)
        elif kind == "inception_a":
            self.branch0 = B(384, 96, 1)
            self.branch1 = S(B(384, 64, 1), B(64, 96, 3, 1, 1))
            self.branch2 = S(B(384, 64, 1), B(64, 96, 3, 1, 1),
                             B(96, 96, 3, 1, 1))
            self.branch3 = S(_AvgPoolNC(), B(384, 96, 1))
        elif kind == "reduction_a":
            self.branch0 = B(384, 384, 3, 2, 1)
            self.branch1 = S(B(384, 192, 1), B(192, 224, 3, 1, 1),
                             B(224, 256, 3, 2, 1))
            self.branch2 = nn.MaxPool2d(3, 2, 1)
        elif kind == "inception_b":
            self.branch0 = B(1024, 384, 1)
            self.branch1 = S(B(1024, 192, 1), B(192, 224, (1, 7), 1, (0, 3)),
                             B(224, 256, (7, 1), 1, (3, 0)))
            self.branch2 = S(B(1024, 192, 1), B(192, 192, (7, 1), 1, (3, 0)),
                             B(192, 224, (1, 7), 1, (0, 3)),
                             B(224, 224, (7, 1), 1, (3, 0)),
                             B(224, 256, (1, 7), 1, (0, 3)))
            self.branch3 = S(_AvgPoolNC(), B(1024, 128, 1))
        elif kind == "reduction_b":
            self.branch0 = S(B(1024, 192, 1), B(192, 192, 3, 2, 1))
            self.branch1 = S(B(1024, 256, 1), B(256, 256, (1, 7), 1, (0, 3)),
                             B(256, 320, (7, 1), 1, (3, 0)),
                             B(320, 320, 3, 2, 1))
            self.branch2 = nn.MaxPool2d(3, 2, 1)
        else:  # inception_c
            self.branch0 = B(1536, 256, 1)
            self.branch1_0 = B(1536, 384, 1)
            self.branch1_1a = B(384, 256, (1, 3), 1, (0, 1))
            self.branch1_1b = B(384, 256, (3, 1), 1, (1, 0))
            self.branch2_0 = B(1536, 384, 1)
            self.branch2_1 = B(384, 448, (3, 1), 1, (1, 0))
            self.branch2_2 = B(448, 512, (1, 3), 1, (0, 1))
            self.branch2_3a = B(512, 256, (1, 3), 1, (0, 1))
            self.branch2_3b = B(512, 256, (3, 1), 1, (1, 0))
            self.branch3 = S(_AvgPoolNC(), B(1536, 256, 1))

    def forward(self, x):
        k = self.kind
        if k == "mixed_3a":
            return torch.cat([self.maxpool(x), self.conv(x)], 1)
        if k == "mixed_5a":
            return torch.cat([self.conv(x), self.maxpool(x)], 1)
        if k == "mixed_4a":
            return torch.cat([self.branch0(x), self.branch1(x)], 1)
        if k in ("inception_a", "inception_b"):
            return torch.cat([self.branch0(x), self.branch1(x),
                              self.branch2(x), self.branch3(x)], 1)
        if k in ("reduction_a", "reduction_b"):
            return torch.cat([self.branch0(x), self.branch1(x),
                              self.branch2(x)], 1)
        x1_0 = self.branch1_0(x)
        x1 = torch.cat([self.branch1_1a(x1_0), self.branch1_1b(x1_0)], 1)
        x2 = self.branch2_2(self.branch2_1(self.branch2_0(x)))
        x2 = torch.cat([self.branch2_3a(x2), self.branch2_3b(x2)], 1)
        return torch.cat([self.branch0(x), x1, x2, self.branch3(x)], 1)


class InceptionV4Encoder(nn.Module):
    """smp InceptionV4Encoder: 22-module features, stage_idxs (3,5,9,15)."""

    _KINDS = (("mixed_3a",) + ("mixed_4a",) + ("mixed_5a",)
              + ("inception_a",) * 4 + ("reduction_a",)
              + ("inception_b",) * 7 + ("reduction_b",)
              + ("inception_c",) * 3)

    def __init__(self, name="inceptionv4"):
        super().__init__()
        stem = [BasicConv2dI(3, 32, 3, 2, 1), BasicConv2dI(32, 32, 3, 1, 1),
                BasicConv2dI(32, 64, 3, 1, 1)]
        self.features = nn.Sequential(
            *stem, *[_IV4Mixed(k) for k in self._KINDS])
        self.stage_idxs = (3, 5, 9, 15)
        self.out_channels = (3, 64, 192, 384, 1024, 1536)

    def forward(self, x):
        feats = [x]
        y = x
        for i, m in enumerate(self.features):
            if i in self.stage_idxs:
                feats.append(y)
            y = m(y)
        feats.append(y)
        return feats


# Mirrors models/inceptionresnetv2.py (Cadene inceptionresnetv2.py + smp
# pad patches). Attribute names match Cadene exactly.


class _IRBlock(nn.Module):
    """Block35/Block17/Block8: branches -> biased 1x1 conv2d (no BN) ->
    relu(x + scale*out) (no relu on the final standalone block8)."""

    def __init__(self, kind, scale, relu=True):
        super().__init__()
        self.scale, self.do_relu = scale, relu
        B, S = BasicConv2dI, nn.Sequential
        if kind == "block35":
            self.branch0 = B(320, 32, 1)
            self.branch1 = S(B(320, 32, 1), B(32, 32, 3, 1, 1))
            self.branch2 = S(B(320, 32, 1), B(32, 48, 3, 1, 1),
                             B(48, 64, 3, 1, 1))
            self.conv2d = nn.Conv2d(128, 320, 1)
        elif kind == "block17":
            self.branch0 = B(1088, 192, 1)
            self.branch1 = S(B(1088, 128, 1), B(128, 160, (1, 7), 1, (0, 3)),
                             B(160, 192, (7, 1), 1, (3, 0)))
            self.conv2d = nn.Conv2d(384, 1088, 1)
        else:
            self.branch0 = B(2080, 192, 1)
            self.branch1 = S(B(2080, 192, 1), B(192, 224, (1, 3), 1, (0, 1)),
                             B(224, 256, (3, 1), 1, (1, 0)))
            self.conv2d = nn.Conv2d(448, 2080, 1)
        self.has_branch2 = kind == "block35"

    def forward(self, x):
        outs = [self.branch0(x), self.branch1(x)]
        if self.has_branch2:
            outs.append(self.branch2(x))
        y = x + self.scale * self.conv2d(torch.cat(outs, 1))
        return torch.relu(y) if self.do_relu else y


class _IRMixed(nn.Module):
    def __init__(self, kind):
        super().__init__()
        self.kind = kind
        B, S = BasicConv2dI, nn.Sequential
        if kind == "mixed_5b":
            self.branch0 = B(192, 96, 1)
            self.branch1 = S(B(192, 48, 1), B(48, 64, 5, 1, 2))
            self.branch2 = S(B(192, 64, 1), B(64, 96, 3, 1, 1),
                             B(96, 96, 3, 1, 1))
            self.branch3 = S(_AvgPoolNC(), B(192, 64, 1))
        elif kind == "mixed_6a":
            self.branch0 = B(320, 384, 3, 2, 1)
            self.branch1 = S(B(320, 256, 1), B(256, 256, 3, 1, 1),
                             B(256, 384, 3, 2, 1))
            self.branch2 = nn.MaxPool2d(3, 2, 1)
        else:  # mixed_7a
            self.branch0 = S(B(1088, 256, 1), B(256, 384, 3, 2, 1))
            self.branch1 = S(B(1088, 256, 1), B(256, 288, 3, 2, 1))
            self.branch2 = S(B(1088, 256, 1), B(256, 288, 3, 1, 1),
                             B(288, 320, 3, 2, 1))
            self.branch3 = nn.MaxPool2d(3, 2, 1)

    def forward(self, x):
        outs = [self.branch0(x), self.branch1(x), self.branch2(x)]
        if self.kind != "mixed_6a":
            outs.append(self.branch3(x))
        return torch.cat(outs, 1)


class InceptionResNetV2Encoder(nn.Module):
    """smp InceptionResNetV2Encoder staging (see
    models/inceptionresnetv2.py docstring)."""

    def __init__(self, name="inceptionresnetv2"):
        super().__init__()
        self.conv2d_1a = BasicConv2dI(3, 32, 3, 2, 1)
        self.conv2d_2a = BasicConv2dI(32, 32, 3, 1, 1)
        self.conv2d_2b = BasicConv2dI(32, 64, 3, 1, 1)
        self.maxpool_3a = nn.MaxPool2d(3, 2, 1)
        self.conv2d_3b = BasicConv2dI(64, 80, 1)
        self.conv2d_4a = BasicConv2dI(80, 192, 3, 1, 1)
        self.maxpool_5a = nn.MaxPool2d(3, 2, 1)
        self.mixed_5b = _IRMixed("mixed_5b")
        self.repeat = nn.Sequential(
            *[_IRBlock("block35", 0.17) for _ in range(10)])
        self.mixed_6a = _IRMixed("mixed_6a")
        self.repeat_1 = nn.Sequential(
            *[_IRBlock("block17", 0.10) for _ in range(20)])
        self.mixed_7a = _IRMixed("mixed_7a")
        self.repeat_2 = nn.Sequential(
            *[_IRBlock("block8", 0.20) for _ in range(9)])
        self.block8 = _IRBlock("block8", 1.0, relu=False)
        self.conv2d_7b = BasicConv2dI(2080, 1536, 1)
        self.out_channels = (3, 64, 192, 320, 1088, 1536)

    def forward(self, x):
        feats = [x]
        y = self.conv2d_2b(self.conv2d_2a(self.conv2d_1a(x)))
        feats.append(y)
        y = self.conv2d_4a(self.conv2d_3b(self.maxpool_3a(y)))
        feats.append(y)
        y = self.repeat(self.mixed_5b(self.maxpool_5a(y)))
        feats.append(y)
        y = self.repeat_1(self.mixed_6a(y))
        feats.append(y)
        y = self.conv2d_7b(self.block8(self.repeat_2(self.mixed_7a(y))))
        feats.append(y)
        return feats


# Mirrors models/dpn.py (pretrainedmodels dpn.py wiring; see its docstring).
DPN_SPECS = {
    # stage_idxs, out_channels, small, init, k_r, groups, b, k_sec, inc_sec
    "dpn68": ((4, 8, 20, 24), (3, 10, 144, 320, 704, 832), True, 10, 128,
              32, False, (3, 4, 12, 3), (16, 32, 32, 64)),
    "dpn68b": ((4, 8, 20, 24), (3, 10, 144, 320, 704, 832), True, 10, 128,
               32, True, (3, 4, 12, 3), (16, 32, 32, 64)),
    "dpn92": ((4, 8, 28, 32), (3, 64, 336, 704, 1552, 2688), False, 64, 96,
              32, False, (3, 4, 20, 3), (16, 32, 24, 128)),
    "dpn98": ((4, 10, 30, 34), (3, 96, 336, 768, 1728, 2688), False, 96,
              160, 40, False, (3, 6, 20, 3), (16, 32, 32, 128)),
    "dpn107": ((5, 13, 33, 37), (3, 128, 376, 1152, 2432, 2688), False, 128,
               200, 50, False, (4, 8, 20, 3), (20, 64, 64, 128)),
    "dpn131": ((5, 13, 41, 45), (3, 128, 352, 832, 1984, 2688), False, 128,
               160, 40, False, (4, 8, 28, 3), (16, 32, 32, 128)),
}


class BnActConv2d(nn.Module):
    def __init__(self, cin, cout, k, stride, groups=1):
        super().__init__()
        self.bn = nn.BatchNorm2d(cin, eps=1e-3)
        self.conv = nn.Conv2d(cin, cout, k, stride, (k - 1) // 2,
                              groups=groups, bias=False)

    def forward(self, x):
        return self.conv(torch.relu(self.bn(x)))


class DPNDualPathBlock(nn.Module):
    def __init__(self, in_chs, r, bw, inc, groups, block_type, b=False):
        super().__init__()
        self.bw, self.b = bw, b
        stride = 2 if block_type == "down" else 1
        self.has_proj = block_type in ("proj", "down")
        if self.has_proj:
            name = "c1x1_w_s2" if stride == 2 else "c1x1_w_s1"
            setattr(self, name, BnActConv2d(in_chs, bw + 2 * inc, 1, stride))
            self._proj_name = name
        self.c1x1_a = BnActConv2d(in_chs, r, 1, 1)
        self.c3x3_b = BnActConv2d(r, r, 3, stride, groups)
        if b:
            cat_bn_ac = nn.Module()  # CatBnAct: child named bn
            cat_bn_ac.bn = nn.BatchNorm2d(r, eps=1e-3)
            self.c1x1_c = cat_bn_ac
            self.c1x1_c1 = nn.Conv2d(r, bw, 1, bias=False)
            self.c1x1_c2 = nn.Conv2d(r, inc, 1, bias=False)
        else:
            self.c1x1_c = BnActConv2d(r, bw + inc, 1, 1)

    def forward(self, x):
        x_in = torch.cat(x, dim=1) if isinstance(x, (tuple, list)) else x
        if self.has_proj:
            x_s = getattr(self, self._proj_name)(x_in)
            x_s1, x_s2 = x_s[:, :self.bw], x_s[:, self.bw:]
        else:
            x_s1, x_s2 = x
        y = self.c3x3_b(self.c1x1_a(x_in))
        if self.b:
            y = torch.relu(self.c1x1_c.bn(y))
            out1, out2 = self.c1x1_c1(y), self.c1x1_c2(y)
        else:
            y = self.c1x1_c(y)
            out1, out2 = y[:, :self.bw], y[:, self.bw:]
        return x_s1 + out1, torch.cat([x_s2, out2], dim=1)


class DPNEncoder(nn.Module):
    """smp DPNEncoder: stem conv/bn/act = stage 1, pool + conv2_* = stage 2,
    conv3/4/5 stages; tuple stage outputs emitted as relu(cat); final
    conv5_bn_ac (CatBnAct). torch key layout matches pretrainedmodels
    (``features.convK_i.*``) via this module's `features` ModuleDict."""

    def __init__(self, name="dpn68"):
        super().__init__()
        (self.stage_idxs, self.out_channels, small, init, k_r, groups, b,
         k_sec, inc_sec) = DPN_SPECS[name]
        feats = nn.ModuleDict()
        stem = nn.Module()
        k = 3 if small else 7
        stem.conv = nn.Conv2d(3, init, k, 2, (k - 1) // 2, bias=False)
        stem.bn = nn.BatchNorm2d(init, eps=1e-3)
        feats["conv1_1"] = stem
        bw_factor = 1 if small else 4
        in_chs = init
        self.block_keys = []
        for stage, base in enumerate((64, 128, 256, 512), start=2):
            bw = base * bw_factor
            inc = inc_sec[stage - 2]
            r = (k_r * bw) // (64 * bw_factor)
            for i in range(1, k_sec[stage - 2] + 1):
                bt = ("proj" if stage == 2 else "down") if i == 1 else "normal"
                key = f"conv{stage}_{i}"
                feats[key] = DPNDualPathBlock(in_chs, r, bw, inc, groups,
                                              bt, b)
                in_chs = (bw + 3 * inc) if i == 1 else in_chs + inc
                self.block_keys.append(key)
        bn_ac = nn.Module()
        bn_ac.bn = nn.BatchNorm2d(in_chs, eps=1e-3)
        feats["conv5_bn_ac"] = bn_ac
        self.features = feats

    def forward(self, x):
        feats = [x]
        stem = self.features["conv1_1"]
        y = torch.relu(stem.bn(stem.conv(x)))
        feats.append(y)
        y = nn.functional.max_pool2d(y, 3, 2, 1)
        for key in self.block_keys:
            if key in ("conv3_1", "conv4_1", "conv5_1"):
                feats.append(torch.relu(torch.cat(y, dim=1)))
            y = self.features[key](y)
        y = torch.cat(y, dim=1)
        feats.append(torch.relu(self.features["conv5_bn_ac"].bn(y)))
        return feats


def make_encoder(name):
    if name in ENCODER_SPECS:
        return ResnetEncoder(name)
    if name in DPN_SPECS:
        return DPNEncoder(name)
    if name == "xception":
        return XceptionEncoder(name)
    if name == "inceptionv4":
        return InceptionV4Encoder(name)
    if name == "inceptionresnetv2":
        return InceptionResNetV2Encoder(name)
    if name in SENET_SPECS:
        return SENetEncoder(name)
    if name.partition("_")[0] in VGG_LAYOUTS:
        return VGGEncoder(name)
    if name in DENSENET_SPECS:
        return DenseNetEncoder(name)
    if name in EFFICIENTNET_SPECS:
        return EfficientNetEncoder(name)
    if name == "mobilenet_v2":
        return MobileNetV2Encoder(name)
    raise ValueError(name)


class DecoderBlock(nn.Module):
    def __init__(self, cin, skip, cout):
        super().__init__()
        self.conv1 = conv_bn_relu(cin + skip, cout)
        self.conv2 = conv_bn_relu(cout, cout)

    def forward(self, x, skip):
        x = nn.functional.interpolate(x, scale_factor=2, mode="nearest")
        if skip is not None:
            x = torch.cat([x, skip], dim=1)
        return self.conv2(self.conv1(x))


class UnetSMP(nn.Module):
    """smp-Unet replica: decoder channel wiring follows smp's UnetDecoder
    (encoder channels reversed sans input; head = deepest level; skips are
    the shallower levels + a skipless last block — see docs/PARITY.md)."""

    def __init__(self, encoder_name="resnet34",
                 decoder_channels=(256, 128, 64, 32, 16)):
        super().__init__()
        self.encoder = make_encoder(encoder_name)
        enc = list(self.encoder.out_channels)[1:][::-1]
        ins = [enc[0]] + list(decoder_channels[:-1])
        skips = enc[1:] + [0]
        # smp: center=True for vgg encoders — CenterBlock of two Conv2dReLU
        # at head channels applied before the decoder.
        self.center = (nn.Sequential(conv_bn_relu(enc[0], enc[0]),
                                     conv_bn_relu(enc[0], enc[0]))
                       if encoder_name.startswith("vgg") else nn.Identity())
        self.blocks = nn.ModuleList(
            [DecoderBlock(i, s, o)
             for i, s, o in zip(ins, skips, decoder_channels)])
        self.head = nn.Conv2d(decoder_channels[-1], 3, 3, 1, 1)

    def forward(self, x):
        feats = self.encoder(x)
        head, skip_feats = feats[-1], feats[1:-1][::-1]
        y = self.center(head)
        for i, block in enumerate(self.blocks):
            y = block(y, skip_feats[i] if i < len(skip_feats) else None)
        return self.head(y)


class Unet34(UnetSMP):
    def __init__(self):
        super().__init__("resnet34")



def smp_named_state_dict(model) -> dict:
    """Rename the replica's state_dict keys to smp/torchvision convention.

    The replica's module tree differs from smp's in a few mechanical spots
    (``encoder.layers.N`` vs ``encoder.layerN+1``, decoder prefix, head
    name); this maps them so the result round-trips through
    ``convert_smp_unet_state_dict`` / reference Lightning checkpoints.
    Values are detached numpy arrays (incl. integer buffers like BN's
    ``num_batches_tracked``).
    """
    out = {}
    for name, value in model.state_dict().items():
        if name.startswith("encoder.layers."):
            # encoder.layers.{li}.{bi}.rest -> encoder.layer{li+1}.{bi}.rest
            parts = name.split(".")
            li, bi, rest = int(parts[2]), parts[3], ".".join(parts[4:])
            rest = rest.replace("down.", "downsample.")
            name = f"encoder.layer{li + 1}.{bi}.{rest}"
        elif name.startswith("blocks.") or name.startswith("center."):
            name = "decoder." + name
        elif name.startswith("head."):
            name = name.replace("head.", "segmentation_head.0.")
        else:
            name = name.replace(".down.", ".downsample.")
        out[name] = value.detach().numpy()
    return out
