"""Measure the torch-CPU reference-equivalent training throughput.

The reference publishes no numbers (BASELINE.md), so this establishes the
CPU-reference baseline on this host: a torch replica of the same
smp-Unet(resnet34) architecture (see tests/test_torch_parity.py for the
block-level parity checks) doing the same train step — noise blend + forward
+ MSE loss + backward + Adam — at the bench shape (batch 32, 64², fp32).

Run:  python tools/torch_cpu_baseline.py [steps]
"""

from __future__ import annotations

import json
import math
import sys
import time

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


def make_encoder(name):
    if name in ENCODER_SPECS:
        return ResnetEncoder(name)
    if name.partition("_")[0] in VGG_LAYOUTS:
        return VGGEncoder(name)
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


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    torch.manual_seed(0)
    batch, size, lam = 32, 64, 5.0
    model = Unet34()
    n_params = sum(p.numel() for p in model.parameters())
    opt = torch.optim.Adam(model.parameters(), lr=2e-2)
    x = torch.rand(batch, 3, size, size) * 2 - 1

    def step():
        y = torch.rand(batch, 1, 1, 1)
        c = 1 / math.exp(lam)
        r = 1 / lam * torch.log(1 / (y * (1 - c) + c))
        noisy = torch.sqrt(1 - r) * x + torch.sqrt(r) * torch.randn_like(x)
        opt.zero_grad()
        loss = nn.functional.mse_loss(model(noisy), x)
        loss.backward()
        opt.step()
        return float(loss)

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(steps):
        loss = step()
    dt = (time.perf_counter() - t0) / steps
    print(json.dumps({"torch_cpu_imgs_per_sec": round(batch / dt, 2),
                      "step_s": round(dt, 2), "params": n_params,
                      "loss": round(loss, 4)}))


if __name__ == "__main__":
    main()
