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
        self.encoder = ResnetEncoder(encoder_name)
        enc = list(self.encoder.out_channels)[1:][::-1]
        ins = [enc[0]] + list(decoder_channels[:-1])
        skips = enc[1:] + [0]
        self.blocks = nn.ModuleList(
            [DecoderBlock(i, s, o)
             for i, s, o in zip(ins, skips, decoder_channels)])
        self.head = nn.Conv2d(decoder_channels[-1], 3, 3, 1, 1)

    def forward(self, x):
        feats = self.encoder(x)
        head, skip_feats = feats[-1], feats[1:-1][::-1]
        y = head
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
