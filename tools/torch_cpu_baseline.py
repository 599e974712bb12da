"""Measure the torch-CPU reference-equivalent training throughput.

The reference publishes no numbers (BASELINE.md), so this establishes the
CPU-reference baseline on this host: a torch replica of the same
smp-Unet(resnet34) architecture doing the same train step — noise blend +
forward + MSE loss + backward + Adam — at the bench shape (batch 32, 64²,
fp32).

The replica model itself lives in the package
(`denoising_diffusion_deep_fake_tpu/utils/torch_replica.py`) because it is
also the checkpoint-export template and the parity anchor; this file is the
bench CLI plus re-exports so existing imports keep working.

Run:  python tools/torch_cpu_baseline.py [steps]
"""

from __future__ import annotations

import json
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import torch
import torch.nn as nn

from denoising_diffusion_deep_fake_tpu.utils.torch_replica import *  # noqa: F401,F403
from denoising_diffusion_deep_fake_tpu.utils.torch_replica import (  # noqa: F401
    _round_filters,
    DPNEncoder,
    EfficientNetEncoder,
    InceptionResNetV2Encoder,
    InceptionV4Encoder,
    Unet34,
    UnetSMP,
    XceptionEncoder,
    make_encoder,
    smp_named_state_dict,
)


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
