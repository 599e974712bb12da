"""Optimizer + LR schedule with torch-semantics parity.

The reference trains with ``torch.optim.Adam`` + per-epoch
``CosineAnnealingLR`` (`/root/reference/d3f/train_deep_fake/lit_module.py:113-125`,
`d3f/train_denoiser/lit_module.py:92-100`; the balancer uses plain Adam with no
schedule, `d3f/balance_training_images/lit_module.py:83-88`).

Parity notes:
* torch Adam: ``update = lr * m_hat / (sqrt(v_hat) + eps)`` with eps *outside*
  the sqrt — optax.adam with ``eps_root=0.0`` matches exactly.
* torch CosineAnnealingLR steps **per epoch** (Lightning default), so the LR is
  piecewise-constant across an epoch:
  ``lr(e) = eta_min + (lr0 - eta_min) * (1 + cos(pi * e / T_max)) / 2``.
  We reproduce that by deriving the epoch from the step counter inside the
  schedule (steps_per_epoch is static at jit time), keeping the whole update
  compiler-visible — no host-side scheduler object.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def cosine_annealing_lr(base_lr: float, t_max: int, epoch,
                        eta_min: float = 0.0):
    """torch ``CosineAnnealingLR`` closed form at integer ``epoch``."""
    epoch = jnp.asarray(epoch, jnp.float32)
    return eta_min + (base_lr - eta_min) * (
        1.0 + jnp.cos(jnp.pi * epoch / t_max)) / 2.0


def make_adam_with_cosine(learning_rate: float, *, b1: float = 0.9,
                          b2: float = 0.999, eps: float = 1e-8,
                          cosine_t_max: int | None = None,
                          steps_per_epoch: int = 1,
                          flatten: bool = True) -> optax.GradientTransformation:
    """Adam with torch betas/eps and optional per-epoch cosine annealing.

    ``cosine_t_max=None`` gives constant-LR Adam (the balancer's optimizer).
    ``flatten`` runs the update over one concatenated parameter vector —
    identical math, but one big fused VPU kernel instead of one per layer
    (measured 15.4 -> 5.8 ms for the 24.4M-param U-Net on TPU v5e).
    """
    if cosine_t_max is None:
        schedule = learning_rate
    else:
        def schedule(step):
            epoch = jnp.floor_divide(step, steps_per_epoch)
            return cosine_annealing_lr(learning_rate, cosine_t_max, epoch)

    tx = optax.adam(learning_rate=schedule, b1=b1, b2=b2, eps=eps,
                    eps_root=0.0)
    return optax.flatten(tx) if flatten else tx
