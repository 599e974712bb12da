"""Exponential moving average of parameters, as pure pytree ops.

Parity target: the ``ema_pytorch.EMA`` shadows used in swap mode
(`/root/reference/d3f/train_deep_fake/lit_module.py:39-40,62-70,185` with
``beta=0.9999, update_every=1, include_online_model=False`` from
`swap_config.yml`). ema_pytorch's semantics, which we reproduce exactly:

* an internal ``step`` counts ``update()`` calls;
* for ``step <= update_after_step`` (default 100) the shadow just copies the
  online params (decay 0);
* afterwards the decay warms up as
  ``decay = clamp(1 - (1 + epoch / inv_gamma) ** -power, 0, beta)`` with
  ``epoch = step - update_after_step - 1`` (defaults inv_gamma=1, power=2/3);
* shadow update is ``ema = decay * ema + (1 - decay) * online`` and is only
  applied every ``update_every``-th call (copies/skips happen on the same
  cadence).

Everything is branch-free (``jnp.where``) so the EMA update lives inside the
jitted train step — no host round-trip per step.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class EmaConfig:
    beta: float = 0.9999
    update_every: int = 1
    update_after_step: int = 100
    inv_gamma: float = 1.0
    power: float = 2.0 / 3.0


def ema_decay(step, cfg: EmaConfig):
    """Current decay given the number of prior ``update()`` calls ``step``."""
    epoch = jnp.asarray(step, jnp.float32) - cfg.update_after_step - 1.0
    value = 1.0 - (1.0 + jnp.maximum(epoch, 0.0) / cfg.inv_gamma) ** (-cfg.power)
    return jnp.where(epoch <= 0.0, 0.0, jnp.clip(value, 0.0, cfg.beta))


def ema_update(ema_params, online_params, step, cfg: EmaConfig):
    """One ``EMA.update()`` call: returns ``(new_ema_params, new_step)``.

    ``step`` is the pre-call counter (a traced int32 scalar is fine).
    """
    decay = ema_decay(step, cfg)
    should_update = (jnp.asarray(step) % cfg.update_every) == 0

    def blend(e, p):
        p = p.astype(e.dtype)
        new = decay * e + (1.0 - decay) * p
        return jnp.where(should_update, new, e)

    new_ema = jax.tree.map(blend, ema_params, online_params)
    return new_ema, step + 1
