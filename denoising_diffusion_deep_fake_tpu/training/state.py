"""Train state pytrees — the functional replacement for Lightning internals.

One ``ModelState`` holds everything Lightning kept implicitly for one model
(params + BN running stats + Adam moments + step counter + optional EMA
shadow). The deep-fake workload carries two of these (model_a / model_b,
SURVEY.md §2 #3); the whole state is a pytree so it jits, shards, donates and
checkpoints as one value.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from denoising_diffusion_deep_fake_tpu.training.ema import (
    EmaConfig,
    ema_update,
)


@flax.struct.dataclass
class ModelState:
    """State for one U-Net: parameters, BN stats, optimizer, optional EMA."""

    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    # EMA shadow (swap mode only); None in denoise/balance modes.
    ema_params: Any = None
    ema_batch_stats: Any = None
    ema_step: Any = None

    @property
    def has_ema(self) -> bool:
        return self.ema_params is not None

    def apply_gradients(self, grads, tx: optax.GradientTransformation,
                        new_batch_stats) -> "ModelState":
        updates, new_opt_state = tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params,
                            batch_stats=new_batch_stats,
                            opt_state=new_opt_state)

    def update_ema(self, cfg: EmaConfig) -> "ModelState":
        """One ema_pytorch-semantics ``update()`` over params + BN stats."""
        new_ema_p, _ = ema_update(self.ema_params, self.params, self.ema_step, cfg)
        new_ema_bs, new_step = ema_update(self.ema_batch_stats,
                                          self.batch_stats, self.ema_step, cfg)
        return self.replace(ema_params=new_ema_p, ema_batch_stats=new_ema_bs,
                            ema_step=new_step)


def create_model_state(model, rng: jax.Array, input_shape,
                       tx: optax.GradientTransformation, *,
                       with_ema: bool = False) -> ModelState:
    """Initialize params/BN/optimizer (and EMA shadow) for a linen model.

    Init runs under jit: eager init dispatches one device op per parameter,
    which over a remote-tunnel TPU costs minutes; jitted it is one program.
    """
    variables = jax.jit(
        lambda rng, x: model.init(rng, x, train=False)
    )(rng, jnp.zeros(input_shape, jnp.float32))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    state = ModelState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
    )
    if with_ema:
        state = state.replace(
            ema_params=jax.tree.map(jnp.copy, params),
            ema_batch_stats=jax.tree.map(jnp.copy, batch_stats),
            ema_step=jnp.zeros((), jnp.int32),
        )
    return state


def param_count(tree) -> int:
    import numpy as np

    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(tree))


def maybe_remat(forward, policy: str):
    """Wrap a gradient-path forward in ``jax.checkpoint`` per config.

    ``policy``: "none" (default — round-1 measurements at 64² showed XLA's
    fusion already minimizes traffic there), "dots" (save MXU outputs,
    rematerialize elementwise/BN chains — the usual bandwidth-relief policy
    for large spatial activations), "full" (save nothing).

    Exposed as the ``remat`` config knob for the 448² class of shapes where
    backward-pass activation reads dominate HBM traffic (BASELINE.md
    "448² step anatomy").
    """
    if policy == "none":
        return forward
    policies = {
        "dots": jax.checkpoint_policies.checkpoint_dots,
        "full": jax.checkpoint_policies.nothing_saveable,
    }
    return jax.checkpoint(forward, policy=policies[policy])
