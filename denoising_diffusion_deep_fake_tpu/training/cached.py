"""Cached-step factories for ``data_cache: device`` (data/device_cache.py).

Wraps a trainer's un-jitted ``_train_step`` core with an in-jit gather from
the HBM-resident uint8 dataset: the step's operands are (state, dataset,
order, base_rng) — all already on device — so a training step dispatches
with ZERO host->device image bytes. Shuffle semantics are the host loader's
(the order vector is its seeded permutation, uploaded once per epoch).
"""

from __future__ import annotations

import functools

import jax

from denoising_diffusion_deep_fake_tpu.data.device_cache import (
    gather_batch,
    gather_batch_sharded,
)


def _data_sharder(mesh):
    """Constrain a gathered batch onto the 'data' mesh axis (DP compute with
    a replicated dataset); identity on a 1-device mesh."""
    if mesh is None or mesh.size <= 1:
        return lambda x: x
    from jax.sharding import NamedSharding, PartitionSpec

    sharding = NamedSharding(mesh, PartitionSpec("data"))
    return lambda x: jax.lax.with_sharding_constraint(x, sharding)


def _gatherer(mesh, batch_size: int, steps_per_epoch: int, sharded: bool):
    """(dataset, order, step) -> data-axis-sharded batch.

    ``sharded`` = the multi-process axis-0-sharded cache layout: the gather
    is a shard-local shard_map take. Otherwise the dataset is replicated and
    a global take + sharding constraint produces the same layout.
    """
    if sharded:
        return lambda ds, order, step: gather_batch_sharded(
            ds, order, step, batch_size, steps_per_epoch, mesh)
    shard = _data_sharder(mesh)
    return lambda ds, order, step: shard(
        gather_batch(ds, order, step, batch_size, steps_per_epoch))


def make_cached_step(train_step_core, batch_size: int, steps_per_epoch: int,
                     *, donate: bool = True, mesh=None, sharded: bool = False):
    """Single-state trainers (denoiser, balance): ``core(state, batch, rng)``
    becomes ``step(state, dataset, order, rng)``."""
    gather = _gatherer(mesh, batch_size, steps_per_epoch, sharded)

    def step(state, dataset_u8, order, rng):
        return train_step_core(state, gather(dataset_u8, order, state.step),
                               rng)

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_cached_pair_step(train_step_core, batch_size: int,
                          steps_per_epoch: int, *, donate: bool = True,
                          mesh=None, sharded: bool = False):
    """Two-identity trainer: ``core(states, batch_a, batch_b, rng)`` becomes
    ``step(states, ds_a, ds_b, order_a, order_b, rng)``."""
    gather = _gatherer(mesh, batch_size, steps_per_epoch, sharded)

    def step(states, ds_a, ds_b, order_a, order_b, rng):
        step_counter = states["a"].step
        return train_step_core(states,
                               gather(ds_a, order_a, step_counter),
                               gather(ds_b, order_b, step_counter), rng)

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def cached_steps_for(trainer, steps_per_epoch: int, *, paired: bool = False,
                     mesh=None, sharded: bool = False):
    """(plain, with_images) cached step pair for a trainer instance."""
    maker = make_cached_pair_step if paired else make_cached_step
    plain = maker(functools.partial(trainer._train_step, with_images=False),
                  trainer.cfg.batch_size, steps_per_epoch, mesh=mesh,
                  sharded=sharded)
    with_images = maker(
        functools.partial(trainer._train_step, with_images=True),
        trainer.cfg.batch_size, steps_per_epoch, donate=False, mesh=mesh,
        sharded=sharded)
    return plain, with_images
