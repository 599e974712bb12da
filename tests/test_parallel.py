"""Mesh/sharding tests on the 8-device virtual CPU mesh (conftest sets it)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from denoising_diffusion_deep_fake_tpu.parallel import (
    batch_sharding,
    create_mesh,
    replicated_sharding,
    shard_batch,
)


def test_virtual_devices_present():
    assert jax.device_count() == 8


def test_create_mesh_shapes():
    mesh = create_mesh()  # all devices on data axis
    assert mesh.shape == {"data": 8, "spatial": 1}
    mesh2 = create_mesh(4, spatial=2)
    assert mesh2.shape == {"data": 4, "spatial": 2}
    with pytest.raises(ValueError, match="devices"):
        create_mesh(16)


def test_shard_batch_places_shards():
    mesh = create_mesh(8)
    batch = np.zeros((16, 8, 8, 3), np.uint8)
    arr = shard_batch(batch, mesh)
    assert arr.sharding.is_equivalent_to(batch_sharding(mesh), 4)
    # Each device holds 16/8 = 2 rows of the batch.
    shard_shapes = {s.data.shape for s in arr.addressable_shards}
    assert shard_shapes == {(2, 8, 8, 3)}


def test_spatial_sharding_splits_height():
    mesh = create_mesh(4, spatial=2)
    batch = np.zeros((8, 16, 16, 3), np.uint8)
    arr = shard_batch(batch, mesh, spatial=True)
    shard_shapes = {s.data.shape for s in arr.addressable_shards}
    assert shard_shapes == {(2, 8, 16, 3)}


def test_data_parallel_gradient_reduction_semantics():
    # A jitted sum-of-batch loss over a sharded batch must equal the
    # single-device result — XLA inserts the cross-device reduction.
    mesh = create_mesh(8)
    x = np.arange(16 * 4, dtype=np.float32).reshape(16, 4)
    w = np.ones((4,), np.float32)

    @jax.jit
    def loss_and_grad(w, x):
        def loss(w):
            return jnp.mean((x @ w) ** 2)
        return jax.value_and_grad(loss)(w)

    x_sharded = jax.device_put(x, batch_sharding(mesh))
    w_repl = jax.device_put(w, replicated_sharding(mesh))
    loss_s, grad_s = loss_and_grad(w_repl, x_sharded)
    loss_1, grad_1 = loss_and_grad(jnp.asarray(w), jnp.asarray(x))
    np.testing.assert_allclose(float(loss_s), float(loss_1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(grad_s), np.asarray(grad_1),
                               rtol=1e-5)


def test_graft_dryrun_multichip():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)
