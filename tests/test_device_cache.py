"""data_cache='device': HBM-resident dataset + in-jit batch gather.

The cached path must be a pure transport change: same seeded epoch order,
same per-step PRNG derivation -> identical losses to the host-loader path.
"""

import json
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from helpers import make_image_dataset

from denoising_diffusion_deep_fake_tpu.config import (
    BalanceConfig,
    DeepFakeConfig,
    DenoiserConfig,
    config_from_dict,
)
from denoising_diffusion_deep_fake_tpu.data import ImageLoader
from denoising_diffusion_deep_fake_tpu.data.device_cache import (
    DeviceDatasetCache,
    gather_batch,
)
from denoising_diffusion_deep_fake_tpu.training.runners import (
    fit_deep_fake,
    fit_denoiser,
)


def _denoiser_cfg(manifest, tmp, **over):
    base = dict(input_image_list_path=str(manifest), batch_size=4,
                image_size=32, learning_rate=1e-3, encoder_name="resnet18",
                max_epochs=2, noise_exponential_sampling_lambda=5.0,
                log_dir=str(tmp / "runs"), checkpoint_dir=str(tmp / "ckpt"),
                last_checkpoint_min_interval_s=1e9, handle_preemption=False)
    base.update(over)
    return config_from_dict(DenoiserConfig, base)


def test_gather_batch_slices_order():
    dataset = jnp.arange(10 * 2 * 2 * 3, dtype=jnp.uint8).reshape(10, 2, 2, 3)
    order = jnp.asarray([3, 1, 4, 1, 5, 9, 2, 6], jnp.int32)
    # step 5 with steps_per_epoch 2, batch 4 -> pos (5 % 2) * 4 = 4
    batch = gather_batch(dataset, order, jnp.asarray(5), 4, 2)
    np.testing.assert_array_equal(np.asarray(batch),
                                  np.asarray(dataset)[[5, 9, 2, 6]])


def test_cache_matches_loader_order(tmp_path):
    manifest = make_image_dataset(tmp_path, n=10, size=32)
    loader = ImageLoader(manifest, 4, image_size=32, seed=3)
    cache = DeviceDatasetCache(loader)
    order = np.asarray(cache.order_for_epoch(1))
    want = loader._epoch_order(1)
    np.testing.assert_array_equal(order, want[:8])  # trimmed to whole batches
    # The cached dataset rows are the decoded images themselves.
    batch, _ = loader._load_batch(order[:4])
    np.testing.assert_array_equal(np.asarray(cache.dataset)[order[:4]], batch)


def test_cache_limit_refuses(tmp_path):
    manifest = make_image_dataset(tmp_path, n=10, size=32)
    loader = ImageLoader(manifest, 4, image_size=32)
    with pytest.raises(ValueError, match="device_cache_limit_bytes"):
        DeviceDatasetCache(loader, limit_bytes=100)


def test_config_rejects_bad_combinations(tmp_path):
    manifest = make_image_dataset(tmp_path, n=10, size=32)
    with pytest.raises(ValueError, match="data_cache"):
        _denoiser_cfg(manifest, tmp_path, data_cache="hbm").validate()
    with pytest.raises(ValueError, match="eliminates per-step uploads"):
        _denoiser_cfg(manifest, tmp_path, data_cache="device",
                      upload_format="i420").validate()
    with pytest.raises(ValueError, match="data axis only"):
        _denoiser_cfg(manifest, tmp_path, data_cache="device",
                      spatial_parallel=2).validate()


def test_fit_denoiser_device_cache_matches_host(tmp_path):
    """Transport-only change: identical per-step losses host vs device."""
    manifest = make_image_dataset(tmp_path, n=12, size=32)

    def run(mode, sub):
        losses = []

        def cb(step, state, metrics):
            losses.append(float(metrics["loss"]))

        fit_denoiser(_denoiser_cfg(manifest, tmp_path / sub, data_cache=mode),
                     max_steps=5, verbose=False, step_callback=cb)
        return losses

    host = run("host", "h")
    dev = run("device", "d")
    assert len(host) == len(dev) == 5
    np.testing.assert_allclose(dev, host, rtol=1e-6)


def test_fit_denoiser_device_cache_data_parallel(tmp_path):
    """8-virtual-device DP: replicated dataset + 'data'-sharded gather."""
    manifest = make_image_dataset(tmp_path, n=16, size=32)
    losses = []

    def cb(step, state, metrics):
        losses.append(float(metrics["loss"]))

    fit_denoiser(_denoiser_cfg(manifest, tmp_path / "dp", data_cache="device",
                               batch_size=8, data_parallel=8),
                 max_steps=3, verbose=False, step_callback=cb)
    assert len(losses) == 3 and np.isfinite(losses).all()


def test_balance_cache_scoring_matches_host(tmp_path):
    """score_dataset_from_cache == host score_dataset (n % B == 0 case)."""
    from denoising_diffusion_deep_fake_tpu.training.balance import (
        BalanceTrainer)

    manifest = make_image_dataset(tmp_path, n=8, size=32)
    cfg = config_from_dict(BalanceConfig, dict(
        data_path=str(manifest), batch_size=4, image_size=32,
        learning_rate=1e-3, encoder_name="resnet18", max_epochs=1,
        ratio_of_noise=0.7, number_of_classes=4,
        log_dir=str(tmp_path / "runs"), checkpoint_dir=str(tmp_path / "c")))
    trainer = BalanceTrainer(cfg, steps_per_epoch=2, image_size=32)
    state = trainer.init_state(jax.random.PRNGKey(0))

    train_loader = ImageLoader(manifest, 4, image_size=32)
    val_loader = ImageLoader(manifest, 4, image_size=32, shuffle=False,
                             drop_remainder=False)
    cache = DeviceDatasetCache(train_loader)
    rng = jax.random.PRNGKey(7)
    idx_host, loss_host = trainer.score_dataset(state, val_loader, rng)
    idx_dev, loss_dev = trainer.score_dataset_from_cache(state, cache, rng)
    np.testing.assert_array_equal(idx_dev, idx_host)
    np.testing.assert_allclose(loss_dev, loss_host, rtol=1e-6)


def test_balance_cache_scoring_tail_matches_host(tmp_path):
    """Tail batch: index-clipping == host pad-by-repeat -> identical losses
    for every image, including the remainder."""
    from denoising_diffusion_deep_fake_tpu.training.balance import (
        BalanceTrainer)

    manifest = make_image_dataset(tmp_path, n=10, size=32)
    cfg = config_from_dict(BalanceConfig, dict(
        data_path=str(manifest), batch_size=4, image_size=32,
        learning_rate=1e-3, encoder_name="resnet18", max_epochs=1,
        ratio_of_noise=0.7, number_of_classes=4,
        log_dir=str(tmp_path / "runs"), checkpoint_dir=str(tmp_path / "c")))
    trainer = BalanceTrainer(cfg, steps_per_epoch=2, image_size=32)
    state = trainer.init_state(jax.random.PRNGKey(0))
    cache = DeviceDatasetCache(ImageLoader(manifest, 4, image_size=32))
    val_loader = ImageLoader(manifest, 4, image_size=32, shuffle=False,
                             drop_remainder=False)
    rng = jax.random.PRNGKey(7)
    idx_host, loss_host = trainer.score_dataset(state, val_loader, rng)
    idx, losses = trainer.score_dataset_from_cache(state, cache, rng)
    assert idx.shape == losses.shape == (10,)
    np.testing.assert_array_equal(idx, idx_host)
    np.testing.assert_allclose(losses, loss_host, rtol=1e-6)


def test_device_cache_rejects_small_dataset(tmp_path):
    manifest = make_image_dataset(tmp_path, n=3, size=32)
    with pytest.raises(ValueError, match="smaller than one batch"):
        DeviceDatasetCache(ImageLoader(manifest, 4, image_size=32,
                                       drop_remainder=False))


def test_fit_balance_device_cache_writes_manifest(tmp_path):
    from denoising_diffusion_deep_fake_tpu.data.manifest import (
        read_image_manifest_with_classes)
    from denoising_diffusion_deep_fake_tpu.training.runners import fit_balance

    manifest = make_image_dataset(tmp_path, n=8, size=32)
    out_list = tmp_path / "balanced.txt"
    cfg = config_from_dict(BalanceConfig, dict(
        data_path=str(manifest), batch_size=4, image_size=32,
        learning_rate=1e-3, encoder_name="resnet18", max_epochs=1,
        ratio_of_noise=0.7, number_of_classes=3,
        output_image_list_path=str(out_list), data_cache="device",
        log_dir=str(tmp_path / "runs"), checkpoint_dir=str(tmp_path / "c"),
        last_checkpoint_min_interval_s=1e9, handle_preemption=False))
    fit_balance(cfg, verbose=False)
    paths, classes = read_image_manifest_with_classes(out_list)
    assert len(paths) == 8 and classes is not None
    assert set(int(c) for c in classes) <= {0, 1, 2}


def test_fit_deep_fake_device_cache_runs(tmp_path):
    ma = make_image_dataset(tmp_path / "a", n=8, size=32, seed=1)
    mb = make_image_dataset(tmp_path / "b", n=8, size=32, seed=2)
    losses = []

    def cb(step, states, metrics):
        losses.append({k: float(v) for k, v in metrics.items()})

    cfg = config_from_dict(DeepFakeConfig, dict(
        mode="swap", data_path_a=str(ma), data_path_b=str(mb), batch_size=4,
        image_size=32, learning_rate=1e-3, encoder_name="resnet18",
        max_epochs=2, ema_update_after_step=0,
        log_dir=str(tmp_path / "runs"), checkpoint_dir=str(tmp_path / "ckpt"),
        last_checkpoint_min_interval_s=1e9, handle_preemption=False,
        data_cache="device"))
    fit_deep_fake(cfg, max_steps=3, verbose=False, step_callback=cb)
    assert len(losses) == 3
    assert all(np.isfinite(list(m.values())).all() for m in losses)
