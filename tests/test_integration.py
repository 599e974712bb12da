"""End-to-end slice tests: the three workloads run at 32², CPU-runnable.

The integration strategy from SURVEY.md §4: run the CPU-runnable config for a
few steps under fixed PRNG keys, check losses are finite and improve-ish,
checkpoints round-trip, and the balancer writes its manifest.
"""

import jax
import numpy as np
import pytest

from denoising_diffusion_deep_fake_tpu.config import (
    BalanceConfig,
    DeepFakeConfig,
    DenoiserConfig,
    config_from_dict,
)

from helpers import make_image_dataset


def small_cfg_kwargs(tmp_path):
    return dict(
        batch_size=2, learning_rate=1e-3, max_epochs=1,
        encoder_name="resnet18", compute_dtype="float32",
        log_dir=str(tmp_path / "runs"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )


@pytest.fixture()
def two_identity_data(tmp_path):
    m_a = make_image_dataset(tmp_path / "ida", n=4, size=32, seed=1)
    m_b = make_image_dataset(tmp_path / "idb", n=4, size=32, seed=2)
    return m_a, m_b


def test_deep_fake_denoise_mode_end_to_end(tmp_path, two_identity_data):
    from denoising_diffusion_deep_fake_tpu.training.runners import fit_deep_fake

    m_a, m_b = two_identity_data
    cfg = config_from_dict(DeepFakeConfig, dict(
        mode="denoise", data_path_a=str(m_a), data_path_b=str(m_b),
        noise_exponential_sampling_lambda=3.0, **small_cfg_kwargs(tmp_path)))
    states, trainer, ctx = fit_deep_fake(cfg, max_steps=2, verbose=False)
    assert ctx.global_step == 2
    assert int(states["a"].step) == 2
    assert int(states["b"].step) == 2
    # Checkpoint was written at epoch end and is restorable.
    from denoising_diffusion_deep_fake_tpu.checkpoint import CheckpointManager

    manager = CheckpointManager(cfg.checkpoint_dir)
    assert manager.latest_step() is not None
    restored, meta = manager.restore(
        lambda: trainer.init_states(jax.random.PRNGKey(0)))
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(restored["a"].params)[0]),
        np.asarray(jax.tree.leaves(states["a"].params)[0]))
    assert meta["hparams"]["mode"] == "denoise"


def test_deep_fake_swap_mode_and_modify_flow(tmp_path, two_identity_data):
    from denoising_diffusion_deep_fake_tpu.checkpoint import CheckpointManager
    from denoising_diffusion_deep_fake_tpu.config import overlay_config
    from denoising_diffusion_deep_fake_tpu.training.runners import fit_deep_fake

    m_a, m_b = two_identity_data
    base = dict(mode="denoise", data_path_a=str(m_a), data_path_b=str(m_b),
                noise_exponential_sampling_lambda=3.0,
                **small_cfg_kwargs(tmp_path))
    cfg = config_from_dict(DeepFakeConfig, base)
    fit_deep_fake(cfg, max_steps=1, verbose=False)

    # modify: flip to swap mode on top of the denoise checkpoint.
    meta = CheckpointManager(cfg.checkpoint_dir).read_meta()
    swap_cfg = overlay_config(DeepFakeConfig, meta["hparams"], {
        "mode": "swap", "noise_exponential_sampling_lambda": 8,
        "ema_beta": 0.9999, "ema_update_every": 1})
    states, trainer, ctx = fit_deep_fake(
        swap_cfg, modify_from=cfg.checkpoint_dir, max_steps=1, verbose=False)
    s = states["a"]
    assert s.has_ema
    assert int(s.step) == 1            # fresh optimizer counters (modify)
    assert "swap" == swap_cfg.mode
    # Swap metrics present in TB? check the state instead: EMA step advanced.
    assert int(s.ema_step) == 1


def test_denoiser_end_to_end(tmp_path):
    from denoising_diffusion_deep_fake_tpu.training.runners import fit_denoiser

    manifest = make_image_dataset(tmp_path / "d", n=4, size=32, seed=3)
    cfg = config_from_dict(DenoiserConfig, dict(
        input_image_list_path=str(manifest),
        noise_exponential_sampling_lambda=5.0, **small_cfg_kwargs(tmp_path)))
    state, trainer, ctx = fit_denoiser(cfg, max_steps=2, verbose=False)
    assert int(state.step) == 2
    # Eval forward works and is finite.
    denoise = trainer.make_denoise_fn()
    x = jax.numpy.zeros((1, 32, 32, 3))
    out = denoise(state, x)
    assert np.isfinite(np.asarray(out)).all()


def test_balance_end_to_end_writes_manifest(tmp_path):
    from denoising_diffusion_deep_fake_tpu.training.runners import fit_balance

    manifest = make_image_dataset(tmp_path / "bal", n=5, size=32, seed=4)
    out_list = tmp_path / "balanced" / "images.txt"
    cfg = config_from_dict(BalanceConfig, dict(
        data_path=str(manifest), output_image_list_path=str(out_list),
        ratio_of_noise=0.7, number_of_classes=4,
        **small_cfg_kwargs(tmp_path)))
    state, trainer, ctx = fit_balance(cfg, max_steps=1, verbose=False)

    # The completed feature: every image got a difficulty class in [0, 4).
    assert out_list.exists()
    lines = out_list.read_text().strip().split("\n")
    assert len(lines) == 5
    classes = [int(l.split("\t")[1]) for l in lines]
    assert all(0 <= c < 4 for c in classes)
    # Min-max binning guarantees both extremes appear.
    assert 0 in classes and 3 in classes


def test_difficulty_index_math():
    from denoising_diffusion_deep_fake_tpu.training.balance import (
        compute_difficulty_index)

    losses = np.asarray([0.0, 0.5, 1.0, 0.999999])
    idx = compute_difficulty_index(losses, 10)
    assert idx.tolist() == [0, 5, 9, 9]  # clamp keeps max in the top class
    # Degenerate all-equal case doesn't divide by zero.
    idx2 = compute_difficulty_index(np.ones(3), 10)
    assert idx2.tolist() == [0, 0, 0]


def test_deep_fake_resume_flow(tmp_path, two_identity_data):
    """resume restores optimizer state, epoch counter, and RNG."""
    from denoising_diffusion_deep_fake_tpu.checkpoint import CheckpointManager
    from denoising_diffusion_deep_fake_tpu.training.runners import fit_deep_fake

    m_a, m_b = two_identity_data
    cfg = config_from_dict(DeepFakeConfig, dict(
        mode="denoise", data_path_a=str(m_a), data_path_b=str(m_b),
        noise_exponential_sampling_lambda=3.0,
        **{**small_cfg_kwargs(tmp_path), "max_epochs": 2}))
    states1, _, ctx1 = fit_deep_fake(cfg, max_steps=2, verbose=False)
    step_before = int(states1["a"].step)

    states2, _, ctx2 = fit_deep_fake(cfg, resume_from=cfg.checkpoint_dir,
                                     max_steps=None, verbose=False)
    # Resumed run continued from the checkpoint's counters: epoch advanced,
    # optimizer steps accumulated on top of the restored Adam state.
    assert ctx2.global_step > 0
    assert int(states2["a"].step) > step_before
    # A later checkpoint exists now.
    assert CheckpointManager(cfg.checkpoint_dir).latest_step() >= step_before


def test_balance_to_train_chain(tmp_path):
    """The full balancer workflow (VERDICT r1 item 9): fit_balance produces
    the difficulty manifest, then fit_deep_fake trains with
    class_balanced_sampling consuming it — balance → manifest → train."""
    from denoising_diffusion_deep_fake_tpu.training.runners import (
        fit_balance, fit_deep_fake)

    manifest = make_image_dataset(tmp_path / "bal", n=6, size=32, seed=4)
    out_list = tmp_path / "balanced" / "images.txt"
    bal_cfg = config_from_dict(BalanceConfig, dict(
        data_path=str(manifest), output_image_list_path=str(out_list),
        ratio_of_noise=0.7, number_of_classes=3,
        **small_cfg_kwargs(tmp_path / "balance")))
    fit_balance(bal_cfg, max_steps=1, verbose=False)
    assert out_list.exists()

    cfg = config_from_dict(DeepFakeConfig, dict(
        mode="denoise", data_path_a=str(out_list), data_path_b=str(out_list),
        class_balanced_sampling=True, noise_exponential_sampling_lambda=3.0,
        **small_cfg_kwargs(tmp_path / "train")))
    seen = []
    states, trainer, ctx = fit_deep_fake(
        cfg, max_steps=2, verbose=False,
        step_callback=lambda s, st, m: seen.append(s))
    assert ctx.global_step == 2, (
        f"steps seen={seen} epoch={ctx.epoch} "
        f"steps_per_epoch={trainer.steps_per_epoch} "
        f"preempt={ctx.preemption.triggered if ctx.preemption else None}")

    # The loaders actually saw the difficulty classes.
    from denoising_diffusion_deep_fake_tpu.data import ImageLoader

    loader = ImageLoader(out_list, 2, class_balanced=True)
    assert loader.classes is not None and len(loader.classes) == 6
