"""Round-trip a REAL Lightning-format .ckpt file through the importer.

The structural importer tests (test_torch_parity.py) validate key mapping;
this file validates the full migration path against an actual on-disk
checkpoint in the reference's format: ``torch.save`` of ``{"state_dict",
"hyper_parameters", "epoch", "global_step"}`` with ``model_a./model_b./
ema_model_a.ema_model./criterion.`` prefixes — exactly what
``pl.Trainer.save_checkpoint`` emits for the reference LitModule
(`/root/reference/d3f/train_deep_fake/lit_module.py:36-42`).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from test_torch_parity import _synthetic_torch_state_dict

ENCODER = "resnet18"


def _make_lightning_ckpt(path, *, with_ema: bool) -> None:
    base = _synthetic_torch_state_dict(ENCODER)
    sd = {}
    rng = np.random.default_rng(7)
    for model in ("model_a", "model_b"):
        # Distinct weights per model so identity mixups would be caught.
        scale = 1.0 if model == "model_a" else 0.5
        for k, v in base.items():
            sd[f"{model}.{k}"] = torch.as_tensor(v * scale)
        if with_ema:
            for k, v in base.items():
                sd[f"ema_{model}.ema_model.{k}"] = torch.as_tensor(v * scale)
            sd[f"ema_{model}.initted"] = torch.tensor(True)
            sd[f"ema_{model}.step"] = torch.tensor(10)
            # ema_pytorch also keeps the online copy under online_model.*
            # in some versions; the importer must ignore unknown EMA subkeys.
    # piqa SSIM gaussian window buffer (dropped by the importer).
    sd["criterion.ssim.kernel"] = torch.zeros(1, 11)
    hparams = {
        "mode": "swap" if with_ema else "denoise",
        "data_path_a": "/data/a/images.txt",
        "data_path_b": "/data/b/images.txt",
        "mean_a": [0.5, 0.5, 0.5], "std_a": [0.5, 0.5, 0.5],
        "mean_b": [0.4, 0.4, 0.4], "std_b": [0.6, 0.6, 0.6],
        "learning_rate": 0.02,
        "batch_size": 4,
        "noise_exponential_sampling_lambda": 8,
        "ema_beta": 0.9999,
        "encoder_name": ENCODER,
        "max_epochs": 300,
    }
    torch.save({"state_dict": sd, "hyper_parameters": hparams,
                "epoch": 12, "global_step": 3456,
                "pytorch-lightning_version": "1.9.0"}, path)


def test_import_real_ckpt_file_swap_mode(tmp_path):
    ckpt_file = tmp_path / "last.ckpt"
    _make_lightning_ckpt(ckpt_file, with_ema=True)

    from denoising_diffusion_deep_fake_tpu.checkpoint import CheckpointManager
    from denoising_diffusion_deep_fake_tpu.utils.torch_import import (
        import_reference_checkpoint)

    out_dir = tmp_path / "imported"
    import_reference_checkpoint(ckpt_file, out_dir)

    manager = CheckpointManager(out_dir)
    meta = manager.read_meta()
    assert meta["step"] == 3456
    assert meta["extra"]["epoch"] == 12
    assert meta["hparams"]["mode"] == "swap"
    assert meta["hparams"]["encoder_name"] == ENCODER
    assert meta["hparams"]["learning_rate"] == 0.02


def test_imported_ckpt_drives_inference(tmp_path):
    """Imported checkpoint -> load_swap_model -> device pipeline forward."""
    ckpt_file = tmp_path / "last.ckpt"
    _make_lightning_ckpt(ckpt_file, with_ema=False)

    from denoising_diffusion_deep_fake_tpu.inference import (
        load_swap_model, make_device_pipeline)
    from denoising_diffusion_deep_fake_tpu.utils.torch_import import (
        import_reference_checkpoint)

    out_dir = tmp_path / "imported"
    import_reference_checkpoint(ckpt_file, out_dir)

    model = load_swap_model(out_dir, "a", image_size=32)
    # Identity crossing parity: model "a" denormalizes with B's statistics.
    assert tuple(model.mean) == (0.4, 0.4, 0.4)
    assert tuple(model.std) == (0.6, 0.6, 0.6)
    pipeline = make_device_pipeline(model)
    frames = jnp.asarray(np.random.default_rng(0).integers(
        0, 256, (2, 32, 32, 3), dtype=np.uint8))
    fake = pipeline(frames, jax.random.PRNGKey(0), jnp.zeros((), jnp.int32))
    fake = np.asarray(fake)
    assert fake.shape == (2, 32, 32, 3) and fake.dtype == np.uint8


def test_imported_ckpt_resumes_training(tmp_path):
    """Imported checkpoint feeds `train modify` semantics (fresh optimizers)."""
    ckpt_file = tmp_path / "last.ckpt"
    _make_lightning_ckpt(ckpt_file, with_ema=True)

    from denoising_diffusion_deep_fake_tpu.checkpoint import CheckpointManager
    from denoising_diffusion_deep_fake_tpu.config import (
        DeepFakeConfig, config_from_dict)
    from denoising_diffusion_deep_fake_tpu.training.deep_fake import (
        DeepFakeTrainer)
    from denoising_diffusion_deep_fake_tpu.utils.torch_import import (
        import_reference_checkpoint)

    out_dir = tmp_path / "imported"
    import_reference_checkpoint(ckpt_file, out_dir)
    manager = CheckpointManager(out_dir)
    meta = manager.read_meta()
    cfg = config_from_dict(DeepFakeConfig, meta["hparams"], validate=False)
    cfg.compute_dtype = "float32"
    trainer = DeepFakeTrainer(cfg, steps_per_epoch=1, image_size=32)
    states, _ = manager.restore(
        lambda: trainer.init_states(jax.random.PRNGKey(0), with_ema=True))

    step = trainer.make_train_step(with_images=False)
    rng = np.random.default_rng(1)
    batch = rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8)
    new_states, metrics = step(states, jnp.asarray(batch), jnp.asarray(batch),
                               jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss_swap/train_a"]))
    assert int(new_states["a"].step) == 1
