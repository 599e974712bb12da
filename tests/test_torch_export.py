"""Export path (native -> reference Lightning .ckpt), inverse of import.

Validates the flax->torch key mapping exactly (round trip through the
importer), torch-replica forward parity on exported weights, and the full
``d3f-tpu export`` checkpoint flow from a real trained-here checkpoint.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

import jax
import jax.numpy as jnp

from denoising_diffusion_deep_fake_tpu.models import create_unet
from denoising_diffusion_deep_fake_tpu.utils.torch_export import (
    export_smp_unet_state_dict,
)
from denoising_diffusion_deep_fake_tpu.utils.torch_import import (
    convert_smp_unet_state_dict,
)

from helpers import make_image_dataset

ENCODER = "resnet18"


@pytest.fixture(scope="module")
def flax_variables():
    model = create_unet(ENCODER)
    return model, model.init(jax.random.PRNGKey(3),
                             jnp.zeros((1, 32, 32, 3)), train=False)


def test_export_import_round_trip_exact(flax_variables):
    """export -> import reproduces the original pytree bit-for-bit."""
    _, variables = flax_variables
    sd = export_smp_unet_state_dict(variables["params"],
                                    variables["batch_stats"])
    params, stats = convert_smp_unet_state_dict(sd)
    for got, want in ((params, variables["params"]),
                      (stats, variables["batch_stats"])):
        flat_got = jax.tree.leaves(got)
        flat_want = jax.tree.leaves(want)
        assert len(flat_got) == len(flat_want)
        assert jax.tree.structure(got) == jax.tree.structure(
            jax.tree.map(np.asarray, want))
        for a, b in zip(flat_got, flat_want):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_exported_weights_drive_torch_replica_to_parity(flax_variables):
    """Exported state_dict loads into the torch replica and matches the
    flax forward (the evidence path for the e2e frame-parity number)."""
    from torch_cpu_baseline import UnetSMP

    fmodel, variables = flax_variables
    sd = export_smp_unet_state_dict(variables["params"],
                                    variables["batch_stats"])
    # smp naming -> the local replica's native attribute names.
    renamed = {}
    for k, v in sd.items():
        k = k.replace("decoder.blocks.", "blocks.")
        k = k.replace("decoder.center.", "center.")
        k = k.replace("segmentation_head.0.", "head.")
        if k.startswith("encoder.layer"):
            li = int(k[len("encoder.layer")])
            k = (f"encoder.layers.{li - 1}" + k[len("encoder.layerX"):])
            k = k.replace(".downsample.", ".down.")
        renamed[k] = torch.from_numpy(np.asarray(v))
    tmodel = UnetSMP(ENCODER)
    missing, unexpected = tmodel.load_state_dict(renamed, strict=False)
    assert not unexpected, unexpected
    assert all("num_batches_tracked" in k for k in missing), missing
    tmodel.eval()

    x = np.random.default_rng(0).standard_normal((2, 3, 32, 32)) \
        .astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x)).numpy()
    got = np.asarray(fmodel.apply(
        variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))), train=False))
    np.testing.assert_allclose(np.transpose(got, (0, 3, 1, 2)), want,
                               atol=5e-5, rtol=1e-4)


def test_generic_export_matches_handwritten_resnet(flax_variables):
    """The probe-inversion path reproduces the handwritten resnet inverse
    bit-for-bit (two independent derivations of the same mapping)."""
    from denoising_diffusion_deep_fake_tpu.utils.torch_export import (
        export_smp_unet_state_dict_any)

    _, variables = flax_variables
    hand = export_smp_unet_state_dict(variables["params"],
                                      variables["batch_stats"])
    probe = export_smp_unet_state_dict_any(variables["params"],
                                           variables["batch_stats"], ENCODER)
    assert set(hand) <= set(probe)
    for k in hand:
        np.testing.assert_array_equal(np.asarray(hand[k], np.float32),
                                      probe[k])
    extra = set(probe) - set(hand)
    assert all(k.endswith("num_batches_tracked") for k in extra)


@pytest.mark.parametrize("encoder", [
    "mobilenet_v2", "vgg11_bn", "densenet121", "efficientnet-b0",
    "se_resnet50", "xception", "inceptionv4", "inceptionresnetv2",
    "dpn68b", "dpn92"])
def test_generic_export_round_trips_every_family(encoder):
    """torch sd -> import -> generic export == torch sd, bit-for-bit, for
    every non-resnet family (the resnet family is covered by the
    handwritten-path tests + the cross-check above)."""
    from denoising_diffusion_deep_fake_tpu.utils.torch_export import (
        export_smp_unet_state_dict_any)
    from denoising_diffusion_deep_fake_tpu.utils.torch_replica import (
        UnetSMP, smp_named_state_dict)

    torch.manual_seed(0)
    sd = smp_named_state_dict(UnetSMP(encoder))
    params, stats = convert_smp_unet_state_dict(sd)
    back = export_smp_unet_state_dict_any(params, stats, encoder)
    assert set(back) == set(sd)
    for k, want in sd.items():
        if k.endswith("num_batches_tracked"):
            assert int(back[k]) == 0
        else:
            np.testing.assert_array_equal(back[k],
                                          np.asarray(want, np.float32))


def test_dispatch_emits_bn_counters_for_resnet(flax_variables):
    from denoising_diffusion_deep_fake_tpu.utils.torch_export import (
        export_unet_state_dict)

    _, variables = flax_variables
    sd = export_unet_state_dict(variables["params"],
                                variables["batch_stats"], ENCODER)
    counters = [k for k in sd if k.endswith("num_batches_tracked")]
    assert counters and all(sd[k].dtype == np.int64 for k in counters)
    means = {k[:-len("num_batches_tracked")] + "running_mean"
             for k in counters}
    assert means == {k for k in sd if k.endswith("running_mean")}


@pytest.mark.slow
def test_full_checkpoint_export_flow(tmp_path):
    """Train 2 swap steps -> d3f-tpu export -> the .ckpt round-trips through
    our own reference-checkpoint loader with EMA + hparams intact."""
    from denoising_diffusion_deep_fake_tpu.config import (
        DeepFakeConfig, config_from_dict)
    from denoising_diffusion_deep_fake_tpu.training.runners import (
        fit_deep_fake)
    from denoising_diffusion_deep_fake_tpu.utils.torch_export import (
        export_reference_checkpoint)
    from denoising_diffusion_deep_fake_tpu.utils.torch_import import (
        load_reference_checkpoint)

    m_a = make_image_dataset(tmp_path, n=4, size=32, seed=0, subdir="a",
                             manifest_name="a.txt")
    m_b = make_image_dataset(tmp_path, n=4, size=32, seed=1, subdir="b",
                             manifest_name="b.txt")
    cfg = config_from_dict(DeepFakeConfig, dict(
        mode="swap", data_path_a=str(m_a), data_path_b=str(m_b),
        batch_size=4, learning_rate=1e-3, max_epochs=1, image_size=32,
        encoder_name=ENCODER, compute_dtype="float32",
        noise_exponential_sampling_lambda=8.0, ema_update_after_step=0,
        log_dir=str(tmp_path / "runs"),
        checkpoint_dir=str(tmp_path / "ckpt")))
    states, _, _ = fit_deep_fake(cfg, max_steps=2, verbose=False)

    out = tmp_path / "exported.ckpt"
    info = export_reference_checkpoint(cfg.checkpoint_dir, out)
    assert info["identities"] == ["a", "b"] and out.exists()

    imported = load_reference_checkpoint(out)
    assert set(imported) >= {"model_a", "model_b", "ema_model_a",
                             "ema_model_b", "hyper_parameters"}
    assert imported["hyper_parameters"]["mode"] == "swap"
    # Weights survive the full native -> .ckpt -> native round trip.
    params_a, _ = imported["model_a"]
    want_leaves = jax.tree.leaves(jax.tree.map(np.asarray,
                                               states["a"].params))
    got_leaves = jax.tree.leaves(params_a)
    assert len(got_leaves) == len(want_leaves)
    for a, b in zip(got_leaves, want_leaves):
        np.testing.assert_array_equal(a, b)
    ema_a, _ = imported["ema_model_a"]
    np.testing.assert_array_equal(
        jax.tree.leaves(ema_a)[0],
        np.asarray(jax.tree.leaves(jax.tree.map(np.asarray,
                                                states["a"].ema_params))[0]))
