"""Numerical parity vs torch layer semantics + checkpoint-importer structure.

The north star demands per-step fp32 parity with the torch reference. smp /
torchvision aren't installed here, so parity is established in layers:

1. primitive semantics (conv padding/stride, BN momentum/eps + running-stat
   updates, maxpool, nearest upsample) — flax vs torch directly;
2. composed block parity (BasicBlock with shared weights) — flax vs a local
   torch replica;
3. importer structure — a synthetic torch state_dict with torchvision/smp
   naming converts into exactly the tree our flax U-Net initializes.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from denoising_diffusion_deep_fake_tpu.models import create_unet
from denoising_diffusion_deep_fake_tpu.utils.torch_import import (
    convert_smp_unet_state_dict,
)


def to_nhwc(x_nchw: np.ndarray) -> np.ndarray:
    return np.transpose(x_nchw, (0, 2, 3, 1))


def conv_hwio(w_oihw: np.ndarray) -> np.ndarray:
    return np.transpose(w_oihw, (2, 3, 1, 0))


@pytest.mark.parametrize("stride,pad,ksize", [(1, 1, 3), (2, 1, 3), (2, 3, 7)])
def test_conv2d_matches_torch(rng, stride, pad, ksize):
    x = rng.standard_normal((2, 4, 16, 16)).astype(np.float32)
    w = rng.standard_normal((8, 4, ksize, ksize)).astype(np.float32)
    want = torch.nn.functional.conv2d(
        torch.from_numpy(x), torch.from_numpy(w), stride=stride,
        padding=pad).numpy()

    got = jax.lax.conv_general_dilated(
        jnp.asarray(to_nhwc(x)), jnp.asarray(conv_hwio(w)),
        window_strides=(stride, stride), padding=[(pad, pad)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(got), to_nhwc(want), atol=2e-4)


def test_batchnorm_train_mode_matches_torch(rng):
    import flax.linen as nn

    x = rng.standard_normal((4, 3, 8, 8)).astype(np.float32) * 2 + 1
    tbn = torch.nn.BatchNorm2d(3, eps=1e-5, momentum=0.1)
    with torch.no_grad():
        tbn.weight.copy_(torch.tensor([1.5, 0.5, 2.0]))
        tbn.bias.copy_(torch.tensor([0.1, -0.2, 0.0]))
    tbn.train()
    want = tbn(torch.from_numpy(x)).detach().numpy()

    fbn = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5)
    variables = fbn.init(jax.random.PRNGKey(0), jnp.asarray(to_nhwc(x)))
    variables = {
        "params": {"scale": jnp.asarray([1.5, 0.5, 2.0]),
                   "bias": jnp.asarray([0.1, -0.2, 0.0])},
        "batch_stats": variables["batch_stats"],
    }
    got, mutated = fbn.apply(variables, jnp.asarray(to_nhwc(x)),
                             mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(got), to_nhwc(want), atol=1e-5)

    # Running stats after one step: torch uses momentum 0.1 toward batch
    # stats with *unbiased* variance.
    np.testing.assert_allclose(np.asarray(mutated["batch_stats"]["mean"]),
                               tbn.running_mean.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(mutated["batch_stats"]["var"]),
                               tbn.running_var.numpy(), rtol=2e-2)


def test_batchnorm_eval_mode_matches_torch(rng):
    import flax.linen as nn

    x = rng.standard_normal((2, 3, 4, 4)).astype(np.float32)
    tbn = torch.nn.BatchNorm2d(3)
    tbn.running_mean.copy_(torch.tensor([0.3, -0.1, 0.7]))
    tbn.running_var.copy_(torch.tensor([1.2, 0.8, 2.0]))
    tbn.eval()
    want = tbn(torch.from_numpy(x)).detach().numpy()

    fbn = nn.BatchNorm(use_running_average=True, epsilon=1e-5)
    variables = {
        "params": {"scale": jnp.ones(3), "bias": jnp.zeros(3)},
        "batch_stats": {"mean": jnp.asarray([0.3, -0.1, 0.7]),
                        "var": jnp.asarray([1.2, 0.8, 2.0])},
    }
    got = fbn.apply(variables, jnp.asarray(to_nhwc(x)))
    np.testing.assert_allclose(np.asarray(got), to_nhwc(want), atol=1e-5)


def test_maxpool_matches_torch(rng):
    import flax.linen as nn

    x = rng.standard_normal((1, 2, 9, 9)).astype(np.float32)
    want = torch.nn.functional.max_pool2d(
        torch.from_numpy(x), kernel_size=3, stride=2, padding=1).numpy()
    got = nn.max_pool(jnp.asarray(to_nhwc(x)), (3, 3), strides=(2, 2),
                      padding=((1, 1), (1, 1)))
    np.testing.assert_allclose(np.asarray(got), to_nhwc(want), atol=1e-6)


def test_nearest_upsample_matches_torch(rng):
    from denoising_diffusion_deep_fake_tpu.models.unet import (
        _upsample_nearest_2x)

    x = rng.standard_normal((1, 3, 5, 5)).astype(np.float32)
    want = torch.nn.functional.interpolate(
        torch.from_numpy(x), scale_factor=2, mode="nearest").numpy()
    got = _upsample_nearest_2x(jnp.asarray(to_nhwc(x)))
    np.testing.assert_allclose(np.asarray(got), to_nhwc(want), atol=1e-6)


class TorchBasicBlock(torch.nn.Module):
    """Local torchvision-BasicBlock replica for composed parity."""

    def __init__(self, cin, cout, stride):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(cout)
        self.conv2 = torch.nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = torch.nn.BatchNorm2d(cout)
        self.down = (torch.nn.Sequential(
            torch.nn.Conv2d(cin, cout, 1, stride, bias=False),
            torch.nn.BatchNorm2d(cout)) if (stride != 1 or cin != cout)
            else None)

    def forward(self, x):
        idt = x if self.down is None else self.down(x)
        y = torch.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return torch.relu(y + idt)


def test_basic_block_composed_parity(rng):
    from denoising_diffusion_deep_fake_tpu.models.resnet import BasicBlock

    tb = TorchBasicBlock(4, 8, stride=2).eval()
    x = rng.standard_normal((2, 4, 8, 8)).astype(np.float32)
    with torch.no_grad():
        want = tb(torch.from_numpy(x)).numpy()

    fb = BasicBlock(features=8, strides=2)
    variables = fb.init(jax.random.PRNGKey(0), jnp.asarray(to_nhwc(x)),
                        train=False)
    params = {
        "conv1": {"kernel": jnp.asarray(conv_hwio(tb.conv1.weight.detach().numpy()))},
        "conv2": {"kernel": jnp.asarray(conv_hwio(tb.conv2.weight.detach().numpy()))},
        "bn1": {"scale": jnp.asarray(tb.bn1.weight.detach().numpy()),
                "bias": jnp.asarray(tb.bn1.bias.detach().numpy())},
        "bn2": {"scale": jnp.asarray(tb.bn2.weight.detach().numpy()),
                "bias": jnp.asarray(tb.bn2.bias.detach().numpy())},
        "downsample_conv": {"kernel": jnp.asarray(
            conv_hwio(tb.down[0].weight.detach().numpy()))},
        "downsample_bn": {"scale": jnp.asarray(tb.down[1].weight.detach().numpy()),
                          "bias": jnp.asarray(tb.down[1].bias.detach().numpy())},
    }
    stats = {
        "bn1": {"mean": jnp.zeros(8), "var": jnp.ones(8)},
        "bn2": {"mean": jnp.zeros(8), "var": jnp.ones(8)},
        "downsample_bn": {"mean": jnp.zeros(8), "var": jnp.ones(8)},
    }
    got = fb.apply({"params": params, "batch_stats": stats},
                   jnp.asarray(to_nhwc(x)), train=False)
    np.testing.assert_allclose(np.asarray(got), to_nhwc(want), atol=1e-4)


def _synthetic_torch_state_dict(encoder="resnet34"):
    """Generate a torch smp-Unet state_dict (names + shapes) synthetically."""
    from denoising_diffusion_deep_fake_tpu.models.resnet import RESNET_SPECS

    spec = RESNET_SPECS[encoder]
    blocks, widths = spec.blocks, spec.widths
    sd = {}
    g = np.random.default_rng(0)

    def add_conv(name, cout, cin, k):
        sd[f"{name}.weight"] = g.standard_normal((cout, cin, k, k)).astype(np.float32)

    def add_bn(name, c):
        sd[f"{name}.weight"] = g.standard_normal(c).astype(np.float32)
        sd[f"{name}.bias"] = g.standard_normal(c).astype(np.float32)
        sd[f"{name}.running_mean"] = np.zeros(c, np.float32)
        sd[f"{name}.running_var"] = np.ones(c, np.float32)
        sd[f"{name}.num_batches_tracked"] = np.asarray(0)

    add_conv("encoder.conv1", 64, 3, 7)
    add_bn("encoder.bn1", 64)
    cin = 64
    for li, (n, w) in enumerate(zip(blocks, widths), start=1):
        for bi in range(n):
            base = f"encoder.layer{li}.{bi}"
            stride_block = li > 1 and bi == 0
            add_conv(f"{base}.conv1", w, cin if bi == 0 else w, 3)
            add_bn(f"{base}.bn1", w)
            add_conv(f"{base}.conv2", w, w, 3)
            add_bn(f"{base}.bn2", w)
            if bi == 0 and (stride_block or cin != w):
                add_conv(f"{base}.downsample.0", w, cin, 1)
                add_bn(f"{base}.downsample.1", w)
        cin = w
    enc_out = [64, 64, 128, 256, 512]
    dec_ch = [256, 128, 64, 32, 16]
    ins = [512, 256, 128, 64, 32]
    skips = [256, 128, 64, 64, 0]
    for i, (cin_d, skip, cout) in enumerate(zip(ins, skips, dec_ch)):
        add_conv(f"decoder.blocks.{i}.conv1.0", cout, cin_d + skip, 3)
        add_bn(f"decoder.blocks.{i}.conv1.1", cout)
        add_conv(f"decoder.blocks.{i}.conv2.0", cout, cout, 3)
        add_bn(f"decoder.blocks.{i}.conv2.1", cout)
    add_conv("segmentation_head.0", 3, 16, 3)
    sd["segmentation_head.0.bias"] = np.zeros(3, np.float32)
    return sd


def test_importer_structure_matches_flax_init():
    sd = _synthetic_torch_state_dict("resnet34")
    params, stats = convert_smp_unet_state_dict(sd)

    model = create_unet("resnet34")
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                           train=False))
    want_params = variables["params"]
    want_stats = variables["batch_stats"]

    got_shapes = jax.tree.map(lambda x: tuple(x.shape), params)
    want_shapes = jax.tree.map(lambda x: tuple(x.shape), want_params)
    assert got_shapes == want_shapes
    got_stat_shapes = jax.tree.map(lambda x: tuple(x.shape), stats)
    want_stat_shapes = jax.tree.map(lambda x: tuple(x.shape), want_stats)
    assert got_stat_shapes == want_stat_shapes


def test_importer_rejects_unknown_keys():
    with pytest.raises(ValueError, match="unmapped"):
        convert_smp_unet_state_dict({"mystery.weight": np.zeros((1, 1, 3, 3))})
