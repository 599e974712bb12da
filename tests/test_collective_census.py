"""Collective census of the compiled sharded programs (VERDICT r4 #3a).

The scale-out design relies on compiler-inserted collectives (jit +
NamedSharding, parallel/mesh.py); its failure mode is silent degradation —
the partitioner all-gathering what it cannot shard, or (the round-5
finding) dropping a mesh axis into full replication. These tests compile
the REAL train step over virtual meshes (abstract operands — no device
memory) and assert on what the SPMD partitioner actually inserted
(parallel/audit.py).
"""

import re

import jax
import pytest

from denoising_diffusion_deep_fake_tpu.parallel import create_mesh
from denoising_diffusion_deep_fake_tpu.parallel.audit import (
    census_summary,
    census_violations,
    collective_census,
    lower_train_step_hlo,
)

_FAKE_HLO = """
HloModule test
  %all-reduce.1 = f32[128,256]{1,0} all-reduce(f32[128,256] %p0), channel_id=1
  %ar2 = (f32[64]{0}, f32[32]{0}) all-reduce(%a, %b), channel_id=2
  %ag = bf16[16,448,448,16]{3,2,1,0} all-gather(%act), dimensions={1}
  %cp = f32[2,1,64,3]{3,2,1,0} collective-permute(%halo), channel_id=9
  %ags = (f32[8,8]{1,0}, f32[16,8]{1,0}) all-gather-start(%x), dimensions={0}
  %agd = f32[16,8]{1,0} all-gather-done(%ags)
"""


def test_census_parser_unit():
    c = collective_census(_FAKE_HLO)
    assert c["all-reduce"].count == 2
    assert c["all-reduce"].total_bytes == 128 * 256 * 4 + (64 + 32) * 4
    # Tuple shapes sum; -start counts its LARGEST element once (the -done
    # line repeats the payload and must not double-count).
    assert c["all-gather"].count == 2
    assert c["all-gather"].max_bytes == 16 * 448 * 448 * 16 * 2
    assert c["collective-permute"].count == 1

    v = census_violations(c, spatial=False)
    assert any("collective-permute" in x for x in v)      # permute w/o spatial
    assert any("all-gather" in x for x in v)              # 100 MiB activation
    assert not census_violations(
        {**c, "collective-permute": collective_census("")["collective-permute"]},
        spatial=False, allgather_limit_bytes=1 << 30)


@pytest.fixture(scope="module")
def data_only_hlo():
    mesh = create_mesh(8, spatial=1)
    return lower_train_step_hlo("swap", mesh, image_size=64, batch_size=8,
                                encoder_name="resnet18")


@pytest.fixture(scope="module")
def spatial_hlo():
    mesh = create_mesh(4, spatial=2)
    return lower_train_step_hlo("swap", mesh, image_size=64, batch_size=8,
                                encoder_name="resnet18")


def test_data_parallel_program_is_allreduce_only(data_only_hlo):
    """Pure DP: gradient all-reduces and NOTHING else. Pins the round-5 SSIM
    fix (batch-axis map stacking used to cost 62 collective-permutes + 12
    all-to-alls of activation chunks per step — ops/ssim.py)."""
    c = collective_census(data_only_hlo)
    assert census_violations(c, spatial=False) == [], census_summary(c)
    assert c["all-reduce"].count > 0            # grads ARE reduced
    assert c["collective-permute"].count == 0   # no resharding
    assert c["all-to-all"].count == 0
    assert c["all-gather"].count == 0           # nothing replicated late


def test_spatial_program_really_shards_h(spatial_hlo):
    """(data,spatial)=(4,2): convs must carry H/2 per device with halo
    collective-permutes — NOT silently replicate the spatial axis (the
    pre-round-5 behavior: the warp's H-gather killed the sharding at the
    first op and every spatial rank redundantly ran the full U-Net)."""
    c = collective_census(spatial_hlo)
    assert census_violations(c, spatial=True) == [], census_summary(c)
    assert c["collective-permute"].count > 0    # halo exchanges exist
    # Per-partition conv shapes: H sharded (H < W for our square images).
    conv_shapes = re.findall(
        r"= \w+\[(\d+),(\d+),(\d+),(\d+)\][^ ]* convolution\(", spatial_hlo)
    assert conv_shapes, "no convolutions found in HLO text"
    assert any(int(h) < int(w) for _, h, w, _ in conv_shapes), \
        f"no H-sharded conv found: {sorted(set(conv_shapes))[:8]}"


@pytest.mark.slow
def test_spatial_census_realistic_448(tmp_path):
    """The audit at the reference operating point (448², batch 16, resnet34,
    spatial=2) — VERDICT r4 weak #3's exact ask. Compile-only; asserts the
    census policy: per-model grad psums present, halos present, and no
    activation-sized all-gather (the 448² stem activation is ~100 MiB bf16;
    the policy limit is 16 MiB)."""
    mesh = create_mesh(4, spatial=2)
    text = lower_train_step_hlo("swap", mesh, image_size=448, batch_size=16,
                                encoder_name="resnet34")
    c = collective_census(text)
    assert census_violations(c, spatial=True) == [], census_summary(c)
    assert c["all-reduce"].count > 0
    assert c["collective-permute"].count > 0
    conv_shapes = re.findall(
        r"= \w+\[(\d+),(\d+),(\d+),(\d+)\][^ ]* convolution\(", text)
    assert any(int(h) < int(w) for _, h, w, _ in conv_shapes)


def test_bench_multichip_tool_compiles():
    """The scaling harness must at least parse + resolve its imports the day
    hardware appears (full CPU-mesh smoke is exercised manually — the tool
    doc's --validate line; running it here would double suite compile time).
    """
    import importlib.util
    from pathlib import Path

    path = Path(__file__).resolve().parents[1] / "tools" / "bench_multichip.py"
    spec = importlib.util.spec_from_file_location("bench_multichip", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert "denoiser64" in mod.WORKLOADS and "swap448_spatial" in mod.WORKLOADS


def test_census_of_denoiser_data_parallel():
    """The denoiser workload's DP program is clean too (32² for speed)."""
    mesh = create_mesh(8, spatial=1)
    text = lower_train_step_hlo("denoiser", mesh, image_size=32, batch_size=8,
                                encoder_name="resnet18")
    c = collective_census(text)
    assert census_violations(c, spatial=False) == [], census_summary(c)
    assert c["all-reduce"].count > 0
    assert c["collective-permute"].count == 0
