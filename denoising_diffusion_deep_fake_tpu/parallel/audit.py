"""Sharded-program collective census: audit WHAT the compiler inserted.

The framework's scale-out story is compiler-inserted collectives (jit +
NamedSharding — parallel/mesh.py); the reference has none to compare against
(SURVEY.md §2 "Parallelism strategies — first-class absence report"). That
design's failure mode is silent: a sharding the SPMD partitioner cannot
honor degrades into all-gathering full activations or parameters — the
program still runs, still converges, and quietly burns the ICI bandwidth the
mesh was supposed to save. VERDICT r4 weak #3: nothing audited the compiled
HLO at a realistic shape.

This module lowers a REAL train step over a mesh (abstract operands — no
device memory needed, works on the 8-virtual-CPU test mesh), compiles it,
and parses the post-SPMD-partitioning HLO for collectives:

* ``all-reduce``          — expected: the per-model gradient psums (+ small
                            scalar/metric reductions)
* ``collective-permute``  — expected ONLY under spatial sharding: conv halo
                            exchanges on the H axis
* ``all-gather``          — small ones are fine (index juggling); one the
                            size of an activation/parameter tensor means the
                            partitioner gave up on a sharding — the audit's
                            main tripwire
* ``reduce-scatter`` / ``all-to-all`` — recorded for completeness

``tests/test_collective_census.py`` pins the census at the reference
operating point (448², spatial=2); ``tools/bench_multichip.py`` reports the
per-step collective byte volume next to measured scaling the day real
multi-chip hardware exists.
"""

from __future__ import annotations

import dataclasses
import functools
import re

_DTYPE_BYTES = {
    "pred": 1, "s4": 1, "u4": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2,
    "f16": 2, "bf16": 2, "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8,
    "f64": 8, "c64": 8, "c128": 16, "f8e4m3fn": 1, "f8e5m2": 1,
}

_COLLECTIVES = ("all-reduce", "all-gather", "collective-permute",
                "reduce-scatter", "all-to-all")

# `= <shape expr> <op>(` — shape expr is a single `dtype[dims]{layout}` or a
# tuple `(dtype[dims], ...)`; `-start` catches async forms (the `-done` half
# repeats the shape and is skipped so nothing double-counts).
_LINE_RE = re.compile(
    r"=\s+(?P<shape>\([^)]*\)|\S+)\s+(?P<op>"
    + "|".join(_COLLECTIVES) + r")(?P<start>-start)?\(")

_SHAPE_RE = re.compile(r"([a-z]\w*)\[([\d,]*)\]")


@dataclasses.dataclass
class CollectiveStats:
    """One collective kind's aggregate footprint in a compiled program."""

    count: int = 0
    total_bytes: int = 0
    max_bytes: int = 0
    shapes: list = dataclasses.field(default_factory=list)  # (bytes, text)

    def add(self, nbytes: int, shape_text: str) -> None:
        self.count += 1
        self.total_bytes += nbytes
        self.max_bytes = max(self.max_bytes, nbytes)
        self.shapes.append((nbytes, shape_text))
        self.shapes.sort(reverse=True)
        del self.shapes[8:]  # keep the top offenders only


def _shape_bytes(shape_expr: str) -> int:
    total = 0
    for dtype, dims in _SHAPE_RE.findall(shape_expr):
        if dtype not in _DTYPE_BYTES:
            continue  # token[...] that isn't a tensor shape
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dtype]
    return total


def collective_census(hlo_text: str) -> dict[str, CollectiveStats]:
    """Parse post-optimization HLO text into per-collective aggregates.

    Async pairs (``all-gather-start``/``-done``) count ONCE (the ``-start``
    carries the payload; ``-done`` lines don't match the `= shape op(`
    pattern for the same op name and are ignored).
    """
    census = {op: CollectiveStats() for op in _COLLECTIVES}
    for line in hlo_text.splitlines():
        m = _LINE_RE.search(line)
        if m is None:
            continue
        shape = m.group("shape")
        if m.group("start"):
            # `-start` outputs are (input, output[, contexts]) tuples: count
            # the LARGEST element, not the tuple sum, to avoid double-count.
            elems = [_shape_bytes(f"{t}[{d}]")
                     for t, d in _SHAPE_RE.findall(shape)]
            nbytes = max(elems, default=0)
        else:
            nbytes = _shape_bytes(shape)
        census[m.group("op")].add(nbytes, shape.strip())
    return census


def census_violations(census: dict[str, CollectiveStats], *, spatial: bool,
                      expect_grad_reduce: bool = True,
                      allgather_limit_bytes: int = 16 << 20,
                      alltoall_limit_bytes: int = 16 << 20) -> list[str]:
    """The audit policy. Returns human-readable violations (empty = clean).

    * gradients must be reduced (an SPMD train step with a data axis and no
      all-reduce means the batch sharding silently degraded),
    * halo collective-permutes may appear ONLY in spatial mode,
    * no all-gather / all-to-all near activation/parameter size — the
      "partitioner gave up" signature (default limit 16 MiB; the 448²
      stem activation is ~100 MiB in bf16, the largest single conv kernel
      ~9 MiB fp32).
    """
    out = []
    if expect_grad_reduce and census["all-reduce"].count == 0:
        out.append("no all-reduce in the compiled step: gradients are not "
                   "being reduced over the data axis")
    if not spatial and census["collective-permute"].count:
        out.append(
            f"{census['collective-permute'].count} collective-permute(s) in "
            "a data-only program (halo exchanges should not exist)")
    for op, limit in (("all-gather", allgather_limit_bytes),
                      ("all-to-all", alltoall_limit_bytes)):
        st = census[op]
        if st.max_bytes > limit:
            worst = st.shapes[0]
            out.append(
                f"{op} of {worst[0]:,} bytes (> limit {limit:,}): {worst[1]}"
                " — the partitioner is gathering a full tensor")
    return out


def census_summary(census: dict[str, CollectiveStats]) -> dict:
    """JSON-friendly summary (bench_multichip rows, ARCHITECTURE tables)."""
    return {
        op: {"count": st.count, "total_mib": round(st.total_bytes / 2**20, 3),
             "max_mib": round(st.max_bytes / 2**20, 3)}
        for op, st in census.items() if st.count
    }


# --------------------------------------------------------------- lowering


def lower_train_step_hlo(workload: str, mesh, *, image_size: int,
                         batch_size: int, encoder_name: str = "resnet34",
                         compute_dtype: str = "bfloat16",
                         spatial: bool | None = None) -> str:
    """Compile one REAL train step over ``mesh`` with abstract operands and
    return its post-optimization HLO text.

    Abstract (``jax.ShapeDtypeStruct``) states/batches mean no parameter or
    activation memory is allocated — a 448² two-model swap step compiles on
    the 8-virtual-CPU test mesh in test time, and the text reflects exactly
    what the runtime path (runners.py `_build_steps` -> jit) would execute:
    same trainer code, same shardings (states replicated, batches
    data/spatial-sharded — parallel/mesh.py).
    """
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from denoising_diffusion_deep_fake_tpu.config import (
        BalanceConfig, DeepFakeConfig, DenoiserConfig, config_from_dict)
    from denoising_diffusion_deep_fake_tpu.parallel.mesh import batch_sharding

    if spatial is None:
        spatial = mesh.shape.get("spatial", 1) > 1
    # data_parallel/spatial_parallel knobs must mirror the mesh so the
    # trainers' in-step spatial activation constraints fire exactly as they
    # would in the real fit_* path (they rebuild this same mesh).
    common = dict(batch_size=batch_size, image_size=image_size,
                  learning_rate=1e-3, encoder_name=encoder_name,
                  compute_dtype=compute_dtype,
                  data_parallel=mesh.shape.get("data", 1),
                  spatial_parallel=mesh.shape.get("spatial", 1),
                  noise_exponential_sampling_lambda=8.0)
    if workload == "swap":
        cfg = config_from_dict(DeepFakeConfig, dict(
            mode="swap", data_path_a="x", data_path_b="y",
            ema_update_after_step=0, **common), validate=False)
        from denoising_diffusion_deep_fake_tpu.training.deep_fake import (
            DeepFakeTrainer)
        trainer = DeepFakeTrainer(cfg, steps_per_epoch=100,
                                  image_size=image_size)
        n_batches = 2
    elif workload == "denoiser":
        cfg = config_from_dict(DenoiserConfig, dict(
            input_image_list_path="x", **common), validate=False)
        from denoising_diffusion_deep_fake_tpu.training.denoiser import (
            DenoiserTrainer)
        trainer = DenoiserTrainer(cfg, steps_per_epoch=100,
                                  image_size=image_size)
        n_batches = 1
    elif workload == "balance":
        cfg = config_from_dict(BalanceConfig, dict(
            data_path="x", ratio_of_noise=0.7, **common), validate=False)
        from denoising_diffusion_deep_fake_tpu.training.balance import (
            BalanceTrainer)
        trainer = BalanceTrainer(cfg, steps_per_epoch=100,
                                 image_size=image_size)
        n_batches = 1
    else:
        raise ValueError(f"unknown workload {workload!r}")

    if workload == "swap":
        states_shape = jax.eval_shape(trainer.init_states,
                                      jax.random.PRNGKey(0))
    else:
        states_shape = jax.eval_shape(trainer.init_state,
                                      jax.random.PRNGKey(0))
    replicated = NamedSharding(mesh, P())
    states_abs = jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype,
                                       sharding=replicated), states_shape)
    bshard = batch_sharding(mesh, spatial_dim=1 if spatial else None)
    batch_abs = jax.ShapeDtypeStruct(
        (batch_size, image_size, image_size, 3), np.uint8, sharding=bshard)
    key_shape = jax.eval_shape(lambda: jax.random.PRNGKey(0))
    rng_abs = jax.ShapeDtypeStruct(key_shape.shape, key_shape.dtype,
                                   sharding=replicated)

    step = jax.jit(functools.partial(trainer._train_step, with_images=False))
    lowered = step.lower(states_abs, *([batch_abs] * n_batches), rng_abs)
    return lowered.compile().as_text()
