#!/bin/bash
# Full TPU measurement sweep, run SERIALLY (the axon tunnel serializes —
# two concurrent device processes deadlock; CLAUDE.md "Environment rules").
#
# Usage:  scripts/bench_all.sh [LOGFILE]
# Runs every measurement tool with generous timeouts (a `timeout` kill
# mid-device-program can wedge the tunnel — see BASELINE.md "tunnel outage
# log" — so budgets are deliberately loose) and appends one section per
# tool to the log. Each tool prints JSON lines; grep '^{' LOGFILE to
# collect them.

set -u
cd "$(dirname "$0")/.."
LOG=${1:-bench_all.log}

run() {
  name=$1; budget=$2; shift 2
  echo "=== $(date -u +%FT%TZ) START $name" >> "$LOG"
  timeout "$budget" "$@" >> "$LOG" 2>&1
  echo "=== $(date -u +%FT%TZ) END $name rc=$?" >> "$LOG"
}

run headline        1800 python bench.py
run ladder          2400 python tools/bench_suite.py
run e2e_denoiser64  1800 python tools/bench_e2e.py denoiser64
run e2e_swap448     2400 python tools/bench_e2e.py swap448
# steps_per_call supersteps + their k=1 controls (VERDICT r4 #1: the
# dispatch-amortization lever, measured). Panels off on all six so the
# early 10 s image cadence can't land inside a measured window (see the
# row comments in tools/bench_e2e.py).
run e2e_supersteps  4800 python tools/bench_e2e.py denoiser64_devcache_noimg \
    denoiser64_devcache_k16 swap448_devcache_noimg swap448_devcache_k8 \
    swap448_i420_noimg swap448_i420_k8
run step_anatomy    2400 python tools/step_anatomy.py
run step_profile    2400 python tools/step_profile.py 448 16 swap 3
run video_256       1800 python tools/bench_video.py
run serving         3000 python tools/bench_serving.py
run tpu_golden      1800 python tools/tpu_golden.py compare
echo "=== $(date -u +%FT%TZ) SWEEP COMPLETE" >> "$LOG"
