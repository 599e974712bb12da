"""bench.py capture hardening: retry/backoff + diagnostic JSON (VERDICT r2 #2).

The round-2 external capture was erased by a transient axon-tunnel outage;
bench.py now runs the measurement in a timeout-bounded subprocess with
bounded retries. These tests drive that wrapper with substitute child
commands (D3F_BENCH_CMD hook) — no TPU needed.
"""

import json
import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _run_bench(cmd: str, *, attempts: int = 2, timeout_s: float = 5.0):
    env = dict(os.environ,
               D3F_BENCH_CMD=cmd,
               D3F_BENCH_ATTEMPTS=str(attempts),
               D3F_BENCH_BACKOFF_S="0.05",
               D3F_BENCH_TIMEOUT_S=str(timeout_s))
    return subprocess.run([sys.executable, BENCH], capture_output=True,
                          text=True, env=env, timeout=120)


def _script(tmp_path, name: str, body: str) -> str:
    path = tmp_path / name
    path.write_text(textwrap.dedent(body))
    return f"{sys.executable} {path}"


def test_success_passes_child_json_through(tmp_path):
    cmd = _script(tmp_path, "ok.py", """
        print('{"metric": "m", "value": 1.0, "unit": "u", "vs_baseline": 2}')
    """)
    proc = _run_bench(cmd)
    assert proc.returncode == 0
    lines = proc.stdout.strip().splitlines()
    assert len(lines) == 1  # exactly ONE JSON line on stdout
    assert json.loads(lines[0])["metric"] == "m"


def test_unavailable_retries_then_emits_diagnostic(tmp_path):
    marker = tmp_path / "calls"
    cmd = _script(tmp_path, "down.py", f"""
        import sys
        with open({str(marker)!r}, "a") as f:
            f.write("x")
        sys.stderr.write("Unable to initialize backend 'axon': UNAVAILABLE")
        sys.exit(1)
    """)
    proc = _run_bench(cmd, attempts=3)
    assert proc.returncode == 1
    diag = json.loads(proc.stdout.strip().splitlines()[-1])
    assert diag["error"] == "tpu_unavailable"
    assert len(diag["attempts"]) == 3
    assert marker.read_text() == "xxx"  # really re-ran the child each time
    assert "UNAVAILABLE" in diag["attempts"][0]["stderr_tail"]


def test_code_error_fails_fast_without_retry(tmp_path):
    cmd = _script(tmp_path, "bug.py", """
        raise ValueError("boom: a genuine code bug")
    """)
    proc = _run_bench(cmd, attempts=3)
    assert proc.returncode == 1
    diag = json.loads(proc.stdout.strip().splitlines()[-1])
    assert diag["error"] == "code_error"
    assert len(diag["attempts"]) == 1  # no pointless backoff on real bugs


def test_hung_attempt_times_out(tmp_path):
    cmd = _script(tmp_path, "hang.py", """
        import time
        time.sleep(60)
    """)
    proc = _run_bench(cmd, attempts=1, timeout_s=1.0)
    assert proc.returncode == 1
    diag = json.loads(proc.stdout.strip().splitlines()[-1])
    assert diag["attempts"][0]["reason"] == "timeout"


def test_all_tools_compile():
    """Every tools/ script must at least byte-compile — they are run rarely
    (TPU-gated) so syntax/regression rot would otherwise surface only during
    a measurement session with the chip reserved."""
    import py_compile
    from pathlib import Path

    tools = sorted((Path(__file__).parents[1] / "tools").glob("*.py"))
    assert len(tools) >= 10, tools
    for path in tools:
        py_compile.compile(str(path), doraise=True)
