"""Abandoned-transfer-thread cleanup (`utils/stragglers.py`).

Round-3 field failure: after `tools/bench_e2e.py` printed its last row the
process aborted at interpreter teardown ("FATAL: exception not rethrown") —
a metric-worker daemon thread abandoned by `LoopContext.abort()` was still
inside a PJRT device fetch when CPython finalization pthread_exit'd it.
These tests pin the registry behavior and the abort()/device_prefetch
adoption hooks.
"""

import threading
import time

import pytest

from denoising_diffusion_deep_fake_tpu.utils import stragglers


def test_drain_joins_finishing_thread():
    release = threading.Event()
    t = threading.Thread(target=release.wait, daemon=True)
    t.start()
    stragglers.adopt(t)
    release.set()
    assert stragglers.drain(budget_s=5.0) is True
    assert not t.is_alive()


def test_drain_gives_up_on_stuck_thread(capsys):
    release = threading.Event()
    t = threading.Thread(target=release.wait, daemon=True, name="stuck-xfer")
    t.start()
    stragglers.adopt(t)
    assert stragglers.drain(budget_s=0.05) is False
    assert "stuck-xfer" in capsys.readouterr().err
    release.set()  # let it exit cleanly for real
    t.join(timeout=5.0)


def test_drain_budget_is_shared_across_threads():
    release = threading.Event()
    threads = [threading.Thread(target=release.wait, daemon=True)
               for _ in range(3)]
    for t in threads:
        t.start()
        stragglers.adopt(t)
    t0 = time.monotonic()
    assert stragglers.drain(budget_s=0.1) is False
    # One shared deadline, not budget * n_threads.
    assert time.monotonic() - t0 < 2.0
    release.set()
    for t in threads:
        t.join(timeout=5.0)


def test_abort_adopts_stuck_metric_worker(tmp_path, monkeypatch):
    """abort()'s 10 s join can time out mid-fetch; the thread must be handed
    to the straggler registry instead of being silently abandoned."""
    from denoising_diffusion_deep_fake_tpu.config import (
        DenoiserConfig, config_from_dict)
    from denoising_diffusion_deep_fake_tpu.training.loop import LoopContext

    cfg = config_from_dict(DenoiserConfig, dict(
        input_image_list_path="x", log_dir=str(tmp_path / "runs"),
        checkpoint_dir=str(tmp_path / "ckpt")), validate=False)
    ctx = LoopContext(cfg, {"k": 1}, workload="denoiser")
    # Swap in a worker that ignores the stop event (simulates a thread
    # blocked in a device fetch) and make abort()'s join return immediately.
    release = threading.Event()
    fake = threading.Thread(target=release.wait, daemon=True)
    fake.start()
    real_worker = ctx._metric_thread
    ctx._metric_thread = fake
    adopted = []
    monkeypatch.setattr(stragglers, "adopt", adopted.append)
    orig_join = threading.Thread.join
    monkeypatch.setattr(threading.Thread, "join",
                        lambda self, timeout=None: orig_join(self, 0.01))
    try:
        ctx.abort()
    finally:
        monkeypatch.undo()
    assert adopted == [fake]
    release.set()
    fake.join(timeout=5.0)
    # Tear down the real worker cleanly.
    ctx._metric_thread = real_worker
    ctx.close()


def test_device_prefetch_adopts_stuck_upload_thread(monkeypatch):
    """An abandoned device_prefetch whose worker outlives the bounded join
    must register the thread with the straggler registry."""
    from denoising_diffusion_deep_fake_tpu.parallel import mesh as mesh_mod

    adopted = []
    monkeypatch.setattr(stragglers, "adopt", adopted.append)

    release = threading.Event()

    def slow_batches():
        yield {"x": None}
        release.wait()  # simulates a device_put stuck on the link
        yield {"x": None}

    m = mesh_mod.create_mesh(data_parallel=1)
    gen = mesh_mod.device_prefetch(iter(slow_batches()), m, depth=1)
    next(gen)
    # Make the finally-block join return before the worker exits.
    orig_join = threading.Thread.join
    monkeypatch.setattr(threading.Thread, "join",
                        lambda self, timeout=None: orig_join(self, 0.01))
    gen.close()
    monkeypatch.undo()
    assert len(adopted) == 1
    release.set()
    adopted[0].join(timeout=5.0)
