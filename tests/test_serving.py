"""Serving subsystem: engine micro-batching + HTTP server round-trips."""

import http.client
import json
import threading

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from denoising_diffusion_deep_fake_tpu.config import (
    DeepFakeConfig,
    config_from_dict,
)
from denoising_diffusion_deep_fake_tpu.serving import SwapEngine
from denoising_diffusion_deep_fake_tpu.serving.server import SwapServer
from denoising_diffusion_deep_fake_tpu.training.runners import fit_deep_fake

from helpers import make_image_dataset

SIZE = 32


@pytest.fixture(scope="module")
def checkpoint(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("serving")
    m_a = make_image_dataset(tmp / "a", n=4, size=SIZE, seed=1)
    m_b = make_image_dataset(tmp / "b", n=4, size=SIZE, seed=2)
    cfg = config_from_dict(DeepFakeConfig, dict(
        mode="denoise", data_path_a=str(m_a), data_path_b=str(m_b),
        noise_exponential_sampling_lambda=3.0, batch_size=2,
        learning_rate=1e-3, max_epochs=1, encoder_name="resnet18",
        compute_dtype="float32", log_dir=str(tmp / "runs"),
        checkpoint_dir=str(tmp / "ckpt")))
    fit_deep_fake(cfg, max_steps=1, verbose=False)
    return cfg.checkpoint_dir


@pytest.fixture(scope="module")
def engine(checkpoint):
    eng = SwapEngine(checkpoint, "a", height=SIZE, width=SIZE, batch_size=4,
                     max_wait_ms=20.0)
    eng.warmup()
    yield eng
    eng.close()


def test_engine_single_frame(engine):
    frame = np.random.default_rng(0).integers(
        0, 256, (SIZE, SIZE, 3), dtype=np.uint8)
    out = engine.swap(frame)
    assert out.shape == (SIZE, SIZE, 3) and out.dtype == np.uint8


def test_engine_stack_and_oversize(engine):
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 256, (6, SIZE, SIZE, 3), dtype=np.uint8)
    out = engine.swap(frames)  # 6 > batch_size=4 -> two device batches
    assert out.shape == frames.shape
    # Determinism: same frame, same result regardless of batch position.
    single = engine.swap(frames[2])
    np.testing.assert_array_equal(single, out[2])


def test_engine_micro_batches_concurrent_callers(engine):
    before = engine.stats()["batches"]
    rng = np.random.default_rng(2)
    frames = [rng.integers(0, 256, (SIZE, SIZE, 3), dtype=np.uint8)
              for _ in range(4)]
    results = [None] * 4

    def call(i):
        results[i] = engine.swap(frames[i])

    threads = [threading.Thread(target=call, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(r is not None and r.shape == (SIZE, SIZE, 3) for r in results)
    stats = engine.stats()
    # 4 concurrent single-frame requests must NOT each get their own device
    # batch (batch_size=4, max_wait 20ms) — expect real micro-batching.
    assert stats["batches"] - before <= 3
    assert stats["errors"] == 0


def test_engine_rejects_bad_input(engine):
    with pytest.raises(ValueError):
        engine.swap(np.zeros((SIZE, SIZE + 1, 3), np.uint8))
    with pytest.raises(ValueError):
        engine.swap(np.zeros((SIZE, SIZE, 3), np.float32))


@pytest.fixture(scope="module")
def server(engine):
    with SwapServer(engine, port=0) as srv:
        yield srv


def _request(port, method, path, body=None, headers=None):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    conn.request(method, path, body=body, headers=headers or {})
    resp = conn.getresponse()
    data = resp.read()
    out_headers = dict(resp.getheaders())
    conn.close()
    return resp.status, data, out_headers


def test_healthz_and_stats(server):
    status, data, _ = _request(server.port, "GET", "/healthz")
    assert status == 200
    info = json.loads(data)
    assert info["status"] == "ok" and info["frame_shape"] == [SIZE, SIZE, 3]
    status, data, _ = _request(server.port, "GET", "/v1/stats")
    assert status == 200 and json.loads(data)["batches"] >= 1


def test_swap_raw_roundtrip(server):
    frames = np.random.default_rng(3).integers(
        0, 256, (2, SIZE, SIZE, 3), dtype=np.uint8)
    status, data, headers = _request(
        server.port, "POST", "/v1/swap_raw", body=frames.tobytes(),
        headers={"X-Shape": f"2,{SIZE},{SIZE},3"})
    assert status == 200, data
    out = np.frombuffer(data, np.uint8).reshape(
        tuple(int(s) for s in headers["X-Shape"].split(",")))
    assert out.shape == frames.shape


def test_swap_encoded_jpeg(server):
    # Oversized frame: server must center-crop/resize to the model shape.
    frame = np.random.default_rng(4).integers(
        0, 256, (SIZE * 2, SIZE * 3, 3), dtype=np.uint8)
    ok, buf = cv2.imencode(".png", frame)
    assert ok
    status, data, headers = _request(server.port, "POST", "/v1/swap",
                                     body=buf.tobytes())
    assert status == 200, data
    assert headers["Content-Type"] == "image/jpeg"
    img = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
    assert img.shape == (SIZE, SIZE, 3)


def test_swap_raw_rejects_bad_shape(server):
    status, data, _ = _request(
        server.port, "POST", "/v1/swap_raw", body=b"123",
        headers={"X-Shape": f"1,{SIZE},{SIZE},3"})
    assert status == 400 and b"bytes" in data


def test_swap_after_close_raises(checkpoint):
    eng = SwapEngine(checkpoint, "a", height=SIZE, width=SIZE, batch_size=2)
    eng.close()
    with pytest.raises(RuntimeError, match="closed"):
        eng.swap(np.zeros((SIZE, SIZE, 3), np.uint8))


def test_oversize_stack_counts_one_request(engine):
    before = engine.stats()["requests"]
    frames = np.random.default_rng(5).integers(
        0, 256, (9, SIZE, SIZE, 3), dtype=np.uint8)  # 3 slices at batch 4
    out = engine.swap(frames)
    assert out.shape == frames.shape
    assert engine.stats()["requests"] == before + 1


def test_use_ema_on_denoise_checkpoint_is_clear_error(checkpoint):
    from denoising_diffusion_deep_fake_tpu.inference import load_swap_model

    with pytest.raises(ValueError, match="no EMA shadows"):
        load_swap_model(checkpoint, "a", use_ema=True, image_size=SIZE)


def test_stats_reports_latency_percentiles(engine):
    engine.swap(np.zeros((SIZE, SIZE, 3), np.uint8))
    stats = engine.stats()
    assert stats["p50_device_batch_ms"] > 0
    assert stats["p99_device_batch_ms"] >= stats["p50_device_batch_ms"]


def test_serve_both_identities(checkpoint):
    """One server, two engines; ?identity= routes; bad identity -> 400."""
    engines = {name: SwapEngine(checkpoint, name, height=SIZE, width=SIZE,
                                batch_size=2) for name in ("a", "b")}
    with SwapServer(engines, port=0) as srv:
        status, data, _ = _request(srv.port, "GET", "/healthz")
        assert status == 200 and json.loads(data)["identities"] == ["a", "b"]
        frame = np.random.default_rng(6).integers(
            0, 256, (1, SIZE, SIZE, 3), dtype=np.uint8)
        outs = {}
        for ident in ("a", "b"):
            status, data, _ = _request(
                srv.port, "POST", f"/v1/swap_raw?identity={ident}",
                body=frame.tobytes(), headers={"X-Shape": f"1,{SIZE},{SIZE},3"})
            assert status == 200, data
            outs[ident] = np.frombuffer(data, np.uint8)
        # Different models + different de/normalization stats -> different fakes.
        assert not np.array_equal(outs["a"], outs["b"])
        status, data, _ = _request(
            srv.port, "POST", "/v1/swap_raw?identity=c",
            body=frame.tobytes(), headers={"X-Shape": f"1,{SIZE},{SIZE},3"})
        assert status == 400 and b"not served" in data


# ----------------------------------------------------------- I420 wire format


@pytest.fixture(scope="module")
def engine_i420(checkpoint):
    eng = SwapEngine(checkpoint, "a", height=SIZE, width=SIZE, batch_size=4,
                     max_wait_ms=20.0, transfer="i420")
    eng.warmup()
    yield eng
    eng.close()


def test_i420_engine_swap_matches_rgb_engine_closely(engine, engine_i420):
    """Same checkpoint, rgb vs i420 device wire: outputs differ only by
    chroma subsampling (bounded), shapes/dtypes identical."""
    yy, xx = np.mgrid[0:SIZE, 0:SIZE] / SIZE
    smooth = np.clip(255 * (0.5 + 0.4 * np.sin(
        2 * np.pi * (0.25 * np.stack([yy, xx, yy * xx], -1)))), 0,
        255).astype(np.uint8)
    out_rgb = engine.swap(smooth)
    out_i420 = engine_i420.swap(smooth)
    assert out_i420.shape == out_rgb.shape == (SIZE, SIZE, 3)
    assert out_i420.dtype == np.uint8
    # Undertrained net amplifies input deltas; just require the outputs to
    # be in the same neighborhood and not garbage.
    err = np.abs(out_i420.astype(np.int32) - out_rgb.astype(np.int32))
    assert err.mean() < 48.0


def test_i420_engine_wire_shapes(engine_i420):
    assert engine_i420.wire_frame_shape == (SIZE * 3 // 2, SIZE)
    packed = np.zeros((2, SIZE * 3 // 2, SIZE), np.uint8)
    out = engine_i420.swap_wire(packed)
    assert out.shape == packed.shape and out.dtype == np.uint8
    with pytest.raises(ValueError, match="wire frames"):
        engine_i420.swap_wire(np.zeros((2, SIZE, SIZE, 3), np.uint8))


def test_engine_rejects_odd_i420_geometry(checkpoint):
    with pytest.raises(ValueError, match="height % 4"):
        SwapEngine(checkpoint, "a", height=30, width=SIZE, transfer="i420")


def test_healthz_formats_follow_engine_geometry():
    """healthz only advertises i420 when the frame geometry can carry it
    (defensive: every U-Net-served size is %32 so also i420-safe, but the
    endpoint must not promise what a request would 400 on)."""
    import types

    from denoising_diffusion_deep_fake_tpu.serving.server import (
        _supported_formats)

    ok = types.SimpleNamespace(height=SIZE, width=SIZE)
    odd = types.SimpleNamespace(height=30, width=SIZE)
    assert _supported_formats(ok) == ["rgb", "i420"]
    assert _supported_formats(odd) == ["rgb"]


@pytest.fixture(scope="module")
def server_i420(engine_i420):
    with SwapServer(engine_i420, port=0) as srv:
        yield srv


def test_swap_raw_i420_passthrough(server_i420):
    """i420 client + i420 engine: zero conversions, half the bytes each way."""
    frames = np.random.default_rng(7).integers(
        0, 256, (2, SIZE, SIZE, 3), dtype=np.uint8)
    packed = np.stack([cv2.cvtColor(f, cv2.COLOR_RGB2YUV_I420)
                       for f in frames])
    assert packed.nbytes == frames.nbytes // 2
    status, data, headers = _request(
        server_i420.port, "POST", "/v1/swap_raw", body=packed.tobytes(),
        headers={"X-Shape": f"2,{SIZE},{SIZE}", "X-Format": "i420"})
    assert status == 200, data
    assert headers["X-Format"] == "i420"
    assert headers["X-Shape"] == f"2,{SIZE},{SIZE}"
    assert len(data) == packed.nbytes  # reply is packed too
    out = np.frombuffer(data, np.uint8).reshape(packed.shape)
    # Decodable as I420 frames.
    rgb = cv2.cvtColor(out[0], cv2.COLOR_YUV2RGB_I420)
    assert rgb.shape == (SIZE, SIZE, 3)


def test_swap_raw_i420_client_on_rgb_engine(server):
    """Mixed: i420 HTTP wire, rgb device wire — server converts."""
    frame = np.random.default_rng(8).integers(
        0, 256, (SIZE, SIZE, 3), dtype=np.uint8)
    packed = cv2.cvtColor(frame, cv2.COLOR_RGB2YUV_I420)
    status, data, headers = _request(
        server.port, "POST", "/v1/swap_raw", body=packed.tobytes(),
        headers={"X-Shape": f"{SIZE},{SIZE}", "X-Format": "i420"})
    assert status == 200, data
    assert headers["X-Shape"] == f"{SIZE},{SIZE}"
    out = np.frombuffer(data, np.uint8).reshape(SIZE * 3 // 2, SIZE)
    assert cv2.cvtColor(out, cv2.COLOR_YUV2RGB_I420).shape == (SIZE, SIZE, 3)


def test_swap_raw_rgb_client_on_i420_engine(server_i420):
    """Mixed the other way: rgb HTTP wire, i420 device wire."""
    frames = np.random.default_rng(9).integers(
        0, 256, (1, SIZE, SIZE, 3), dtype=np.uint8)
    status, data, headers = _request(
        server_i420.port, "POST", "/v1/swap_raw", body=frames.tobytes(),
        headers={"X-Shape": f"1,{SIZE},{SIZE},3"})
    assert status == 200, data
    assert np.frombuffer(data, np.uint8).reshape(
        tuple(int(s) for s in headers["X-Shape"].split(","))).shape == \
        frames.shape


def test_swap_raw_i420_rejects_bad_geometry(server_i420):
    status, data, _ = _request(
        server_i420.port, "POST", "/v1/swap_raw", body=b"x",
        headers={"X-Shape": "30,31", "X-Format": "i420"})
    assert status == 400 and b"height % 4" in data


def test_healthz_reports_transfer(server_i420):
    status, data, _ = _request(server_i420.port, "GET", "/healthz")
    assert status == 200
    info = json.loads(data)
    assert info["transfer"] == "i420" and "i420" in info["formats"]


def test_engine_multi_device_replicas_match_single(checkpoint, engine):
    """devices=2: two pinned replicas off one queue; the single-pass swap is
    deterministic, so outputs must equal the devices=1 engine's."""
    import jax

    assert jax.local_device_count() >= 2  # conftest: 8 virtual CPU devices
    multi = SwapEngine(checkpoint, "a", height=SIZE, width=SIZE,
                       batch_size=4, max_wait_ms=2.0, devices=2)
    try:
        multi.warmup()
        rng = np.random.default_rng(5)
        frames = [rng.integers(0, 256, (SIZE, SIZE, 3), dtype=np.uint8)
                  for _ in range(8)]
        results = [None] * len(frames)

        def call(i):
            results[i] = multi.swap(frames[i])

        threads = [threading.Thread(target=call, args=(i,))
                   for i in range(len(frames))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        stats = multi.stats()
        # +1: warmup() rode the same queue.
        assert stats["devices"] == 2 and stats["frames"] == len(frames) + 1
        for f, r in zip(frames, results):
            # <= 1 LSB: XLA may fuse the two engines' programs differently
            # (micro-batch packing differs), and a float landing exactly on
            # the uint8 trunc threshold can flip by one.
            diff = np.abs(r.astype(np.int16)
                          - engine.swap(f).astype(np.int16))
            assert diff.max() <= 1, diff.max()
    finally:
        multi.close()


def test_engine_rejects_too_many_devices(checkpoint):
    import jax

    with pytest.raises(ValueError, match="devices="):
        SwapEngine(checkpoint, "a", height=SIZE, width=SIZE,
                   devices=jax.local_device_count() + 1)


# ------------------------------------------------------------- backpressure


class _GatedPipeline:
    """Wraps a compiled pipeline so the dispatcher blocks until released —
    makes queue buildup deterministic for overload tests."""

    def __init__(self, inner):
        self.inner = inner
        self.entered = threading.Event()
        self.gate = threading.Event()

    def __call__(self, dev_arr, key, batch_idx):
        self.entered.set()
        assert self.gate.wait(timeout=60)
        return self.inner(dev_arr, key, batch_idx)


def _wait_for(predicate, timeout=30.0):
    import time

    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        if predicate():
            return True
        time.sleep(0.01)
    return False


def test_engine_sheds_on_overload(checkpoint):
    """Queue past the watermark: the call is rejected with a drain estimate
    BEFORE any slice is enqueued; admitted callers drain normally after."""
    from denoising_diffusion_deep_fake_tpu.serving import EngineOverloadedError

    eng = SwapEngine(checkpoint, "a", height=SIZE, width=SIZE, batch_size=2,
                     max_wait_ms=1.0, max_queue_frames=4)
    try:
        eng.warmup()
        gated = _GatedPipeline(eng._dispatchers[0].pipeline)
        eng._dispatchers[0].pipeline = gated

        frames = np.zeros((2, SIZE, SIZE, 3), np.uint8)
        results = []
        threads = [threading.Thread(
            target=lambda: results.append(eng.swap(frames)))
            for _ in range(3)]
        threads[0].start()
        assert gated.entered.wait(timeout=30)   # batch 1 on-device, blocked
        for t in threads[1:]:
            t.start()                            # 4 frames queued
        assert _wait_for(lambda: eng.stats()["queue_depth"] == 4)

        with pytest.raises(EngineOverloadedError) as exc:
            eng.swap(frames)                     # 4 + 2 > watermark 4
        assert exc.value.retry_after_s > 0

        gated.gate.set()
        for t in threads:
            t.join(timeout=60)
        assert len(results) == 3                 # admitted calls all served
        stats = eng.stats()
        assert stats["shed_requests"] == 1
        assert stats["queue_high_water"] == 4
        assert stats["queue_depth"] == 0         # fully drained
        assert stats["max_queue_frames"] == 4
        assert stats["errors"] == 0              # sheds are not errors
    finally:
        gated.gate.set()
        eng.close()


def test_engine_rejects_watermark_below_batch(checkpoint):
    with pytest.raises(ValueError, match="max_queue_frames"):
        SwapEngine(checkpoint, "a", height=SIZE, width=SIZE, batch_size=4,
                   max_queue_frames=2)


def test_serve_cli_check_mode(checkpoint):
    """`d3f-tpu serve --check` validates a deployment end to end (restore +
    compile + device round-trip) and exits 0 without listening."""
    from click.testing import CliRunner

    from denoising_diffusion_deep_fake_tpu.main import cli

    result = CliRunner().invoke(cli, [
        "serve", str(checkpoint), "a", "--width", str(SIZE),
        "--height", str(SIZE), "--batch_size", "2", "--check"])
    assert result.exit_code == 0, result.output
    stats_line = [line for line in result.output.splitlines()
                  if line.startswith("{")][-1]
    stats = json.loads(stats_line)
    assert stats["serve_check"] == "ok" and stats["engine"] == "a"
    assert stats["frames"] >= 1          # the warmup round-trip really ran
    assert stats["frame_shape"] == [SIZE, SIZE, 3]


def test_engine_check_admission_contract(checkpoint):
    """The pre-payload probe's API contract (any front-end, not just HTTP):
    passes below the watermark WITHOUT reserving capacity, sheds above it
    with a positive drain estimate, and counts early sheds separately."""
    from denoising_diffusion_deep_fake_tpu.serving import EngineOverloadedError

    eng = SwapEngine(checkpoint, "a", height=SIZE, width=SIZE, batch_size=2,
                     max_wait_ms=1.0, max_queue_frames=2)
    try:
        eng.warmup()
        # Empty queue: repeated probes pass and reserve NOTHING — a real
        # call is still admitted afterwards.
        for _ in range(10):
            eng.check_admission(2)
        assert eng.stats()["queue_depth"] == 0
        out = eng.swap(np.zeros((2, SIZE, SIZE, 3), np.uint8))
        assert out.shape == (2, SIZE, SIZE, 3)

        # Force the queue to the watermark behind a gate; the probe sheds.
        gated = _GatedPipeline(eng._dispatchers[0].pipeline)
        eng._dispatchers[0].pipeline = gated
        frames = np.zeros((2, SIZE, SIZE, 3), np.uint8)
        results = []
        threads = [threading.Thread(
            target=lambda: results.append(eng.swap(frames)))
            for _ in range(2)]
        threads[0].start()
        assert gated.entered.wait(timeout=30)
        threads[1].start()
        assert _wait_for(lambda: eng.stats()["queue_depth"] == 2)

        with pytest.raises(EngineOverloadedError) as exc:
            eng.check_admission(1)
        assert exc.value.retry_after_s > 0
        stats = eng.stats()
        assert stats["early_shed_requests"] == 1
        assert stats["shed_requests"] == 1       # early sheds count as sheds

        gated.gate.set()
        for t in threads:
            t.join(timeout=60)
        assert len(results) == 2                 # probes cost admitted calls
        assert eng.stats()["queue_depth"] == 0   # nothing -- fully drained
    finally:
        gated.gate.set()
        eng.close()


def _read_http_head(sock) -> str:
    """Read from ``sock`` until the end of one header block; return it."""
    data = b""
    while b"\r\n\r\n" not in data:
        chunk = sock.recv(65536)
        if not chunk:
            break
        data += chunk
    return data.split(b"\r\n\r\n", 1)[0].decode()


@pytest.fixture()
def overloaded(checkpoint):
    """A server whose engine queue sits AT the watermark behind a gate.

    Yields (server, engine, gate, finish) where ``finish()`` opens the gate
    and joins the two admitted in-flight requests, asserting both got 200s.
    """
    eng = SwapEngine(checkpoint, "a", height=SIZE, width=SIZE, batch_size=2,
                     max_wait_ms=1.0, max_queue_frames=2)
    gated = None
    try:
        eng.warmup()
        gated = _GatedPipeline(eng._dispatchers[0].pipeline)
        eng._dispatchers[0].pipeline = gated
        with SwapServer(eng, port=0) as srv:
            frames = np.zeros((2, SIZE, SIZE, 3), np.uint8)
            hdrs = {"X-Shape": f"2,{SIZE},{SIZE},3"}
            replies = []
            threads = [threading.Thread(target=lambda: replies.append(
                _request(srv.port, "POST", "/v1/swap_raw",
                         body=frames.tobytes(), headers=hdrs)))
                for _ in range(2)]
            threads[0].start()
            assert gated.entered.wait(timeout=30)  # batch 1 in flight
            threads[1].start()                      # 2 frames queued (full)
            assert _wait_for(lambda: eng.stats()["queue_depth"] == 2)

            def finish():
                gated.gate.set()
                for t in threads:
                    t.join(timeout=60)
                assert [r[0] for r in replies] == [200, 200]

            yield srv, eng, gated, finish
    finally:
        if gated is not None:
            gated.gate.set()
        eng.close()


def test_server_early_sheds_without_reading_body(overloaded):
    """Byte-bound-wire overload: the 503 must arrive from the HEADERS alone.

    The raw socket announces a body (Content-Length set) but never sends a
    byte of it — a reply arriving anyway proves the server shed without
    reading the payload (pre-round-4 behavior blocked in ``rfile.read``
    until the body arrived, so overload always cost the full upload)."""
    import socket

    srv, eng, _, finish = overloaded
    nbytes = 2 * SIZE * SIZE * 3
    with socket.create_connection(("127.0.0.1", srv.port), timeout=30) as s:
        s.sendall((f"POST /v1/swap_raw HTTP/1.1\r\nHost: t\r\n"
                   f"X-Shape: 2,{SIZE},{SIZE},3\r\n"
                   f"Content-Length: {nbytes}\r\n\r\n").encode())
        head = _read_http_head(s)
    assert head.startswith("HTTP/1.1 503"), head
    assert "Connection: close" in head          # unread body -> no keep-alive
    assert "Retry-After:" in head
    stats = eng.stats()
    assert stats["early_shed_requests"] == 1    # shed before the read
    assert stats["shed_requests"] == 1
    finish()
    # The probe made no reservation: the engine drains and serves normally.
    assert eng.stats()["queue_depth"] == 0


def test_server_expect_100_continue(overloaded):
    """RFC 7231 §5.1.1 face of early shedding: an ``Expect: 100-continue``
    client pays zero body bytes on overload (final 503 replaces the interim
    100); once the backlog drains the same request gets 100 then 200."""
    import socket

    srv, eng, _, finish = overloaded
    nbytes = 2 * SIZE * SIZE * 3
    req = (f"POST /v1/swap_raw HTTP/1.1\r\nHost: t\r\n"
           f"X-Shape: 2,{SIZE},{SIZE},3\r\n"
           f"Content-Length: {nbytes}\r\nExpect: 100-continue\r\n\r\n")

    with socket.create_connection(("127.0.0.1", srv.port), timeout=30) as s:
        s.sendall(req.encode())
        head = _read_http_head(s)
    assert head.startswith("HTTP/1.1 503"), head  # NOT "100 Continue"
    assert "Retry-After:" in head
    assert eng.stats()["early_shed_requests"] == 1

    finish()  # drain the backlog; the engine is now idle

    with socket.create_connection(("127.0.0.1", srv.port), timeout=30) as s:
        s.sendall(req.encode())
        interim = _read_http_head(s)
        assert interim.startswith("HTTP/1.1 100"), interim
        s.sendall(np.zeros((2, SIZE, SIZE, 3), np.uint8).tobytes())
        head = _read_http_head(s)
    assert head.startswith("HTTP/1.1 200"), head


def test_server_post_read_shed_keeps_connection(overloaded):
    """The authoritative in-``swap_wire`` check (probe passed, queue filled
    while the body streamed in): the body was fully read, so the 503 must
    NOT close the connection — the same keep-alive socket serves a 200
    after the backlog drains."""
    import http.client

    srv, eng, _, finish = overloaded
    eng.check_admission = lambda n: None   # force the post-read path
    frames = np.zeros((2, SIZE, SIZE, 3), np.uint8)
    hdrs = {"X-Shape": f"2,{SIZE},{SIZE},3"}

    conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=60)
    try:
        conn.request("POST", "/v1/swap_raw", body=frames.tobytes(),
                     headers=hdrs)
        resp = conn.getresponse()
        body = resp.read()
        assert resp.status == 503, body
        assert resp.getheader("Retry-After") is not None
        assert (resp.getheader("Connection") or "").lower() != "close"
        stats = eng.stats()
        assert stats["shed_requests"] == 1
        assert stats["early_shed_requests"] == 0   # probe was disabled

        finish()                                    # drain the backlog
        # SAME connection: keep-alive survived the drained 503.
        conn.request("POST", "/v1/swap_raw", body=frames.tobytes(),
                     headers=hdrs)
        resp = conn.getresponse()
        out = resp.read()
        assert resp.status == 200 and len(out) == frames.nbytes
    finally:
        conn.close()


def test_server_sheds_with_503_and_retry_after(checkpoint):
    """HTTP face of admission control: 503 + Retry-After + JSON error body;
    the connection stays usable and the engine recovers."""
    eng = SwapEngine(checkpoint, "a", height=SIZE, width=SIZE, batch_size=2,
                     max_wait_ms=1.0, max_queue_frames=2)
    gated = None
    try:
        eng.warmup()
        gated = _GatedPipeline(eng._dispatchers[0].pipeline)
        eng._dispatchers[0].pipeline = gated
        with SwapServer(eng, port=0) as srv:
            frames = np.zeros((2, SIZE, SIZE, 3), np.uint8)
            hdrs = {"X-Shape": f"2,{SIZE},{SIZE},3"}

            replies = []
            threads = [threading.Thread(target=lambda: replies.append(
                _request(srv.port, "POST", "/v1/swap_raw",
                         body=frames.tobytes(), headers=hdrs)))
                for _ in range(2)]
            threads[0].start()
            assert gated.entered.wait(timeout=30)  # batch 1 in flight
            threads[1].start()                      # 2 frames queued (full)
            assert _wait_for(lambda: eng.stats()["queue_depth"] == 2)

            status, data, headers = _request(
                srv.port, "POST", "/v1/swap_raw", body=frames.tobytes(),
                headers=hdrs)
            assert status == 503, data
            assert int(headers["Retry-After"]) >= 1
            assert b"overloaded" in data

            gated.gate.set()
            for t in threads:
                t.join(timeout=60)
            assert [r[0] for r in replies] == [200, 200]
            status, data, _ = _request(srv.port, "GET", "/v1/stats")
            assert json.loads(data)["shed_requests"] == 1
    finally:
        if gated is not None:
            gated.gate.set()
        eng.close()


# ---------------------------------------------------- deadlines / cancellation


def test_engine_drops_expired_before_dispatch(checkpoint):
    """VERDICT r4 weak #4: a queued request whose deadline passed must NOT
    burn a device batch — the dispatcher skips it at gather time, the waiter
    gets RequestExpiredError at the deadline (not at engine close)."""
    from denoising_diffusion_deep_fake_tpu.serving import RequestExpiredError

    eng = SwapEngine(checkpoint, "a", height=SIZE, width=SIZE, batch_size=2,
                     max_wait_ms=1.0)
    gated = None
    try:
        eng.warmup()
        batches_before = eng.stats()["batches"]
        gated = _GatedPipeline(eng._dispatchers[0].pipeline)
        eng._dispatchers[0].pipeline = gated
        frames = np.zeros((2, SIZE, SIZE, 3), np.uint8)

        blocker_done = []
        blocker = threading.Thread(
            target=lambda: blocker_done.append(eng.swap(frames)))
        blocker.start()
        assert gated.entered.wait(timeout=30)   # batch 1 on-device, blocked

        errors = []
        impatient = threading.Thread(
            target=lambda: errors.append(_expect_raises(
                lambda: eng.swap(frames, deadline_ms=200.0))))
        impatient.start()
        assert _wait_for(lambda: eng.stats()["queue_depth"] == 2)
        impatient.join(timeout=30)               # raises AT the deadline,
        assert not impatient.is_alive()          # while the gate still holds
        assert isinstance(errors[0], RequestExpiredError)
        assert eng.stats()["expired_requests"] == 1

        gated.gate.set()                         # batch 1 completes; the
        blocker.join(timeout=60)                 # dispatcher then gathers the
        assert len(blocker_done) == 1            # expired request and skips it
        assert _wait_for(
            lambda: eng.stats()["expired_dropped_frames"] == 2)
        stats = eng.stats()
        assert stats["batches"] == batches_before + 1  # NO batch for expired
        assert stats["queue_depth"] == 0
        assert stats["errors"] == 0              # expiry is not an error

        # Engine still healthy: a fresh call round-trips.
        out = eng.swap(frames)
        assert out.shape == frames.shape
    finally:
        if gated is not None:
            gated.gate.set()
        eng.close()


def _expect_raises(fn):
    """Run fn; return the exception it raised (None if it returned)."""
    try:
        fn()
        return None
    except BaseException as e:
        return e


def test_engine_wait_unblocks_at_deadline_even_when_claimed(checkpoint):
    """A request already packed into an in-flight device batch cannot be
    unpacked — but its caller still stops waiting at the deadline instead of
    riding out the batch (pre-round-5 _wait blocked until engine close)."""
    from denoising_diffusion_deep_fake_tpu.serving import RequestExpiredError

    eng = SwapEngine(checkpoint, "a", height=SIZE, width=SIZE, batch_size=2,
                     max_wait_ms=1.0)
    gated = None
    try:
        eng.warmup()
        gated = _GatedPipeline(eng._dispatchers[0].pipeline)
        eng._dispatchers[0].pipeline = gated
        frames = np.zeros((2, SIZE, SIZE, 3), np.uint8)

        errors = []
        caller = threading.Thread(
            target=lambda: errors.append(_expect_raises(
                lambda: eng.swap(frames, deadline_ms=250.0))))
        caller.start()
        assert gated.entered.wait(timeout=30)    # claimed: batch in flight
        caller.join(timeout=30)                  # unblocks at ~250 ms anyway
        assert not caller.is_alive()
        assert isinstance(errors[0], RequestExpiredError)
        stats = eng.stats()
        assert stats["expired_requests"] == 1
        assert stats["expired_dropped_frames"] == 0  # it WAS dispatched

        gated.gate.set()                         # late result is discarded
        assert _wait_for(lambda: eng.stats()["batches"] >= 2)
        out = eng.swap(frames)                   # engine remains healthy
        assert out.shape == frames.shape
    finally:
        if gated is not None:
            gated.gate.set()
        eng.close()


def test_engine_default_deadline_and_per_call_override(checkpoint):
    """Constructor-level request_deadline_ms applies to every call;
    deadline_ms=0 disables it per call."""
    from denoising_diffusion_deep_fake_tpu.serving import RequestExpiredError

    eng = SwapEngine(checkpoint, "a", height=SIZE, width=SIZE, batch_size=2,
                     max_wait_ms=1.0, request_deadline_ms=300.0)
    gated = None
    try:
        eng.warmup()
        assert eng.stats()["request_deadline_ms"] == 300.0
        gated = _GatedPipeline(eng._dispatchers[0].pipeline)
        eng._dispatchers[0].pipeline = gated
        frames = np.zeros((2, SIZE, SIZE, 3), np.uint8)

        results, errors = [], []
        # deadline_ms=0 opts this call OUT of the engine default: it must
        # survive blocking well past 300 ms and complete when the gate opens.
        blocker = threading.Thread(
            target=lambda: results.append(eng.swap(frames, deadline_ms=0)))
        blocker.start()
        assert gated.entered.wait(timeout=30)
        # Default-deadline call: queued behind the gate, expires at ~300 ms.
        impatient = threading.Thread(
            target=lambda: errors.append(_expect_raises(
                lambda: eng.swap(frames))))
        impatient.start()
        impatient.join(timeout=30)
        assert isinstance(errors[0], RequestExpiredError)

        gated.gate.set()
        blocker.join(timeout=60)
        assert len(results) == 1 and results[0].shape == frames.shape
    finally:
        if gated is not None:
            gated.gate.set()
        eng.close()


def test_server_deadline_header_504(checkpoint):
    """HTTP face: an admitted request whose X-Deadline-Ms passes while its
    batch is blocked gets 504 (distinct from the 503 shed); the engine
    counters record the expiry and the server stays serviceable."""
    eng = SwapEngine(checkpoint, "a", height=SIZE, width=SIZE, batch_size=2,
                     max_wait_ms=1.0)
    gated = None
    try:
        eng.warmup()
        gated = _GatedPipeline(eng._dispatchers[0].pipeline)
        eng._dispatchers[0].pipeline = gated
        with SwapServer(eng, port=0) as srv:
            frames = np.zeros((2, SIZE, SIZE, 3), np.uint8)
            hdrs = {"X-Shape": f"2,{SIZE},{SIZE},3"}

            replies = []
            blocker = threading.Thread(target=lambda: replies.append(
                _request(srv.port, "POST", "/v1/swap_raw",
                         body=frames.tobytes(), headers=hdrs)))
            blocker.start()
            assert gated.entered.wait(timeout=30)  # batch 1 in flight

            status, data, _ = _request(
                srv.port, "POST", "/v1/swap_raw", body=frames.tobytes(),
                headers={**hdrs, "X-Deadline-Ms": "250"})
            assert status == 504, data
            assert b"deadline" in data
            assert eng.stats()["expired_requests"] == 1

            gated.gate.set()
            blocker.join(timeout=60)
            assert [r[0] for r in replies] == [200]
            # Expired frames were dropped pre-dispatch once dequeued.
            assert _wait_for(
                lambda: eng.stats()["expired_dropped_frames"] == 2)

            # Malformed deadline header: 400, not a crash.
            status, data, _ = _request(
                srv.port, "POST", "/v1/swap_raw", body=frames.tobytes(),
                headers={**hdrs, "X-Deadline-Ms": "soon"})
            assert status == 400 and b"X-Deadline-Ms" in data

            # Serviceability after the expiry path.
            status, data, _ = _request(
                srv.port, "POST", "/v1/swap_raw", body=frames.tobytes(),
                headers=hdrs)
            assert status == 200 and len(data) == frames.nbytes
    finally:
        if gated is not None:
            gated.gate.set()
        eng.close()
