"""Load-bench the inference server: concurrent clients vs one device batch.

Run with the chip free:  python tools/bench_serving.py [ckpt_dir] [wire ...]

Without a checkpoint argument, trains one throwaway step at 448² to get one.
``wire`` rows: "rgb" (default protocol) and/or "i420" (4:2:0-packed frames on
BOTH hops — client->server HTTP and server->device; half the bytes each way,
the lever for byte-bound links like this dev tunnel). Default: both.

Measures sustained frames/sec through the full HTTP + micro-batch + device
path for 1, 4, 8, and 16 concurrent raw-tensor clients, plus single-request
p50 latency, plus a 64-client OVERLOAD row probing the admission-control
regime (bounded p99 for admitted requests, clean 503 shedding for the rest).
Prints one JSON line per row.
"""

from __future__ import annotations

import http.client
import json
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

SIZE = 448
BATCH = 8


def make_checkpoint(tmp: Path) -> str:
    import sys as _sys

    _sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))
    from helpers import make_image_dataset

    from denoising_diffusion_deep_fake_tpu.config import (
        DeepFakeConfig, config_from_dict)
    from denoising_diffusion_deep_fake_tpu.training.runners import fit_deep_fake

    m_a = make_image_dataset(tmp / "a", n=4, size=SIZE, seed=1)
    m_b = make_image_dataset(tmp / "b", n=4, size=SIZE, seed=2)
    cfg = config_from_dict(DeepFakeConfig, dict(
        mode="denoise", data_path_a=str(m_a), data_path_b=str(m_b),
        noise_exponential_sampling_lambda=3.0, batch_size=2,
        learning_rate=1e-3, max_epochs=1, encoder_name="resnet34",
        log_dir=str(tmp / "runs"), checkpoint_dir=str(tmp / "ckpt")))
    fit_deep_fake(cfg, max_steps=1, verbose=False)
    return cfg.checkpoint_dir


def _wire_payload(rng, n_frames: int, wire: str):
    """(body_bytes, headers, frames_per_request) for one client request."""
    frames = rng.integers(0, 256, (n_frames, SIZE, SIZE, 3), dtype=np.uint8)
    if wire == "i420":
        from denoising_diffusion_deep_fake_tpu.ops.image import (
            pack_rgb_batch_to_i420_np)

        packed = pack_rgb_batch_to_i420_np(frames)
        return (packed.tobytes(),
                {"X-Shape": f"{n_frames},{SIZE},{SIZE}", "X-Format": "i420"},
                n_frames)
    return (frames.tobytes(),
            {"X-Shape": f"{n_frames},{SIZE},{SIZE},3"}, n_frames)


def client_loop(port: int, body: bytes, headers: dict, n_frames: int,
                stop: threading.Event, counter: list) -> None:
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
    while not stop.is_set():
        conn.request("POST", "/v1/swap_raw", body=body, headers=headers)
        resp = conn.getresponse()
        resp.read()
        assert resp.status == 200, resp.status
        counter[0] += n_frames
    conn.close()


def _read_response(reader):
    """(status, headers, body) of one HTTP response off a buffered reader."""
    line = reader.readline()
    if not line:
        raise ConnectionError("connection closed by server")
    status = int(line.split()[1])
    hdrs = {}
    while True:
        raw = reader.readline()
        if raw in (b"\r\n", b"\n", b""):
            break
        key, _, val = raw.decode("latin-1").partition(":")
        hdrs[key.strip().lower()] = val.strip()
    body = reader.read(int(hdrs.get("content-length", 0)))
    return status, hdrs, body


def overload_client_loop(port: int, body: bytes, headers: dict,
                         n_frames: int, stop: threading.Event,
                         out: dict) -> None:
    """Overload-tolerant client speaking ``Expect: 100-continue`` (raw
    socket — http.client transmits bodies eagerly, defeating the handshake).

    On overload the server sheds from the headers alone (final 503 instead
    of the interim 100), so each shed costs this client ZERO body bytes —
    the round-4 fix for the byte-bound raw-RGB wire where every shed
    previously paid the full ~1.2 MB upload. Counts sheds, honors
    Retry-After (capped), records success latencies, and tolerates
    mid-handshake resets (server-side close racing the body) as sheds."""
    import socket

    head = ("POST /v1/swap_raw HTTP/1.1\r\nHost: bench\r\n"
            + "".join(f"{k}: {v}\r\n" for k, v in headers.items())
            + f"Content-Length: {len(body)}\r\nExpect: 100-continue\r\n\r\n"
            ).encode()
    sock = reader = None
    while not stop.is_set():
        try:
            if sock is None:
                sock = socket.create_connection(("127.0.0.1", port),
                                                timeout=120)
                reader = sock.makefile("rb")
            t0 = time.perf_counter()
            sock.sendall(head)
            status, hdrs, _ = _read_response(reader)
            if status == 100:
                sock.sendall(body)
                status, hdrs, _ = _read_response(reader)
            dt_ms = (time.perf_counter() - t0) * 1e3
            if status == 200:
                out["ok_frames"] += n_frames
                out["lat_ms"].append(dt_ms)
            elif status == 503:
                out["shed"] += 1
                retry = float(hdrs.get("retry-after") or 1)
                if hdrs.get("connection", "").lower() == "close":
                    reader.close(); sock.close(); sock = reader = None
                stop.wait(min(retry, 0.5))
            else:
                raise AssertionError(f"unexpected status {status}")
        except (OSError, ConnectionError):
            if sock is not None:
                try:
                    reader.close(); sock.close()
                except OSError:
                    pass
            sock = reader = None
            out["resets"] += 1
            stop.wait(0.05)
    if sock is not None:
        reader.close()
        sock.close()


def bench_overload(engine, port: int, wire: str, n_clients: int = 64) -> None:
    """Overload regime: clients far beyond device throughput. Healthy
    behavior = bounded p99 for ADMITTED requests + clean 503 shedding for
    the rest (pre-backpressure this grew the queue and every caller's
    latency without bound)."""
    rng = np.random.default_rng(1)
    body, headers, n_frames = _wire_payload(rng, 2, wire)
    stop = threading.Event()
    outs = [{"ok_frames": 0, "shed": 0, "resets": 0, "lat_ms": []}
            for _ in range(n_clients)]
    threads = [threading.Thread(
        target=overload_client_loop,
        args=(port, body, headers, n_frames, stop, outs[i]), daemon=True)
        for i in range(n_clients)]
    for t in threads:
        t.start()
    time.sleep(2.0)  # ramp
    base_ok = sum(o["ok_frames"] for o in outs)
    base_shed = sum(o["shed"] for o in outs)
    n_lat_base = [len(o["lat_ms"]) for o in outs]
    t0 = time.perf_counter()
    time.sleep(10.0)
    elapsed = time.perf_counter() - t0
    ok = sum(o["ok_frames"] for o in outs) - base_ok
    shed = sum(o["shed"] for o in outs) - base_shed
    lat = np.concatenate([np.asarray(o["lat_ms"][n:] or [0.0])
                          for o, n in zip(outs, n_lat_base)])
    stop.set()
    for t in threads:
        t.join(timeout=60)
    stats = engine.stats()
    total_reqs = ok / n_frames + shed
    resets = sum(o["resets"] for o in outs)
    print(json.dumps({
        "metric": f"serve_overload_{n_clients}clients_448_{wire}",
        "value": round(ok / elapsed, 1), "unit": "frames/sec",
        "shed_rate": round(shed / total_reqs, 3) if total_reqs else 0.0,
        "p50_ok_ms": round(float(np.percentile(lat, 50)), 1),
        "p99_ok_ms": round(float(np.percentile(lat, 99)), 1),
        "queue_high_water": stats["queue_high_water"],
        "max_queue_frames": stats["max_queue_frames"],
        "batch_occupancy": stats["batch_occupancy"],
        "early_shed_requests": stats["early_shed_requests"],
        "shed_body_bytes_avoided": stats["early_shed_requests"] * len(body),
        "client_resets": resets}), flush=True)


def bench_wire(ckpt: str, wire: str) -> None:
    from denoising_diffusion_deep_fake_tpu.serving import SwapEngine
    from denoising_diffusion_deep_fake_tpu.serving.server import SwapServer

    engine = SwapEngine(ckpt, "a", height=SIZE, width=SIZE, batch_size=BATCH,
                        max_wait_ms=4.0, transfer=wire)
    secs = engine.warmup()
    print(f"# [{wire}] compile {secs:.1f}s", flush=True)
    rng = np.random.default_rng(0)

    with SwapServer(engine, port=0) as server:
        # p50 single-request latency (1 frame, lone client).
        body, headers, _ = _wire_payload(rng, 1, wire)
        lat = []
        conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=60)
        for _ in range(30):
            t0 = time.perf_counter()
            conn.request("POST", "/v1/swap_raw", body=body, headers=headers)
            conn.getresponse().read()
            lat.append((time.perf_counter() - t0) * 1e3)
        conn.close()
        print(json.dumps({"metric": f"serve_p50_latency_1frame_448_{wire}",
                          "value": round(float(np.median(lat)), 2),
                          "unit": "ms"}), flush=True)

        for n_clients in (1, 4, 8, 16):
            body, headers, n_frames = _wire_payload(rng, 2, wire)
            stop = threading.Event()
            counter = [0]
            threads = [threading.Thread(
                target=client_loop,
                args=(server.port, body, headers, n_frames, stop, counter),
                daemon=True)
                for _ in range(n_clients)]
            for t in threads:
                t.start()
            time.sleep(2.0)           # ramp
            start_count = counter[0]
            t0 = time.perf_counter()
            time.sleep(8.0)
            fps = (counter[0] - start_count) / (time.perf_counter() - t0)
            stop.set()
            for t in threads:
                t.join(timeout=30)
            stats = engine.stats()
            print(json.dumps({
                "metric": f"serve_throughput_{n_clients}clients_448_{wire}",
                "value": round(fps, 1), "unit": "frames/sec",
                "batch_occupancy": stats["batch_occupancy"]}), flush=True)

        bench_overload(engine, server.port, wire)


def bench_sampler(ckpt: str, sampler_steps: int = 10,
                  wire: str = "i420") -> None:
    """DDIM-refinement serving row (VERDICT r3 #5): the engine's
    sampler_steps>0 mode under concurrent load — N denoising steps per
    frame ride one lax.scan program, so the cost is ~N forward passes."""
    from denoising_diffusion_deep_fake_tpu.serving import SwapEngine
    from denoising_diffusion_deep_fake_tpu.serving.server import SwapServer

    engine = SwapEngine(ckpt, "a", height=SIZE, width=SIZE, batch_size=BATCH,
                        max_wait_ms=4.0, transfer=wire,
                        sampler_steps=sampler_steps)
    secs = engine.warmup()
    print(f"# [sampler{sampler_steps}/{wire}] compile {secs:.1f}s",
          flush=True)
    rng = np.random.default_rng(2)
    with SwapServer(engine, port=0) as server:
        for n_clients in (1, 8):
            body, headers, n_frames = _wire_payload(rng, 2, wire)
            stop = threading.Event()
            counter = [0]
            threads = [threading.Thread(
                target=client_loop,
                args=(server.port, body, headers, n_frames, stop, counter),
                daemon=True) for _ in range(n_clients)]
            for t in threads:
                t.start()
            time.sleep(2.0)
            start_count = counter[0]
            t0 = time.perf_counter()
            time.sleep(8.0)
            fps = (counter[0] - start_count) / (time.perf_counter() - t0)
            stop.set()
            for t in threads:
                t.join(timeout=60)
            print(json.dumps({
                "metric": (f"serve_ddim{sampler_steps}_"
                           f"{n_clients}clients_448_{wire}"),
                "value": round(fps, 1), "unit": "frames/sec",
                "batch_occupancy": engine.stats()["batch_occupancy"]}),
                flush=True)
    engine.close()


def impatient_client_loop(port: int, body: bytes, headers: dict,
                          n_frames: int, timeout_ms: float,
                          use_deadline: bool, stop: threading.Event,
                          out: dict) -> None:
    """A client with a hard client-side timeout: it ABANDONS the request
    (closes the socket) at ``timeout_ms`` and immediately retries with a
    fresh one — the impatient-retry pattern that, without server-side
    deadlines, litters the queue with work nobody is waiting for.
    ``use_deadline`` additionally tells the server via ``X-Deadline-Ms``
    so the engine can drop the abandoned work before dispatch."""
    import socket

    hdrs = dict(headers)
    if use_deadline:
        hdrs["X-Deadline-Ms"] = str(timeout_ms)
    head = ("POST /v1/swap_raw HTTP/1.1\r\nHost: bench\r\n"
            + "".join(f"{k}: {v}\r\n" for k, v in hdrs.items())
            + f"Content-Length: {len(body)}\r\nConnection: close\r\n\r\n"
            ).encode()
    while not stop.is_set():
        sock = reader = None
        try:
            sock = socket.create_connection(("127.0.0.1", port), timeout=5)
            sock.settimeout(timeout_ms / 1000.0)
            reader = sock.makefile("rb")
            t0 = time.perf_counter()
            sock.sendall(head + body)
            status, rhdrs, _ = _read_response(reader)
            dt_ms = (time.perf_counter() - t0) * 1e3
            if status == 200 and dt_ms <= timeout_ms:
                out["ok_frames"] += n_frames
                out["lat_ms"].append(dt_ms)
            elif status == 200:
                out["late"] += 1          # delivered after the client's bar
            elif status == 503:
                out["shed"] += 1
                stop.wait(min(float(rhdrs.get("retry-after") or 1), 0.25))
            elif status == 504:
                out["expired"] += 1       # server-side deadline answer
            else:
                raise AssertionError(f"unexpected status {status}")
        except socket.timeout:
            out["abandoned"] += 1         # client gave up; work may still
        except (OSError, ConnectionError):  # be queued server-side
            out["resets"] += 1
            stop.wait(0.05)
        finally:
            for h in (reader, sock):
                try:
                    if h is not None:
                        h.close()
                except OSError:
                    pass


def bench_impatient(ckpt: str, wire: str, n_clients: int = 32,
                    timeout_ms: float = 500.0) -> None:
    """Goodput under impatient clients, with vs without server deadlines
    (VERDICT r4 #4). Same engine, two 10 s phases: (a) clients time out
    client-side only — their abandoned requests still occupy queue frames
    and burn device batches when dequeued; (b) clients send X-Deadline-Ms,
    so the dispatcher drops expired work pre-dispatch. Healthy result:
    within-deadline frames/sec rises and expired_dropped_frames counts the
    device work saved."""
    from denoising_diffusion_deep_fake_tpu.serving import SwapEngine
    from denoising_diffusion_deep_fake_tpu.serving.server import SwapServer

    engine = SwapEngine(ckpt, "a", height=SIZE, width=SIZE, batch_size=BATCH,
                        max_wait_ms=4.0, transfer=wire)
    secs = engine.warmup()
    print(f"# [impatient/{wire}] compile {secs:.1f}s", flush=True)
    rng = np.random.default_rng(3)
    body, headers, n_frames = _wire_payload(rng, 2, wire)
    results = {}
    with SwapServer(engine, port=0) as server:
        for use_deadline in (False, True):
            before = engine.stats()
            stop = threading.Event()
            outs = [{"ok_frames": 0, "late": 0, "shed": 0, "expired": 0,
                     "abandoned": 0, "resets": 0, "lat_ms": []}
                    for _ in range(n_clients)]
            threads = [threading.Thread(
                target=impatient_client_loop,
                args=(server.port, body, headers, n_frames, timeout_ms,
                      use_deadline, stop, outs[i]), daemon=True)
                for i in range(n_clients)]
            for t in threads:
                t.start()
            time.sleep(2.0)  # ramp
            base = [dict(o, lat_ms=len(o["lat_ms"])) for o in outs]
            t0 = time.perf_counter()
            time.sleep(10.0)
            elapsed = time.perf_counter() - t0
            stop.set()
            for t in threads:
                t.join(timeout=60)
            after = engine.stats()
            tally = {k: sum(o[k] - b[k] for o, b in zip(outs, base))
                     for k in ("ok_frames", "late", "shed", "expired",
                               "abandoned", "resets")}
            lat = np.concatenate(
                [np.asarray(o["lat_ms"][b["lat_ms"]:] or [0.0])
                 for o, b in zip(outs, base)])
            tag = "deadline" if use_deadline else "nodeadline"
            row = {
                "metric": (f"serve_impatient_{n_clients}clients_"
                           f"{timeout_ms:.0f}ms_{wire}_{tag}"),
                "value": round(tally["ok_frames"] / elapsed, 1),
                "unit": "goodput_frames/sec",
                "p50_ok_ms": round(float(np.percentile(lat, 50)), 1),
                "late_replies": tally["late"],
                "client_abandoned": tally["abandoned"],
                "server_504": tally["expired"],
                "shed_503": tally["shed"],
                "expired_dropped_frames":
                    after["expired_dropped_frames"]
                    - before["expired_dropped_frames"],
                "batches_burned": after["batches"] - before["batches"],
            }
            results[tag] = row
            print(json.dumps(row), flush=True)
            time.sleep(3.0)  # drain the abandoned backlog between phases
        if results["nodeadline"]["value"]:
            print(json.dumps({
                "metric": f"serve_impatient_goodput_gain_{wire}",
                "value": round(results["deadline"]["value"]
                               / results["nodeadline"]["value"], 3),
                "unit": "x"}), flush=True)
    engine.close()


def main():
    import tempfile

    args = sys.argv[1:]
    wires = [a for a in args if a in ("rgb", "i420")]
    sampler = [a for a in args if a.startswith("sampler")]
    impatient = [a for a in args if a.startswith("impatient")]
    ckpt_args = [a for a in args
                 if a not in ("rgb", "i420")
                 and not a.startswith(("sampler", "impatient"))]
    if ckpt_args:
        ckpt = ckpt_args[0]
    else:
        tmp = Path(tempfile.mkdtemp(prefix="bench_serving_"))
        print(f"# training a throwaway checkpoint at {SIZE}² ...", flush=True)
        ckpt = make_checkpoint(tmp)
    only_impatient = impatient and not wires and not sampler
    if not only_impatient:
        for wire in (wires or ["rgb", "i420"]):
            bench_wire(ckpt, wire)
        if sampler or not (wires or sampler):
            steps = int(sampler[0][len("sampler"):]) if sampler else 10
            bench_sampler(ckpt, steps)
    if impatient or not (wires or sampler):
        # Optional timeout override: `impatient` or `impatient3000` (ms).
        # The client timeout must sit between one device-batch time and the
        # full queue-drain time for the row to discriminate — on a degraded
        # tunnel (uploads ~1 s/batch) 500 ms yields zero goodput both ways.
        ms = (impatient and impatient[0][len("impatient"):]) or ""
        bench_impatient(ckpt, "rgb",
                        timeout_ms=float(ms) if ms else 500.0)


if __name__ == "__main__":
    main()
