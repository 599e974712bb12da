"""Load-bench the inference server: concurrent clients vs one device batch.

Run with the chip free:  python tools/bench_serving.py [ckpt_dir]
Without a checkpoint argument, trains one throwaway step at 448² to get one.

Measures sustained frames/sec through the full HTTP + micro-batch + device
path for 1, 4, 8, and 16 concurrent raw-tensor clients, plus single-request
p50 latency. Prints one JSON line per row.
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


def client_loop(port: int, frames: np.ndarray, stop: threading.Event,
                counter: list) -> None:
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
    shape = ",".join(str(s) for s in frames.shape)
    body = frames.tobytes()
    while not stop.is_set():
        conn.request("POST", "/v1/swap_raw", body=body,
                     headers={"X-Shape": shape})
        resp = conn.getresponse()
        resp.read()
        assert resp.status == 200, resp.status
        counter[0] += frames.shape[0]
    conn.close()


def main():
    import tempfile

    from denoising_diffusion_deep_fake_tpu.serving import SwapEngine
    from denoising_diffusion_deep_fake_tpu.serving.server import SwapServer

    if len(sys.argv) > 1:
        ckpt = sys.argv[1]
    else:
        tmp = Path(tempfile.mkdtemp(prefix="bench_serving_"))
        print(f"# training a throwaway checkpoint at {SIZE}² ...", flush=True)
        ckpt = make_checkpoint(tmp)

    engine = SwapEngine(ckpt, "a", height=SIZE, width=SIZE, batch_size=BATCH,
                        max_wait_ms=4.0)
    secs = engine.warmup()
    print(f"# compile {secs:.1f}s", flush=True)
    rng = np.random.default_rng(0)

    with SwapServer(engine, port=0) as server:
        # p50 single-request latency (1 frame, lone client).
        frame = rng.integers(0, 256, (1, SIZE, SIZE, 3), dtype=np.uint8)
        lat = []
        conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=60)
        for _ in range(30):
            t0 = time.perf_counter()
            conn.request("POST", "/v1/swap_raw", body=frame.tobytes(),
                         headers={"X-Shape": f"1,{SIZE},{SIZE},3"})
            conn.getresponse().read()
            lat.append((time.perf_counter() - t0) * 1e3)
        conn.close()
        print(json.dumps({"metric": "serve_p50_latency_1frame_448",
                          "value": round(float(np.median(lat)), 2),
                          "unit": "ms"}), flush=True)

        for n_clients in (1, 4, 8, 16):
            frames = rng.integers(0, 256, (2, SIZE, SIZE, 3), dtype=np.uint8)
            stop = threading.Event()
            counter = [0]
            threads = [threading.Thread(
                target=client_loop,
                args=(server.port, frames, stop, counter), daemon=True)
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
                "metric": f"serve_throughput_{n_clients}clients_448",
                "value": round(fps, 1), "unit": "frames/sec",
                "batch_occupancy": stats["batch_occupancy"]}), flush=True)


if __name__ == "__main__":
    main()
