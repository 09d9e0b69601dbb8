"""Serving load test: concurrency sweep with latency percentiles.

Starts `serve` (checkpoint or `.sdz` artifact) as a subprocess, fires N
concurrent clients each posting one JPEG per request against /detect
for a fixed duration, and reports p50/p95/p99 latency, served img/s,
error counts, and the server's own micro-batch counters (/healthz).
With `--sweep` it repeats the run across several `--max_batch` settings
and prints one markdown table.

The reference publishes only single-image Xcode latency medians
(`/root/reference/README.md:114`); this is the deployment-shaped
equivalent for the TPU serving stack.

Usage:
    python tools/load_test.py --artifact model.sdz --clients 32 \
        --duration 30 --sweep 8,32,128
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path

_REPO_ROOT = str(_Path(__file__).resolve().parents[1])
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)  # run as `python tools/x.py` without install


import argparse
import http.client
import io
import json
import statistics
import subprocess
import sys
import threading
import time
from pathlib import Path

import numpy as np


def make_jpeg(size: int = 512) -> bytes:
    from PIL import Image

    rng = np.random.default_rng(0)
    arr = rng.integers(0, 255, size=(size, size, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=90)
    return buf.getvalue()


def wait_healthy(host: str, port: int, timeout_s: float = 600.0) -> dict:
    deadline = time.monotonic() + timeout_s
    while time.monotonic() < deadline:
        try:
            conn = http.client.HTTPConnection(host, port, timeout=5)
            conn.request("GET", "/healthz")
            resp = conn.getresponse()
            body = json.loads(resp.read())
            conn.close()
            if resp.status == 200:
                return body
        except OSError:
            time.sleep(1.0)
    raise TimeoutError(f"server on {host}:{port} never became healthy")


def client_loop(host, port, payload, stop, latencies, errors):
    while not stop.is_set():
        t0 = time.monotonic()
        try:
            conn = http.client.HTTPConnection(host, port, timeout=120)
            conn.request("POST", "/detect", body=payload,
                         headers={"Content-Type": "image/jpeg"})
            resp = conn.getresponse()
            resp.read()
            conn.close()
            if resp.status == 200:
                latencies.append(time.monotonic() - t0)
            else:
                errors.append(resp.status)
        except OSError as e:
            errors.append(str(e))


def run_one(args, max_batch: int) -> dict:
    serve_cmd = [
        sys.executable, "-m", "structuredetector_tpu.cli.serve",
        "--host", args.host, "--port", str(args.port),
        "--max_batch", str(max_batch),
        "--batch_window_ms", str(args.batch_window_ms),
    ]
    if args.artifact:
        serve_cmd += ["--artifact", args.artifact]
    else:
        serve_cmd += ["--load_model", args.load_model,
                      "--labels", args.labels, "--anchor_name", args.anchor_name]
    serve_cmd += args.serve_args

    log = open(args.log_dir / f"serve_b{max_batch}.log", "w")
    proc = subprocess.Popen(serve_cmd, stdout=log, stderr=subprocess.STDOUT)
    try:
        wait_healthy(args.host, args.port)
        payload = make_jpeg(args.image_size)

        latencies: list[float] = []
        errors: list = []
        stop = threading.Event()
        threads = [
            threading.Thread(
                target=client_loop,
                args=(args.host, args.port, payload, stop, latencies, errors),
                daemon=True,
            )
            for _ in range(args.clients)
        ]
        t0 = time.monotonic()
        for t in threads:
            t.start()
        time.sleep(args.duration)
        stop.set()
        for t in threads:
            t.join(timeout=130)
        elapsed = time.monotonic() - t0

        health = wait_healthy(args.host, args.port, timeout_s=30)
        lat = sorted(latencies)

        def pct(p):
            return lat[min(len(lat) - 1, int(p / 100 * len(lat)))] if lat else float("nan")

        return {
            "max_batch": max_batch,
            "requests": len(lat),
            "errors": len(errors),
            "error_sample": errors[:5],
            "img_per_s": len(lat) / elapsed,
            "p50_ms": pct(50) * 1e3,
            "p95_ms": pct(95) * 1e3,
            "p99_ms": pct(99) * 1e3,
            "mean_ms": statistics.fmean(lat) * 1e3 if lat else float("nan"),
            "server_batches": health.get("batches_run"),
            "server_mean_batch": (
                health.get("images_run", 0) / health["batches_run"]
                if health.get("batches_run") else float("nan")
            ),
            # server-side submit->done percentiles (excludes HTTP/decode
            # overhead the client numbers include) from /healthz
            "server_latency": health.get("latency"),
        }
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            proc.kill()
        log.close()


def main(argv=None):
    p = argparse.ArgumentParser()
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--artifact", type=str, default=None)
    src.add_argument("--load_model", type=str, default=None)
    p.add_argument("--labels", type=str, default="labels.json")
    p.add_argument("--anchor_name", type=str, default="stem")
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8321)
    p.add_argument("--clients", type=int, default=32)
    p.add_argument("--duration", type=float, default=30.0)
    p.add_argument("--image_size", type=int, default=512)
    p.add_argument("--batch_window_ms", type=float, default=5.0)
    p.add_argument("--sweep", type=str, default=None,
                   help="Comma-separated max_batch values, e.g. 8,32,128.")
    p.add_argument("--log_dir", type=Path, default=Path("_runs"))
    p.add_argument("--out", type=Path, default=None)
    p.add_argument("serve_args", nargs="*", default=[],
                   help="Extra flags forwarded to the serve subprocess "
                        "after '--', e.g. -- --width 256 --int8.")
    args = p.parse_args(argv)
    args.log_dir.mkdir(parents=True, exist_ok=True)

    batches = [int(b) for b in args.sweep.split(",")] if args.sweep else [32]
    results = [run_one(args, b) for b in batches]

    cols = ("max_batch", "requests", "errors", "img_per_s",
            "p50_ms", "p95_ms", "p99_ms", "server_mean_batch")
    lines = ["| " + " | ".join(cols) + " |", "|" + "---|" * len(cols)]
    for r in results:
        lines.append("| " + " | ".join(
            f"{r[c]:.1f}" if isinstance(r[c], float) else str(r[c]) for c in cols
        ) + " |")
    table = "\n".join(lines)
    print()
    print(table)
    if args.out:
        args.out.write_text(json.dumps({"table": table, "runs": results}, indent=2))


if __name__ == "__main__":
    main()
