"""Probe: host<->device transfer throughput, before/after first D2H.

Round-4 serving diagnosis. On the tunneled single-chip backend used in
this environment, the FIRST device-to-host fetch of any size (even 8
bytes) permanently degrades every later host-to-device transfer in the
process from ~1.4 GB/s to ~50 MB/s, and D2H runs at ~28 MB/s. Any
inference loop fetches results, so a serving process always runs in the
degraded regime: at 512x512 uint8 that caps a batch-32 predict cycle at
~500 ms of input transfer + ~40 ms forward + ~25 ms decode fetch
(~56 img/s process ceiling — vs ~4000 img/s device compute capacity).

This is a transfer-layer defect of the tunnel client, not of the
framework or the TPU (the same loop on the CPU backend, and H2D-only
processes, are flat); the equivalent RSS retention finding lives in
ROADMAP.md. Run this probe on a real TPU VM to confirm both vanish.

Usage:
    python tools/probe_transfer.py [--out _runs/probe_transfer.json]
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np


def _h2d_ms(shape=(32, 512, 512, 3), n=3) -> list:
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    out = []
    for _ in range(n):
        fresh = rng.integers(0, 255, shape, dtype=np.uint8)
        t0 = time.perf_counter()
        jnp.asarray(fresh).block_until_ready()
        out.append(round((time.perf_counter() - t0) * 1e3, 1))
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", type=Path, default=None)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    nbytes = 32 * 512 * 512 * 3

    # warm the backend with one H2D + trivial compute (no fetch)
    jnp.zeros((8,), jnp.float32).block_until_ready()
    pre = _h2d_ms()

    # the poison: a single tiny D2H fetch
    np.asarray(jnp.ones((8,), jnp.float32))
    post = _h2d_ms()

    big = jnp.ones((32, 512, 512, 3), jnp.uint8)
    big.block_until_ready()
    t0 = time.perf_counter()
    np.asarray(big)
    d2h_ms = (time.perf_counter() - t0) * 1e3

    result = {
        "device": str(dev),
        "payload_mb": round(nbytes / 1e6, 1),
        "h2d_ms_before_first_fetch": pre,
        "h2d_ms_after_first_fetch": post,
        "h2d_mbps_before": round(nbytes / 1e3 / min(pre), 1),
        "h2d_mbps_after": round(nbytes / 1e3 / min(post), 1),
        "d2h_ms": round(d2h_ms, 1),
        "d2h_mbps": round(nbytes / 1e3 / d2h_ms, 1),
        "degraded": min(post) > 3 * max(pre),
    }
    print(json.dumps(result, indent=2))
    if args.out:
        args.out.parent.mkdir(parents=True, exist_ok=True)
        args.out.write_text(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
