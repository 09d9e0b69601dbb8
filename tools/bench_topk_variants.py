"""Measure the fused decode-front Pallas kernel variants on hardware
at the flagship serving shapes (batch 128, 512x512 -> 128x128 planes:
anchors C=2 k=20, parts C=1 k=40) and cross-check bit-exactness.

Decides VERDICT r4 item 7: the one-hot MXU-gather variant
(`ops/pallas/topk.py::_sigmoid_nms_topk_onehot_kernel`) was projected
~3x faster than the shipped full-sweep kernel (2.28 ms); keep
whichever measures faster.

Usage: python tools/bench_topk_variants.py [--out topk_variants.json]
"""

import sys as _sys
from pathlib import Path as _Path

_REPO_ROOT = str(_Path(__file__).resolve().parents[1])
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from structuredetector_tpu.ops.pallas.topk import fused_sigmoid_nms_topk
from structuredetector_tpu.ops.tensor import (
    _topk_iterative,
    clamped_sigmoid,
    plateau_nms,
)

BATCH, H, W = 128, 128, 128
CASES = (("anchors", 2, 20), ("parts", 1, 40))
ITERS = 30


def bench(fn, *args):
    fn(*args)  # compile
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / ITERS * 1e3


def main():
    out_path = None
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]
    rng = np.random.default_rng(0)
    results = {"backend": jax.default_backend(), "iters": ITERS}
    for name, c, k in CASES:
        x = jnp.asarray(
            rng.normal(0, 3, (BATCH * c, H, W)).astype(np.float32))

        # correctness first: both variants bit-equal to the XLA path
        # (same reference as tests/test_pallas_topk.py::_reference)
        hm = jnp.transpose(x.reshape(BATCH, c, H, W), (0, 2, 3, 1))
        sup = plateau_nms(clamped_sigmoid(hm))
        per_class = jnp.transpose(sup, (0, 3, 1, 2)).reshape(BATCH, c, H * W)
        rv, ri = _topk_iterative(per_class, k)
        want_v = np.asarray(rv).reshape(BATCH * c, k)
        want_i = np.asarray(ri).reshape(BATCH * c, k)
        for variant in ("rounds", "onehot"):
            got_v, got_i = fused_sigmoid_nms_topk(x, k, variant=variant)
            np.testing.assert_array_equal(np.asarray(got_v), want_v,
                                          err_msg=f"{name}/{variant} values")
            np.testing.assert_array_equal(np.asarray(got_i), want_i,
                                          err_msg=f"{name}/{variant} indices")

        case = {}
        for variant in ("rounds", "onehot"):
            ms = bench(lambda a, v=variant: fused_sigmoid_nms_topk(
                a, k, variant=v), x)
            case[variant] = round(ms, 3)
        results[name] = case
        print(f"{name} (N={BATCH * c}, k={k}): {case}")

    total = {v: round(sum(results[n][v] for n, _, _ in CASES), 3)
             for v in ("rounds", "onehot")}
    results["total_front_ms"] = total
    results["winner"] = min(total, key=total.get)
    print("front total:", total, "->", results["winner"])
    if out_path:
        _Path(out_path).write_text(json.dumps(results, indent=2))
        print("wrote", out_path)


if __name__ == "__main__":
    main()
