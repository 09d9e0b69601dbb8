"""`serve` console script: HTTP inference server with micro-batching.

POST an image to /detect, get the annotation JSON back (reference
schema, original pixel coordinates). Concurrent requests group into
device batches (serve.MicroBatcher). New TPU-native deployment surface
— the reference ships a CoreML artifact instead (convert_coreml.py).
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Serve a trained model over HTTP with micro-batching."
    )
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--max_batch", type=str, default="auto",
                   help="Device batch cap; batches pad to powers of two. "
                        "'auto' (default) probes the steady-state H2D "
                        "bandwidth at startup and picks 128 when the "
                        "transfer of an extra image is cheaper than its "
                        "device compute, else 32 (the measured optimum "
                        "on a degraded/tunneled transfer layer, DESIGN.md "
                        "serving section). Pass an integer to pin it.")
    p.add_argument("--batch_window_ms", type=float, default=5.0,
                   help="How long to wait for more requests after the "
                        "first of a batch arrives.")
    p.add_argument("--submit_timeout_s", type=float, default=30.0,
                   help="Per-request cap on time waiting for the device "
                        "(503 on expiry) so a stalled device can't wedge "
                        "every handler thread.")
    p.add_argument("--artifact", type=str, default=None,
                   help="Serve an exported .sdz artifact instead of a "
                        "checkpoint (no other model flags needed; decode "
                        "parameters come from the embedded metadata).")
    p.add_argument("--pipeline", action="store_true",
                   help="Depth-2 serving pipeline: host prep/transfer of "
                        "batch N+1 overlaps device work of batch N. Wins "
                        "only when transfers genuinely parallelize with "
                        "device work (TPU VM); serve probes the link at "
                        "startup and falls back to the synchronous loop "
                        "in the serialized/degraded-transfer regime, "
                        "where the pipeline measured 2.4x worse "
                        "(DESIGN.md 'Serving throughput').")
    p.add_argument("--pipeline_force", action="store_true",
                   help="Skip the probe gate and run the depth-2 "
                        "pipeline unconditionally (for A/B measurement; "
                        "implies --pipeline).")
    p.add_argument("--no_warmup", action="store_true",
                   help="Skip pre-compiling the power-of-two batch shapes "
                        "at startup (first request per shape then pays "
                        "the compile).")
    args, rest = p.parse_known_args(argv)

    from ..serve import run_server

    if args.artifact:
        if rest:
            raise SystemExit(
                f"unrecognized arguments with --artifact: {' '.join(rest)} "
                "(model/decode flags come from the artifact metadata)"
            )
        from ..predictor import ExportPredictor

        predictor = ExportPredictor(args.artifact)
    else:
        from ..config import config_from_args
        from ..predictor import Predictor

        config = config_from_args(rest)
        assert config.pretrained_model, (
            "No model to serve. Use '--load_model <model_path>' "
            "or '--artifact <model.sdz>'."
        )
        predictor = Predictor(config)

    mbps = None
    if args.max_batch == "auto":
        from ..serve import probe_h2d_mbps, resolve_auto_max_batch

        mbps = probe_h2d_mbps()
        args.max_batch = resolve_auto_max_batch(mbps)
        print(f"max_batch auto: H2D ~{mbps:.0f} MB/s (steady-state) "
              f"-> {args.max_batch}")
    else:
        args.max_batch = int(args.max_batch)

    if args.pipeline_force:
        args.pipeline = True
    elif args.pipeline:
        from ..serve import probe_h2d_mbps, resolve_pipeline

        if mbps is None:
            mbps = probe_h2d_mbps()
        if not resolve_pipeline(mbps):
            print(f"pipeline: declined — H2D ~{mbps:.0f} MB/s is in the "
                  "serialized/degraded-transfer regime where the depth-2 "
                  "pipeline measures worse than the synchronous loop "
                  "(DESIGN.md 'Serving throughput'); running sync. "
                  "--pipeline_force overrides.")
            args.pipeline = False

    if not args.no_warmup:
        # compile every batch shape the micro-batcher can produce now,
        # not on the first unlucky request (~seconds per shape on TPU)
        from PIL import Image

        w, h = predictor.config.width, predictor.config.height
        dummy = Image.new("RGB", (w, h))
        sizes = []
        b = 1
        while b < args.max_batch:
            sizes.append(b)
            b *= 2
        sizes.append(args.max_batch)  # _pad_pow2 caps here — a shape of
        # its own when max_batch isn't a power of two
        for b in sizes:
            print(f"warmup: batch {b}")
            predictor.predict_batch([dummy] * b)

    print(f"serving on http://{args.host}:{args.port} "
          f"(max_batch={args.max_batch}, window={args.batch_window_ms} ms) "
          f"POST /detect, GET /healthz")
    run_server(predictor, args.host, args.port,
               max_batch=args.max_batch, window_ms=args.batch_window_ms,
               submit_timeout_s=args.submit_timeout_s,
               pipeline=args.pipeline)


if __name__ == "__main__":
    main()
