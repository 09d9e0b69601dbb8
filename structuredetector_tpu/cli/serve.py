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
    p.add_argument("--max_batch", type=int, default=8,
                   help="Device batch cap; batches pad to powers of two.")
    p.add_argument("--batch_window_ms", type=float, default=5.0,
                   help="How long to wait for more requests after the "
                        "first of a batch arrives.")
    args, rest = p.parse_known_args(argv)

    from ..config import config_from_args
    from ..predictor import Predictor
    from ..serve import run_server

    config = config_from_args(rest)
    assert config.pretrained_model, (
        "No model to serve. Use the option '--load_model <model_path>'."
    )

    predictor = Predictor(config)
    print(f"serving on http://{args.host}:{args.port} "
          f"(max_batch={args.max_batch}, window={args.batch_window_ms} ms) "
          f"POST /detect, GET /healthz")
    run_server(predictor, args.host, args.port,
               max_batch=args.max_batch, window_ms=args.batch_window_ms)


if __name__ == "__main__":
    main()
