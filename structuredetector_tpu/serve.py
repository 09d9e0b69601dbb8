"""Inference server with dynamic micro-batching.

TPU serving wants batches (the chip hits ~4x its batch-1 throughput at
batch 128), but HTTP clients send one image at a time. `MicroBatcher`
closes the gap: requests queue up, a worker drains up to `max_batch` of
them (waiting at most `window_ms` after the first arrival), and one
jitted forward+decode serves the whole group. Batches pad to the next
power of two so only log2(max_batch)+1 graph shapes ever compile.

The HTTP layer is stdlib (`ThreadingHTTPServer`) — one POST per image,
JSON annotation back, in the reference's public schema
(`/root/reference/README.md:40-69`). No counterpart exists in the
reference (its serving story is a CoreML artifact handed to an app);
this is TPU-native deployment surface.
"""

from __future__ import annotations

import io
import json
import queue
import threading
import time
from collections import deque
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np
from PIL import Image

__all__ = ["MicroBatcher", "make_server", "run_server"]

_SHUTDOWN = object()

# Reject request bodies above this before reading them: ThreadingHTTPServer
# spawns a thread per connection, so unbounded client-declared
# Content-Length would let concurrent uploads exhaust host memory.
MAX_BODY_BYTES = 32 << 20  # 32 MB — generous for any real camera JPEG


def probe_h2d_mbps(size_mb: float = 16.0) -> float:
    """Measured steady-state host->device bandwidth in MB/s.

    A tiny device->host fetch runs FIRST: on tunneled
    single-controller backends the first fetch permanently degrades
    the process's H2D link (1.4 GB/s -> 52 MB/s, ROADMAP.md /
    tools/probe_transfer.py), and a serving process fetches results on
    every batch, so the degraded figure is the only honest basis for
    sizing batches. On a real TPU VM the fetch is harmless and the
    probe reports the true link speed."""
    import time

    import jax
    import numpy as np

    dev = jax.devices()[0]
    np.asarray(jax.device_put(np.zeros((8,), np.float32), dev))  # D2H once
    buf = np.zeros((int(size_mb * 2**20),), np.uint8)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(jax.device_put(buf, dev))
        best = min(best, time.perf_counter() - t0)
    return size_mb / best


def resolve_auto_max_batch(h2d_mbps: float,
                           img_mb: float = 0.79,
                           device_ms_per_img: float = 0.26) -> int:
    """32 or 128 from the probed link speed.

    128 only pays when transferring one more image costs less than
    computing it (~0.79 MB uint8 at 512x512 vs ~0.26 ms/img at the
    measured 3900 img/s int8 ceiling -> needs >= ~3 GB/s); below that
    the link is the bottleneck and the round-4 percentile sweep showed
    32 maximizes served img/s (44.8 vs 33.5 at 128, DESIGN.md).

    The defaults are the measured 512x512 anchors, but the BREAK-EVEN
    they imply is resolution-independent to first order: transfer
    bytes and device time both scale ~linearly with pixel count, so
    their ratio (the required MB/s) is unchanged for other input
    sizes. Override both parameters together if a deployment's
    measured per-image cost deviates from the linear model."""
    need_mbps = img_mb / (device_ms_per_img / 1e3)
    return 128 if h2d_mbps >= need_mbps else 32


def resolve_pipeline(h2d_mbps: float) -> bool:
    """Whether the depth-2 pipeline pays on this link.

    Same break-even as `resolve_auto_max_batch`: the pipeline's whole
    point is overlapping batch N+1's transfer with batch N's device
    work, which requires the link to move an image faster than the
    device computes it. In the serialized/degraded-transfer regime it
    measured 2.4x WORSE than the sync loop even with the full-batch
    guard (26.9 -> 11.0 img/s at 64-client saturation,
    _runs/load_test_r5_sync.json vs _runs/load_test_r5_pipeline.json),
    so `serve --pipeline` declines and runs sync there
    (--pipeline_force overrides for A/B measurement)."""
    return resolve_auto_max_batch(h2d_mbps) == 128


def _pad_pow2(n: int, cap: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return min(p, cap)


class MicroBatcher:
    """Groups concurrent single-image requests into device batches.

    `predict_batch` is `Predictor.predict_batch` (or any callable from a
    list of PIL images to a list of annotations). Thread-safe `submit`;
    one worker thread owns the device.
    """

    def __init__(self, predict_batch, max_batch: int = 8,
                 window_ms: float = 5.0,
                 submit_timeout_s: Optional[float] = None,
                 predict_split: Optional[tuple] = None):
        if max_batch < 1:
            raise ValueError("max_batch must be >= 1")
        self._predict = predict_batch
        # (submit, collect) pair enables the depth-2 pipeline: batch
        # N+1's host prep + device dispatch run before batch N's result
        # fetch, so steady-state throughput is max(host, device) phase
        # instead of their sum (Predictor.predict_batch_submit).
        self._split = predict_split
        self.max_batch = max_batch
        self.window_s = window_ms / 1e3
        self.submit_timeout_s = submit_timeout_s
        self._queue: "queue.Queue" = queue.Queue()
        self._closed = False
        self._lock = threading.Lock()  # orders submit() vs close()
        self._worker = threading.Thread(target=self._loop, daemon=True)
        self._worker.start()
        # observability: how many device calls served how many images,
        # and a sliding window of per-request latencies (submit -> done,
        # so queueing + batching window + device time) for /healthz
        # percentiles. deque.append is atomic under the GIL; readers
        # snapshot via list().
        self.batches_run = 0
        self.images_run = 0
        self._latencies: "deque[float]" = deque(maxlen=2048)

    @property
    def queue_depth(self) -> int:
        """Images waiting for a device batch (approximate, lock-free)."""
        return self._queue.qsize()

    def latency_stats(self) -> dict:
        """p50/p95/p99 over the last ≤2048 served requests, in ms.

        Covers the full server-side path (queue wait + batching window +
        device forward + decode); nearest-rank percentiles."""
        lats = sorted(list(self._latencies))  # snapshot first: the worker
        # appends concurrently, and sorting an actively-mutating deque
        # is undefined outside CPython's atomic C-level copy
        if not lats:
            return {"count": 0}
        n = len(lats)

        def pct(p: float) -> float:
            return round(lats[min(n - 1, int(round(p * (n - 1))))] * 1e3, 3)

        return {"count": n, "p50_ms": pct(0.50), "p95_ms": pct(0.95),
                "p99_ms": pct(0.99)}

    def submit(self, image: Image.Image, timeout: Optional[float] = None):
        """Blocks until the batcher has a result; returns the annotation
        (or raises what the model raised). A `timeout` (seconds; default
        the constructor's `submit_timeout_s`, default unbounded) raises
        TimeoutError instead of wedging the calling thread if the device
        path stalls (runaway compile, device hang)."""
        done = threading.Event()
        slot: dict = {"t0": time.monotonic()}
        with self._lock:
            # under the lock, a non-closed batcher is guaranteed to
            # enqueue BEFORE close() enqueues _SHUTDOWN (FIFO queue), so
            # the worker always services this item — submit can't hang
            if self._closed:
                raise RuntimeError("batcher is closed")
            self._queue.put((image, done, slot))
        if not done.wait(timeout if timeout is not None else self.submit_timeout_s):
            # the worker may still complete this item later; that only
            # sets an Event nobody reads
            raise TimeoutError(
                f"inference did not complete within the submit timeout "
                f"({timeout or self.submit_timeout_s} s)"
            )
        if "error" in slot:
            raise slot["error"]
        return slot["result"]

    def close(self):
        with self._lock:
            if self._closed:
                return
            self._closed = True
            self._queue.put(_SHUTDOWN)
        self._worker.join(timeout=5)
        if self._worker.is_alive():
            # worker wedged inside predict_batch: its finally-drain will
            # never run, so fail everything still queued ourselves (items
            # the worker already dequeued are covered by submit timeouts)
            while True:
                try:
                    leftover = self._queue.get_nowait()
                except queue.Empty:
                    break
                if leftover is _SHUTDOWN:
                    continue
                _, done, slot = leftover
                slot["error"] = RuntimeError(
                    "batcher shut down while the device worker was hung")
                done.set()

    def _gather_window(self, first) -> tuple:
        """(items, saw_shutdown): wait up to the batching window for
        more requests after the first arrival."""
        items = [first]
        deadline = time.monotonic() + self.window_s
        while len(items) < self.max_batch:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                nxt = self._queue.get(timeout=remaining)
            except queue.Empty:
                break
            if nxt is _SHUTDOWN:
                return items, True
            items.append(nxt)
        return items, False

    def _loop(self):
        if self._split is not None:
            self._loop_pipelined()
            return
        try:
            while True:
                first = self._queue.get()
                if first is _SHUTDOWN:
                    return
                items, saw_shutdown = self._gather_window(first)
                self._run(items)
                if saw_shutdown:
                    return
        finally:
            self._drain_on_exit()

    def _loop_pipelined(self):
        """Depth-2 pipeline over the (submit, collect) split: submit
        batch N+1 to the device BEFORE collecting batch N's results, so
        host prep/transfer and device compute overlap.

        The early submit happens ONLY when a full `max_batch` is
        already queued. Anything less would split the arrival stream
        across two in-flight batches and fragment both (round-4 load
        test: mean device batch 31 -> 21 and 44.8 -> 39.7 img/s under
        64-client saturation with a windowed early submit; 44.8 -> 27
        with a no-wait drain). With the full-batch guard the pipeline
        overlaps exactly when saturation guarantees fragment-free
        batches, and degenerates to the sync loop otherwise — one
        shared request pool, never a split one."""
        submit, collect = self._split
        pending = None  # (items, handle) in flight on the device
        nxt = None
        shutdown = False
        try:
            while True:
                items = []
                if pending is None:
                    first = self._queue.get()
                    if first is _SHUTDOWN:
                        return
                    items, shutdown = self._gather_window(first)
                elif self._queue.qsize() >= self.max_batch:
                    # full batch waiting: overlap it with the in-flight
                    # batch (no window, no partial drain)
                    while len(items) < self.max_batch:
                        try:
                            got = self._queue.get_nowait()
                        except queue.Empty:
                            break
                        if got is _SHUTDOWN:
                            shutdown = True
                            break
                        items.append(got)
                # else: batch in flight and queue below a full batch —
                # collect first (items stays empty), then gather with
                # the normal window like the sync loop

                nxt = None
                if items:
                    try:
                        nxt = (items, self._submit_batch(submit, items))
                    except BaseException as e:
                        self._fail_items(items, e)
                if pending is not None:
                    self._collect_batch(collect, pending)
                pending = nxt
                if shutdown:
                    if pending is not None:
                        self._collect_batch(collect, pending)
                    return
        finally:
            # A KeyboardInterrupt/SystemExit re-raised by _fail_items can
            # unwind while ANOTHER batch is still in flight (submit of
            # N+1 dying leaves N pending; collect of N dying leaves N+1
            # just submitted). Those items already left the queue, so the
            # drain below can't rescue them — fail their waiters here.
            # Served items are skipped (done already set).
            err = RuntimeError("batcher shut down while a batch was in flight")
            for inflight in (pending, nxt):
                if inflight is not None:
                    for _, done, slot in inflight[0]:
                        if not done.is_set():
                            slot["error"] = err
                            done.set()
            self._drain_on_exit()

    def _drain_on_exit(self):
        # whether via _SHUTDOWN or a worker crash, never leave a
        # waiter blocked: mark closed and fail anything still queued.
        # Under the lock, so no submit() can slip an item in between
        # the closed-flag check and the drain.
        with self._lock:
            self._closed = True
            while True:
                try:
                    leftover = self._queue.get_nowait()
                except queue.Empty:
                    break
                if leftover is _SHUTDOWN:
                    continue
                _, done, slot = leftover
                slot["error"] = RuntimeError("batcher shut down")
                done.set()

    def _fail_items(self, items, e: BaseException):
        """Surface a failure to every still-unserved waiter of a batch —
        these items left the queue, so the shutdown drain can't rescue
        them."""
        err = e if isinstance(e, Exception) else RuntimeError(repr(e))
        for _, done, slot in items:
            if not done.is_set():
                slot["error"] = err
                done.set()
        if not isinstance(e, Exception):
            raise  # KeyboardInterrupt/SystemExit still terminate

    def _submit_batch(self, submit, items):
        """Pipeline front half: pad and dispatch to the device."""
        images = [im for im, _, _ in items]
        target = _pad_pow2(len(images), self.max_batch)
        padded = images + [images[-1]] * (target - len(images))
        return submit(padded)

    def _collect_batch(self, collect, pending):
        """Pipeline back half: fetch results and wake the waiters."""
        items, handle = pending
        try:
            results = collect(handle)[: len(items)]
            if len(results) < len(items):
                raise RuntimeError(
                    f"predict collect returned {len(results)} results "
                    f"for {len(items)} images"
                )
            self.batches_run += 1
            self.images_run += len(items)
            now = time.monotonic()
            for (_, done, slot), result in zip(items, results):
                slot["result"] = result
                self._latencies.append(now - slot["t0"])
                done.set()
        except BaseException as e:
            self._fail_items(items, e)

    def _run(self, items):
        images = [im for im, _, _ in items]
        # pad with a copy of the last image to a power-of-two batch so
        # the jit cache stays small; padded results are dropped
        target = _pad_pow2(len(images), self.max_batch)
        padded = images + [images[-1]] * (target - len(images))
        try:
            results = self._predict(padded)[: len(images)]
            if len(results) < len(images):
                raise RuntimeError(
                    f"predict_batch returned {len(results)} results "
                    f"for {len(images)} images"
                )
            self.batches_run += 1
            self.images_run += len(images)
            now = time.monotonic()
            for (_, done, slot), result in zip(items, results):
                slot["result"] = result
                self._latencies.append(now - slot["t0"])
                done.set()
        except BaseException as e:
            self._fail_items(items, e)


def make_request_decoder(predictor, use_native: bool):
    """Request bytes -> predictor feed, honoring the predictor's input
    signature. Three cases (uniform across Predictor and ExportPredictor
    via their `feed_uint8`/`feed_normalize` properties):

    - `feed_uint8`: raw uint8 RGB — normalization runs inside the graph
      (`Predictor(device_normalize=True)`, `export --uint8_input`);
    - `feed_normalize`: host applies /255 + ImageNet mean/std in float32;
    - neither (float artifact exported with `--norm`): the graph owns
      /255 + mean/std, so the feed is raw [0, 255] float32. The native
      float decode yields [0, 1], so decode uint8 and widen instead.

    With `use_native`, decode+resize happens here in C++ (GIL released)
    and a `PreparedImage` skips the predictor's per-image PIL transform;
    otherwise returns a loaded PIL image (decoded NOW — a truncated
    payload must 400 here, not explode inside a shared micro-batch and
    500 innocent requests)."""
    from .data import native as native_io
    from .predictor import PreparedImage

    cfg = predictor.config
    feed_u8 = getattr(predictor, "feed_uint8", False)
    feed_norm = getattr(predictor, "feed_normalize", not feed_u8)

    def decode_request(data: bytes):
        if use_native:
            arr, size = native_io.decode_bytes(
                data, cfg.width, cfg.height,
                normalize=feed_norm,
                dtype=np.float32 if feed_norm else np.uint8,
            )
            if not feed_u8 and not feed_norm:
                arr = arr.astype(np.float32)
            return PreparedImage(arr, size)
        image = Image.open(io.BytesIO(data))
        image.load()
        if image.mode != "RGB":
            image = image.convert("RGB")
        return image

    return decode_request


def make_server(predictor, host: str = "127.0.0.1", port: int = 8000,
                max_batch: int = 8, window_ms: float = 5.0,
                submit_timeout_s: Optional[float] = 30.0,
                pipeline: bool = False):
    """(ThreadingHTTPServer, MicroBatcher) serving the predictor.

    Routes:
      POST /detect  — raw JPEG/PNG bytes in the body -> annotation JSON
                      (reference schema) in original image coordinates
      GET  /healthz — liveness + batching counters + queue depth
    """
    # `pipeline=True` + a predictor exposing the submit/collect split
    # enables the depth-2 pipeline (host prep of batch N+1 overlaps
    # device work of batch N). The early submit is gated on a FULL
    # max_batch already queued (MicroBatcher._loop_pipelined), so the
    # arrival stream is never split across fragmented in-flight
    # batches — below saturation it behaves exactly like the sync
    # loop. See DESIGN.md "Serving throughput" for measurements.
    split = None
    if pipeline and hasattr(predictor, "predict_batch_submit"):
        split = (predictor.predict_batch_submit, predictor.predict_batch_collect)
    batcher = MicroBatcher(predictor.predict_batch, max_batch=max_batch,
                           window_ms=window_ms,
                           submit_timeout_s=submit_timeout_s,
                           predict_split=split)
    cfg = predictor.config

    # Request decode path: the native in-memory decoder (fused
    # JPEG/PNG decode + resize in C++, GIL released) feeds the batcher
    # pre-resized `PreparedImage`s, so the Python phase of a request is
    # just the HTTP framing. Falls back to PIL when the library isn't
    # built. Round-3 load tests measured the per-request PIL
    # decode+resize as the serving bottleneck (8.6 img/s end-to-end vs
    # ~4000 img/s device capacity).
    from .data import native as native_io

    # v4+ required: a v3 library passes available() (file loaders work)
    # but lacks the in-memory decode — routing requests through it would
    # 400 every POST. Fall back to PIL instead.
    use_native = native_io.supports_decode_bytes()
    decode_request = make_request_decoder(predictor, use_native=use_native)

    model_info = {
        "width": cfg.width, "height": cfg.height,
        "anchors": list(cfg.labels.keys()), "parts": list(cfg.parts.keys()),
        "anchor_name": cfg.anchor_name,
        "native_decode": use_native,
    }

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _reply(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, {
                    "status": "ok",
                    "batches_run": batcher.batches_run,
                    "images_run": batcher.images_run,
                    "queue_depth": batcher.queue_depth,
                    "latency": batcher.latency_stats(),
                    "model": model_info,
                })
            else:
                self._reply(404, {"error": f"no route {self.path}"})

        def do_POST(self):
            if self.path != "/detect":
                self._reply(404, {"error": f"no route {self.path}"})
                return
            raw_len = self.headers.get("Content-Length")
            if raw_len is None:
                self._reply(411, {"error": "Content-Length required"})
                return
            try:
                length = int(raw_len)
            except ValueError:
                self._reply(400, {"error": f"bad Content-Length: {raw_len!r}"})
                return
            if length <= 0:
                self._reply(400, {"error": "empty body"})
                return
            if length > MAX_BODY_BYTES:
                # refuse BEFORE reading: the declared size alone must not
                # let clients fill host memory
                self._reply(413, {
                    "error": f"body too large ({length} > {MAX_BODY_BYTES} bytes)"
                })
                return
            try:
                data = self.rfile.read(length)
                image = decode_request(data)
            except Exception as e:
                self._reply(400, {"error": f"bad image payload: {e}"})
                return
            try:
                annotation = batcher.submit(image)
            except TimeoutError as e:
                self._reply(503, {"error": str(e)})
                return
            except Exception as e:
                self._reply(500, {"error": str(e)})
                return
            payload = annotation.json_repr()
            # overwrite AFTER serialization: json_repr resolves the
            # path against the cwd, which must not reach clients
            payload["image_path"] = "upload"
            self._reply(200, payload)

    class Server(ThreadingHTTPServer):
        # the stdlib default accept backlog (5) RSTs concurrent clients
        # under load — the whole point of a micro-batching server is
        # many simultaneous requests
        request_queue_size = 128

    server = Server((host, port), Handler)
    return server, batcher


def run_server(predictor, host: str = "127.0.0.1", port: int = 8000,
               max_batch: int = 8, window_ms: float = 5.0,
               ready: Optional[threading.Event] = None,
               submit_timeout_s: Optional[float] = 30.0,
               pipeline: bool = False):
    """Serve until interrupted; `ready` is set once the socket listens."""
    server, batcher = make_server(predictor, host, port, max_batch, window_ms,
                                  submit_timeout_s=submit_timeout_s,
                                  pipeline=pipeline)
    if ready is not None:
        ready.set()
    try:
        server.serve_forever()
    finally:
        batcher.close()
        server.server_close()
