"""Serving layer (serve.py): micro-batching semantics with a fake
model, and the HTTP round-trip with a real Predictor."""

import io
import json
import threading
import time
import urllib.request

import numpy as np
import pytest
from PIL import Image

from structuredetector_tpu.serve import MicroBatcher, make_server


class FakePredict:
    """Stands in for Predictor.predict_batch; records batch sizes."""

    def __init__(self, delay_s=0.0, fail=False):
        self.calls = []
        self.delay_s = delay_s
        self.fail = fail

    def __call__(self, images):
        self.calls.append(len(images))
        if self.fail:
            raise RuntimeError("model exploded")
        time.sleep(self.delay_s)
        return [f"ann-{id(im)}" for im in images]


def test_microbatcher_single():
    fake = FakePredict()
    b = MicroBatcher(fake, max_batch=4, window_ms=1.0)
    img = Image.new("RGB", (8, 8))
    assert b.submit(img) == f"ann-{id(img)}"
    assert b.batches_run == 1 and b.images_run == 1
    b.close()


def test_microbatcher_groups_concurrent_requests():
    fake = FakePredict(delay_s=0.01)
    b = MicroBatcher(fake, max_batch=8, window_ms=100.0)
    images = [Image.new("RGB", (8, 8)) for _ in range(6)]
    results = [None] * 6

    def work(i):
        results[i] = b.submit(images[i])

    threads = [threading.Thread(target=work, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    assert results == [f"ann-{id(im)}" for im in images]  # order preserved
    assert b.images_run == 6
    assert b.batches_run < 6, "requests were not batched"
    # padding goes to powers of two, capped at max_batch
    assert all(n in (1, 2, 4, 8) for n in fake.calls)
    b.close()


def test_microbatcher_latency_stats():
    fake = FakePredict(delay_s=0.02)
    b = MicroBatcher(fake, max_batch=4, window_ms=1.0)
    for _ in range(3):
        b.submit(Image.new("RGB", (8, 8)))
    stats = b.latency_stats()
    assert stats["count"] == 3
    # each request waited at least the model delay, and the percentile
    # order holds
    assert stats["p50_ms"] >= 20.0
    assert stats["p50_ms"] <= stats["p95_ms"] <= stats["p99_ms"]
    b.close()


def test_microbatcher_latency_stats_empty():
    b = MicroBatcher(FakePredict(), max_batch=2, window_ms=1.0)
    assert b.latency_stats() == {"count": 0}
    b.close()


def test_microbatcher_propagates_model_errors():
    b = MicroBatcher(FakePredict(fail=True), max_batch=2, window_ms=1.0)
    with pytest.raises(RuntimeError, match="model exploded"):
        b.submit(Image.new("RGB", (8, 8)))
    b.close()


def test_microbatcher_rejects_bad_config():
    with pytest.raises(ValueError):
        MicroBatcher(FakePredict(), max_batch=0)


def test_microbatcher_submit_after_close_raises():
    b = MicroBatcher(FakePredict(), max_batch=2, window_ms=1.0)
    b.close()
    with pytest.raises(RuntimeError, match="closed"):
        b.submit(Image.new("RGB", (8, 8)))
    b.close()  # idempotent


def test_microbatcher_submit_timeout():
    """A stalled device path 503s the request (TimeoutError) instead of
    wedging the handler thread forever."""
    release = threading.Event()

    def hung_predict(images):
        release.wait(10)
        return ["late"] * len(images)

    b = MicroBatcher(hung_predict, max_batch=2, window_ms=1.0,
                     submit_timeout_s=0.1)
    t0 = time.monotonic()
    with pytest.raises(TimeoutError, match="submit timeout"):
        b.submit(Image.new("RGB", (8, 8)))
    assert time.monotonic() - t0 < 5
    # per-call override beats the constructor default
    with pytest.raises(TimeoutError):
        b.submit(Image.new("RGB", (8, 8)), timeout=0.05)
    release.set()
    b.close()


def test_microbatcher_close_fails_queued_items_when_worker_hung():
    """If the worker is wedged inside predict_batch, close() itself
    drains the queue so no waiter stays blocked."""
    entered = threading.Event()
    release = threading.Event()

    def hung_predict(images):
        entered.set()
        release.wait(30)
        return ["late"] * len(images)

    b = MicroBatcher(hung_predict, max_batch=1, window_ms=1.0)
    b._worker.join(timeout=0)  # worker alive
    hang_err = {}

    def first():
        try:
            b.submit(Image.new("RGB", (8, 8)))
        except Exception as e:
            hang_err["e"] = e

    t1 = threading.Thread(target=first, daemon=True)
    t1.start()
    assert entered.wait(5)  # worker is now stuck in predict_batch
    # second request sits in the queue behind the hung batch
    queued_err = {}

    def second():
        try:
            b.submit(Image.new("RGB", (8, 8)))
        except Exception as e:
            queued_err["e"] = e

    t2 = threading.Thread(target=second, daemon=True)
    t2.start()
    while b.queue_depth == 0:
        time.sleep(0.01)
    b._worker.join(timeout=0)
    orig_join = b._worker.join
    b._worker.join = lambda timeout=None: orig_join(timeout=0.2)  # fast close
    b.close()
    t2.join(timeout=5)
    assert isinstance(queued_err.get("e"), RuntimeError)
    assert "hung" in str(queued_err["e"])
    release.set()  # unwedge; the first waiter then gets its (late) result
    t1.join(timeout=5)


# -- depth-2 pipeline (submit/collect split) ----------------------------

class FakeSplit:
    """Records the interleaving of submits and collects."""

    def __init__(self):
        self.events = []
        self.block_first_submit = threading.Event()
        self.fail_collect_for = None  # handle id to fail
        self.collect_exc = RuntimeError  # what a failing collect raises

    def submit(self, images):
        handle = (len(self.events), [f"r{i}" for i in range(len(images))])
        self.events.append(("submit", len(images)))
        if len(self.events) == 1:
            # hold the worker inside the first submit until the test has
            # queued the second batch — makes the interleaving assertion
            # deterministic
            self.block_first_submit.wait(timeout=5)
        return handle

    def collect(self, handle):
        hid, results = handle
        self.events.append(("collect", hid))
        if self.fail_collect_for == hid:
            raise self.collect_exc("device exploded")
        return results


def test_pipelined_submits_next_batch_before_collecting_previous():
    # max_batch=1: a single queued request IS a full batch, so the
    # full-batch guard allows the early submit
    fake = FakeSplit()
    b = MicroBatcher(lambda images: None, max_batch=1, window_ms=1.0,
                     predict_split=(fake.submit, fake.collect))
    results = {}

    def post(key):
        results[key] = b.submit(f"img_{key}")

    t1 = threading.Thread(target=post, args=(1,), daemon=True)
    t1.start()
    # wait until batch 1 is inside submit, then queue batch 2
    while not fake.events:
        time.sleep(0.005)
    t2 = threading.Thread(target=post, args=(2,), daemon=True)
    t2.start()
    while b.queue_depth == 0:
        time.sleep(0.005)
    fake.block_first_submit.set()
    t1.join(timeout=5)
    t2.join(timeout=5)

    kinds = [k for k, _ in fake.events]
    # batch 2's device dispatch happened BEFORE batch 1's result fetch
    assert kinds == ["submit", "submit", "collect", "collect"], fake.events
    assert results[1] == "r0" and results[2] == "r0"
    assert b.batches_run == 2 and b.images_run == 2
    b.close()


def test_pipelined_no_early_submit_below_full_batch():
    """The depth-2 overlap must NOT split arrivals: with a batch in
    flight and fewer than max_batch requests queued, the loop collects
    first (sync behavior) instead of early-submitting a fragment
    (round-4 load test: fragmenting dropped 44.8 -> 39.7 img/s)."""
    fake = FakeSplit()
    b = MicroBatcher(lambda images: None, max_batch=4, window_ms=1.0,
                     predict_split=(fake.submit, fake.collect))
    results = {}

    def post(key):
        results[key] = b.submit(f"img_{key}")

    t1 = threading.Thread(target=post, args=(1,), daemon=True)
    t1.start()
    while not fake.events:
        time.sleep(0.005)
    # one request queued (< max_batch) while batch 1 is inside submit
    t2 = threading.Thread(target=post, args=(2,), daemon=True)
    t2.start()
    while b.queue_depth == 0:
        time.sleep(0.005)
    fake.block_first_submit.set()
    t1.join(timeout=5)
    t2.join(timeout=5)

    kinds = [k for k, _ in fake.events]
    # collect(b1) happened BEFORE submit(b2): no fragmented early submit
    assert kinds == ["submit", "collect", "submit", "collect"], fake.events
    assert results[1] == "r0" and results[2] == "r0"
    b.close()


def test_pipelined_collect_error_fails_only_its_batch():
    fake = FakeSplit()
    fake.block_first_submit.set()  # don't hold anything
    fake.fail_collect_for = 0  # first submit's handle id
    b = MicroBatcher(lambda images: None, max_batch=4, window_ms=1.0,
                     predict_split=(fake.submit, fake.collect))
    with pytest.raises(RuntimeError, match="device exploded"):
        b.submit("img_a")
    # the batcher survives: the next request succeeds
    assert b.submit("img_b") == "r0"
    b.close()


def test_pipelined_shutdown_collects_inflight_batch():
    fake = FakeSplit()
    b = MicroBatcher(lambda images: None, max_batch=4, window_ms=1.0,
                     predict_split=(fake.submit, fake.collect))
    out = {}

    def post():
        out["r"] = b.submit("img")

    t = threading.Thread(target=post, daemon=True)
    t.start()
    while not fake.events:
        time.sleep(0.005)
    # batch is wedged inside submit; close() enqueues _SHUTDOWN
    closer = threading.Thread(target=b.close, daemon=True)
    closer.start()
    time.sleep(0.05)
    fake.block_first_submit.set()
    t.join(timeout=5)
    closer.join(timeout=5)
    assert out["r"] == "r0"  # the in-flight batch was still served


def test_pipelined_base_exception_fails_all_inflight_waiters(monkeypatch):
    """A BaseException (KeyboardInterrupt/SystemExit) unwinding the
    pipelined loop while TWO batches are in flight must fail BOTH
    batches' waiters — those items already left the queue, so the
    shutdown drain can't rescue them. Pre-fix, the just-submitted
    batch's clients hung until the submit timeout (forever when None)."""
    # the SystemExit deliberately kills the daemon worker thread; keep
    # pytest's thread-exception plugin from flagging the expected death
    monkeypatch.setattr(threading, "excepthook", lambda args: None)
    fake = FakeSplit()
    fake.fail_collect_for = 0  # first submit's handle id
    fake.collect_exc = SystemExit
    # max_batch=1 so the queued second request forms a full batch and
    # is early-submitted while batch 1 is in flight
    b = MicroBatcher(lambda images: None, max_batch=1, window_ms=1.0,
                     predict_split=(fake.submit, fake.collect))
    errs = {}

    def post(key):
        try:
            errs[key] = b.submit(f"img_{key}", timeout=10)
        except BaseException as e:  # noqa: BLE001 — capture for asserts
            errs[key] = e

    t1 = threading.Thread(target=post, args=(1,), daemon=True)
    t1.start()
    while not fake.events:
        time.sleep(0.005)
    # batch 1 is wedged inside submit; queue batch 2 behind it
    t2 = threading.Thread(target=post, args=(2,), daemon=True)
    t2.start()
    while b.queue_depth == 0:
        time.sleep(0.005)
    fake.block_first_submit.set()
    # pipelined order: submit(b1) -> submit(b2) -> collect(b1) raises
    # SystemExit with b2 still in flight
    t1.join(timeout=5)
    t2.join(timeout=5)
    assert not t1.is_alive(), "batch-1 waiter hung"
    assert not t2.is_alive(), "in-flight batch-2 waiter hung"
    assert isinstance(errs[1], RuntimeError)  # wrapped SystemExit
    assert isinstance(errs[2], RuntimeError)
    assert "in flight" in str(errs[2])


def test_make_server_pipeline_wiring():
    """Default stays synchronous; pipeline=True wires the split only
    when the predictor exposes it."""

    class SplitPredictor:
        class config:
            width, height = 64, 64
            labels = {"bean": 0}
            parts = {"leaf": 0}
            anchor_name = "stem"

        transform = None

        def predict_batch(self, images):
            return [None] * len(images)

        def predict_batch_submit(self, images):
            return images

        def predict_batch_collect(self, handle):
            return [None] * len(handle)

    server, batcher = make_server(SplitPredictor(), "127.0.0.1", 0)
    assert batcher._split is None
    batcher.close(); server.server_close()

    server, batcher = make_server(SplitPredictor(), "127.0.0.1", 0,
                                  pipeline=True)
    assert batcher._split is not None
    batcher.close(); server.server_close()

    class PlainPredictor:
        config = SplitPredictor.config
        transform = None

        def predict_batch(self, images):
            return [None] * len(images)

    server, batcher = make_server(PlainPredictor(), "127.0.0.1", 0,
                                  pipeline=True)
    assert batcher._split is None  # graceful sync fallback
    batcher.close(); server.server_close()


def _jpeg_bytes(w=40, h=24, seed=0):
    buf = io.BytesIO()
    rng = np.random.default_rng(seed)
    Image.fromarray(rng.integers(0, 255, (h, w, 3), np.uint8)).save(
        buf, format="JPEG"
    )
    return buf.getvalue()


def test_request_decoder_feed_signatures():
    """The three request-feed cases (serve.make_request_decoder): raw
    uint8, host-normalized float32, and raw [0,255] float32 for float
    artifacts exported with --norm (whose graph owns /255 + mean/std —
    feeding the native normalized or [0,1] decode there would
    double-normalize)."""
    from structuredetector_tpu.data import native as native_io
    from structuredetector_tpu.predictor import PreparedImage
    from structuredetector_tpu.serve import make_request_decoder

    if not native_io.available():
        pytest.skip("native IO library not built")

    class Feed:
        class config:
            width, height = 32, 32

        def __init__(self, u8, norm):
            self.feed_uint8 = u8
            self.feed_normalize = norm

    data = _jpeg_bytes()

    u8 = make_request_decoder(Feed(True, False), use_native=True)(data)
    assert isinstance(u8, PreparedImage)
    assert u8.array.dtype == np.uint8 and u8.array.shape == (32, 32, 3)
    assert u8.size == (40, 24)  # original size for annotation rescale

    norm = make_request_decoder(Feed(False, True), use_native=True)(data)
    assert norm.array.dtype == np.float32
    assert norm.array.min() < 0.0  # ImageNet-normalized, not raw/[0,1]

    raw = make_request_decoder(Feed(False, False), use_native=True)(data)
    assert raw.array.dtype == np.float32
    np.testing.assert_array_equal(raw.array, u8.array.astype(np.float32))

    # PIL fallback: a loaded RGB image, any truncation raising HERE
    pil = make_request_decoder(Feed(True, False), use_native=False)(data)
    assert isinstance(pil, Image.Image) and pil.mode == "RGB"
    with pytest.raises(Exception):
        make_request_decoder(Feed(True, False), use_native=False)(data[:20])

    # The native path honors the same 400-on-truncation guarantee —
    # both header-level and MID-SCAN truncation (libjpeg 'succeeds' on
    # the latter with a faked EOI + warning; must not serve garbage).
    native_dec = make_request_decoder(Feed(True, False), use_native=True)
    with pytest.raises(Exception):
        native_dec(data[:20])
    with pytest.raises(Exception):
        native_dec(data[: int(len(data) * 0.6)])


def test_serve_requires_v4_native_for_request_decode(monkeypatch):
    """A v3 libsdnet_io.so passes available() (file loaders work) but
    lacks decode_bytes — the server must fall back to PIL instead of
    400-ing every request against the stale build."""
    from structuredetector_tpu.data import native as native_io

    class Stub:
        class config:
            width, height = 64, 64
            labels = {"bean": 0}
            parts = {"leaf": 0}
            anchor_name = "stem"

        transform = None

        def predict_batch(self, images):
            return [None] * len(images)

    monkeypatch.setattr(native_io, "supports_decode_bytes", lambda: False)
    monkeypatch.setattr(native_io, "available", lambda: True)
    server, batcher = make_server(Stub(), "127.0.0.1", 0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=30
        ) as r:
            health = json.loads(r.read())
        assert health["model"]["native_decode"] is False
    finally:
        server.shutdown()
        batcher.close()
        server.server_close()


def test_predictor_feed_signature_properties():
    from structuredetector_tpu.config import Config
    from structuredetector_tpu.predictor import Predictor

    cfg = Config(width=32, height=32, max_objects=2, max_parts=4, fpn_depth=8,
                 use_amp=False)
    cfg.set_labels(["bean"], ["leaf"])
    on_device = Predictor(cfg)
    assert on_device.feed_uint8 and not on_device.feed_normalize
    on_host = Predictor(cfg, device_normalize=False)
    assert not on_host.feed_uint8 and on_host.feed_normalize


def test_predictor_variables_are_device_committed():
    """Weights must be jax.Arrays after init: numpy leaves re-upload on
    EVERY jit call (no host-argument caching), which measured ~1.4 s per
    serve batch over the high-latency device link (round 4)."""
    import jax

    from structuredetector_tpu.config import Config
    from structuredetector_tpu.predictor import Predictor

    cfg = Config(width=32, height=32, max_objects=2, max_parts=4, fpn_depth=8,
                 use_amp=False)
    cfg.set_labels(["bean"], ["leaf"])
    cfg.anchor_name = "stem"
    predictor = Predictor(cfg)
    leaves = jax.tree_util.tree_leaves(predictor.variables)
    assert leaves and all(isinstance(l, jax.Array) for l in leaves)


def test_resolve_auto_max_batch_thresholds():
    """128 only when transferring one more image is cheaper than
    computing it; the break-even for the defaults (0.79 MB/img,
    0.26 ms/img) sits at ~3038 MB/s."""
    from structuredetector_tpu.serve import resolve_auto_max_batch

    assert resolve_auto_max_batch(52.0) == 32       # tunneled link
    assert resolve_auto_max_batch(1400.0) == 32     # un-degraded tunnel
    assert resolve_auto_max_batch(3100.0) == 128    # real TPU VM PCIe
    assert resolve_auto_max_batch(10_000.0) == 128
    # exactly at break-even: transfer == compute, take the big batch
    breakeven = 0.79 / (0.26 / 1e3)
    assert resolve_auto_max_batch(breakeven) == 128
    assert resolve_auto_max_batch(breakeven - 1) == 32
    # scales with the per-image cost model
    assert resolve_auto_max_batch(1000.0, img_mb=0.1,
                                  device_ms_per_img=0.26) == 128


def test_resolve_pipeline_same_breakeven_as_max_batch():
    """The depth-2 pipeline engages exactly in the fast-link regime
    where --max_batch auto picks 128 (transfers overlap with compute);
    in the degraded/serialized regime it measured 2.4x worse than sync
    and must decline. Expected values are written out explicitly
    (asserting equality with resolve_auto_max_batch would restate the
    implementation and could never fail)."""
    from structuredetector_tpu.serve import resolve_pipeline

    for mbps in (13.4, 27.0, 52.0, 1400.0, 3000.0):  # measured tunnel states
        assert not resolve_pipeline(mbps)
    for mbps in (3100.0, 5000.0, 10_000.0):  # real TPU-VM-class links
        assert resolve_pipeline(mbps)


def test_probe_h2d_mbps_returns_finite_positive():
    """Probe must work on any backend (serve runs it at startup when
    --max_batch auto, the default)."""
    from structuredetector_tpu.serve import probe_h2d_mbps

    mbps = probe_h2d_mbps(size_mb=1.0)
    assert np.isfinite(mbps) and mbps > 0


@pytest.mark.slow  # compiles the full model
def test_http_server_end_to_end():
    from structuredetector_tpu.config import Config
    from structuredetector_tpu.predictor import Predictor

    cfg = Config(width=64, height=64, max_objects=4, max_parts=8, fpn_depth=32,
                 use_amp=False)
    cfg.set_labels(["bean", "maize"], ["leaf"])
    cfg.anchor_name = "stem"
    predictor = Predictor(cfg)

    server, batcher = make_server(predictor, "127.0.0.1", 0, max_batch=2,
                                  window_ms=2.0)
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=30
        ) as r:
            health = json.loads(r.read())
        assert health["status"] == "ok"
        assert health["model"]["anchors"] == ["bean", "maize"]
        assert health["model"]["width"] == 64
        assert health["queue_depth"] == 0
        assert health["latency"] == {"count": 0}  # nothing served yet

        rng = np.random.default_rng(0)
        buf = io.BytesIO()
        Image.fromarray(rng.integers(0, 255, (48, 80, 3), np.uint8)).save(
            buf, format="JPEG"
        )
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/detect", data=buf.getvalue(), method="POST"
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            ann = json.loads(r.read())
        assert ann["img_size"] == [80, 48]  # original size, not network size
        assert isinstance(ann["objects"], list)

        # bad payload -> 400, unknown route -> 404
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/detect", data=b"not an image",
            method="POST"
        )
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=30)
        assert e.value.code == 400
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(
                f"http://127.0.0.1:{port}/nope", timeout=30
            )
        assert e.value.code == 404

        # an oversized declared Content-Length is refused (413) BEFORE
        # the body is read — the memory-exhaustion guard
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/detect", data=b"tiny", method="POST",
            headers={"Content-Length": str(64 << 20)},
        )
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=30)
        assert e.value.code == 413
        # invalid Content-Length -> 400
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/detect", data=b"tiny", method="POST",
            headers={"Content-Length": "nope"},
        )
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=30)
        assert e.value.code == 400
    finally:
        server.shutdown()
        thread.join(timeout=5)
        batcher.close()
        server.server_close()
