"""Host <-> device bridge: annotations -> fixed-shape padded arrays.

The reference renders full dense targets per sample on CPU workers
(`/root/reference/src/sdnet/data/transforms.py:121-208`). Here the host
only *flattens* each annotation into tiny padded keypoint arrays; the
dense Gaussian rendering happens on-device (`ops.encode.encode_targets`)
inside the jitted train step. This removes the reference's #1 input
pipeline bottleneck (SURVEY.md §3.1 hot loops).

Selection semantics are preserved exactly (`transforms.py:157-191`):
- objects beyond `max_objects` are dropped entirely,
- parts fill a single *global* `max_parts` budget in object order and the
  budget can truncate an object's parts mid-iteration,
- coordinates are clipped to the input bounds, then scaled into the
  output grid (x * out_w / in_w).
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, List, NamedTuple, Sequence

import numpy as np

from ..annotations import ImageAnnotation, clip_annotation


class FlatKeypoints(NamedTuple):
    """Per-sample padded keypoint arrays (grid coordinates)."""

    anchors_xy: np.ndarray  # (O, 2) float32
    anchor_cls: np.ndarray  # (O,) int32
    anchor_mask: np.ndarray  # (O,) bool
    parts_xy: np.ndarray  # (P, 2) float32
    part_kind: np.ndarray  # (P,) int32
    part_owner_xy: np.ndarray  # (P, 2) float32
    part_mask: np.ndarray  # (P,) bool


def flatten_annotation(
    annotation: ImageAnnotation,
    *,
    labels: Dict[str, int],
    parts: Dict[str, int],
    max_objects: int,
    max_parts: int,
    in_size,
    out_size,
) -> FlatKeypoints:
    """Flatten one clipped annotation into padded grid-space arrays.

    `annotation` must already be in input-image space (post-resize). It is
    clipped in place like the reference (`transforms.py:154`).
    """
    in_w, in_h = in_size
    out_w, out_h = out_size
    sx, sy = out_w / in_w, out_h / in_h

    clip_annotation(annotation, (in_w, in_h))

    o, p = max_objects, max_parts
    anchors_xy = np.zeros((o, 2), np.float32)
    anchor_cls = np.zeros((o,), np.int32)
    anchor_mask = np.zeros((o,), bool)
    parts_xy = np.zeros((p, 2), np.float32)
    part_kind = np.zeros((p,), np.int32)
    part_owner_xy = np.zeros((p, 2), np.float32)
    part_mask = np.zeros((p,), bool)

    kp_idx = 0
    done = False
    for obj_idx, obj in enumerate(annotation.objects[:max_objects]):
        gx, gy = obj.x * sx, obj.y * sy
        anchors_xy[obj_idx] = (gx, gy)
        anchor_cls[obj_idx] = labels[obj.name]
        anchor_mask[obj_idx] = True

        for kp in obj.parts:
            parts_xy[kp_idx] = (kp.x * sx, kp.y * sy)
            part_kind[kp_idx] = parts[kp.kind]
            part_owner_xy[kp_idx] = (gx, gy)
            part_mask[kp_idx] = True
            kp_idx += 1
            if kp_idx == max_parts:
                done = True
                break
        if done:
            break

    return FlatKeypoints(
        anchors_xy, anchor_cls, anchor_mask, parts_xy, part_kind, part_owner_xy, part_mask
    )


def collate(samples: Sequence[dict]) -> dict:
    """Stack per-sample dicts (image + FlatKeypoints + annotation) into a
    batch dict of numpy arrays; 'annotation' stays a Python list (like
    the reference collate_fn, dataset.py:57-87)."""
    batch: dict = {}
    first = samples[0]
    for key, value in first.items():
        if key == "annotation":
            batch[key] = [s[key] for s in samples]
        elif isinstance(value, FlatKeypoints):
            batch[key] = FlatKeypoints(
                *(np.stack([getattr(s[key], f) for s in samples]) for f in value._fields)
            )
        else:
            batch[key] = np.stack([s[key] for s in samples])
    return batch


class Loader:
    """Batching iterator with a real worker pool.

    Replaces torch DataLoader (reference trainer.py:62-87). `dataset`
    must be indexable; transform applied in `dataset.__getitem__`.

    Two loading strategies:
    - per-sample (default): with `num_workers > 0`, every sample load is
      a task on a `num_workers`-thread pool (JPEG decode in PIL and the
      numpy work release the GIL); up to `prefetch_batches` batches of
      sample futures stay in flight, and batches are yielded strictly in
      index order.
    - whole-batch (`batch_fetch`): a callable `(indices) -> batch dict`
      that fabricates the entire batch at once — the hook for the native
      C++ loader (`data.native.load_batch`), which decodes and resizes a
      full batch on its own no-GIL thread pool into one contiguous
      buffer. Batches are staged ahead on a single coordinator thread
      (the parallelism lives inside the native call).
    """

    def __init__(
        self,
        dataset,
        batch_size: int = 1,
        shuffle: bool = False,
        drop_last: bool = False,
        num_workers: int = 0,
        seed: int = 0,
        collate_fn=collate,
        batch_fetch=None,
        prefetch_batches: int = 4,
        process_index: int = 0,
        process_count: int = 1,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.collate_fn = collate_fn
        self.batch_fetch = batch_fetch
        self.prefetch_batches = max(1, prefetch_batches)
        # multi-host: batch_size is the GLOBAL batch; this process loads
        # its contiguous slice of every global batch (parallel.multihost)
        self.process_index = process_index
        self.process_count = max(1, process_count)
        if self.process_count > 1:
            assert batch_size % self.process_count == 0, (
                f"global batch {batch_size} must divide by "
                f"process_count {process_count}"
            )
        self.seed = seed
        self._epoch = 0

    def set_epoch(self, epoch: int):
        """Pin the shuffle order to (seed, epoch) statelessly, so a
        resumed run replays the exact batch sequence of the unbroken run
        (the epoch is restored from the checkpointed step count; no RNG
        state needs checkpointing). The trainer calls this every epoch."""
        self._epoch = int(epoch)

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _index_batches(self) -> List[List[int]]:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            # identically seeded on every process -> same global order;
            # keyed on (seed, epoch) so the order is a pure function of
            # the epoch (exact data-order resume, see set_epoch)
            np.random.default_rng((self.seed, self._epoch)).shuffle(order)
        batches = [
            list(order[i : i + self.batch_size])
            for i in range(0, len(order), self.batch_size)
        ]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]
        if self.process_count > 1:
            from ..parallel.multihost import process_slice

            batches = [
                local
                for b in batches
                if (local := process_slice(b, self.process_index, self.process_count))
                is not None
            ]
        return batches

    def __iter__(self):
        batches = self._index_batches()
        if self.batch_fetch is not None:
            yield from self._iter_batch_fetch(batches)
        elif self.num_workers <= 0:
            for idxs in batches:
                yield self.collate_fn([self.dataset[i] for i in idxs])
        else:
            yield from self._iter_pool(batches)

    def _iter_pool(self, batches):
        """Per-sample loads fanned out over a thread pool, ordered
        batch assembly, bounded look-ahead."""
        import collections
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            inflight: "collections.deque" = collections.deque()
            it = iter(batches)

            def stage_next():
                idxs = next(it, None)
                if idxs is not None:
                    inflight.append([pool.submit(self.dataset.__getitem__, i) for i in idxs])

            for _ in range(self.prefetch_batches):
                stage_next()
            while inflight:
                futures = inflight.popleft()
                samples = [f.result() for f in futures]
                stage_next()
                yield self.collate_fn(samples)

    def _iter_batch_fetch(self, batches):
        """Whole-batch fabrication staged ahead on a coordinator thread;
        the heavy lifting parallelizes inside `batch_fetch` itself."""
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch_batches)
        stop = object()

        def producer():
            try:
                for idxs in batches:
                    q.put(self.batch_fetch(idxs))
            except BaseException as e:  # surface errors on the consumer
                q.put(e)
            finally:
                q.put(stop)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
        t.join()


def native_batch_fetch(dataset, transform, n_threads: int = 4):
    """Build a `Loader(batch_fetch=...)` callable backed by the native
    C++ batch loader: annotations are parsed on the coordinator thread
    (no image decode), then one `native.load_batch` call fills the whole
    NHWC image buffer with `n_threads` C++ threads outside the GIL."""

    def fetch(indices):
        pairs = [dataset.raw_item(i) for i in indices]
        return transform.native_batch_apply(
            [p for p, _ in pairs], [t for _, t in pairs], n_threads=n_threads
        )

    return fetch


def choose_batch_fetch(config, dataset, transform):
    """The Loader's whole-batch native path when the config asks for it,
    the library is built, and the transform mode supports it; else None
    (per-sample PIL path)."""
    if not getattr(config, "native_io", False):
        return None
    from . import native

    if not native.available():
        return None
    supports = getattr(transform, "supports_native_batch", None)
    if supports is None or not supports():
        return None
    return native_batch_fetch(
        dataset, transform, n_threads=max(2, config.num_workers or 4)
    )


def device_prefetch(iterator, size: int = 2):
    """Overlap host batch preparation with device compute: stage up to
    `size` batches ahead with async `jax.device_put` of the array
    fields. The reference relies on torch DataLoader prefetch_factor
    (trainer.py:62-87); this is the JAX analog — transfers are async, so
    staging N+1 happens while the device runs step N."""
    import collections

    import jax.numpy as jnp

    def to_device(batch):
        out = {}
        for k, v in batch.items():
            if k == "annotation":
                out[k] = v
            elif isinstance(v, FlatKeypoints):
                out[k] = FlatKeypoints(*(jnp.asarray(f) for f in v))
            else:
                out[k] = jnp.asarray(v)
        return out

    queue_: "collections.deque" = collections.deque()
    for batch in iterator:
        queue_.append(to_device(batch))
        if len(queue_) >= size:
            yield queue_.popleft()
    while queue_:
        yield queue_.popleft()
