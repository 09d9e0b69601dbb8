"""Host flattening, collate, loader (data.pipeline)."""

import numpy as np
import pytest

from structuredetector_tpu.annotations import ImageAnnotation, Keypoint, Object
from structuredetector_tpu.data.pipeline import (
    FlatKeypoints,
    Loader,
    collate,
    flatten_annotation,
)


def make_ann(n_objs=2, parts_per_obj=2):
    objs = []
    for i in range(n_objs):
        anchor = Keypoint("stem", 10.0 * (i + 1), 20.0 * (i + 1))
        parts = [
            Keypoint("leaf", 10.0 * (i + 1) + j + 1, 20.0 * (i + 1) + j)
            for j in range(parts_per_obj)
        ]
        objs.append(Object("bean", anchor, parts))
    return ImageAnnotation("x.jpg", objs, (100, 80))


LABELS = {"bean": 0, "maize": 1}
PARTS = {"leaf": 0}


def flat(ann, max_objects=4, max_parts=8, in_size=(100, 80), out_size=(25, 20)):
    return flatten_annotation(
        ann, labels=LABELS, parts=PARTS, max_objects=max_objects,
        max_parts=max_parts, in_size=in_size, out_size=out_size,
    )


def test_flatten_grid_scaling():
    kp = flat(make_ann(1, 1))
    # anchor (10, 20) in 100x80 -> grid 25x20: (2.5, 5.0)
    np.testing.assert_allclose(kp.anchors_xy[0], [2.5, 5.0])
    assert kp.anchor_cls[0] == 0
    assert kp.anchor_mask[0] and not kp.anchor_mask[1]
    # part (11, 20) -> (2.75, 5.0); owner = anchor grid coords
    np.testing.assert_allclose(kp.parts_xy[0], [2.75, 5.0])
    np.testing.assert_allclose(kp.part_owner_xy[0], [2.5, 5.0])


def test_flatten_clips_before_scaling():
    ann = make_ann(1, 0)
    ann.objects[0].x = 150.0  # beyond width
    kp = flat(ann)
    # clipped to 99 -> grid 99 * 25/100 = 24.75
    np.testing.assert_allclose(kp.anchors_xy[0, 0], 24.75)


def test_flatten_object_budget():
    kp = flat(make_ann(6, 0), max_objects=4)
    assert kp.anchor_mask.sum() == 4


def test_flatten_global_part_budget_truncates_mid_object():
    """The reference's global max_parts budget stops mid-object
    (transforms.py:186-191): 3 objects x 3 parts with budget 4 keeps
    obj0's 3 parts + obj1's first part, and obj2 is dropped entirely —
    including its anchor (the outer loop breaks, transforms.py:190-191)."""
    kp = flat(make_ann(3, 3), max_parts=4)
    assert kp.part_mask.sum() == 4
    assert kp.anchor_mask.sum() == 2  # obj2's anchor is dropped too
    # 4th part belongs to object 1
    np.testing.assert_allclose(kp.part_owner_xy[3], kp.anchors_xy[1])


def test_collate_stacks_and_keeps_annotations():
    samples = []
    for i in range(3):
        ann = make_ann(1, 1)
        samples.append({
            "image": np.zeros((16, 16, 3), np.float32) + i,
            "keypoints": flat(ann),
            "annotation": ann,
        })
    batch = collate(samples)
    assert batch["image"].shape == (3, 16, 16, 3)
    assert isinstance(batch["keypoints"], FlatKeypoints)
    assert batch["keypoints"].anchors_xy.shape == (3, 4, 2)
    assert len(batch["annotation"]) == 3
    assert batch["annotation"][0] is samples[0]["annotation"]


class _ToyDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"image": np.full((2, 2, 3), i, np.float32),
                "keypoints": flat(make_ann(1, 0)), "annotation": make_ann(1, 0)}


def test_loader_batching_drop_last():
    loader = Loader(_ToyDataset(10), batch_size=4, drop_last=True)
    batches = list(loader)
    assert len(batches) == 2 == len(loader)
    assert all(b["image"].shape[0] == 4 for b in batches)


def test_loader_keeps_remainder_without_drop():
    loader = Loader(_ToyDataset(10), batch_size=4)
    batches = list(loader)
    assert len(batches) == 3
    assert batches[-1]["image"].shape[0] == 2


def test_loader_shuffle_deterministic_by_seed():
    a = [b["image"][0, 0, 0, 0] for b in Loader(_ToyDataset(8), 1, shuffle=True, seed=7)]
    b = [b["image"][0, 0, 0, 0] for b in Loader(_ToyDataset(8), 1, shuffle=True, seed=7)]
    c = [b["image"][0, 0, 0, 0] for b in Loader(_ToyDataset(8), 1, shuffle=True, seed=8)]
    assert a == b
    assert a != c


def test_loader_prefetch_threads():
    loader = Loader(_ToyDataset(9), batch_size=2, num_workers=2)
    vals = sorted(float(b["image"][0, 0, 0, 0]) for b in loader)
    assert len(vals) == 5


def test_loader_pool_preserves_batch_order():
    """Worker-pool loading must yield batches in index order even when
    sample load times are adversarial."""
    import time

    class _SlowFirst(_ToyDataset):
        def __getitem__(self, i):
            if i == 0:
                time.sleep(0.05)  # first sample finishes last
            return super().__getitem__(i)

    loader = Loader(_SlowFirst(8), batch_size=2, num_workers=4)
    vals = [float(b["image"][0, 0, 0, 0]) for b in loader]
    assert vals == [0.0, 2.0, 4.0, 6.0]


def test_loader_pool_uses_multiple_workers():
    """num_workers loads really run concurrently (the round-1
    implementation ran everything on one producer thread)."""
    import threading
    import time

    seen = set()
    barrier = threading.Barrier(3, timeout=5)

    class _Blocking(_ToyDataset):
        def __getitem__(self, i):
            seen.add(threading.get_ident())
            if i < 3:
                barrier.wait()  # deadlocks unless 3 loads run in parallel
            return super().__getitem__(i)

    loader = Loader(_Blocking(6), batch_size=3, num_workers=3)
    t0 = time.monotonic()
    list(loader)
    assert time.monotonic() - t0 < 5
    assert len(seen) >= 2


def test_loader_pool_propagates_errors():
    class _Boom(_ToyDataset):
        def __getitem__(self, i):
            if i == 3:
                raise RuntimeError("bad sample")
            return super().__getitem__(i)

    with pytest.raises(RuntimeError, match="bad sample"):
        list(Loader(_Boom(6), batch_size=2, num_workers=2))


def test_loader_batch_fetch_path():
    calls = []

    def fetch(idxs):
        calls.append(list(idxs))
        return {"image": np.full((len(idxs), 2, 2, 3), idxs[0], np.float32)}

    loader = Loader(_ToyDataset(6), batch_size=2, batch_fetch=fetch)
    batches = list(loader)
    assert calls == [[0, 1], [2, 3], [4, 5]]
    assert [float(b["image"][0, 0, 0, 0]) for b in batches] == [0.0, 2.0, 4.0]


def test_loader_batch_fetch_propagates_errors():
    def fetch(idxs):
        raise IOError("decode failed")

    with pytest.raises(IOError, match="decode failed"):
        list(Loader(_ToyDataset(4), batch_size=2, batch_fetch=fetch))


def test_loader_epoch_order_is_stateless():
    """Exact data-order resume: the shuffle order at epoch N is a pure
    function of (seed, N) — a resumed loader replays the unbroken run's
    indices without any RNG checkpointing."""
    ds = _ToyDataset(17)
    a = Loader(ds, batch_size=4, shuffle=True, seed=7)
    b = Loader(ds, batch_size=4, shuffle=True, seed=7)

    # unbroken run: epochs 0..3
    unbroken = {}
    for e in range(4):
        a.set_epoch(e)
        unbroken[e] = a._index_batches()

    # "resumed" run jumps straight to epoch 3
    b.set_epoch(3)
    assert b._index_batches() == unbroken[3]
    # and different epochs actually differ
    assert unbroken[0] != unbroken[1]


def test_multiscale_schedule_is_stateless(tiny_config):
    """Resolution schedule replays under resume: roll for epoch N is a
    pure function of (seed, N)."""
    from structuredetector_tpu.data.augment import TrainAugmentation

    a = TrainAugmentation(tiny_config)
    sched = []
    for e in range(1, 8):
        a.trigger_random_resize(e)
        sched.append(a.current_size)

    b = TrainAugmentation(tiny_config)  # fresh instance = resumed process
    b.trigger_random_resize(4)
    assert b.current_size == sched[3]
    assert len(set(sched)) > 1  # the schedule does vary
