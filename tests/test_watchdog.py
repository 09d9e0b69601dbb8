"""StallWatchdog: the wedged-device-RPC detector (train/trainer.py).

Fast, deterministic tests via the `on_fire` seam — the real path calls
os._exit(87), which the subprocess integration test in test_train.py
covers.
"""

import time

import pytest

from structuredetector_tpu.train.trainer import STALL_EXIT_CODE, StallWatchdog


def test_fires_after_timeout():
    fired = []
    w = StallWatchdog(0.15, on_fire=fired.append).start()
    deadline = time.monotonic() + 5
    while not fired and time.monotonic() < deadline:
        time.sleep(0.02)
    w.stop()
    assert fired and fired[0] > 0.15


def test_beat_defers_firing():
    fired = []
    w = StallWatchdog(0.4, on_fire=fired.append).start()
    for _ in range(8):
        time.sleep(0.1)
        w.beat()
    assert not fired, "beats within the timeout must keep it quiet"
    w.stop()
    time.sleep(0.3)
    assert not fired, "stop() must silence it even once idle"


def test_stop_prevents_firing():
    fired = []
    w = StallWatchdog(0.2, on_fire=fired.append).start()
    w.stop()
    time.sleep(0.5)
    assert not fired


def test_rejects_nonpositive_timeout():
    with pytest.raises(ValueError):
        StallWatchdog(0.0)


def test_exit_code_is_stable_contract():
    # tools/train_supervised.sh keys off this value
    assert STALL_EXIT_CODE == 87


# -- embedding-plateau warning (round-4 grouping failure detector) -------

def test_embedding_plateau_detected():
    from structuredetector_tpu.train.trainer import embedding_plateau_warning

    first = {"hm_loss": 750.0, "embedding_loss": 0.024}
    stuck = {"hm_loss": 5.0, "embedding_loss": 0.0235}
    msg = embedding_plateau_warning(first, stuck)
    assert msg is not None and "--embedding_weight" in msg


def test_embedding_plateau_healthy_run_silent():
    from structuredetector_tpu.train.trainer import embedding_plateau_warning

    first = {"hm_loss": 750.0, "embedding_loss": 24.0}
    healthy = {"hm_loss": 5.0, "embedding_loss": 1.7}
    assert embedding_plateau_warning(first, healthy) is None


def test_embedding_plateau_not_applicable():
    from structuredetector_tpu.train.trainer import embedding_plateau_warning

    # embedding_weight 0 / no parts: loss identically 0, never warn
    assert embedding_plateau_warning(
        {"hm_loss": 10.0, "embedding_loss": 0.0},
        {"hm_loss": 1.0, "embedding_loss": 0.0},
    ) is None
    # heatmap loss still high: too early to judge
    assert embedding_plateau_warning(
        {"hm_loss": 10.0, "embedding_loss": 1.0},
        {"hm_loss": 9.0, "embedding_loss": 1.0},
    ) is None
