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
