"""Training machinery: schedule, state, steps, checkpoints, overfit smoke."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from structuredetector_tpu.config import Config
from structuredetector_tpu.models import init_model
from structuredetector_tpu.train.checkpoints import BestModelSaver, CheckpointManager
from structuredetector_tpu.train.state import (
    create_train_state,
    make_lr_schedule,
    make_optimizer,
)
from structuredetector_tpu.train.steps import make_eval_step, make_train_step

pytestmark = pytest.mark.slow  # compile-heavy: jitted train steps


def make_config(**kw):
    kw = {"width": 32, "height": 32, "max_objects": 2, "max_parts": 4,
          "fpn_depth": 16, "batch_size": 2, "use_amp": False, "epochs": 9,
          "lr_step": 3, "learning_rate": 1e-3}.copy() | kw
    cfg = Config(**kw)
    cfg.set_labels(["bean"], ["leaf"])
    return cfg


def test_lr_schedule_steplr_semantics():
    """StepLR(step=epochs//lr_step, gamma=0.1): /10 at epochs 3 and 6
    (reference trainer.py:54-56, args.py:213-215)."""
    cfg = make_config()
    sched = make_lr_schedule(cfg, steps_per_epoch=10)
    assert float(sched(0)) == pytest.approx(1e-3)
    assert float(sched(29)) == pytest.approx(1e-3)
    assert float(sched(30)) == pytest.approx(1e-4)
    assert float(sched(60)) == pytest.approx(1e-5, rel=1e-4)


def test_lr_step_zero_disables_decay():
    cfg = make_config(lr_step=0)
    sched = make_lr_schedule(cfg, steps_per_epoch=10)
    assert float(sched(80)) == pytest.approx(1e-3)


def test_lr_step_exceeding_epochs_is_constant():
    """epochs < lr_step -> step size 0 -> constant LR (must not hang)."""
    cfg = make_config(epochs=2, lr_step=3)
    sched = make_lr_schedule(cfg, steps_per_epoch=3)
    assert float(sched(5)) == pytest.approx(1e-3)


def _batch(cfg, b=2, seed=0):
    rng = np.random.default_rng(seed)
    o, p = cfg.max_objects, cfg.max_parts
    g = cfg.grid_size()[0]
    kp = {
        "anchors_xy": jnp.asarray(rng.uniform(1, g - 1, (b, o, 2)), jnp.float32),
        "anchor_cls": jnp.zeros((b, o), jnp.int32),
        "anchor_mask": jnp.ones((b, o), bool),
        "parts_xy": jnp.asarray(rng.uniform(1, g - 1, (b, p, 2)), jnp.float32),
        "part_kind": jnp.zeros((b, p), jnp.int32),
        "part_owner_xy": jnp.asarray(rng.uniform(1, g - 1, (b, p, 2)), jnp.float32),
        "part_mask": jnp.ones((b, p), bool),
    }
    images = jnp.asarray(rng.normal(0, 1, (b, cfg.height, cfg.width, 3)), jnp.float32)
    return images, kp


def test_overfit_smoke():
    """A few steps on one fixed batch must reduce the loss (SURVEY.md §4
    overfit smoke test)."""
    cfg = make_config(learning_rate=1e-3, hm_loss_fn="mse")
    model, variables = init_model(cfg)
    opt = make_optimizer(cfg, steps_per_epoch=1000)
    state = create_train_state(cfg, variables, opt)
    step = make_train_step(model, cfg, opt, out_h=8, out_w=8, donate=False)

    images, kp = _batch(cfg)
    losses = []
    for _ in range(20):
        state, stats = step(state, images, kp)
        losses.append(float(stats["total_loss"]))
    assert losses[-1] < losses[0] * 0.7, losses
    assert int(state.step) == 20


def test_train_step_updates_batch_stats():
    cfg = make_config()
    model, variables = init_model(cfg)
    opt = make_optimizer(cfg, 10)
    state = create_train_state(cfg, variables, opt)
    step = make_train_step(model, cfg, opt, out_h=8, out_w=8, donate=False)
    images, kp = _batch(cfg)
    new_state, _ = step(state, images, kp)
    old = np.asarray(state.batch_stats["encoder"]["bn1"]["mean"])
    new = np.asarray(new_state.batch_stats["encoder"]["bn1"]["mean"])
    assert not np.allclose(old, new)


def test_eval_step_returns_outputs_and_stats():
    cfg = make_config()
    model, variables = init_model(cfg)
    eval_step = make_eval_step(model, cfg, out_h=8, out_w=8)
    images, kp = _batch(cfg)
    outputs, stats, gt_maps = eval_step(variables, images, kp)
    assert outputs["anchor_hm"].shape == (2, 8, 8, 1)
    assert gt_maps["anchor_hm"].shape == (2, 8, 8, 1)
    assert np.isfinite(float(stats["total_loss"]))


def test_checkpoint_roundtrip(tmp_path):
    cfg = make_config()
    model, variables = init_model(cfg)
    opt = make_optimizer(cfg, 10)
    state = create_train_state(cfg, variables, opt)

    mgr = CheckpointManager(tmp_path / "ckpt")
    mgr.save_state(5, jax.device_get(state))
    mgr.wait()
    assert mgr.latest_step() == 5
    restored = mgr.restore_state(jax.device_get(state))
    np.testing.assert_allclose(
        np.asarray(restored.params["head"]["bias"]),
        np.asarray(state.params["head"]["bias"]),
    )
    assert int(restored.step) == 0
    mgr.close()


def test_best_model_saver(tmp_path):
    cfg = make_config()
    _, variables = init_model(cfg)
    saver = BestModelSaver(tmp_path)
    saved = saver.update(variables, loss=1.0, csi_f1=0.5, classif_f1=0.2, kp_f1=0.7)
    assert set(saved) == {"loss", "csi", "classif", "kp_reg"}
    assert (tmp_path / "model_best_loss.msgpack").exists()
    # worse values -> nothing saved
    saved = saver.update(variables, loss=2.0, csi_f1=0.4, classif_f1=0.1, kp_f1=0.6)
    assert saved == []
    # partial improvement
    saved = saver.update(variables, loss=0.5, csi_f1=0.4, classif_f1=0.9, kp_f1=0.6)
    assert set(saved) == {"loss", "classif"}


def test_best_model_saver_survives_resume(tmp_path):
    """A resumed run (same trainings dir) must not restart best metrics
    at 0.0 — its first, typically-worse validation would overwrite every
    model_best_* snapshot captured before the preemption."""
    cfg = make_config()
    _, variables = init_model(cfg)
    saver = BestModelSaver(tmp_path)
    saver.update(variables, loss=1.0, csi_f1=0.8, classif_f1=0.6, kp_f1=0.9,
                 epoch=20)
    best_bytes = (tmp_path / "model_best_csi.msgpack").read_bytes()

    resumed = BestModelSaver(tmp_path)  # fresh object, same dir
    assert resumed.best_csi == 0.8 and resumed.best_loss == 1.0
    assert resumed.captured_epoch["csi"] == 20
    # a worse post-resume validation must NOT overwrite the snapshots
    saved = resumed.update(variables, loss=1.5, csi_f1=0.55, classif_f1=0.3,
                           kp_f1=0.7, epoch=21)
    assert saved == []
    assert (tmp_path / "model_best_csi.msgpack").read_bytes() == best_bytes
    # corrupt state file degrades to fresh tracking, not a crash
    (tmp_path / "best_metrics.json").write_text("{not json")
    fresh = BestModelSaver(tmp_path)
    assert fresh.best_csi == 0.0


def test_train_step_with_device_augment():
    """Regression: augmented step must trace cleanly (the device_augment
    module used to be imported inside the trace, leaking its constants
    as tracers)."""
    cfg = make_config()
    model, variables = init_model(cfg)
    opt = make_optimizer(cfg, 10)
    state = create_train_state(cfg, variables, opt)
    step = make_train_step(model, cfg, opt, out_h=8, out_w=8, donate=False,
                           augment=True)
    images, kp = _batch(cfg)
    images = (images - images.min()) / (images.max() - images.min())  # [0,1]
    s2, stats = step(state, images, kp)
    assert np.isfinite(float(stats["total_loss"]))
    # different steps draw different augmentations -> different losses
    s3, stats3 = step(s2, images, kp)
    assert float(stats3["total_loss"]) != float(stats["total_loss"])


def test_train_step_uint8_feed_bit_identical_bf16():
    """The uint8 feed (raw pixels + on-device /255) must reproduce the
    float32 [0,1] feed exactly in the flagship bf16 mode: XLA compiles
    /255 as multiply-by-reciprocal (1-ulp f32 differences on ~half the
    levels), but every u8 level rounds to the same bf16 either way, so
    after the compute-dtype cast the two feeds are bit-identical."""
    cfg = make_config(use_amp=True)
    model, variables = init_model(cfg)
    opt = make_optimizer(cfg, 10)
    state = create_train_state(cfg, variables, opt)
    step = make_train_step(model, cfg, opt, out_h=8, out_w=8, donate=False,
                           augment=True)
    _, kp = _batch(cfg)
    rng = np.random.default_rng(7)
    u8 = rng.integers(0, 256, (2, cfg.height, cfg.width, 3), np.uint8)
    f32 = u8.astype(np.float32) / 255.0

    s_u8, stats_u8 = step(state, jnp.asarray(u8), kp)
    s_f, stats_f = step(state, jnp.asarray(f32), kp)
    assert float(stats_u8["total_loss"]) == float(stats_f["total_loss"])
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        s_u8.params, s_f.params,
    )


def test_train_step_uint8_feed_close_fp32():
    """In fp32 (no-amp) mode the reciprocal-multiply rewrite leaves
    1-ulp input differences that train-mode BatchNorm amplifies — the
    step must still agree to float noise, not diverge."""
    cfg = make_config()
    model, variables = init_model(cfg)
    opt = make_optimizer(cfg, 10)
    state = create_train_state(cfg, variables, opt)
    step = make_train_step(model, cfg, opt, out_h=8, out_w=8, donate=False,
                           augment=True)
    _, kp = _batch(cfg)
    rng = np.random.default_rng(7)
    u8 = rng.integers(0, 256, (2, cfg.height, cfg.width, 3), np.uint8)
    f32 = u8.astype(np.float32) / 255.0

    _, stats_u8 = step(state, jnp.asarray(u8), kp)
    _, stats_f = step(state, jnp.asarray(f32), kp)
    np.testing.assert_allclose(
        float(stats_u8["total_loss"]), float(stats_f["total_loss"]), rtol=1e-3)


def test_malloc_trim_returns_heap():
    """The opt-in epoch hook: on glibc (this CI) the call must succeed;
    elsewhere it degrades to False, never raises."""
    from structuredetector_tpu.train.trainer import malloc_trim

    assert malloc_trim() in (True, False)
    import platform

    if platform.system() == "Linux":
        assert malloc_trim() is True


def test_stall_watchdog_aborts_wedged_trainer(tmp_path):
    """Integration: a trainer whose epoch never completes a step is
    killed by the watchdog with the supervisor-visible exit code 87."""
    import subprocess
    import sys
    import textwrap

    script = textwrap.dedent("""
        import time
        from structuredetector_tpu.train import trainer as trainer_mod

        class FakeTrainer:
            pass

        # drive train()'s watchdog wiring without a real model: reuse the
        # real method objects on a minimal stand-in
        t = FakeTrainer.__new__(FakeTrainer)
        t._watchdog = None
        wd = trainer_mod.StallWatchdog(0.3).start()
        t._watchdog = wd
        time.sleep(30)   # 'wedged RPC': never beats
        print('not reached')
    """)
    proc = subprocess.run([sys.executable, "-c", script], timeout=60,
                          capture_output=True, text=True)
    assert proc.returncode == 87, proc.stderr
    assert "stall-watchdog" in proc.stderr
    assert "not reached" not in proc.stdout


def test_ema_update_math():
    """The trainer's jitted EMA op is e*d + p*(1-d), donated in place."""
    from structuredetector_tpu.train.trainer import Trainer  # noqa: F401

    decay = 0.9
    update = jax.jit(
        lambda ema, p: jax.tree.map(
            lambda e, q: e * decay + q * (1.0 - decay), ema, p),
        donate_argnums=0,
    )
    ema = {"w": jnp.ones((4,)), "b": jnp.zeros((2,))}
    params = {"w": jnp.full((4,), 2.0), "b": jnp.full((2,), 10.0)}
    out = update(ema, params)
    np.testing.assert_allclose(np.asarray(out["w"]), 1.0 * 0.9 + 2.0 * 0.1)
    np.testing.assert_allclose(np.asarray(out["b"]), 10.0 * 0.1)


def test_config_ema_validation():
    cfg = Config(width=32, height=32, ema=1.0)
    cfg.set_labels(["a"], ["p"])
    with pytest.raises(AssertionError):
        cfg.validate()


def test_best_model_saver_staleness(tmp_path):
    """Capture-age tracking: a best snapshot frozen early is flagged
    STALE in the end-of-run report (round-3 verdict weak #6)."""
    import numpy as np

    from structuredetector_tpu.train.checkpoints import BestModelSaver

    v = {"params": {"w": np.zeros(2, np.float32)}}
    s = BestModelSaver(tmp_path)
    assert set(s.update(v, loss=1.0, csi_f1=0.1, classif_f1=0.1, kp_f1=0.1,
                        epoch=2)) == {"loss", "csi", "classif", "kp_reg"}
    # only kp improves later; classif/csi freeze at epoch 2
    s.update(v, loss=2.0, csi_f1=0.05, classif_f1=0.05, kp_f1=0.9, epoch=40)
    report = s.staleness_report(final_epoch=40)
    stale = [l for l in report if "STALE" in l]
    assert any("model_best_classif" in l for l in stale)
    assert any("model_best_csi" in l for l in stale)
    assert not any("model_best_kp_reg" in l for l in stale)
