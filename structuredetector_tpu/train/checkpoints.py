"""Checkpointing: full train-state resume + 4-best model policy.

Two tiers (SURVEY.md §5):
- **Full state** via Orbax `CheckpointManager` (async-capable): params,
  BN stats, optimizer state, step — enabling exact resume. The reference
  never saves optimizer/scheduler state (trainer.py / network.py:86-87);
  this closes that gap.
- **Best models** as msgpack variable snapshots, reproducing the
  reference's 4 conditional checkpoints per validation
  (`trainer.py:226-237`): model_best_loss / model_best_csi /
  model_best_classif / model_best_kp_reg.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from ..models.network import save_params


class CheckpointManager:
    def __init__(self, directory, max_to_keep: int = 2):
        self.directory = Path(directory).resolve()
        self.directory.mkdir(parents=True, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory / "state",
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, enable_async_checkpointing=True
            ),
        )

    def save_state(self, step: int, state) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore_state(self, state_like, step: Optional[int] = None):
        """Restore into the structure of `state_like` (a concrete or
        abstract TrainState)."""
        step = step if step is not None else self.latest_step()
        if step is None:
            return None
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, state_like)
        return self._mgr.restore(step, args=ocp.args.StandardRestore(abstract))

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()


class BestModelSaver:
    """Track best loss / CSI / classif / kp-F1 and snapshot variables.

    The best metrics are persisted to `best_metrics.json` next to the
    snapshots and reloaded on construction: a resumed run (`--resume`
    points at the same trainings/<ts> dir) must NOT restart from
    best_*=0.0 — its first validation would otherwise unconditionally
    overwrite every model_best_*.msgpack with whatever it scores,
    silently discarding strictly better pre-preemption snapshots."""

    _STATE_FILE = "best_metrics.json"

    def __init__(self, save_dir):
        self.save_dir = Path(save_dir)
        self.save_dir.mkdir(parents=True, exist_ok=True)
        self.best_loss = float("inf")
        self.best_csi = 0.0
        self.best_classif = 0.0
        self.best_kp_reg = 0.0
        # epoch each snapshot was captured at (-1 = never): the
        # reference's conditional policy can freeze a "best" checkpoint
        # at epoch 2 and say nothing (a metric that ticks once early and
        # flatlines); staleness() makes that visible at the end of a run
        self.captured_epoch = {k: -1 for k in ("loss", "csi", "classif", "kp_reg")}
        self._load()

    def _load(self):
        path = self.save_dir / self._STATE_FILE
        if not path.exists():
            return
        try:
            data = json.loads(path.read_text())
        except (OSError, json.JSONDecodeError):
            return  # corrupt/partial file: fall back to fresh tracking
        self.best_loss = float(data.get("best_loss", self.best_loss))
        self.best_csi = float(data.get("best_csi", self.best_csi))
        self.best_classif = float(data.get("best_classif", self.best_classif))
        self.best_kp_reg = float(data.get("best_kp_reg", self.best_kp_reg))
        for k, e in data.get("captured_epoch", {}).items():
            if k in self.captured_epoch:
                self.captured_epoch[k] = int(e)

    def _persist(self):
        path = self.save_dir / self._STATE_FILE
        tmp = path.with_suffix(".json.tmp")
        tmp.write_text(json.dumps({
            "best_loss": self.best_loss,
            "best_csi": self.best_csi,
            "best_classif": self.best_classif,
            "best_kp_reg": self.best_kp_reg,
            "captured_epoch": self.captured_epoch,
        }))
        os.replace(tmp, path)  # atomic vs preemption mid-write

    def update(self, variables: Any, *, loss: float, csi_f1: float,
               classif_f1: float, kp_f1: float, epoch: int = -1) -> list:
        saved = []
        if loss < self.best_loss:
            self.best_loss = loss
            save_params(variables, self.save_dir / "model_best_loss.msgpack")
            saved.append("loss")
        if csi_f1 > self.best_csi:
            self.best_csi = csi_f1
            save_params(variables, self.save_dir / "model_best_csi.msgpack")
            saved.append("csi")
        if classif_f1 > self.best_classif:
            self.best_classif = classif_f1
            save_params(variables, self.save_dir / "model_best_classif.msgpack")
            saved.append("classif")
        if kp_f1 > self.best_kp_reg:
            self.best_kp_reg = kp_f1
            save_params(variables, self.save_dir / "model_best_kp_reg.msgpack")
            saved.append("kp_reg")
        for k in saved:
            self.captured_epoch[k] = epoch
        if saved:
            self._persist()
        return saved

    def staleness_report(self, final_epoch: int, stale_after: int = 10) -> list:
        """Human-readable capture ages; entries more than `stale_after`
        epochs older than the run's end are flagged STALE."""
        lines = []
        for k, e in self.captured_epoch.items():
            if e < 0:
                continue
            age = final_epoch - e
            flag = "  <-- STALE: metric froze early, prefer another snapshot" \
                if age > stale_after else ""
            lines.append(
                f"model_best_{k}.msgpack: captured at epoch {e} "
                f"({age} epochs before the end){flag}"
            )
        return lines
