"""Training orchestrator.

Mirrors the reference `Trainer` (`/root/reference/src/sdnet/model/trainer.py:23-309`):
owns the model, loss, decoder, evaluator, TensorBoard writer, optimizer
with StepLR-equivalent schedule, train/valid loaders; validates every 2
epochs; tracks 4 "best" checkpoints; logs loss scalars per step, metric
groups and debug images per validation; re-rolls the multi-scale input
size each epoch (`trainer.py:135`).

TPU-first differences:
- the hot loop is one donated jitted device program per resolution
  bucket (encode+forward+loss+grad+update fused; see `train.steps`),
  cached across the 9 multi-scale buckets,
- data parallelism over a ("data", "model") mesh from day one,
- full train-state Orbax checkpointing for exact resume (the reference
  restarts optimization on resume),
- optional `jax.profiler` trace capture (`--profile`).
"""

from __future__ import annotations

from datetime import datetime
from pathlib import Path
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.augment import TrainAugmentation, ValidationAugmentation
from ..data.dataset import CropDataset
from ..data.decoders import Decoder
from ..data.pipeline import Loader, choose_batch_fetch, device_prefetch
from ..evaluation import Evaluator
from ..models import init_model
from ..parallel.mesh import create_mesh
from .checkpoints import BestModelSaver, CheckpointManager
from .state import create_train_state, make_lr_schedule, make_optimizer
from .steps import kp_to_device_dict, make_eval_step, make_train_step


class MetricsWriter:
    """TensorBoard writer; silently no-ops if tensorboard is missing."""

    def __init__(self, log_dir=None, enabled: bool = True):
        # enabled=False builds a no-op writer (non-lead multi-host
        # processes): every method already guards on self._w.
        if not enabled:
            self._w = None
            return
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._w = SummaryWriter(log_dir=str(log_dir) if log_dir else None)
        except Exception:
            self._w = None

    def scalars(self, tag: str, values: Dict[str, float], step: int):
        if self._w:
            self._w.add_scalars(tag, values, step)

    def scalar(self, tag: str, value: float, step: int):
        if self._w:
            self._w.add_scalar(tag, value, step)

    def image(self, tag: str, image, step: int):
        """image: PIL or (H, W, 3) uint8 numpy."""
        if self._w:
            arr = np.asarray(image)
            self._w.add_image(tag, arr, step, dataformats="HWC")

    def flush(self):
        if self._w:
            self._w.flush()

    def close(self):
        if self._w:
            self._w.close()


def host_rss_mb() -> float:
    """Resident set size of this process in MB (0.0 if unreadable).

    Logged per epoch ("Host/rss_mb"): long multi-scale runs through
    tunneled single-controller backends show steady client-side host
    growth (~200-400 MB/epoch, ROADMAP.md "Performance") that our own
    pipeline does not account for — per-epoch telemetry localizes it on
    any deployment without attaching a profiler."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return float(line.split()[1]) / 1024.0
    except OSError:
        pass
    try:
        import resource

        return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0
    except Exception:
        return 0.0


STALL_EXIT_CODE = 87


def embedding_plateau_warning(
    first: Dict[str, float], current: Dict[str, float]
) -> Optional[str]:
    """Detect the round-4 grouping failure mode while the run is cheap
    to restart (DESIGN.md "Structural grouping (CSI) — round-4
    diagnosis"): with a too-small --embedding_weight the trunk's
    gradients are heatmap-dominated, the embedding head never trains,
    and keypoint metrics look excellent while CSI/classif collapse.
    Signature: the weighted heatmap loss has dropped 5x or more since
    the first validation while the weighted embedding loss moved < 10%.
    Returns the warning text, or None when healthy/not applicable."""
    emb0 = first.get("embedding_loss", 0.0)
    hm0 = first.get("hm_loss", 0.0)
    emb = current.get("embedding_loss", 0.0)
    hm = current.get("hm_loss", 0.0)
    if emb0 <= 0.0 or hm0 <= 0.0:  # no parts / embedding_weight 0
        return None
    if hm < 0.2 * hm0 and emb > 0.9 * emb0:
        return (
            "WARNING: the embedding loss has not moved "
            f"({emb0:.4g} -> {emb:.4g}) while the heatmap loss dropped "
            f"{hm0 / max(hm, 1e-12):.0f}x. The embedding head is likely "
            "not training: keypoint metrics will look good but "
            "part-to-anchor grouping (CSI/classification) will collapse. "
            "Consider a larger --embedding_weight (see DESIGN.md "
            "'Structural grouping')."
        )
    return None


class StallWatchdog:
    """Aborts the process when training stops making progress.

    A dead connection to a remote device backend leaves the main thread
    blocked inside an uninterruptible C call (observed in production: a
    tunneled TPU client futex-waiting forever on an RPC reply mid-run).
    No Python exception can be raised into such a frame, so the only
    reliable escape is a hard exit from a sidecar thread: `beat()` after
    every completed step; if no beat arrives within `timeout_s`, the
    watchdog prints a diagnostic and `os._exit(STALL_EXIT_CODE)` so a
    supervisor (tools/train_supervised.sh) can relaunch with --resume.
    """

    def __init__(self, timeout_s: float, on_fire=None):
        import threading
        import time

        if timeout_s <= 0:
            raise ValueError("timeout_s must be > 0")
        self.timeout_s = timeout_s
        self._time = time.monotonic
        self._beat_t = self._time()
        self._stop = threading.Event()
        self._on_fire = on_fire  # test seam; None = os._exit for real
        self._thread = threading.Thread(
            target=self._run, daemon=True, name="stall-watchdog"
        )

    def start(self) -> "StallWatchdog":
        self._thread.start()
        return self

    def beat(self):
        self._beat_t = self._time()

    def stop(self):
        self._stop.set()

    def _run(self):
        import os
        import sys

        poll = max(0.05, min(10.0, self.timeout_s / 4))
        while not self._stop.wait(poll):
            idle = self._time() - self._beat_t
            if idle > self.timeout_s:
                print(
                    f"[stall-watchdog] no step completed in {idle:.0f}s "
                    f"(> {self.timeout_s:.0f}s): device RPC presumed wedged; "
                    f"aborting with exit code {STALL_EXIT_CODE}. The run dir "
                    f"holds a resumable checkpoint (--resume).",
                    file=sys.stderr, flush=True,
                )
                if self._on_fire is not None:
                    self._on_fire(idle)
                    return
                os._exit(STALL_EXIT_CODE)


def malloc_trim() -> bool:
    """Ask glibc to return freed heap pages to the OS; True on success.

    General hygiene for long runs on many-threaded hosts. Note: the
    host-RSS growth observed under the tunneled backend is NOT glibc
    retention — tools/probe_rss.py showed it immune to malloc_trim and
    MALLOC_ARENA_MAX and proportional to transferred bytes (a transfer
    leak in the tunnel client; DESIGN.md "Host RSS under the tunneled
    backend"). A no-op (and False) on non-glibc platforms."""
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        return bool(libc.malloc_trim(0) >= 0)
    except Exception:
        return False


class Trainer:
    def __init__(self, config, log: bool = True):
        self.config = config
        # multi-host: process 0 owns logging/checkpoint IO; every process
        # loads its slice of each global batch (parallel.multihost)
        self.process_index = jax.process_index()
        self.process_count = jax.process_count()
        self.is_lead = self.process_index == 0
        self.log = log and self.is_lead

        if config.compile_cache:
            # persistent XLA compilation cache: pre-warm and resumed runs
            # reuse compiled programs across processes
            jax.config.update("jax_compilation_cache_dir", str(config.compile_cache))
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

        self.mesh = create_mesh(config.data_parallel, config.model_parallel)
        self.model, variables = init_model(config)

        # warm start / resume source (reference trainer.py:45-48)
        if config.pretrained_model:
            from ..models.network import resolve_variables

            variables = resolve_variables(config.pretrained_model, variables)
        elif getattr(config, "pretrained_backbone", False):
            # reference `pretrained=True` default (network.py:41): find a
            # locally cached torchvision ImageNet resnet34 and bridge it
            from ..models.network import resolve_variables
            from ..models.torch_bridge import find_imagenet_resnet34

            path = find_imagenet_resnet34(getattr(config, "backbone", "resnet34"))
            variables = resolve_variables(path, variables)
            if self.is_lead:
                print(f"Warm-started encoder from {path}")

        self.decoder = Decoder(config)
        self.evaluator = Evaluator(config)

        # data (reference trainer.py:58-87)
        self.train_augmentation = TrainAugmentation(config)
        self.train_set = CropDataset(config, config.train_dir, self.train_augmentation)
        self.train_set.localize_image_names()
        self.train_loader = Loader(
            self.train_set,
            batch_size=config.batch_size,
            shuffle=True,
            drop_last=True,
            num_workers=config.num_workers,
            seed=config.seed,
            batch_fetch=choose_batch_fetch(
                config, self.train_set, self.train_augmentation
            ),
            process_index=self.process_index,
            process_count=self.process_count,
        )
        valid_augmentation = ValidationAugmentation(config)
        self.valid_set = CropDataset(config, config.valid_dir, valid_augmentation)
        self.valid_set.localize_image_names()
        # batch validation via --eval_batch_size (default 1 = reference
        # parity, trainer.py:72-77): each forward dispatch costs ~25 ms
        # through a tunneled device, so batching the every-2-epochs pass
        # amortizes it 1/batch. Detection metrics are batch-invariant
        # (per-image decode + matching); only the reported validation
        # *loss* shifts slightly at batch > 1 because focal-loss
        # normalization spans the batch instead of one image.
        self.valid_loader = Loader(
            self.valid_set, batch_size=config.eval_batch_size,
            num_workers=config.num_workers,
            batch_fetch=choose_batch_fetch(config, self.valid_set, valid_augmentation),
        )

        steps_per_epoch = max(1, len(self.train_loader))
        self.lr_schedule = make_lr_schedule(config, steps_per_epoch)
        self.optimizer = make_optimizer(config, steps_per_epoch)
        self.state = create_train_state(config, variables, self.optimizer)

        if config.resume_dir:
            self.save_dir = Path(config.resume_dir)
            assert self.save_dir.exists(), f"resume dir {self.save_dir} not found"
        else:
            self.save_dir = Path("trainings") / f"{datetime.now():%Y-%m-%d_%H-%M-%S}"
            self.save_dir.mkdir(parents=True, exist_ok=True)
        self.writer = MetricsWriter(self.save_dir / "tb", enabled=self.log)
        self.checkpoints = CheckpointManager(self.save_dir)
        self.best_models = BestModelSaver(self.save_dir)

        # --ema: averaged params live OUTSIDE TrainState (checkpoint
        # layout stays identical whether or not EMA is on; the average
        # is persisted as a sibling ema_params.msgpack, itself loadable
        # via --load_model). One donated fused multiply-add per step.
        self.ema_params = None
        self._ema_update = None
        if config.ema > 0:
            decay = float(config.ema)
            # a COPY: the train step donates the state, so aliasing
            # state.params here would leave ema pointing at deleted
            # buffers after the first step
            self.ema_params = jax.tree.map(jnp.copy, self.state.params)

            # Warmup-corrected decay (min(decay, (1+t)/(10+t))): the
            # average starts at the init weights, so a flat decay near 1
            # would leave early validations (epoch 0 runs valid()!)
            # dominated by random init and could lock a near-init
            # snapshot in as "best" on short runs.
            def _ema_step(ema, p, step):
                step = step.astype(jnp.float32)
                d = jnp.minimum(decay, (1.0 + step) / (10.0 + step))
                return jax.tree.map(lambda e, q: e * d + q * (1.0 - d), ema, p)

            self._ema_update = jax.jit(_ema_step, donate_argnums=0)

        self.global_step = 0
        self._train_steps: Dict[Tuple[int, int], object] = {}
        self._eval_step = None
        self._profiled = False
        self._preempted = False
        self._current_epoch = 0
        self._watchdog: StallWatchdog | None = None
        self._first_val_losses: Dict[str, float] | None = None
        self._warned_embedding_plateau = False

    # -- preemption (SURVEY.md §5 failure detection) ---------------------

    def _install_preemption_handlers(self):
        """SIGTERM/SIGINT set a flag; the step loop notices at the next
        batch boundary, saves the full train state, drains the async
        checkpointer, and exits cleanly — so a preempted run resumes
        exactly where it stopped (`--resume`). Handlers are installed
        only in the main thread and restored after training."""
        import signal

        self._prev_handlers = {}

        def on_signal(signum, frame):
            self._preempted = True

        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                self._prev_handlers[sig] = signal.signal(sig, on_signal)
            except ValueError:  # not the main thread
                pass

    def _restore_signal_handlers(self):
        import signal

        for sig, prev in getattr(self, "_prev_handlers", {}).items():
            signal.signal(sig, prev)
        self._prev_handlers = {}

    def _save_ema(self):
        if self.ema_params is not None:
            from ..models.network import save_params

            save_params(
                {"params": jax.device_get(self.ema_params),
                 "batch_stats": jax.device_get(self.state.batch_stats)},
                self.save_dir / "ema_params.msgpack",
            )

    def _preemption_save(self):
        if self.is_lead:
            # A long save/drain is legitimate progress — suspend the
            # stall watchdog so it cannot os._exit mid-write (the save
            # itself is atomic, but losing the drain loses the step).
            if self._watchdog is not None:
                self._watchdog.stop()
            self.checkpoints.save_state(self.global_step, jax.device_get(self.state))
            self._save_ema()
            self.checkpoints.wait()
            print(
                f"Preemption: saved train state at step {int(self.state.step)} "
                f"to {self.save_dir}; resume with --resume {self.save_dir}"
            )

    # -- step caches (one compiled program per resolution bucket) -------

    def _train_step_for(self, h: int, w: int):
        key = (h, w)
        if key not in self._train_steps:
            out_h = int(h / self.config.down_ratio)
            out_w = int(w / self.config.down_ratio)
            self._train_steps[key] = make_train_step(
                self.model, self.config, self.optimizer,
                out_h=out_h, out_w=out_w,
                mesh=self.mesh, state_example=self.state,
                augment=self.train_augmentation.device_augment,
            )
        return self._train_steps[key]

    def prewarm(self):
        """Compile every multi-scale resolution bucket before epoch 0.

        Without this, each of the 9 bucket shapes
        (`TrainAugmentation.ratios`, reference transforms.py:212) pays a
        cold jit the first time its epoch rolls it, stalling a random
        mid-training epoch for the compile time and forcing
        --stall_timeout_s to stay far above a step time. The warm-up
        executes one throwaway step per bucket on zero inputs (a dummy
        state is donated, the real one is untouched), which both compiles
        and primes jit's dispatch cache; with --compile_cache the
        programs also persist across restarts. Returns the number of
        bucket programs warmed."""
        import time as _time

        if self.process_count > 1:
            # multi-host feeds globally-sharded arrays; a locally-built
            # dummy batch would not match. Buckets compile cold there.
            return 0
        cfg = self.config
        sizes = [self.train_augmentation.current_size]
        if not cfg.no_augmentation:
            for ratio in self.train_augmentation.ratios:
                w = max(32, int(ratio * cfg.width / 32) * 32)
                h = max(32, int(ratio * cfg.height / 32) * 32)
                if (w, h) not in sizes:
                    sizes.append((w, h))

        img_dtype = (
            jnp.uint8
            if self.train_augmentation.device_augment
            and self.train_augmentation.uint8_feed
            else jnp.float32
        )
        b = cfg.batch_size
        kp = {
            "anchors_xy": jnp.zeros((b, cfg.max_objects, 2), jnp.float32),
            "anchor_cls": jnp.zeros((b, cfg.max_objects), jnp.int32),
            "anchor_mask": jnp.zeros((b, cfg.max_objects), bool),
            "parts_xy": jnp.zeros((b, cfg.max_parts, 2), jnp.float32),
            "part_kind": jnp.zeros((b, cfg.max_parts), jnp.int32),
            "part_owner_xy": jnp.zeros((b, cfg.max_parts, 2), jnp.float32),
            "part_mask": jnp.zeros((b, cfg.max_parts), bool),
        }
        t0 = _time.monotonic()
        for w, h in sizes:
            step_fn = self._train_step_for(h, w)
            dummy_state = jax.tree.map(jnp.zeros_like, self.state)
            images = jnp.zeros((b, h, w, 3), img_dtype)
            out_state, stats = step_fn(dummy_state, images, kp)
            jax.block_until_ready(stats)
            del dummy_state, out_state
            if self._watchdog is not None:
                self._watchdog.beat()
        if self.is_lead:
            print(
                f"Pre-warmed {len(sizes)} resolution buckets in "
                f"{_time.monotonic() - t0:.1f}s: "
                + ", ".join(f"{w}x{h}" for w, h in sizes)
            )
        return len(sizes)

    def _eval_step_fn(self):
        if self._eval_step is None:
            out_w, out_h = self.config.grid_size()
            self._eval_step = make_eval_step(
                self.model, self.config, out_h=out_h, out_w=out_w
            )
        return self._eval_step

    # -- loops ----------------------------------------------------------

    def train(self):
        """Epoch loop (reference trainer.py:94-101): validate every 2
        epochs, flush logs, checkpoint latest state each epoch."""
        from tqdm import tqdm

        start_epoch = 0
        if self.config.resume_dir:
            if self.resume():
                # Exact resume: skip the epochs already completed so the
                # run finishes at --epochs total, not resume-point+epochs
                # (optimizer/LR/step state is restored in resume()).
                steps_per_epoch = max(1, len(self.train_loader))
                start_epoch = min(
                    int(self.state.step) // steps_per_epoch, self.config.epochs
                )
                print(
                    f"Resumed from step {int(self.state.step)} "
                    f"(epoch {start_epoch}/{self.config.epochs})"
                )
                if start_epoch > 0:
                    # restore the multi-scale resolution the unbroken run
                    # would use at this epoch (last roll was for it)
                    self.train_augmentation.trigger_random_resize(start_epoch)

        self._install_preemption_handlers()
        try:
            # Prewarm BEFORE arming the watchdog: a cold bucket compile
            # is legitimate startup work of unbounded duration (minutes
            # through this backend) and must not trip a tight
            # --stall_timeout_s into an os._exit(87) -> --resume ->
            # identical-cold-compile crash loop. Prewarm exists
            # precisely so the steady-state timeout can be tight.
            if self.config.prewarm:
                self.prewarm()
            if self.config.stall_timeout_s > 0:
                self._watchdog = StallWatchdog(self.config.stall_timeout_s).start()
            for epoch in tqdm(range(start_epoch, self.config.epochs),
                              initial=start_epoch, total=self.config.epochs,
                              desc="Training", unit="epoch"):
                self._current_epoch = epoch
                self.train_epoch(epoch)
                if self._preempted:
                    self._preemption_save()
                    return
                if epoch % 2 == 0:
                    self.valid()
                if self.is_lead:
                    self.checkpoints.save_state(
                        self.global_step, jax.device_get(self.state)
                    )
                    self._save_ema()
                    if self._watchdog is not None:
                        # the device_get above is a completed blocking
                        # round-trip; don't let a slow epoch-end save
                        # eat into the stall budget
                        self._watchdog.beat()
                self.writer.flush()
                if self.config.malloc_trim:
                    malloc_trim()
            if self.is_lead:
                # best-snapshot capture ages: the conditional policy can
                # freeze a "best" checkpoint on an early one-off metric
                # tick (reference behavior, DESIGN.md "Flagship accuracy
                # gate"); say so instead of letting users ship it blind
                for line in self.best_models.staleness_report(
                    self._current_epoch
                ):
                    print(line)
        finally:
            # Always drain the async checkpointer — an exception mid-loop
            # must not leave orbax threads writing at interpreter exit.
            # Watchdog first: the final drain can legitimately take long.
            if self._watchdog is not None:
                self._watchdog.stop()
            self._restore_signal_handlers()
            self.checkpoints.wait()
            self.writer.close()

    def train_epoch(self, epoch: int = 0):
        from tqdm import tqdm

        cfg = self.config
        # shuffle order is a pure function of (seed, epoch): a resumed
        # run replays the unbroken run's exact batch sequence
        self.train_loader.set_epoch(epoch)
        w, h = self.train_augmentation.current_size
        step_fn = self._train_step_for(h, w)

        profile_this = cfg.profile and not self._profiled

        iterator = tqdm(
            self.train_loader, desc="Epoch", leave=False, unit="batch",
            disable=not self.is_lead,
        )
        if self.process_count > 1:
            # every process contributes its local slice of the global
            # batch as one globally-sharded array (parallel.multihost)
            from ..parallel.multihost import global_batch_arrays

            batches = (
                dict(b, **dict(zip(("image", "keypoints"), global_batch_arrays(
                    self.mesh, b["image"],
                    {f: getattr(b["keypoints"], f) for f in b["keypoints"]._fields},
                ))))
                for b in iterator
            )
        else:
            batches = device_prefetch(iterator)
        # Blocking stats fetches serve two consumers: TB logging (lead)
        # and the stall watchdog — whose beat must witness a COMPLETED
        # device round-trip, or async dispatch keeps "progressing" for
        # as long as the queue absorbs batches after a wedge. Cadence:
        # every 10th step, not every step like the reference
        # (trainer.py:126-129; a blocking fetch per step serializes the
        # device pipeline — documented in README), PLUS a timeout_s/3
        # time floor so slow steps (big batch/resolution, where 10 steps
        # can outlast --stall_timeout_s) still beat well inside the
        # timeout. No consumer (log off, watchdog off) -> no fetch.
        import time as _time

        wd = self._watchdog
        beat_floor_s = wd.timeout_s / 3.0 if wd is not None else None
        last_fetch_t = _time.monotonic()
        trace_active = False
        for i, batch in enumerate(batches):
            if profile_this and i == 5:
                jax.profiler.start_trace(str(self.save_dir / "profile"))
                trace_active = True
            images = batch["image"]
            kp = batch["keypoints"]
            if not isinstance(kp, dict):
                kp = kp_to_device_dict(kp)
            self.state, stats = step_fn(self.state, images, kp)
            if self._ema_update is not None:
                self.ema_params = self._ema_update(
                    self.ema_params, self.state.params, self.state.step)
            if trace_active and i == 10:
                jax.block_until_ready(self.state.params)
                jax.profiler.stop_trace()
                trace_active = False
                self._profiled = True
                profile_this = False

            overdue = (
                beat_floor_s is not None
                and _time.monotonic() - last_fetch_t > beat_floor_s
            )
            if (self.log or wd is not None) and (i % 10 == 0 or overdue):
                # blocking fetch on EVERY process with a watchdog, not
                # just the logging lead
                host_stats = {k: float(v) for k, v in jax.device_get(stats).items()}
                last_fetch_t = _time.monotonic()
                if self.log:
                    self.writer.scalars("Loss/Train", host_stats, self.global_step)
                if wd is not None:
                    wd.beat()
            self.global_step += cfg.batch_size
            if self._preempted:  # SIGTERM/SIGINT: stop at the batch boundary
                break

        if trace_active:
            # epochs shorter than 11 batches (or a preemption between
            # i=5 and i=10) never hit the i==10 stop; an unterminated
            # trace makes next epoch's start_trace raise and leaks the
            # profile. Close it at the epoch boundary instead.
            jax.block_until_ready(self.state.params)
            jax.profiler.stop_trace()
            self._profiled = True

        self.writer.scalar(
            "Learning rate", float(self.lr_schedule(int(self.state.step))),
            self.global_step,
        )
        self.writer.scalar("Host/rss_mb", host_rss_mb(), self.global_step)
        # multi-scale re-roll for next epoch (trainer.py:135), keyed on
        # the epoch so a resumed run replays the same schedule
        self.train_augmentation.trigger_random_resize(epoch + 1)

    def valid(self) -> Dict[str, float]:
        """Validation pass (reference trainer.py:137-309): loss + decode
        + metric accumulation per image, 4-best checkpointing, TB
        scalars and debug images."""
        from tqdm import tqdm

        cfg = self.config
        self.evaluator.reset()
        eval_step = self._eval_step_fn()
        variables = self.state.variables
        if self.ema_params is not None:
            # validate (and snapshot best models from) the averaged
            # weights; BN stats stay the live running averages
            variables = {"params": self.ema_params,
                         "batch_stats": self.state.batch_stats}
        if self.process_count > 1:
            # Multi-host: the train step committed params to the GLOBAL
            # mesh (devices on other hosts included); the plain-jit eval
            # below feeds process-LOCAL batches, and mixing the two
            # raises "incompatible devices". Gather a host-local copy of
            # the variables instead (collective — valid() runs on every
            # process at the same epochs) and validate locally. Each
            # process redundantly evaluates the full (unsharded) valid
            # set; only the lead logs and snapshots. The jit identity
            # with replicated out_shardings is an SPMD all-gather that
            # works for ANY input sharding (process_allgather would
            # stack/concat along axis 0, wrong for Cout-sharded convs);
            # device_get then reads the now-local replica.
            from jax.sharding import NamedSharding, PartitionSpec

            replicate = jax.jit(
                lambda t: t,
                out_shardings=NamedSharding(self.mesh, PartitionSpec()),
            )
            variables = jax.tree.map(
                jnp.asarray, jax.device_get(replicate(variables))
            )

        loss_sums: Dict[str, float] = {}
        n = 0
        last = None

        for batch in tqdm(self.valid_loader, desc="Validation", leave=False,
                          unit="batch"):
            images = jnp.asarray(batch["image"])
            kp = kp_to_device_dict(batch["keypoints"])
            outputs, stats, gt_maps = eval_step(variables, images, kp)

            data = self.decoder(outputs, return_metadata=True)
            bn = len(batch["annotation"])
            for i, annotation in enumerate(batch["annotation"]):
                self.evaluator.accumulate(
                    data["annotation"][i], annotation, data["raw_parts"][i],
                    eval_csi=True, eval_classif=True,
                )
            # stats are batch means; weight by batch count so the final
            # average is per-image regardless of a smaller last batch
            for k, v in jax.device_get(stats).items():
                loss_sums[k] = loss_sums.get(k, 0.0) + float(v) * bn
            n += bn
            last = (batch, data, data["annotation"][0], batch["annotation"][0],
                    gt_maps)
            if self._watchdog is not None:
                self._watchdog.beat()

        loss_avg = {k: v / max(n, 1) for k, v in loss_sums.items()}
        summary = self.evaluator.scalar_summary()

        if self._first_val_losses is None:
            # The plateau baseline must survive --resume: re-baselining
            # to the resumed run's first validation (already post-drop)
            # would silence the warning in exactly the supervised
            # kill-and-resume workflow it was built for. Lead persists
            # it; every process restores it.
            import json as _json

            baseline_file = self.save_dir / "first_val_losses.json"
            if baseline_file.exists():
                try:
                    self._first_val_losses = _json.loads(
                        baseline_file.read_text())
                except Exception:
                    self._first_val_losses = dict(loss_avg)
            else:
                self._first_val_losses = dict(loss_avg)
                if self.is_lead:
                    baseline_file.write_text(
                        _json.dumps(self._first_val_losses))
        if self.is_lead and not self._warned_embedding_plateau:
            warning = embedding_plateau_warning(self._first_val_losses, loss_avg)
            if warning is not None:
                print(warning)
                self._warned_embedding_plateau = True

        if self.is_lead:
            self.best_models.update(
                jax.device_get(variables),
                loss=loss_avg.get("total_loss", float("inf")),
                csi_f1=summary.get("csi/f1_total", 0.0),
                classif_f1=summary.get("classif/f1_total", 0.0),
                kp_f1=summary.get("kps/f1_total", 0.0),
                epoch=self._current_epoch,
            )

        if self.log:
            self.writer.scalars("Loss/Validation", loss_avg, self.global_step)
            for tag, prefix in (
                ("Metrics_AllKps", "kps"), ("Metrics_Anchor", "anchor"),
                ("Metrics_Parts", "part"),
            ):
                for metric in ("f1", "precision", "recall", "acc"):
                    vals = {
                        k.split("/", 1)[1].replace(f"{metric}_", ""): v
                        for k, v in summary.items()
                        if k.startswith(f"{prefix}/{metric}")
                    }
                    if vals:
                        self.writer.scalars(f"{tag}/{metric}", vals, self.global_step)
            self.writer.scalars(
                "Metrics_CSI/f1",
                {k.split("_", 1)[1]: v for k, v in summary.items()
                 if k.startswith("csi/f1")},
                self.global_step,
            )
            self.writer.scalars(
                "Metrics_Classif/f1",
                {"total": summary.get("classif/f1_total", 0.0)}, self.global_step,
            )
            if "grouping/accuracy" in summary:
                self.writer.scalar(
                    "Metrics_Grouping/accuracy",
                    summary["grouping/accuracy"], self.global_step,
                )
            if last is not None:
                self._log_debug_images(*last)

        return summary

    def _log_debug_images(self, batch, data, prediction, annotation, gt_maps):
        """The reference's 7 debug panels (trainer.py:257-309)."""
        from .. import visualization as viz

        image = np.asarray(batch["image"][0])
        step = self.global_step
        cfg = self.config
        try:
            gt_a, gt_p = viz.draw_heatmaps(
                np.asarray(gt_maps["anchor_hm"][0]),
                np.asarray(gt_maps["part_hm"][0]), cfg,
            )
            self.writer.image("Heatmaps/Ground_Truth/Anchors", gt_a, step)
            self.writer.image("Heatmaps/Ground_Truth/Parts", gt_p, step)
            self.writer.image(
                "Detections/Ground_Truth", viz.draw(image, annotation, cfg), step
            )
            self.writer.image(
                "Detections/Prediction", viz.draw(image, prediction, cfg), step
            )
            a_hm, p_hm = viz.draw_heatmaps(
                np.asarray(data["anchor_hm_sig"][0]),
                np.asarray(data["part_hm_sig"][0]), cfg,
            )
            self.writer.image("Heatmaps/Predictions/Anchors", a_hm, step)
            self.writer.image("Heatmaps/Predictions/Parts", p_hm, step)
            self.writer.image(
                "Other/Raw_Predictions",
                viz.draw_kp_and_emb(
                    image, np.asarray(data["anchors"][0]),
                    np.asarray(data["parts"][0]), cfg,
                ),
                step,
            )
            self.writer.image(
                "Other/Raw_Embeddings",
                viz.draw_embeddings(image, np.asarray(data["raw_embeddings"][0]), cfg),
                step,
            )
        except Exception:  # drawing must never kill training
            pass

    # -- resume ----------------------------------------------------------

    def resume(self) -> bool:
        """Restore the latest full train state from this run's dir."""
        restored = self.checkpoints.restore_state(jax.device_get(self.state))
        if restored is None:
            return False
        self.state = jax.device_put(restored)
        self.global_step = int(self.state.step) * self.config.batch_size
        if self.config.ema > 0:
            # resume the average alongside the state; fall back to the
            # restored params for checkpoints written before EMA was on
            ema_file = self.save_dir / "ema_params.msgpack"
            self.ema_params = None
            if ema_file.exists():
                from ..models.network import load_params

                try:
                    self.ema_params = jax.device_put(
                        load_params(str(ema_file))["params"])
                except Exception as e:
                    # writes are atomic (save_params os.replace), but a
                    # file from an older build may still be truncated —
                    # never let a corrupt average brick --resume
                    print(
                        f"Warning: could not load {ema_file} ({e}); "
                        f"restarting the EMA from the restored params"
                    )
            if self.ema_params is None:
                self.ema_params = jax.tree.map(jnp.copy, self.state.params)
        return True
