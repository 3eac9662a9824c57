"""Training orchestration: the Lightning-Trainer equivalent.

Drives the jitted step functions over epochs with validation, LR scheduling
(incl. metric-driven plateau), early stopping, top-k checkpointing, metric
logging, and callback hooks — the behavior wired up in the reference's
``run.py:136-197`` (ModelCheckpoint / EarlyStopping / LearningRateMonitor /
EvaluateLocalization / WeightInstancesByLocalization + ``Trainer.fit``).
"""

from __future__ import annotations

import math
import signal
import time
from dataclasses import dataclass, field
from typing import Callable, Iterable

import jax
import numpy as np

from ..configs import Config
from ..utils.logging import MetricLogger
from . import optim
from .checkpoints import CheckpointManager
from .train import TrainState


def _device_only(batch: dict) -> dict:
    """Strip host-only keys (leading underscore) before jitted steps; the
    full batch (with _ids/_words/...) still reaches the callbacks."""
    if isinstance(batch, dict):
        return {k: v for k, v in batch.items() if not k.startswith("_")}
    return batch


class Callback:
    """Hook surface (subset of Lightning's, the parts the reference uses)."""

    def on_train_batch_end(self, trainer, state, metrics, batch, batch_idx): ...
    def on_validation_batch_end(self, trainer, state, metrics, batch, batch_idx): ...
    def on_test_batch_end(self, trainer, state, metrics, batch, batch_idx): ...
    def on_epoch_end(self, trainer, state, split, epoch_metrics): ...


class ProfileTrace(Callback):
    """Capture a ``jax.profiler`` device trace of a window of train steps
    (viewable in TensorBoard/XProf/Perfetto).  The reference had no profiling
    at all (SURVEY §5); here it is one flag: ``run.py --profile N``.

    Skips the first ``skip`` batches (compile + warmup would dominate the
    trace), then records ``steps`` batches and stops, blocking on the last
    step's metrics so the trace contains completed device work.  Fail-soft:
    trace errors (e.g. an execution tunnel without profiler support) log a
    warning instead of killing the run."""

    def __init__(self, log_dir, steps: int = 5, skip: int = 2):
        self.log_dir = str(log_dir)
        self.steps = steps
        self.skip = skip
        self._active = False
        self._done = False
        self._seen = 0  # completed optimizer steps, NOT batch_idx: under
        # gradient accumulation batch_idx jumps by G and an exact
        # batch_idx+1 == skip match would never fire

    def on_train_batch_end(self, trainer, state, metrics, batch, batch_idx):
        if self._done:
            return
        self._seen += 1
        try:
            if not self._active and self._seen >= self.skip:
                jax.profiler.start_trace(self.log_dir)
                self._active = True
            elif self._active and self._seen >= self.skip + self.steps:
                jax.block_until_ready(metrics["loss"])
                jax.profiler.stop_trace()
                self._active = False
                self._done = True
                print(f"profile trace ({self.steps} steps) written to {self.log_dir}")
        except Exception as exc:  # fail-soft: profiling must never kill training
            self._active = False
            self._done = True
            print(f"WARNING: profiler trace failed: {exc}")


@dataclass
class EarlyStopping:
    monitor: str = "val_loss"
    patience: int = 10
    min_delta: float = 0.0
    mode: str = "min"
    best: float = field(default=math.inf)
    bad_epochs: int = 0
    stopped: bool = False

    def __post_init__(self):
        if self.mode == "max":
            self.best = -math.inf

    def step(self, value: float) -> bool:
        improved = (value < self.best - self.min_delta) if self.mode == "min" else (value > self.best + self.min_delta)
        if improved:
            self.best = value
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs >= self.patience:
                self.stopped = True
        return self.stopped

    def state_dict(self) -> dict:
        return {k: getattr(self, k) for k in ("best", "bad_epochs", "stopped")}

    def load_state_dict(self, d: dict) -> None:
        for k, v in d.items():
            setattr(self, k, v)


class Trainer:
    def __init__(
        self,
        cfg: Config,
        train_step: Callable,
        eval_step: Callable | None = None,
        *,
        callbacks: list[Callback] | None = None,
        logger: MetricLogger | None = None,
        checkpoints: CheckpointManager | None = None,
        metric_extractor: Callable[[dict], dict] | None = None,
    ):
        self.cfg = cfg
        self.train_step = train_step
        self.eval_step = eval_step
        self.callbacks = callbacks or []
        lightning = cfg.lightning or Config()
        trainer_cfg = lightning.trainer or Config()
        self.max_epochs = int(trainer_cfg.max_epochs or 1)
        # reference trainer knobs (imagenome_pretrain_config.yaml:14-16)
        self.limit_train_batches = trainer_cfg.limit_train_batches
        self.limit_val_batches = trainer_cfg.limit_val_batches
        # Lightning accumulate_grad_batches: stack G loader batches into one
        # [G, b, ...] step input; the jitted step (built with the matching
        # accum_steps) scans the micro-batches and applies ONE update
        self.accumulate_grad_batches = max(1, int(trainer_cfg.accumulate_grad_batches or 1))
        # device-resident loop: stack K loader batches into one [K, b, ...]
        # dispatch that runs K FULL train steps (K optimizer updates —
        # reference semantics, unlike accumulation); amortizes per-dispatch
        # host overhead.  Mutually exclusive with accumulation — the step
        # builder (``make_pretrain_steps``) rejects the combination.
        self.steps_per_dispatch = max(
            1, int((cfg.train.steps_per_dispatch if cfg.train else None) or 1))
        self.check_val_every_n_epoch = int(trainer_cfg.check_val_every_n_epoch or 1)
        self.logger = logger or MetricLogger(cfg.output_dir)
        self.checkpoints = checkpoints
        self.scheduler = optim.make_scheduler(cfg)
        es_cfg = lightning.early_stopping_callback
        self.early_stopping = (
            EarlyStopping(
                monitor=es_cfg.monitor or "val_loss",
                patience=int(es_cfg.patience or 10),
                min_delta=float(es_cfg.min_delta or 0.0),
                mode=es_cfg.mode or "min",
            )
            if es_cfg
            else None
        )
        self.metric_extractor = metric_extractor or (lambda m: {})
        self.global_step = 0
        # Lightning resume_from_checkpoint parity: epoch counter, scheduler,
        # and early-stopping state travel in the checkpoint meta
        # (``trainer_state``) so --resume continues the SAME run — epoch
        # numbering, data order (loader epoch seed), plateau/early-stop
        # history — instead of replaying from epoch 0
        self.start_epoch = 0
        # preemption-graceful shutdown: SIGTERM/SIGUSR1 (the SLURM preemption
        # signals Lightning's SLURM connector handled for the reference's 48 h
        # walls, submit_job.sh:9) set a flag; fit() breaks at the next batch
        # boundary, saves a checkpoint, and returns cleanly for requeue+--resume
        self.interrupted = False

    def _install_signal_handlers(self) -> dict:
        previous = {}
        for sig in (signal.SIGTERM, signal.SIGUSR1):
            try:
                previous[sig] = signal.signal(
                    sig, lambda signum, frame: setattr(self, "interrupted", True))
            except ValueError:  # not the main thread (e.g. threaded tests)
                pass
        return previous

    @staticmethod
    def _restore_signal_handlers(previous: dict) -> None:
        for sig, handler in previous.items():
            try:
                signal.signal(sig, handler)
            except ValueError:
                pass

    # -- resume (Lightning resume_from_checkpoint parity) ----------------------
    def state_dict(self, epochs_completed: int) -> dict:
        d = {"epoch": int(epochs_completed), "global_step": int(self.global_step),
             "scheduler": self.scheduler.state_dict()}
        if self.early_stopping is not None:
            d["early_stopping"] = self.early_stopping.state_dict()
        return d

    def load_state_dict(self, d: dict) -> None:
        if not d:
            return
        self.start_epoch = int(d.get("epoch", 0))
        self.global_step = int(d.get("global_step", 0))
        if d.get("scheduler"):
            self.scheduler.load_state_dict(d["scheduler"])
        if d.get("early_stopping") and self.early_stopping is not None:
            self.early_stopping.load_state_dict(d["early_stopping"])

    @staticmethod
    def _limit(limit, loader) -> int | None:
        """Lightning semantics: float = fraction of batches, int = count."""
        if limit is None:
            return None
        if isinstance(limit, float) and limit <= 1.0:
            try:
                return max(1, int(len(loader) * limit))
            except TypeError:
                return None
        return int(limit)

    # -- loops -----------------------------------------------------------------
    def _run_eval(self, state: TrainState, loader: Iterable, split: str) -> dict:
        if self.eval_step is None:
            return {}
        max_batches = self._limit(self.limit_val_batches, loader)
        sums: dict[str, float] = {}
        count = 0
        collected: list[dict] = []
        for batch_idx, batch in enumerate(loader):
            if max_batches is not None and batch_idx >= max_batches:
                break
            out = self.eval_step(state, _device_only(batch))
            metrics = out[0] if isinstance(out, tuple) else out
            host = {k: np.asarray(jax.device_get(v)) for k, v in metrics.items()}
            # retain only ≤2-D metrics (logits/labels for the extractor);
            # batched attention maps etc. would hold GBs of host RAM
            collected.append({k: v for k, v in host.items() if np.ndim(v) <= 2})
            for k, v in host.items():
                if np.ndim(v) == 0:
                    sums[k] = sums.get(k, 0.0) + float(v)
            count += 1
            for cb in self.callbacks:
                hook = cb.on_validation_batch_end if split == "val" else cb.on_test_batch_end
                hook(self, state, host, batch, batch_idx)
        epoch_metrics = {f"{split}_{k}": v / max(count, 1) for k, v in sums.items()}
        epoch_metrics.update(self.metric_extractor(collected))
        return epoch_metrics

    def fit(self, state: TrainState, train_loader: Iterable, val_loader: Iterable | None = None) -> TrainState:
        previous_handlers = self._install_signal_handlers()
        try:
            return self._fit(state, train_loader, val_loader)
        finally:
            self._restore_signal_handlers(previous_handlers)

    def _fit(self, state: TrainState, train_loader: Iterable, val_loader: Iterable | None) -> TrainState:
        if self.start_epoch and hasattr(train_loader, "epoch"):
            # continue the deterministic shuffle sequence where the original
            # run left off (PrefetchLoader orders epoch e by seed+e)
            train_loader.epoch = self.start_epoch
        for epoch in range(self.start_epoch, self.max_epochs):
            t0 = time.time()
            n = 0
            loss_sum = 0.0
            max_batches = self._limit(self.limit_train_batches, train_loader)
            device_losses = []  # keep on device; a per-step float() would
            # force a host sync and break JAX async dispatch
            microbuf: list = []
            update_interval = int(self.cfg.train.update_interval or 100) if self.cfg.train else 100

            def stack_window(bufs):
                return jax.tree_util.tree_map(
                    lambda *xs: np.stack(xs) if isinstance(xs[0], np.ndarray)
                    else jax.numpy.stack(xs),
                    *[_device_only(b) for b in bufs])

            def after_step(metrics, batch, batch_idx, opt_steps: int = 1):
                nonlocal n
                prev = n
                self.global_step += opt_steps
                n += opt_steps
                # under steps_per_dispatch metrics["loss"] is the window MEAN;
                # weight by the window's step count so the epoch mean stays a
                # per-optimizer-step mean (lazy device op, no host sync)
                device_losses.append(metrics["loss"] * opt_steps if opt_steps > 1
                                     else metrics["loss"])
                for cb in self.callbacks:
                    cb.on_train_batch_end(self, state, metrics, batch, batch_idx)
                # cadence keyed on completed optimizer steps, not batch_idx
                # (under accumulation batch_idx advances G per step and
                # batch_idx % interval == 0 would almost never fire); a
                # K-step dispatch fires if ANY step in its window is on cadence
                if any(j % update_interval == 0 for j in range(prev, n)):
                    host = {k: float(jax.device_get(v)) for k, v in metrics.items() if np.ndim(v) == 0}
                    host["lr"] = self.scheduler.current_lr
                    self.logger.log(host, self.global_step, "train")

            batch_idx = -1
            for batch_idx, batch in enumerate(train_loader):
                if max_batches is not None and batch_idx >= max_batches:
                    break
                if self.interrupted:
                    break
                window = (self.accumulate_grad_batches
                          if self.accumulate_grad_batches > 1
                          else self.steps_per_dispatch)
                if window > 1:
                    microbuf.append(batch)
                    if len(microbuf) < window:
                        continue  # keep filling the window
                    stacked = stack_window(microbuf)
                    k = len(microbuf)
                    batch, microbuf = microbuf[-1], []  # callbacks see the last batch
                    state, metrics = self.train_step(state, stacked)
                    after_step(metrics, batch, batch_idx,
                               opt_steps=(k if self.steps_per_dispatch > 1 else 1))
                else:
                    state, metrics = self.train_step(state, _device_only(batch))
                    after_step(metrics, batch, batch_idx)

            if microbuf and not self.interrupted:
                # Lightning semantics: the trailing incomplete window still
                # steps at epoch end (accumulation: grads averaged over the
                # micro-batches that exist; steps_per_dispatch: a K'<K scan —
                # one extra compile for the trailing shape, K' real updates) —
                # otherwise epochs shorter than the window would silently
                # train zero steps
                stacked = stack_window(microbuf)
                k = len(microbuf)
                state, metrics = self.train_step(state, stacked)
                after_step(metrics, microbuf[-1], batch_idx,
                           opt_steps=(k if self.steps_per_dispatch > 1 else 1))
                microbuf = []

            loss_sum = float(np.sum(jax.device_get(device_losses))) if device_losses else 0.0
            epoch_metrics = {"train_loss": loss_sum / max(n, 1), "epoch_time": time.time() - t0}
            if self.interrupted:
                # preemption: persist NOW (mid-epoch state; a --resume restarts
                # the interrupted epoch — the loader's epoch order is a pure
                # function of seed+epoch, so the rerun is deterministic)
                epoch_metrics["interrupted"] = 1.0
                self.logger.log(epoch_metrics, self.global_step, "epoch")
                if self.checkpoints is not None:
                    self.checkpoints.save(
                        {"params": state.params, "batch_stats": state.batch_stats,
                         "opt_state": state.opt_state, "step": state.step},
                        step=self.global_step, metrics=epoch_metrics, cfg=self.cfg,
                        # the interrupted epoch is NOT complete — resume reruns
                        # it (deterministic order: the loader reseeds by epoch)
                        trainer_state=self.state_dict(epochs_completed=epoch),
                    )
                    self.checkpoints.wait()  # durable before the process exits
                return state
            if val_loader is not None and (epoch + 1) % self.check_val_every_n_epoch == 0:
                epoch_metrics.update(self._run_eval(state, val_loader, "val"))
            for cb in self.callbacks:
                cb.on_epoch_end(self, state, "train", epoch_metrics)
            self.logger.log(epoch_metrics, self.global_step, "epoch")

            monitor = self.scheduler and self.cfg.train and self.cfg.train.scheduler and self.cfg.train.scheduler.monitor
            metric_val = epoch_metrics.get(monitor or "val_loss")
            new_lr = self.scheduler.step(metric_val)
            state = state.replace(opt_state=optim.set_learning_rate(state.opt_state, new_lr))

            if self.checkpoints is not None:
                self.checkpoints.save(
                    {"params": state.params, "batch_stats": state.batch_stats,
                     "opt_state": state.opt_state, "step": state.step},
                    step=self.global_step, metrics=epoch_metrics, cfg=self.cfg,
                    trainer_state=self.state_dict(epochs_completed=epoch + 1),
                )
            if self.early_stopping is not None:
                v = epoch_metrics.get(self.early_stopping.monitor)
                if v is not None and self.early_stopping.step(float(v)):
                    break
        if self.checkpoints is not None:
            self.checkpoints.wait()  # async saves durable before fit() returns
        return state

    def validate(self, state: TrainState, loader: Iterable) -> dict:
        m = self._run_eval(state, loader, "val")
        self.logger.log(m, self.global_step, "val")
        return m

    def test(self, state: TrainState, loader: Iterable) -> dict:
        m = self._run_eval(state, loader, "test")
        self.logger.log(m, self.global_step, "test")
        for cb in self.callbacks:
            cb.on_epoch_end(self, state, "test", m)
        return m
