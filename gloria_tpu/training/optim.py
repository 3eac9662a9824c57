"""Optimizers and LR schedules (optax), matching the reference builder.

Reference: ``/root/reference/gloria/builder.py:62-137``.

- Adam with betas (0.5, 0.999) and *coupled* L2 weight decay (torch ``Adam``
  adds ``wd·p`` to the gradient before the moment updates — so the decay term
  goes through ``add_decayed_weights`` *before* ``scale_by_adam``).
- AdamW (decoupled decay), SGD+momentum.
- Schedulers: ``warmup`` (the reference's epoch-keyed lambda), ``cos``
  (CosineAnnealingLR, T_max=10), ``step`` (γ=0.8/epoch), and ``plateau``
  (ReduceLROnPlateau factor 0.5, patience 5) — plateau is a *host-side*
  controller (:class:`PlateauScheduler`) because it depends on val metrics;
  the LR reaches the optimizer through ``optax.inject_hyperparams``.
- Gradient clipping by global norm (Lightning ``gradient_clip_val``).
- ``partition_trainable`` implements the freeze flags
  (``freeze_bert``/``freeze_cnn``/``train_last_local_image_layer``/
  ``train_prompt``, ``builder.py:65-74``) by zeroing updates outside the
  trainable subtree.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..configs import Config


class SkipNonfiniteState(NamedTuple):
    inner_state: Any
    total_notfinite: jnp.ndarray  # i32 count of zeroed (skipped) updates


def skip_nonfinite_updates(inner: optax.GradientTransformation) -> optax.GradientTransformation:
    """Zero the update when the gradients are not all finite.

    Branchless alternative to ``optax.apply_if_finite``: that wrapper's
    ``lax.cond`` over the whole (params-sized) inner state forces XLA to
    double-buffer the Adam moments and blocks fusion with the backward —
    measured 5% of the pretrain step (634 → 604 pairs/s on v5e at B=48).
    Here the bad gradients are zeroed *before* the inner update and the
    produced update is zeroed after, both fused ``where``s on an already-
    computed global-norm scalar, so parameters are protected at no
    measurable cost.  Deviation from a strict GradScaler skip: on a skipped
    step the inner moments still see a zero gradient (Adam: ``m ← β₁m``,
    ``v ← β₂v``, one decay) — params are identical, and the decay wash-out
    only occurs during the rare transient the guard exists for."""

    def init(params):
        return SkipNonfiniteState(inner.init(params), jnp.zeros((), jnp.int32))

    def update(grads, state, params=None):
        ok = jnp.isfinite(optax.global_norm(grads))
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(ok, g, jnp.zeros_like(g)), grads)
        updates, inner_state = inner.update(grads, state.inner_state, params)
        updates = jax.tree_util.tree_map(
            lambda u: jnp.where(ok, u, jnp.zeros_like(u)), updates)
        return updates, SkipNonfiniteState(
            inner_state, state.total_notfinite + (1 - ok.astype(jnp.int32)))

    return optax.GradientTransformation(init, update)


def make_optimizer(cfg: Config, grad_clip: float | None = None) -> optax.GradientTransformation:
    """cfg.train.optimizer → injectable-LR optax chain. Update the LR via
    ``set_learning_rate`` on the optimizer state.

    The whole chain is wrapped in :func:`skip_nonfinite_updates`: a step
    whose gradients contain inf/NaN applies a ZERO update (params untouched)
    instead of poisoning the parameters.  This is the reference's training
    semantics — its fp16 AMP ``GradScaler`` skips the optimizer step on
    non-finite gradients (Lightning ``precision: 16``) — and it matters in
    bf16: transient gradient spikes on marginally-stable configs (e.g. the
    B=96 synthetic bench) otherwise NaN the whole run.  Disable with
    ``cfg.train.skip_nonfinite_grads: false``."""
    opt_cfg = cfg.train.optimizer or Config()
    name = (opt_cfg.name or "Adam").lower()
    wd = float(opt_cfg.weight_decay or 0.0)
    skip_nonfinite = (cfg.train.skip_nonfinite_grads
                      if cfg.train and cfg.train.skip_nonfinite_grads is not None
                      else True)
    # optax.flatten: run the elementwise optimizer math over ONE raveled
    # vector instead of ~300 per-leaf kernels.  The flagship tree
    # (ResNet-50 + BERT-base, ~135M params) has ~320 leaves; per-leaf
    # lowering leaves XLA hundreds of small fused loops whose launch +
    # tiling overhead could dominate the moment math — measured on v5e at
    # B=48 it instead LOSES 16% (the grad concatenate is a barrier against
    # backward overlap; DESIGN.md round-3 table), so this stays off.
    # Trade-off: the optimizer state stores flat [N] moment vectors, so
    # checkpoints carry the same bytes but not per-parameter names; torch
    # export of optimizer moments is unaffected (it exports params, not
    # moments).  Disable with ``cfg.train.flatten_optimizer: false``.
    flatten = (cfg.train.flatten_optimizer
               if cfg.train and cfg.train.flatten_optimizer is not None
               else False)

    def build(learning_rate):
        txs = []
        if grad_clip:
            txs.append(optax.clip_by_global_norm(grad_clip))
        if name == "adam":
            if wd:
                txs.append(optax.add_decayed_weights(wd))  # torch-coupled L2
            txs.append(optax.scale_by_adam(b1=0.5, b2=0.999, eps=1e-8))
        elif name == "adamw":
            txs.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
            if wd:
                txs.append(optax.add_decayed_weights(wd))
        elif name == "sgd":
            momentum = float(cfg.momentum or opt_cfg.momentum or 0.0)
            if wd:
                txs.append(optax.add_decayed_weights(wd))
            if momentum:
                txs.append(optax.trace(decay=momentum))
        else:
            raise ValueError(f"unknown optimizer: {opt_cfg.name}")
        txs.append(optax.scale_by_learning_rate(learning_rate))
        chain = optax.chain(*txs)
        if flatten:
            chain = optax.flatten(chain)
        if skip_nonfinite:
            chain = skip_nonfinite_updates(chain)
        return chain

    lr = float(cfg.lightning.trainer.lr if cfg.lightning and cfg.lightning.trainer and cfg.lightning.trainer.lr else (cfg.train.lr or 1e-4))
    return optax.inject_hyperparams(build)(learning_rate=lr)


def set_learning_rate(opt_state, lr: float):
    """Return opt_state with the injected learning rate replaced."""
    return optax.tree_utils.tree_set(opt_state, learning_rate=jnp.asarray(lr, jnp.float32))


def get_learning_rate(opt_state) -> float:
    return float(optax.tree_utils.tree_get(opt_state, "learning_rate"))


# ---------------------------------------------------------------------------
# Freezing / partial training
# ---------------------------------------------------------------------------

def partition_trainable(params, trainable_fn: Callable[[tuple[str, ...]], bool]) -> Any:
    """Label tree: 'trainable' / 'frozen' per parameter path."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def label(path):
        keys = tuple(getattr(p, "key", str(p)) for p in path)
        return "trainable" if trainable_fn(keys) else "frozen"

    labels = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(params), [label(p) for p, _ in flat]
    )
    return labels


def freeze_wrap(tx: optax.GradientTransformation, labels) -> optax.GradientTransformation:
    return optax.multi_transform({"trainable": tx, "frozen": optax.set_to_zero()}, labels)


def trainable_predicate(cfg: Config) -> Callable[[tuple[str, ...]], bool]:
    """Encode the reference's freeze flags as a path predicate."""
    m = cfg.model or Config()
    if m.train_last_local_image_layer or m.train_prompt:
        def pred(path):
            joined = "/".join(path)
            if m.train_last_local_image_layer and "img_encoder/backbone/layer3" in joined:
                return True
            if m.train_prompt and "text_encoder/bert" in joined and "embeddings" in joined:
                return True
            return False
        return pred

    freeze_bert = bool(m.text and m.text.freeze_bert)
    freeze_cnn = bool(m.vision and m.vision.freeze_cnn)

    def pred(path):
        joined = "/".join(path)
        if freeze_bert and joined.startswith("text_encoder/bert"):
            return False
        if freeze_cnn and joined.startswith("img_encoder/backbone"):
            return False
        return True

    return pred


# ---------------------------------------------------------------------------
# Schedulers (epoch-keyed multipliers; plateau is metric-driven)
# ---------------------------------------------------------------------------

def warmup_lambda(epoch: int) -> float:
    # reference builder.py:102-107
    if epoch <= 3:
        return 0.001 + epoch * 0.003
    if epoch >= 22:
        return 0.01 * (1 - epoch / 200.0) ** 0.9
    return 0.01


@dataclass
class LRScheduler:
    """Host-side LR controller. ``step(metric)`` once per interval, then push
    ``current_lr`` into the optimizer state via :func:`set_learning_rate`."""

    name: str
    base_lr: float
    factor: float = 0.5
    patience: int = 5
    t_max: int = 10
    gamma: float = 0.8
    mode: str = "min"
    # state
    count: int = 0
    best: float = field(default=math.inf)
    bad_epochs: int = 0
    current_lr: float = field(default=0.0)

    def __post_init__(self):
        self.current_lr = self.base_lr if self.name != "warmup" else self.base_lr * warmup_lambda(0)
        if self.mode == "max":
            self.best = -math.inf

    def step(self, metric: float | None = None) -> float:
        self.count += 1
        e = self.count
        if self.name == "warmup":
            self.current_lr = self.base_lr * warmup_lambda(e)
        elif self.name == "cos":
            self.current_lr = self.base_lr * (1 + math.cos(math.pi * e / self.t_max)) / 2
        elif self.name == "step":
            self.current_lr = self.base_lr * (self.gamma ** e)
        elif self.name == "plateau":
            if metric is not None:
                improved = metric < self.best if self.mode == "min" else metric > self.best
                if improved:
                    self.best = metric
                    self.bad_epochs = 0
                else:
                    self.bad_epochs += 1
                    if self.bad_epochs > self.patience:
                        self.current_lr *= self.factor
                        self.bad_epochs = 0
        elif self.name in (None, "none", "const"):
            pass
        else:
            raise ValueError(f"unknown scheduler: {self.name}")
        return self.current_lr

    def state_dict(self) -> dict:
        return {k: getattr(self, k) for k in ("count", "best", "bad_epochs", "current_lr")}

    def load_state_dict(self, d: dict) -> None:
        for k, v in d.items():
            setattr(self, k, v)


def make_scheduler(cfg: Config) -> LRScheduler:
    sch = cfg.train.scheduler or Config()
    lr = float(cfg.lightning.trainer.lr if cfg.lightning and cfg.lightning.trainer and cfg.lightning.trainer.lr else (cfg.train.lr or 1e-4))
    return LRScheduler(name=(sch.name or "none"), base_lr=lr)
