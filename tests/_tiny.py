"""Canonical tiny-model setup shared across test files.

ONE tiny GLoRIA configuration (resnet_18 tower at 64 px crops, 2-layer
64-wide BERT, batch 8, 24 tokens, SGD, dropout 0) serves every test that
just needs "a jitted train step".  Sharing the exact config matters on a
1-core box: the expensive init + train-step compile then happens once per
pytest process (``tiny_setup`` memoizes) and once per machine (the
persistent compilation cache configured in conftest.py dedups identical HLO
across processes/re-runs).  Tests that need a variant pass ``overrides`` —
every distinct override set is a fresh compile, so prefer the canonical
setup unless the variant IS the point of the test.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gloria_tpu.builder import init_gloria
from gloria_tpu.configs import Config
from gloria_tpu.data.synthetic import make_synthetic_batch

BATCH_SHAPE = dict(batch_size=8, num_tokens=24, imsize=64, vocab_size=256)


def tiny_cfg(overrides: dict | None = None) -> Config:
    """The canonical tiny config (fresh copy).  ``overrides`` maps config
    dot-paths to values, e.g. ``{"lightning.trainer.accumulate_grad_batches": 2}``."""
    cfg = Config({
        "model": {"gloria": {"temp1": 4.0, "temp2": 5.0, "temp3": 10.0,
                              "local_loss_weight": 1.0, "global_loss_weight": 1.0},
                   "vision": {"model_name": "resnet_18"},
                   "text": {"embedding_dim": 64, "last_n_layers": 4,
                             "agg_tokens": True, "aggregate_method": "sum",
                             # dropout 0: deterministic forward — identity
                             # tests (accum/mesh/resume) need grads that do
                             # not depend on per-step rng folding
                             "bert_config": {"vocab_size": 256, "hidden_size": 64,
                                              "num_layers": 2, "num_heads": 4,
                                              "intermediate_size": 128,
                                              "max_position_embeddings": 32,
                                              "dropout_rate": 0.0}}},
        # SGD: updates are linear in gradients, so cross-sharding numeric
        # noise stays tiny (Adam's sqrt-normalization flips near-zero grads)
        "train": {"batch_size": 8, "optimizer": {"name": "SGD"}, "momentum": 0.0},
        "lightning": {"trainer": {"lr": 1e-3, "gradient_clip_val": 0.25}},
    })
    for path, value in (overrides or {}).items():
        cfg.set_path(path, value)
    return cfg


def tiny_batch(seed: int = 0, **shape_overrides) -> dict:
    return make_synthetic_batch(**{**BATCH_SHAPE, **shape_overrides}, seed=seed)


_MEMO: dict = {}


def _freeze(value):
    if isinstance(value, dict):
        return tuple(sorted((k, _freeze(v)) for k, v in value.items()))
    if isinstance(value, (list, tuple)):
        return tuple(_freeze(v) for v in value)
    return value


def tiny_setup(overrides: dict | None = None, seed: int = 0, **init_kwargs):
    """Memoized ``init_gloria`` on the canonical config + batch shape.

    Returns ``(model, state, train_step, eval_step)`` where ``state`` is a
    FRESH on-device copy each call (the jitted steps donate their input
    state, so callers may consume it freely).  The jitted steps are shared —
    their compile cost is paid once per (overrides, seed, init_kwargs) key.
    """
    key = (_freeze(overrides or {}), seed, _freeze(init_kwargs))
    if key not in _MEMO:
        raw = tiny_batch(seed=0)
        model, state, train_step, eval_step = init_gloria(
            tiny_cfg(overrides), raw, seed=seed, **init_kwargs)
        _MEMO[key] = (model, jax.device_get(state), train_step, eval_step)
    model, state_host, train_step, eval_step = _MEMO[key]
    state = jax.tree_util.tree_map(jnp.asarray, state_host)
    return model, state, train_step, eval_step
