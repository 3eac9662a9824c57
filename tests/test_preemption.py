"""Preemption-graceful shutdown: SIGTERM/SIGUSR1 → checkpoint + clean return.

The reference trained under 48 h SLURM walls (``submit_job.sh:9``) and relied
on Lightning's SLURM connector for preemption handling; here the Trainer
installs its own handlers, breaks at the next batch boundary, saves, and
returns so the job can be requeued with ``--resume``.
"""

import os
import signal

import numpy as np

import jax

from gloria_tpu.builder import init_gloria
from gloria_tpu.configs import Config
from gloria_tpu.data.synthetic import make_synthetic_batch
from gloria_tpu.training.checkpoints import CheckpointManager
from gloria_tpu.training.trainer import Trainer


def tiny_cfg():
    return Config({
        "model": {"gloria": {"temp1": 4.0, "temp2": 5.0, "temp3": 10.0,
                              "local_loss_weight": 1.0, "global_loss_weight": 1.0},
                   "vision": {"model_name": "resnet_18"},
                   "text": {"embedding_dim": 64, "last_n_layers": 4, "agg_tokens": True,
                             "aggregate_method": "sum",
                             "bert_config": {"vocab_size": 256, "hidden_size": 64,
                                              "num_layers": 2, "num_heads": 4,
                                              "intermediate_size": 128,
                                              "max_position_embeddings": 32}}},
        "train": {"batch_size": 8, "optimizer": {"name": "SGD"}, "momentum": 0.0},
        "lightning": {"trainer": {"lr": 1e-3, "max_epochs": 50}},
    })


class _PreemptAfter:
    """Callback standing in for the cluster scheduler: delivers SIGTERM to
    this process after N train batches."""

    def __init__(self, after: int):
        self.after = after

    def on_train_batch_end(self, trainer, state, metrics, batch, batch_idx):
        if batch_idx == self.after:
            os.kill(os.getpid(), signal.SIGTERM)

    def on_validation_batch_end(self, *a): ...
    def on_test_batch_end(self, *a): ...
    def on_epoch_end(self, *a): ...


def test_sigterm_saves_checkpoint_and_returns(tmp_path):
    cfg = tiny_cfg()
    cfg.set_path("output_dir", str(tmp_path))
    raw = make_synthetic_batch(batch_size=8, num_tokens=24, imsize=64, vocab_size=256)
    model, state, train_step, eval_step = init_gloria(cfg, raw)
    batches = [{k: np.asarray(v) for k, v in raw.items()} for _ in range(100)]

    manager = CheckpointManager(tmp_path / "ckpts", save_top_k=1)
    trainer = Trainer(cfg, train_step, eval_step, checkpoints=manager,
                      callbacks=[_PreemptAfter(after=2)])
    prior_term = signal.getsignal(signal.SIGTERM)
    state = trainer.fit(state, batches)

    # stopped at the next batch boundary, long before the 50×100 schedule
    assert trainer.interrupted
    steps = int(jax.device_get(state.step))
    assert 3 <= steps <= 4, steps
    # a checkpoint of the interrupted state exists and is resumable
    last = manager.last()
    assert last is not None
    restored, _, extra = manager.restore(last)
    assert int(np.asarray(restored["step"])) == steps
    # the scheduler's handler was restored after fit()
    assert signal.getsignal(signal.SIGTERM) is prior_term


def test_sigusr1_is_also_graceful(tmp_path):
    cfg = tiny_cfg()
    cfg.set_path("output_dir", str(tmp_path))
    raw = make_synthetic_batch(batch_size=8, num_tokens=24, imsize=64, vocab_size=256)
    model, state, train_step, eval_step = init_gloria(cfg, raw)

    class _Usr1(_PreemptAfter):
        def on_train_batch_end(self, trainer, state, metrics, batch, batch_idx):
            if batch_idx == self.after:
                os.kill(os.getpid(), signal.SIGUSR1)

    batches = [{k: np.asarray(v) for k, v in raw.items()} for _ in range(50)]
    trainer = Trainer(cfg, train_step, eval_step, callbacks=[_Usr1(after=0)])
    state = trainer.fit(state, batches)
    assert trainer.interrupted
    assert int(jax.device_get(state.step)) <= 2
