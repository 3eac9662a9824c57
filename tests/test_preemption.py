"""Preemption-graceful shutdown: SIGTERM/SIGUSR1 → checkpoint + clean return.

The reference trained under 48 h SLURM walls (``submit_job.sh:9``) and relied
on Lightning's SLURM connector for preemption handling; here the Trainer
installs its own handlers, breaks at the next batch boundary, saves, and
returns so the job can be requeued with ``--resume``.
"""

import pytest

import os
import signal

import numpy as np

import jax

from gloria_tpu.builder import init_gloria
from gloria_tpu.configs import Config
from gloria_tpu.data.synthetic import make_synthetic_batch
from gloria_tpu.training.checkpoints import CheckpointManager
from gloria_tpu.training.trainer import Trainer


pytestmark = pytest.mark.smoke  # bounded quick tier (see README)


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


def test_preempt_mid_kstep_window_drops_partial_and_resumes_coherently(tmp_path):
    """SIGTERM while a --steps_per_dispatch window is only partially buffered:
    the partial window must be DROPPED (not half-stepped), the checkpoint must
    record only completed optimizer steps, and --resume must rerun the
    interrupted epoch so the dropped batches are reprocessed — no batch lost,
    no step double-counted (state.step == global_step throughout).

    Wiring-level test (stub step fn, zero compile): the K-step scan body
    itself is proven ≡ K sequential steps by test_steps_per_dispatch."""
    import jax.numpy as jnp

    from gloria_tpu.training.trainer import Trainer

    K, n_batches = 3, 8
    cfg = tiny_cfg()
    cfg.set_path("train.steps_per_dispatch", K)
    cfg.set_path("lightning.trainer.max_epochs", 1)
    cfg.set_path("output_dir", str(tmp_path))
    raw = make_synthetic_batch(batch_size=4, num_tokens=12, imsize=32, vocab_size=256)
    _, state, _, _ = init_gloria(cfg, raw)

    consumed: list[list[int]] = []  # batch ids per dispatched window

    def fake_step(st, stacked):
        ids = [int(i) for i in np.asarray(stacked["bid"]).reshape(-1)]
        consumed.append(ids)
        k = np.asarray(stacked["bid"]).shape[0]  # [K', b] → K' optimizer steps
        return st.replace(step=st.step + k), {"loss": jnp.float32(1.0)}

    def batches(kill_after: int | None):
        # loader stand-in; delivers SIGTERM once batch ``kill_after`` has been
        # handed out — the NEXT loop iteration sees trainer.interrupted with
        # the window only partially buffered
        for i in range(n_batches):
            b = {k: np.asarray(v) for k, v in raw.items()}
            b["bid"] = np.full((4,), i)  # ride along through stack_window
            yield b
            if i == kill_after:
                os.kill(os.getpid(), signal.SIGTERM)

    manager = CheckpointManager(tmp_path / "ckpts", save_top_k=1)
    trainer = Trainer(cfg, fake_step, checkpoints=manager)
    # kill after batch 4: window [0,1,2] dispatched, [3,4] buffered (partial)
    state = trainer.fit(state, batches(kill_after=4))
    assert trainer.interrupted
    # only the FULL first window ran ([K, b] stack: batch ids 0,1,2 × b=4 rows)
    assert consumed == [[0] * 4 + [1] * 4 + [2] * 4]
    assert trainer.global_step == K == int(jax.device_get(state.step))

    restored, _, extra = manager.restore(manager.last())
    assert int(np.asarray(restored["step"])) == K
    ts = extra["trainer_state"]
    assert ts["epoch"] == 0 and ts["global_step"] == K  # epoch NOT complete

    # resume: rerun of the interrupted epoch reprocesses every batch in order,
    # including the two that were buffered-and-dropped
    consumed.clear()
    resumed = Trainer(cfg, fake_step, checkpoints=None)
    resumed.load_state_dict(ts)
    state = state.replace(step=jnp.asarray(np.asarray(restored["step"])))
    state = resumed.fit(state, batches(kill_after=None))
    assert [len(w) // 4 for w in consumed] == [3, 3, 2]  # K, K, trailing K'<K
    assert sorted({i for w in consumed for i in w}) == list(range(n_batches))
    # no step-count drift: 3 pre-preemption + 8 rerun-epoch optimizer steps,
    # and the device step counter agrees with the trainer's bookkeeping
    assert resumed.global_step == K + n_batches
    assert int(jax.device_get(state.step)) == K + n_batches


def test_preempt_mid_accum_window_drops_partial(tmp_path):
    """Same boundary under gradient accumulation: a partial [G'<G] micro-batch
    buffer at SIGTERM is dropped — the checkpoint holds only whole updates
    (global_step counts ONE per accumulation window, unlike K-step)."""
    import jax.numpy as jnp

    from gloria_tpu.training.trainer import Trainer

    cfg = tiny_cfg()
    cfg.set_path("lightning.trainer.accumulate_grad_batches", 3)
    cfg.set_path("lightning.trainer.max_epochs", 1)
    cfg.set_path("output_dir", str(tmp_path))
    raw = make_synthetic_batch(batch_size=4, num_tokens=12, imsize=32, vocab_size=256)
    _, state, _, _ = init_gloria(cfg, raw)

    windows = []

    def fake_step(st, stacked):
        windows.append(int(np.asarray(stacked["bid"]).shape[0]))
        return st.replace(step=st.step + 1), {"loss": jnp.float32(1.0)}

    def batches():
        for i in range(8):
            b = {k: np.asarray(v) for k, v in raw.items()}
            b["bid"] = np.full((4,), i)
            yield b
            if i == 4:
                os.kill(os.getpid(), signal.SIGTERM)

    manager = CheckpointManager(tmp_path / "ckpts", save_top_k=1)
    trainer = Trainer(cfg, fake_step, checkpoints=manager)
    state = trainer.fit(state, batches())
    assert trainer.interrupted
    assert windows == [3]  # the buffered [3,4] partial window did not step
    assert trainer.global_step == 1 == int(jax.device_get(state.step))
    restored, _, extra = manager.restore(manager.last())
    assert extra["trainer_state"]["global_step"] == 1


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
