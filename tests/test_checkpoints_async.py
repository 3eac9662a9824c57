"""Async checkpointing: background disk writes with one-in-flight + prune
protection (CheckpointManager(async_save=True); reference counterpart is
Lightning's synchronous ModelCheckpoint)."""

import pytest

import numpy as np

import jax.numpy as jnp

from gloria_tpu.configs import Config
from gloria_tpu.training.checkpoints import CheckpointManager


pytestmark = pytest.mark.smoke  # bounded quick tier (see README)


def _tree(step: int):
    rng = np.random.RandomState(step)
    return {"params": {"w": jnp.asarray(rng.randn(64, 64), jnp.float32),
                       "b": jnp.asarray(rng.randn(64), jnp.float32)},
            "step": jnp.asarray(step, jnp.int32)}


def test_async_save_roundtrip(tmp_path):
    mgr = CheckpointManager(tmp_path, monitor="val_loss", save_top_k=1,
                            async_save=True)
    path = mgr.save(_tree(3), step=3, metrics={"val_loss": 1.0},
                    cfg=Config({"experiment_name": "async"}))
    mgr.wait()
    restored, cfg, extra = mgr.restore(path)
    assert int(np.asarray(restored["step"])) == 3
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.asarray(_tree(3)["params"]["w"]))
    assert cfg.experiment_name == "async" and extra["step"] == 3


def test_async_sequence_prunes_like_sync(tmp_path):
    """Same manifest/top-k/last behavior as the synchronous manager across a
    sequence of saves; restore() waits for in-flight writes by itself."""
    results = {}
    for mode, async_save in (("sync", False), ("async", True)):
        d = tmp_path / mode
        mgr = CheckpointManager(d, monitor="val_loss", save_top_k=2,
                                save_last=True, async_save=async_save)
        for step, loss in ((1, 3.0), (2, 1.0), (3, 2.0), (4, 5.0)):
            mgr.save(_tree(step), step=step, metrics={"val_loss": loss})
        mgr.wait()
        kept = sorted(e["name"] for e in mgr.manifest["entries"])
        results[mode] = (kept, mgr.best(), mgr.last())
        # top-2 by val_loss = steps 2,3; step 4 survives only as 'last'
        assert {"step_00000002", "step_00000003", "step_00000004"} == set(kept), kept
        restored, _, _ = mgr.restore(mgr.best())
        assert int(np.asarray(restored["step"])) == 2
    assert results["sync"][0] == results["async"][0]


def test_async_protects_in_flight_unworthy_save(tmp_path):
    """A new save that does NOT make top-k must not be rmtree'd while its
    background write is still running (prune-protection of the in-flight
    name); it is pruned at the next save instead."""
    mgr = CheckpointManager(tmp_path, monitor="val_loss", save_top_k=1,
                            save_last=False, async_save=True)
    mgr.save(_tree(1), step=1, metrics={"val_loss": 1.0})  # the best
    p2 = mgr.save(_tree(2), step=2, metrics={"val_loss": 9.0})  # unworthy
    # immediately after dispatch the unworthy save is still on the manifest
    names = {e["name"] for e in mgr.manifest["entries"]}
    assert "step_00000002" in names
    mgr.wait()
    restored, _, _ = mgr.restore(p2)  # fully written despite being unworthy
    assert int(np.asarray(restored["step"])) == 2
    mgr.save(_tree(3), step=3, metrics={"val_loss": 2.0})
    mgr.wait()
    names = {e["name"] for e in mgr.manifest["entries"]}
    assert "step_00000002" not in names  # pruned once safely out of flight
    assert "step_00000001" in names


def test_last_and_best_skip_crash_orphaned_manifest_entry(tmp_path):
    """A hard kill mid-async-write leaves manifest 'last' naming a directory
    that never finalized; last()/best() must fall back to the newest durable
    checkpoint instead of handing --resume a nonexistent path."""
    import shutil

    mgr = CheckpointManager(tmp_path, monitor="val_loss", save_top_k=2)
    state = {"w": np.arange(4.0)}
    p1 = mgr.save(state, step=1, metrics={"val_loss": 1.0})
    p2 = mgr.save(state, step=2, metrics={"val_loss": 0.5})
    # simulate the crash window: step 2's directory vanished (tmp-dir rename
    # never happened) but the manifest still points at it
    shutil.rmtree(p2)
    assert mgr.last() == p1
    assert mgr.best() == p1
    # a fresh manager reading the same manifest agrees
    mgr2 = CheckpointManager(tmp_path, monitor="val_loss", save_top_k=2)
    assert mgr2.last() == p1 and mgr2.best() == p1
