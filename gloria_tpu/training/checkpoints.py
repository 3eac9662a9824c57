"""Checkpointing: hyperparameters-in-ckpt, top-k/last tracking, resume, surgery.

Covers the reference's Lightning checkpoint behavior
(``/root/reference/run.py:150-152``, ``configs/*.yaml checkpoint_callback``):
monitor-metric top-k + save_last, config embedded in the checkpoint
(``save_hyperparameters``, ``pretrain_model.py:17``), warm-start and full
resume, and the cross-model state surgery the reference does by key rewriting
(``gloria.py:85-89,172-179``) — here by pytree-path selection.

Format: orbax PyTreeCheckpointer per step directory + a json manifest.
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from ..configs import Config


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(jax.device_get(x)), tree)


class CheckpointManager:
    def __init__(self, directory: str | Path, monitor: str = "val_loss",
                 mode: str = "min", save_top_k: int = 10, save_last: bool = True,
                 async_save: bool = False):
        self.dir = Path(directory)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.monitor = monitor
        self.mode = mode
        self.save_top_k = save_top_k
        self.save_last = save_last
        self.async_save = async_save
        # async: the (already host-copied) tree is serialized and written to
        # disk on orbax's background thread so the next epoch trains during
        # the write; at most ONE save is in flight (save() waits for the
        # previous), and _prune never touches the in-flight directory.
        # Multi-host: only process 0 calls save() (the state is replicated),
        # so orbax's internal save barriers must span ONLY the writer —
        # otherwise process 0 blocks in sync_global_processes while the other
        # hosts run ahead into the next train step's collectives (a Gloo/ICI
        # "collective mismatch" crash, caught by tests/test_multihost.py)
        mp_opts = ocp.options.MultiprocessingOptions()
        if jax.process_count() > 1:
            mp_opts = ocp.options.MultiprocessingOptions(
                primary_host=0, active_processes={0})
        self._ckpt = (
            ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler(),
                                  multiprocessing_options=mp_opts)
            if async_save
            else ocp.Checkpointer(ocp.PyTreeCheckpointHandler(),
                                  multiprocessing_options=mp_opts))
        self.manifest_path = self.dir / "manifest.json"
        self.manifest: dict = {"entries": [], "last": None}
        if self.manifest_path.exists():
            self.manifest = json.loads(self.manifest_path.read_text())

    def wait(self) -> None:
        """Block until any in-flight async save is durable on disk.  Call
        before process exit / restore-from-latest; no-op when synchronous."""
        if hasattr(self._ckpt, "wait_until_finished"):
            self._ckpt.wait_until_finished()

    def save_tokenizer(self, tokenizer) -> None:
        """Persist the training tokenizer once at the manager root
        (``<dir>/tokenizer/vocab.txt``) so every ``step_*`` checkpoint under
        it is self-contained for ``api.load_gloria`` (single-writer under
        multi-host, like :meth:`save`)."""
        if tokenizer is not None and jax.process_index() == 0:
            tokenizer.save_vocab(self.dir / "tokenizer")

    # -- core save/load --------------------------------------------------------
    def _write(self, name: str, state: Any, cfg: Config | None, extra: dict):
        path = self.dir / name
        if path.exists():
            shutil.rmtree(path)
        self._ckpt.save(path.resolve(), _to_host(state))
        meta = {"extra": extra}
        if cfg is not None:
            meta["cfg"] = cfg.to_dict()
        (self.dir / f"{name}.meta.json").write_text(json.dumps(meta))

    def save(self, state: Any, step: int, metrics: dict | None = None,
             cfg: Config | None = None, trainer_state: dict | None = None) -> str:
        # single-writer under multi-host: the state this trainer checkpoints
        # is replicated across hosts under pure DP, so process 0 writes for
        # everyone (avoids N hosts racing on the shared directory).  Fully
        # host-sharded state would need orbax's cooperative multihost path;
        # that limitation is documented in docs/MULTIHOST.md.
        if jax.process_index() != 0:
            return str(self.dir / f"step_{step:08d}")
        self.wait()  # one async save in flight at a time
        metrics = metrics or {}
        metric = metrics.get(self.monitor)
        name = f"step_{step:08d}"
        extra = {"step": step, "metrics": {k: float(v) for k, v in metrics.items()}}
        if trainer_state is not None:
            extra["trainer_state"] = trainer_state
        self._write(name, state, cfg, extra)
        entry = {"name": name, "step": step, "metric": None if metric is None else float(metric)}
        self.manifest["entries"] = [e for e in self.manifest["entries"] if e["name"] != name] + [entry]
        if self.save_last:
            self.manifest["last"] = name
        # never prune the directory the background thread may still be
        # writing; if unworthy it is pruned at the NEXT save (post-wait)
        self._prune(protect=name if self.async_save else None)
        self.manifest_path.write_text(json.dumps(self.manifest))
        return str(self.dir / name)

    def _prune(self, protect: str | None = None):
        scored = [e for e in self.manifest["entries"] if e["metric"] is not None]
        sign = 1 if self.mode == "min" else -1
        scored.sort(key=lambda e: sign * e["metric"])
        keep = {e["name"] for e in scored[: self.save_top_k]}
        # metric-less saves (epochs without validation) only survive as 'last';
        # keeping them all would defeat save_top_k and grow disk unboundedly
        unscored = [e["name"] for e in self.manifest["entries"] if e["metric"] is None]
        if unscored:
            keep.add(unscored[-1])
        if self.manifest.get("last"):
            keep.add(self.manifest["last"])
        if protect is not None:
            keep.add(protect)
        for e in list(self.manifest["entries"]):
            if e["name"] not in keep:
                shutil.rmtree(self.dir / e["name"], ignore_errors=True)
                (self.dir / f"{e['name']}.meta.json").unlink(missing_ok=True)
                self.manifest["entries"].remove(e)

    def _durable(self, name: str) -> bool:
        """The manifest can name a checkpoint whose async background write
        never finalized (hard kill mid-write: orbax writes to a tmp dir and
        renames on completion, so the named dir simply doesn't exist)."""
        return (self.dir / name).is_dir()

    def best(self) -> str | None:
        scored = [e for e in self.manifest["entries"]
                  if e["metric"] is not None and self._durable(e["name"])]
        if not scored:
            return self.last()
        sign = 1 if self.mode == "min" else -1
        best = min(scored, key=lambda e: sign * e["metric"])
        return str(self.dir / best["name"])

    def last(self) -> str | None:
        """Newest DURABLE checkpoint: falls back past a crash-orphaned
        manifest 'last' to the most recent entry that exists on disk."""
        names = [e["name"] for e in self.manifest["entries"]]
        if self.manifest.get("last"):
            names.append(self.manifest["last"])
        for name in reversed(list(dict.fromkeys(names))):
            if self._durable(name):
                return str(self.dir / name)
        return None

    def restore(self, path: str | Path, target: Any = None) -> tuple[Any, Config | None, dict]:
        self.wait()  # the requested checkpoint may still be in flight
        path = Path(path)
        state = self._ckpt.restore(path.resolve(), item=_to_host(target) if target is not None else None)
        meta_path = path.parent / f"{path.name}.meta.json"
        cfg, extra = None, {}
        if meta_path.exists():
            meta = json.loads(meta_path.read_text())
            cfg = Config(meta["cfg"]) if "cfg" in meta else None
            extra = meta.get("extra", {})
        return state, cfg, extra


def save_checkpoint(path: str | Path, state: Any, cfg: Config | None = None,
                    tokenizer=None) -> None:
    """One-off checkpoint (no manager bookkeeping).  Pass ``tokenizer`` to
    make the checkpoint self-contained: the vocab is written next to the
    state so ``api.load_gloria(path)`` restores the exact tokenizer."""
    path = Path(path)
    if path.exists():
        shutil.rmtree(path)
    ocp.PyTreeCheckpointer().save(path.resolve(), _to_host(state))
    if cfg is not None:
        (path.parent / f"{path.name}.meta.json").write_text(json.dumps({"cfg": cfg.to_dict()}))
    if tokenizer is not None:
        # sibling dir, NOT inside the orbax tree: a target-less restore
        # infers the pytree from directory contents, so foreign files in the
        # checkpoint dir would corrupt the inferred structure
        tokenizer.save_vocab(path.parent / f"{path.name}.tokenizer")


def load_checkpoint(path: str | Path, target: Any = None) -> tuple[Any, Config | None]:
    path = Path(path)
    state = ocp.PyTreeCheckpointer().restore(path.resolve(), item=_to_host(target) if target is not None else None)
    meta_path = path.parent / f"{path.name}.meta.json"
    cfg = None
    if meta_path.exists():
        meta = json.loads(meta_path.read_text())
        cfg = Config(meta["cfg"]) if "cfg" in meta else None
    return state, cfg


def load_checkpoint_meta(path: str | Path) -> dict:
    """The ``extra`` record a CheckpointManager wrote next to ``path``
    (step, metrics, trainer_state for epoch/scheduler/early-stop resume);
    {} when absent."""
    path = Path(path)
    meta_path = path.parent / f"{path.name}.meta.json"
    if meta_path.exists():
        return json.loads(meta_path.read_text()).get("extra", {})
    return {}


# ---------------------------------------------------------------------------
# Cross-model surgery (reference key-rewrite equivalents)
# ---------------------------------------------------------------------------

def extract_subtree(variables: dict, path: tuple[str, ...]) -> Any:
    """E.g. extract_subtree(vars, ('params', 'img_encoder')) — the equivalent
    of the reference's ``gloria.img_encoder.model``-prefix selection."""
    node = variables
    for key in path:
        node = node[key]
    return node


def graft_subtree(variables: dict, path: tuple[str, ...], subtree: Any) -> dict:
    """Return a copy of ``variables`` with ``subtree`` placed at ``path``
    (encoder transplant into classifiers/U-Net, reference gloria.py:172-179)."""
    import copy

    out = copy.deepcopy(jax.tree_util.tree_map(lambda x: x, variables))
    node = out
    for key in path[:-1]:
        node = node[key]
    node[path[-1]] = subtree
    return out
