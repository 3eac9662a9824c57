"""Device mesh + sharding rules (SPMD over ICI).

The reference's only parallelism is single-process ``nn.DataParallel``
(``configs/*.yaml: distributed_backend: 'dp'``).  Here the same program
scales as one pjit'd SPMD computation over a ``jax.sharding.Mesh``:

- axis ``"data"``: batch sharding (images *and* captions).  The O(B²)
  pairwise local loss then computes each device's *rows* of the similarity
  matrix against all-gathered caption embeddings — the collectives are
  inserted by GSPMD from the sharding annotations and ride ICI.
- axis ``"fsdp"`` (optional): ZeRO-3-style parameter sharding; each weight is
  split along its largest divisible axis and all-gathered just-in-time by
  XLA.  For the ~130M-parameter GLoRIA this is optional but keeps the design
  ready for bigger text towers.
- axis ``"model"`` (optional): Megatron-style tensor parallelism over the
  transformer towers (BERT text encoder + the optional image transformer).
  QKV and MLP-in projections are column-parallel (output features sharded),
  attention-out and MLP-out are row-parallel (input features sharded); GSPMD
  propagates these parameter shardings through the matmuls and inserts the
  all-reduce after each row-parallel projection.  The reference has nothing
  comparable (single-process ``nn.DataParallel`` only); at GLoRIA's 130M
  params TP is headroom, not need — the rules exist so the same program
  scales to bigger towers without a rewrite.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    n_devices: int | None = None,
    fsdp: int = 1,
    tp: int = 1,
    devices: list | None = None,
) -> Mesh:
    """(data, fsdp, model) mesh; fsdp/tp axes default to size 1 (pure DP).

    Axis order puts ``model`` innermost so tensor-parallel all-reduces ride
    the fastest ICI links on a real slice."""
    devices = devices if devices is not None else jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"requested a {n_devices}-device mesh but only {len(devices)} "
                f"device(s) are visible on platform "
                f"{devices[0].platform if devices else '?'}; for a virtual mesh "
                "set XLA_FLAGS=--xla_force_host_platform_device_count=<n> and "
                "jax.config.update('jax_platforms', 'cpu') BEFORE jax backend init"
            )
        devices = devices[:n_devices]
    n = len(devices)
    if n % (fsdp * tp):
        raise ValueError(f"{n} devices not divisible by fsdp={fsdp} × tp={tp}")
    arr = np.asarray(devices).reshape(n // (fsdp * tp), fsdp, tp)
    return Mesh(arr, axis_names=("data", "fsdp", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis over 'data'."""
    return NamedSharding(mesh, P(("data",)))


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Single-host placement: each array is the GLOBAL batch, leading axis
    split over 'data'.  For multi-host runs use :func:`shard_batch_per_host`
    (each host holds only its rows)."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P(*(("data",) + (None,) * (x.ndim - 1))))),
        batch,
    )


def shard_batch_per_host(batch: dict, mesh: Mesh) -> dict:
    """Multi-host placement: each process passes only its LOCAL rows of the
    global batch (global batch = local rows × process_count along 'data');
    ``jax.make_array_from_process_local_data`` assembles the global sharded
    array.  On a single process this equals :func:`shard_batch`."""

    def place(x):
        sharding = NamedSharding(mesh, P(*(("data",) + (None,) * (x.ndim - 1))))
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    return jax.tree_util.tree_map(place, batch)


# Megatron-style TP rules over the transformer towers.  Column-parallel
# (output features sharded) feeds row-parallel (input features sharded); the
# only cross-device talk is the all-reduce GSPMD inserts after each
# row-parallel matmul.  Covers both flax module shapes in this repo:
# Dense kernels [in, out] and MultiHeadDotProductAttention kernels
# [in, heads, head_dim] / [heads, head_dim, out] (head-sharded).
_TP_COL = {"query", "key", "value", "intermediate", "linear1"}
_TP_ROW = {"out", "output", "linear2"}
_TP_SCOPES = ("layer_", "image_transformer_", "self_attn", "attention")


def _tp_dim(path_keys: tuple[str, ...], value: Any, tp_size: int) -> int | None:
    """Index of the axis to place on 'model', or None (replicate over tp)."""
    if tp_size <= 1 or value.ndim < 1 or len(path_keys) < 2:
        return None
    if not any(k.startswith(s) or k == s for k in path_keys for s in _TP_SCOPES):
        return None
    leaf, parent = path_keys[-1], path_keys[-2]
    if leaf == "kernel" and value.ndim >= 2:
        dim = 1 if parent in _TP_COL else 0 if parent in _TP_ROW else None
    elif leaf == "bias" and parent in _TP_COL:
        dim = 0  # column-parallel bias lives with its output shard
    else:
        dim = None
    if dim is not None and value.shape[dim] % tp_size == 0:
        return dim
    return None


def param_spec(path_keys: tuple[str, ...], value: Any, fsdp_size: int,
               tp_size: int = 1) -> P:
    """TP rule first (name-matched transformer projections on 'model'), then
    FSDP: shard the largest remaining axis divisible by the fsdp axis size;
    replicate small/indivisible params."""
    spec = [None] * value.ndim
    tp_dim = _tp_dim(path_keys, value, tp_size)
    if tp_dim is not None:
        spec[tp_dim] = "model"
    if fsdp_size > 1 and value.ndim > 0 and value.size >= 2**16:
        dims = list(value.shape)
        order = sorted(range(len(dims)), key=lambda i: -dims[i])
        for i in order:
            if i != tp_dim and dims[i] % fsdp_size == 0:
                spec[i] = "fsdp"
                break
    if all(s is None for s in spec):
        return P()
    return P(*spec)


def shard_params(variables: dict, mesh: Mesh) -> dict:
    """Place a variable tree on the mesh per the TP + FSDP rules
    ('model'/'fsdp' axes) with everything replicated over 'data'."""
    fsdp_size = mesh.shape.get("fsdp", 1)
    tp_size = mesh.shape.get("model", 1)

    def place(path, x):
        keys = tuple(getattr(p, "key", str(p)) for p in path)
        return jax.device_put(
            x, NamedSharding(mesh, param_spec(keys, x, fsdp_size, tp_size)))

    return jax.tree_util.tree_map_with_path(place, variables)


def replicate(tree: Any, mesh: Mesh) -> Any:
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree
    )
