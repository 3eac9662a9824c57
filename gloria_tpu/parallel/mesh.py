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
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    n_devices: int | None = None,
    fsdp: int = 1,
    devices: list | None = None,
) -> Mesh:
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
    if n % fsdp:
        raise ValueError(f"{n} devices not divisible by fsdp={fsdp}")
    arr = np.asarray(devices).reshape(n // fsdp, fsdp)
    return Mesh(arr, axis_names=("data", "fsdp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis over 'data'."""
    return NamedSharding(mesh, P(("data",)))


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P(*(("data",) + (None,) * (x.ndim - 1))))),
        batch,
    )


def param_spec(path_keys: tuple[str, ...], value: Any, fsdp_size: int) -> P:
    """FSDP rule: shard the largest axis divisible by the fsdp axis size;
    replicate small/indivisible params."""
    if fsdp_size <= 1 or value.ndim == 0 or value.size < 2**16:
        return P()
    dims = list(value.shape)
    order = sorted(range(len(dims)), key=lambda i: -dims[i])
    for i in order:
        if dims[i] % fsdp_size == 0:
            spec = [None] * len(dims)
            spec[i] = "fsdp"
            return P(*spec)
    return P()


def shard_params(variables: dict, mesh: Mesh) -> dict:
    """Place a variable tree on the mesh per the FSDP rule ('fsdp' axis) with
    everything replicated over 'data'."""
    fsdp_size = mesh.shape["fsdp"]

    def place(path, x):
        keys = tuple(getattr(p, "key", str(p)) for p in path)
        return jax.device_put(x, NamedSharding(mesh, param_spec(keys, x, fsdp_size)))

    return jax.tree_util.tree_map_with_path(place, variables)


def replicate(tree: Any, mesh: Mesh) -> Any:
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree
    )
