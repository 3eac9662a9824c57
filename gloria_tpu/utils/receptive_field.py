"""Empirical receptive-field windows of the local-feature map.

Equivalent of the reference's autograd-through-an-all-ones-encoder trick
(``/root/reference/gloria/lightning/callbacks.py:83-125``): every parameter
is set to one (BatchNorm stats to identity), and the input-gradient support
of each output cell gives its receptive window.  The reference loops a
python generator over 361 ``torch.autograd.grad`` calls; here the VJP seeds
are batched with ``vmap`` in chunks — one compiled program, whole rows of
cells at a time.

Used by the 'windows' attention-overlay mode
(``gloria_tpu.utils.viz.windows_attn_overlay``).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def ones_variables(variables: dict) -> dict:
    """All params → 1; BN stats → (mean 0, var 1) so activations stay positive
    and gradient support equals the geometric receptive field."""
    out = {"params": jax.tree_util.tree_map(jnp.ones_like, variables["params"])}
    if "batch_stats" in variables and variables["batch_stats"] is not None:
        def stat(path, x):
            name = str(path[-1].key) if hasattr(path[-1], "key") else str(path[-1])
            return jnp.zeros_like(x) if name == "mean" else jnp.ones_like(x)

        out["batch_stats"] = jax.tree_util.tree_map_with_path(stat, variables["batch_stats"])
    return out


def compute_receptive_windows(local_feature_fn, variables: dict, image_shape: tuple[int, int, int],
                              chunk: int = 32) -> np.ndarray:
    """local_feature_fn(variables, img[1,H,W,C]) -> [h, w] (channel-summed
    local features).  Returns windows [h, w, 4] as (y1, x1, y2, x2) exclusive.
    """
    ones = ones_variables(variables)
    img = jnp.ones((1, *image_shape), jnp.float32)

    out, vjp_fn = jax.vjp(lambda x: local_feature_fn(ones, x), img)
    h, w = out.shape
    n = h * w

    def seed_grad(flat_idx):
        seed = jnp.zeros((h * w,), jnp.float32).at[flat_idx].set(1.0).reshape(h, w)
        (g,) = vjp_fn(seed)
        return (jnp.abs(g[0]).sum(-1) > 0)  # [H, W] support mask

    grad_chunk = jax.jit(jax.vmap(seed_grad))
    windows = np.zeros((n, 4), np.int64)
    for start in range(0, n, chunk):
        idxs = jnp.arange(start, min(start + chunk, n))
        masks = np.asarray(grad_chunk(idxs))
        for k, mask in enumerate(masks):
            ys, xs = np.nonzero(mask)
            if len(ys):
                windows[start + k] = [ys.min(), xs.min(), ys.max() + 1, xs.max() + 1]
    return windows.reshape(h, w, 4)
