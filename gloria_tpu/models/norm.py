"""BatchNorm with a splittable stats/apply boundary.

``SplitBatchNorm`` is numerically and structurally interchangeable with
``flax.linen.BatchNorm`` (same param tree: params scale/bias, batch_stats
mean/var; same f32 fast-variance stats, clip-at-zero, running-average
update, and apply order — asserted against flax in
tests/test_fused_bn.py), with two extra modes that the fused bottleneck
kernel (``gloria_tpu.ops.pallas.fused_bn``) needs:

- ``fold=True``: instead of normalizing ``x``, return the per-channel
  folded affine ``(scale_eff, shift_eff)`` with
  ``bn(x) == x * scale_eff + shift_eff`` — the form a matmul prologue can
  apply in-register.  Batch stats are still computed from ``x`` and the
  running averages still update.
- ``sums=(s1, s2), count=M``: derive the batch statistics from per-channel
  sum and sum-of-squares accumulated by the kernel's epilogue (fast
  variance: E[x²] − E[x]²), so no separate pass over the activation is
  needed.  Returns the folded affine.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp
from jax import lax


class SplitBatchNorm(nn.Module):
    use_running_average: bool | None = None
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x=None, use_running_average: bool | None = None, *,
                 fold: bool = False, sums: tuple | None = None,
                 count: int | None = None):
        use_running_average = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average)
        if sums is not None:
            features = sums[0].shape[-1]
        else:
            features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones_init(), (features,),
                           self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros_init(), (features,),
                          self.param_dtype)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda s: jnp.zeros(s, jnp.float32), (features,))
        ra_var = self.variable("batch_stats", "var",
                               lambda s: jnp.ones(s, jnp.float32), (features,))

        if sums is not None:
            if count is None:
                raise ValueError("sums mode requires count")
            mean = sums[0].astype(jnp.float32) / count
            mean2 = sums[1].astype(jnp.float32) / count
            var = jnp.maximum(0.0, mean2 - mean * mean)
        elif use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            # flax _compute_stats semantics: f32, fast variance, clipped
            xf = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            mean = xf.mean(axes)
            mean2 = (xf * xf).mean(axes)
            var = jnp.maximum(0.0, mean2 - mean * mean)

        if not use_running_average and not self.is_initializing():
            ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
            ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var

        mul = lax.rsqrt(var + self.epsilon) * scale
        if fold or sums is not None:
            return mul, bias - mean * mul
        # NOTE: a [B,H,W,C] -> [B*H*W,C] flatten before the stats/apply math
        # was tried here (the standalone 4-D reduce at stem shapes measures
        # 2.2x slower than the 2-D view, scripts/bench_bn_reduce.py) but is
        # (a) a wash inside the full jitted step — XLA already canonicalizes
        # the reduce — and (b) NOT free under GSPMD: merging the dp-sharded
        # batch dim with spatial dims broke sharding propagation and aborted
        # the dp x tp sharded step on the virtual mesh.  Keep BN shape-
        # preserving; sharded-step equality is pinned by test_parallel.py.
        y = (x.astype(jnp.float32) - mean) * mul + bias
        out_dtype = self.dtype or jnp.promote_types(x.dtype, jnp.float32)
        return jnp.asarray(y, out_dtype)
