"""BatchNorm, numerically interchangeable with ``flax.linen.BatchNorm``.

Same param tree (params scale/bias, batch_stats mean/var), same f32
fast-variance stats, clip-at-zero, running-average update, and apply order —
asserted against flax in tests/test_models.py.  It exists as a first-party
module so the stats/apply math stays auditable against the reference's torch
BatchNorm semantics (momentum 0.9, eps 1e-5 — torchvision resnet defaults,
``gloria/models/cnn_backbones.py``) and so layout experiments have one place
to live; the folded-affine/sums modes that served the retired fused
bottleneck kernel now live with it in ``scripts/experiments/fused_bn.py``.
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
    def __call__(self, x, use_running_average: bool | None = None):
        use_running_average = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average)
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones_init(), (features,),
                           self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros_init(), (features,),
                          self.param_dtype)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda s: jnp.zeros(s, jnp.float32), (features,))
        ra_var = self.variable("batch_stats", "var",
                               lambda s: jnp.ones(s, jnp.float32), (features,))

        if use_running_average:
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
        # NOTE: a [B,H,W,C] -> [B*H*W,C] flatten before the stats/apply math
        # was tried here (the standalone 4-D reduce at stem shapes measures
        # 2.2x slower than the 2-D view, scripts/experiments/bench_bn_reduce.py)
        # but is (a) a wash inside the full jitted step — XLA already
        # canonicalizes the reduce — and (b) NOT free under GSPMD: merging the
        # dp-sharded batch dim with spatial dims broke sharding propagation and
        # aborted the dp x tp sharded step on the virtual mesh.  Keep BN shape-
        # preserving; sharded-step equality is pinned by test_parallel.py.
        y = (x.astype(jnp.float32) - mean) * mul + bias
        out_dtype = self.dtype or jnp.promote_types(x.dtype, jnp.float32)
        return jnp.asarray(y, out_dtype)
