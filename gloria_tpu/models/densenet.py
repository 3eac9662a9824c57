"""DenseNet backbones in Flax (NHWC, TPU-native).

The reference registry lists densenet_121/161/169
(``/root/reference/gloria/models/cnn_backbones.py:49-80``) but its
``densenet_forward`` is an empty stub (``vision_model.py:88-89``) and the
registry returns no local-feature dim — DenseNet was never usable for the
GLoRIA path there.  This implementation supersedes the stub: torchvision
DenseNet topology (so ``gloria_tpu.utils.torch_import.import_densenet`` maps
checkpoints 1:1) with the local-feature tap at the denseblock3 output — the
same 1/16-resolution point as ResNet's layer3 tap, giving 19×19 regions at
the 299² encoder input.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp


class DenseLayer(nn.Module):
    """torchvision ``_DenseLayer``: BN-ReLU-Conv1×1(bn_size·k) → BN-ReLU-Conv3×3(k)."""

    growth_rate: int
    bn_size: int = 4
    conv: Any = nn.Conv
    norm: Any = nn.BatchNorm

    @nn.compact
    def __call__(self, x):
        out = self.norm(name="norm1")(x)
        out = nn.relu(out)
        out = self.conv(self.bn_size * self.growth_rate, (1, 1), use_bias=False, name="conv1")(out)
        out = self.norm(name="norm2")(out)
        out = nn.relu(out)
        out = self.conv(self.growth_rate, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False, name="conv2")(out)
        return jnp.concatenate([x, out], axis=-1)


class Transition(nn.Module):
    """torchvision ``_Transition``: BN-ReLU-Conv1×1(half) → AvgPool/2."""

    out_channels: int
    conv: Any = nn.Conv
    norm: Any = nn.BatchNorm

    @nn.compact
    def __call__(self, x):
        x = self.norm(name="norm")(x)
        x = nn.relu(x)
        x = self.conv(self.out_channels, (1, 1), use_bias=False, name="conv")(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class DenseNet(nn.Module):
    """Returns (pooled_global, denseblock3_local) like ``ResNet``."""

    growth_rate: int
    block_config: Sequence[int]
    num_init_features: int
    bn_size: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, return_features: bool = False):
        conv = partial(nn.Conv, dtype=self.dtype, param_dtype=jnp.float32)
        norm = partial(
            nn.BatchNorm, use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, param_dtype=jnp.float32,
        )
        features = {"input": x}
        x = x.astype(self.dtype)
        x = conv(self.num_init_features, (7, 7), strides=(2, 2),
                 padding=[(3, 3), (3, 3)], use_bias=False, name="conv0")(x)
        x = norm(name="norm0")(x)
        x = nn.relu(x)
        features["stem"] = x
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        channels = self.num_init_features
        for bi, n_layers in enumerate(self.block_config, start=1):
            for li in range(n_layers):
                x = DenseLayer(self.growth_rate, self.bn_size, conv=conv, norm=norm,
                               name=f"denseblock{bi}_denselayer{li + 1}")(x)
            channels += n_layers * self.growth_rate
            features[f"denseblock{bi}"] = x
            if bi != len(self.block_config):
                channels //= 2
                x = Transition(channels, conv=conv, norm=norm, name=f"transition{bi}")(x)

        x = norm(name="norm5")(x)
        x = nn.relu(x)
        pooled = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)
        if return_features:
            return pooled, features
        # local tap: denseblock3 output (1/16 resolution — ResNet layer3 analog)
        return pooled, features["denseblock3"].astype(jnp.float32)


# name → (constructor kwargs, global feature dim, denseblock3 local dim)
DENSENETS: dict[str, tuple[dict, int, int]] = {
    "densenet_121": (dict(growth_rate=32, block_config=(6, 12, 24, 16), num_init_features=64), 1024, 1024),
    "densenet_161": (dict(growth_rate=48, block_config=(6, 12, 36, 24), num_init_features=96), 2208, 2112),
    "densenet_169": (dict(growth_rate=32, block_config=(6, 12, 32, 32), num_init_features=64), 1664, 1280),
}
