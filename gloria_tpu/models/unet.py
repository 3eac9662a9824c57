"""ResNet-encoder U-Net for pneumothorax segmentation (Flax, NHWC).

Equivalent of the reference's first-party ``ResnetUNet``
(``/root/reference/gloria/models/unet.py:103-181``): ResNet-50 encoder with
skips at {input, stem, layer1, layer2, layer3}, a 2048→2048 conv bridge, five
ConvTranspose up blocks with the reference's channel plan, and a 1×1 output
head.  GLoRIA encoder weights transplant directly into the ``backbone``
subtree (``gloria_tpu.training.checkpoints.graft_subtree``), which replaces
the reference's ``gloria.img_encoder.model``-prefix state-dict surgery
(``unet.py:115-122``, ``gloria.py:172-179``).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .resnet import make_backbone


class ConvBlock(nn.Module):
    features: int
    with_nonlinearity: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (3, 3), padding=[(1, 1), (1, 1)],
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                          dtype=self.dtype, param_dtype=jnp.float32, name="bn")(x)
        if self.with_nonlinearity:
            x = nn.relu(x)
        return x


class UpBlock(nn.Module):
    out_channels: int
    up_out_channels: int | None = None  # ConvTranspose output (defaults to out_channels)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, up_x, skip_x, train: bool = False):
        up_out = self.up_out_channels or self.out_channels
        x = nn.ConvTranspose(up_out, (2, 2), strides=(2, 2),
                             dtype=self.dtype, param_dtype=jnp.float32, name="upsample")(up_x)
        x = jnp.concatenate([x, skip_x.astype(x.dtype)], axis=-1)
        x = ConvBlock(self.out_channels, dtype=self.dtype, name="conv_block_1")(x, train)
        x = ConvBlock(self.out_channels, dtype=self.dtype, name="conv_block_2")(x, train)
        return x


class ResnetUNet(nn.Module):
    model_name: str = "resnet_50"
    n_classes: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: [B, H, W, 3], H and W divisible by 32. Returns [B, H, W, n_classes]."""
        if "resnet" not in self.model_name:
            raise ValueError("Resnet UNet only accepts resnet backbones")
        backbone, _, _ = make_backbone(self.model_name, dtype=self.dtype)
        _, feats = backbone(x, train=train, return_features=True)

        h = ConvBlock(2048, dtype=self.dtype, name="bridge_1")(feats["layer4"], train)
        h = ConvBlock(2048, dtype=self.dtype, name="bridge_2")(h, train)

        # channel plan mirrors reference unet.py:133-151
        h = UpBlock(1024, dtype=self.dtype, name="up1")(h, feats["layer3"], train)
        h = UpBlock(512, dtype=self.dtype, name="up2")(h, feats["layer2"], train)
        h = UpBlock(256, dtype=self.dtype, name="up3")(h, feats["layer1"], train)
        h = UpBlock(128, up_out_channels=128, dtype=self.dtype, name="up4")(h, feats["stem"], train)
        h = UpBlock(64, up_out_channels=64, dtype=self.dtype, name="up5")(h, feats["input"], train)

        return nn.Conv(self.n_classes, (1, 1), param_dtype=jnp.float32, name="out")(h).astype(jnp.float32)
