"""ResNet / ResNeXt backbones in Flax (NHWC, TPU-native).

Structural equivalent of the torchvision backbones the reference registry
exposes (``/root/reference/gloria/models/cnn_backbones.py:17-80``): same
block topology, strides, and BatchNorm placement so that torchvision weights
map 1:1 onto the parameter tree (see ``gloria_tpu.utils.torch_import``).

Differences from the torch implementation are deliberate TPU choices:
- NHWC layout (XLA's preferred conv layout on TPU),
- ``dtype`` policy: bf16 compute / f32 params & batch stats,
- forward returns both the pooled layer4 feature and the layer3 local-feature
  map in one trace (the reference re-runs the stem twice for that —
  ``vision_model.py:67-86``).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .densenet import DENSENETS, DenseNet
from .norm import SplitBatchNorm

ModuleDef = Any


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    groups: int = 1
    base_width: int = 64
    conv: ModuleDef = nn.Conv
    norm: ModuleDef = SplitBatchNorm

    expansion = 1

    @nn.compact
    def __call__(self, x):
        identity = x
        out = self.conv(self.planes, (3, 3), strides=(self.stride, self.stride), padding=[(1, 1), (1, 1)], use_bias=False, name="conv1")(x)
        out = self.norm(name="bn1")(out)
        out = nn.relu(out)
        out = self.conv(self.planes, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False, name="conv2")(out)
        out = self.norm(name="bn2")(out)
        if self.downsample:
            identity = self.conv(self.planes * self.expansion, (1, 1), strides=(self.stride, self.stride), use_bias=False, name="downsample_conv")(x)
            identity = self.norm(name="downsample_bn")(identity)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    groups: int = 1
    base_width: int = 64
    conv: ModuleDef = nn.Conv
    norm: ModuleDef = SplitBatchNorm

    expansion = 4

    @nn.compact
    def __call__(self, x):
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        identity = x
        out = self.conv(width, (1, 1), use_bias=False, name="conv1")(x)
        out = self.norm(name="bn1")(out)
        out = nn.relu(out)
        out = self.conv(
            width, (3, 3), strides=(self.stride, self.stride), padding=[(1, 1), (1, 1)],
            feature_group_count=self.groups, use_bias=False, name="conv2",
        )(out)
        out = self.norm(name="bn2")(out)
        out = nn.relu(out)
        out = self.conv(self.planes * self.expansion, (1, 1), use_bias=False, name="conv3")(out)
        out = self.norm(name="bn3")(out)
        if self.downsample:
            identity = self.conv(self.planes * self.expansion, (1, 1), strides=(self.stride, self.stride), use_bias=False, name="downsample_conv")(x)
            identity = self.norm(name="downsample_bn")(identity)
        return nn.relu(out + identity)


class ResNet(nn.Module):
    """Torchvision-topology ResNet returning (pooled_global, layer3_local).

    Input: NHWC float. ``train`` toggles BatchNorm running-average use.
    """

    block: type
    layers: Sequence[int]
    groups: int = 1
    width_per_group: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, return_features: bool = False):
        conv = partial(nn.Conv, dtype=self.dtype, param_dtype=jnp.float32)
        norm = partial(
            SplitBatchNorm, use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, param_dtype=jnp.float32,
        )
        features = {"input": x}
        x = x.astype(self.dtype)
        x = conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)], use_bias=False, name="conv1")(x)
        x = norm(name="bn1")(x)
        x = nn.relu(x)
        features["stem"] = x  # post-relu, pre-maxpool (U-Net skip)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        planes = 64
        for stage_idx, num_blocks in enumerate(self.layers):
            stride = 1 if stage_idx == 0 else 2
            for block_idx in range(num_blocks):
                in_ch = x.shape[-1]
                out_ch = planes * self.block.expansion
                x = self.block(
                    planes=planes,
                    stride=stride if block_idx == 0 else 1,
                    downsample=(block_idx == 0 and (stride != 1 or in_ch != out_ch)),
                    groups=self.groups,
                    base_width=self.width_per_group,
                    conv=conv,
                    norm=norm,
                    name=f"layer{stage_idx + 1}_{block_idx}",
                )(x)
            features[f"layer{stage_idx + 1}"] = x
            planes *= 2

        pooled = jnp.mean(features["layer4"], axis=(1, 2)).astype(jnp.float32)  # AdaptiveAvgPool2d(1)
        if return_features:
            return pooled, features
        return pooled, features["layer3"].astype(jnp.float32)


# registry mirroring reference cnn_backbones naming (cnn_backbones.py:17-80):
# name → (constructor kwargs, global feature dim, 1/16-tap local feature dim)
BACKBONES: dict[str, tuple[dict, int, int]] = {
    "resnet_18": (dict(block=BasicBlock, layers=(2, 2, 2, 2)), 512, 256),
    "resnet_34": (dict(block=BasicBlock, layers=(3, 4, 6, 3)), 512, 256),
    "resnet_50": (dict(block=Bottleneck, layers=(3, 4, 6, 3)), 2048, 1024),
    "resnet_101": (dict(block=Bottleneck, layers=(3, 4, 23, 3)), 2048, 1024),
    "resnext_50": (dict(block=Bottleneck, layers=(3, 4, 6, 3), groups=32, width_per_group=4), 2048, 1024),
    "resnext_101": (dict(block=Bottleneck, layers=(3, 4, 23, 3), groups=32, width_per_group=8), 2048, 1024),
}


BACKBONES.update(DENSENETS)


def make_backbone(name: str, dtype=jnp.float32, module_name: str = "backbone"):
    spec, feature_dim, interm_dim = BACKBONES[name]
    if name.startswith("densenet"):
        return DenseNet(**spec, dtype=dtype, name=module_name), feature_dim, interm_dim
    return ResNet(**spec, dtype=dtype, name=module_name), feature_dim, interm_dim
