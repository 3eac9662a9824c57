"""End-to-end torch→flax weight-import parity.

Builds real torch modules (HF BertModel offline-init, a minimal torch ResNet,
torch TransformerEncoderLayer), imports their state dicts through
``gloria_tpu.utils.torch_import`` and checks forward outputs match.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from gloria_tpu.models.bert import BertConfig, BertModel
from gloria_tpu.models.gloria_model import TransformerEncoderLayer
from gloria_tpu.models.resnet import ResNet, Bottleneck
from gloria_tpu.utils import torch_import

jax.config.update("jax_default_matmul_precision", "highest")


def test_bert_import_matches_hf_forward():
    import transformers

    hf_cfg = transformers.BertConfig(
        vocab_size=99, hidden_size=32, num_hidden_layers=3, num_attention_heads=4,
        intermediate_size=48, max_position_embeddings=40, type_vocab_size=2,
    )
    torch.manual_seed(0)
    hf = transformers.BertModel(hf_cfg)
    hf.eval()

    ids = torch.randint(0, 99, (2, 11))
    mask = torch.ones(2, 11, dtype=torch.long)
    mask[1, 7:] = 0
    with torch.no_grad():
        out = hf(ids, attention_mask=mask, output_hidden_states=True)

    cfg = BertConfig(
        vocab_size=99, hidden_size=32, num_layers=3, num_heads=4,
        intermediate_size=48, max_position_embeddings=40,
    )
    params = torch_import.import_bert(hf.state_dict(), num_layers=3, num_heads=4)
    model = BertModel(cfg)
    seq, pooled, states = model.apply(
        {"params": params}, jnp.asarray(ids.numpy()), jnp.asarray(mask.numpy())
    )
    np.testing.assert_allclose(np.asarray(seq), out.last_hidden_state.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pooled), out.pooler_output.numpy(), rtol=1e-4, atol=1e-5)
    for i, h in enumerate(out.hidden_states):
        np.testing.assert_allclose(np.asarray(states[i]), h.numpy(), rtol=1e-4, atol=1e-5)


class _TorchBottleneck(torch.nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(planes)
        self.conv2 = torch.nn.Conv2d(planes, planes, 3, stride=stride, padding=1, bias=False)
        self.bn2 = torch.nn.BatchNorm2d(planes)
        self.conv3 = torch.nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = torch.nn.BatchNorm2d(planes * 4)
        self.relu = torch.nn.ReLU()
        self.downsample = downsample

    def forward(self, x):
        idt = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            idt = self.downsample(x)
        return self.relu(out + idt)


class _TorchMiniResNet(torch.nn.Module):
    """torchvision-topology ResNet with bottleneck blocks; ``layers=(3,4,6,3)``
    reproduces the full resnet50 topology (reference zoo backbone,
    ``gloria/models/cnn_backbones.py``)."""

    def __init__(self, layers=(1, 1, 1, 1)):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(64)
        self.relu = torch.nn.ReLU()
        self.maxpool = torch.nn.MaxPool2d(3, stride=2, padding=1)
        inplanes = 64
        for i, (planes, n_blocks) in enumerate(zip([64, 128, 256, 512], layers)):
            stride = 1 if i == 0 else 2
            down = torch.nn.Sequential(
                torch.nn.Conv2d(inplanes, planes * 4, 1, stride=stride, bias=False),
                torch.nn.BatchNorm2d(planes * 4),
            )
            blocks = [_TorchBottleneck(inplanes, planes, stride, down)]
            inplanes = planes * 4
            for _ in range(n_blocks - 1):
                blocks.append(_TorchBottleneck(inplanes, planes))
            setattr(self, f"layer{i+1}", torch.nn.Sequential(*blocks))

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer1(x)
        x = self.layer2(x)
        x = self.layer3(x)
        local = x
        x = self.layer4(x)
        pooled = x.mean(dim=(2, 3))
        return pooled, local


def test_resnet_import_matches_torch_forward():
    torch.manual_seed(1)
    tm = _TorchMiniResNet()
    tm.eval()
    # randomize BN stats so running-average use is actually exercised
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 1.5)

    x = torch.randn(2, 3, 64, 64)
    with torch.no_grad():
        ref_pooled, ref_local = tm(x)

    params, stats = torch_import.import_resnet(tm.state_dict(), layers=(1, 1, 1, 1))
    model = ResNet(block=Bottleneck, layers=(1, 1, 1, 1))
    pooled, local = model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x.permute(0, 2, 3, 1).numpy()), train=False,
    )
    np.testing.assert_allclose(np.asarray(pooled), ref_pooled.numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(local), ref_local.permute(0, 2, 3, 1).numpy(), rtol=1e-3, atol=1e-4
    )


def test_transformer_layer_import_matches_torch():
    torch.manual_seed(2)
    tl = torch.nn.TransformerEncoderLayer(d_model=32, nhead=4)
    tl.eval()
    x = torch.randn(9, 2, 32)  # [seq, batch, dim] torch convention
    with torch.no_grad():
        ref = tl(x)

    params = torch_import.import_transformer_layer(
        {f"layers.0.{k}": v for k, v in tl.state_dict().items()}, "layers.0", num_heads=4
    )
    layer = TransformerEncoderLayer(d_model=32, num_heads=4)
    got = layer.apply({"params": params}, jnp.asarray(x.permute(1, 0, 2).numpy()))
    np.testing.assert_allclose(
        np.asarray(got), ref.permute(1, 0, 2).numpy(), rtol=1e-4, atol=1e-5
    )


# -- DenseNet ------------------------------------------------------------------

class _TorchMiniDenseNet(torch.nn.Module):
    """torchvision densenet state-dict key layout (features.denseblockB.denselayerL.*)
    at toy scale: growth 8, blocks (2, 2, 2, 2), init 16."""

    GROWTH, BLOCKS, INIT = 8, (2, 2, 2, 2), 16

    def __init__(self):
        super().__init__()
        import collections

        features = collections.OrderedDict()
        features["conv0"] = torch.nn.Conv2d(3, self.INIT, 7, stride=2, padding=3, bias=False)
        features["norm0"] = torch.nn.BatchNorm2d(self.INIT)
        ch = self.INIT
        for b, n in enumerate(self.BLOCKS, start=1):
            block = torch.nn.ModuleDict()
            for l in range(1, n + 1):
                layer = torch.nn.Module()
                layer.norm1 = torch.nn.BatchNorm2d(ch)
                layer.conv1 = torch.nn.Conv2d(ch, 4 * self.GROWTH, 1, bias=False)
                layer.norm2 = torch.nn.BatchNorm2d(4 * self.GROWTH)
                layer.conv2 = torch.nn.Conv2d(4 * self.GROWTH, self.GROWTH, 3, padding=1, bias=False)
                block[f"denselayer{l}"] = layer
                ch += self.GROWTH
            features[f"denseblock{b}"] = block
            if b != len(self.BLOCKS):
                tr = torch.nn.Module()
                tr.norm = torch.nn.BatchNorm2d(ch)
                ch //= 2
                tr.conv = torch.nn.Conv2d(tr.norm.num_features, ch, 1, bias=False)
                features[f"transition{b}"] = tr
        features["norm5"] = torch.nn.BatchNorm2d(ch)
        self.features = torch.nn.ModuleDict(features)

    def forward(self, x):
        import torch.nn.functional as F

        f = self.features
        x = F.max_pool2d(F.relu(f["norm0"](f["conv0"](x))), 3, stride=2, padding=1)
        local = None
        for b in range(1, len(self.BLOCKS) + 1):
            block = f[f"denseblock{b}"]
            for l in range(1, self.BLOCKS[b - 1] + 1):
                layer = block[f"denselayer{l}"]
                out = layer.conv1(F.relu(layer.norm1(x)))
                out = layer.conv2(F.relu(layer.norm2(out)))
                x = torch.cat([x, out], dim=1)
            if b == 3:
                local = x
            if b != len(self.BLOCKS):
                tr = f[f"transition{b}"]
                x = F.avg_pool2d(tr.conv(F.relu(tr.norm(x))), 2, stride=2)
        x = F.relu(f["norm5"](x))
        return x.mean(dim=(2, 3)), local


def test_densenet_import_matches_torch_forward():
    from gloria_tpu.models.densenet import DenseNet

    torch.manual_seed(4)
    tm = _TorchMiniDenseNet().eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.7, 1.3)

    x = torch.randn(2, 3, 64, 64)
    with torch.no_grad():
        ref_pooled, ref_local = tm(x)

    params, stats = torch_import.import_densenet(tm.state_dict(), block_config=tm.BLOCKS)
    model = DenseNet(growth_rate=tm.GROWTH, block_config=tm.BLOCKS, num_init_features=tm.INIT)
    pooled, local = model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x.permute(0, 2, 3, 1).numpy()), train=False,
    )
    np.testing.assert_allclose(np.asarray(pooled), ref_pooled.numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(local), ref_local.permute(0, 2, 3, 1).numpy(), rtol=1e-3, atol=1e-4)


def test_densenet_backbone_registry_forward():
    """DenseNet is usable end-to-end through the ImageEncoder registry path
    (the reference's densenet_forward is an unreachable stub —
    vision_model.py:88-89)."""
    from gloria_tpu.models.resnet import BACKBONES
    from gloria_tpu.models.vision_model import ImageEncoder

    assert {"densenet_121", "densenet_161", "densenet_169"} <= set(BACKBONES)
    import jax

    enc = ImageEncoder(model_name="densenet_121", output_dim=32, input_size=64)
    v = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    g, l, (h, w) = enc.apply(v, jnp.zeros((1, 64, 64, 3)), train=False)
    assert g.shape == (1, 32)
    assert l.shape == (1, h * w, 32)


def test_import_gloria_routes_densenet_checkpoints():
    """A gloria.-prefixed checkpoint whose image tower is a torchvision
    DenseNet must import through the densenet mapper automatically."""
    torch.manual_seed(5)
    import transformers

    hf_cfg = transformers.BertConfig(
        vocab_size=64, hidden_size=16, num_hidden_layers=1, num_attention_heads=2,
        intermediate_size=32, max_position_embeddings=32, type_vocab_size=2)
    bert = transformers.BertModel(hf_cfg)
    dn = _TorchMiniDenseNet()
    # norm5 channels of the mini net: follow the block/transition arithmetic
    ch = dn.INIT
    for b, n in enumerate(dn.BLOCKS, start=1):
        ch += n * dn.GROWTH
        if b != len(dn.BLOCKS):
            ch //= 2
    g_emb = torch.nn.Linear(ch, 16)
    # local tap channels = denseblock3 output
    ch3 = dn.INIT
    for b, n in enumerate(dn.BLOCKS[:3], start=1):
        ch3 += n * dn.GROWTH
        if b != 3:
            ch3 //= 2
    l_emb = torch.nn.Conv2d(ch3, 16, 1, bias=False)

    state = {}
    for k, v in bert.state_dict().items():
        state[f"gloria.text_encoder.model.{k}"] = v
    for k, v in dn.state_dict().items():
        state[f"gloria.img_encoder.model.{k}"] = v
    state["gloria.img_encoder.global_embedder.weight"] = g_emb.weight
    state["gloria.img_encoder.global_embedder.bias"] = g_emb.bias
    state["gloria.img_encoder.local_embedder.weight"] = l_emb.weight

    variables = torch_import.import_gloria(state, bert_layers=1, bert_heads=2)
    bb = variables["params"]["img_encoder"]["backbone"]
    assert "conv0" in bb and "denseblock3_denselayer1" in bb and "norm5" in bb
    np.testing.assert_allclose(
        bb["denseblock2_denselayer2"]["conv2"]["kernel"],
        dn.state_dict()["features.denseblock2.denselayer2.conv2.weight"]
        .numpy().transpose(2, 3, 1, 0), rtol=1e-6)
