"""Import PyTorch checkpoints into gloria_tpu parameter trees.

Covers the three torch weight sources the reference ecosystem produces:

1. torchvision ResNet/ResNeXt state dicts → :class:`gloria_tpu.models.resnet.ResNet`
2. HuggingFace ``BertModel`` state dicts → :class:`gloria_tpu.models.bert.BertModel`
3. Reference GLoRIA Lightning checkpoints (``gloria.``-prefixed keys, see
   ``/root/reference/gloria/gloria.py:81-94``) → full :class:`GLoRIA` variables.

Tensors are accepted as anything with ``.numpy()`` or ndarray; no torch
import is required here (callers load the pickle with torch on host).

Layout conversions:
- conv weights OIHW → HWIO,
- dense weights [out, in] → [in, out],
- BN running stats → flax ``batch_stats``,
- torch ``nn.TransformerEncoderLayer`` packed qkv (``in_proj_weight``) →
  flax MultiHeadDotProductAttention per-head kernels.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def _np(t: Any) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach()
    if hasattr(t, "numpy"):
        t = t.numpy()
    return np.asarray(t, dtype=np.float32)


def _conv(w) -> np.ndarray:
    return _np(w).transpose(2, 3, 1, 0)  # OIHW → HWIO


def _dense(w) -> np.ndarray:
    return _np(w).T


# ---------------------------------------------------------------------------
# ResNet
# ---------------------------------------------------------------------------

def import_resnet(state: Mapping[str, Any], layers: tuple[int, ...]) -> tuple[dict, dict]:
    """torchvision state dict → (params, batch_stats) for ``ResNet``."""
    params: dict = {}
    stats: dict = {}

    def bn(src: str, dst: str):
        params[dst] = {"scale": _np(state[f"{src}.weight"]), "bias": _np(state[f"{src}.bias"])}
        stats[dst] = {"mean": _np(state[f"{src}.running_mean"]), "var": _np(state[f"{src}.running_var"])}

    params["conv1"] = {"kernel": _conv(state["conv1.weight"])}
    bn("bn1", "bn1")

    for stage, n_blocks in enumerate(layers, start=1):
        for b in range(n_blocks):
            src = f"layer{stage}.{b}"
            dst = f"layer{stage}_{b}"
            block_p: dict = {}
            block_s: dict = {}
            k = 1
            while f"{src}.conv{k}.weight" in state:
                block_p[f"conv{k}"] = {"kernel": _conv(state[f"{src}.conv{k}.weight"])}
                block_p[f"bn{k}"] = {
                    "scale": _np(state[f"{src}.bn{k}.weight"]),
                    "bias": _np(state[f"{src}.bn{k}.bias"]),
                }
                block_s[f"bn{k}"] = {
                    "mean": _np(state[f"{src}.bn{k}.running_mean"]),
                    "var": _np(state[f"{src}.bn{k}.running_var"]),
                }
                k += 1
            if f"{src}.downsample.0.weight" in state:
                block_p["downsample_conv"] = {"kernel": _conv(state[f"{src}.downsample.0.weight"])}
                block_p["downsample_bn"] = {
                    "scale": _np(state[f"{src}.downsample.1.weight"]),
                    "bias": _np(state[f"{src}.downsample.1.bias"]),
                }
                block_s["downsample_bn"] = {
                    "mean": _np(state[f"{src}.downsample.1.running_mean"]),
                    "var": _np(state[f"{src}.downsample.1.running_var"]),
                }
            params[dst] = block_p
            stats[dst] = block_s
    return params, stats


def import_densenet(state: Mapping[str, Any], block_config: tuple[int, ...]) -> tuple[dict, dict]:
    """torchvision ``densenet*.state_dict()`` → (params, batch_stats) for
    :class:`gloria_tpu.models.densenet.DenseNet`.  torchvision nests
    everything under ``features.``; our modules are flat
    ``denseblock{b}_denselayer{l}`` / ``transition{b}``."""
    params: dict = {}
    stats: dict = {}

    def bn(src: str, dst_p: dict, dst_s: dict, name: str):
        dst_p[name] = {"scale": _np(state[f"{src}.weight"]), "bias": _np(state[f"{src}.bias"])}
        dst_s[name] = {"mean": _np(state[f"{src}.running_mean"]), "var": _np(state[f"{src}.running_var"])}

    params["conv0"] = {"kernel": _conv(state["features.conv0.weight"])}
    bn("features.norm0", params, stats, "norm0")
    for b, n_layers in enumerate(block_config, start=1):
        for l in range(1, n_layers + 1):
            src = f"features.denseblock{b}.denselayer{l}"
            dst = f"denseblock{b}_denselayer{l}"
            p, s = {}, {}
            bn(f"{src}.norm1", p, s, "norm1")
            p["conv1"] = {"kernel": _conv(state[f"{src}.conv1.weight"])}
            bn(f"{src}.norm2", p, s, "norm2")
            p["conv2"] = {"kernel": _conv(state[f"{src}.conv2.weight"])}
            params[dst], stats[dst] = p, s
        if b != len(block_config):
            src = f"features.transition{b}"
            p, s = {}, {}
            bn(f"{src}.norm", p, s, "norm")
            p["conv"] = {"kernel": _conv(state[f"{src}.conv.weight"])}
            params[f"transition{b}"], stats[f"transition{b}"] = p, s
    bn("features.norm5", params, stats, "norm5")
    return params, stats


# ---------------------------------------------------------------------------
# BERT
# ---------------------------------------------------------------------------

def import_bert(state: Mapping[str, Any], num_layers: int, num_heads: int) -> dict:
    """HF ``BertModel`` state dict → params for ``gloria_tpu.models.bert.BertModel``."""

    def ln(src: str) -> dict:
        return {"scale": _np(state[f"{src}.weight"]), "bias": _np(state[f"{src}.bias"])}

    def dense(src: str) -> dict:
        return {"kernel": _dense(state[f"{src}.weight"]), "bias": _np(state[f"{src}.bias"])}

    params: dict = {
        "word_embeddings": {"embedding": _np(state["embeddings.word_embeddings.weight"])},
        "position_embeddings": {"embedding": _np(state["embeddings.position_embeddings.weight"])},
        "token_type_embeddings": {"embedding": _np(state["embeddings.token_type_embeddings.weight"])},
        "embeddings_ln": ln("embeddings.LayerNorm"),
        "pooler": dense("pooler.dense"),
    }
    for i in range(num_layers):
        src = f"encoder.layer.{i}"
        params[f"layer_{i}"] = {
            "attention": {
                "query": dense(f"{src}.attention.self.query"),
                "key": dense(f"{src}.attention.self.key"),
                "value": dense(f"{src}.attention.self.value"),
                "out": dense(f"{src}.attention.output.dense"),
                "ln": ln(f"{src}.attention.output.LayerNorm"),
            },
            "intermediate": dense(f"{src}.intermediate.dense"),
            "output": dense(f"{src}.output.dense"),
            "ln": ln(f"{src}.output.LayerNorm"),
        }
    return params


# ---------------------------------------------------------------------------
# torch TransformerEncoderLayer → flax MultiHeadDotProductAttention layer
# ---------------------------------------------------------------------------

def import_transformer_layer(state: Mapping[str, Any], prefix: str, num_heads: int) -> dict:
    d = _np(state[f"{prefix}.linear1.weight"]).shape[1]
    head = d // num_heads
    in_w = _np(state[f"{prefix}.self_attn.in_proj_weight"])  # [3D, D]
    in_b = _np(state[f"{prefix}.self_attn.in_proj_bias"])
    qkv_w = [in_w[i * d:(i + 1) * d].T.reshape(d, num_heads, head) for i in range(3)]
    qkv_b = [in_b[i * d:(i + 1) * d].reshape(num_heads, head) for i in range(3)]
    out_w = _np(state[f"{prefix}.self_attn.out_proj.weight"]).T.reshape(num_heads, head, d)
    return {
        "self_attn": {
            "query": {"kernel": qkv_w[0], "bias": qkv_b[0]},
            "key": {"kernel": qkv_w[1], "bias": qkv_b[1]},
            "value": {"kernel": qkv_w[2], "bias": qkv_b[2]},
            "out": {"kernel": out_w, "bias": _np(state[f"{prefix}.self_attn.out_proj.bias"])},
        },
        "linear1": {"kernel": _dense(state[f"{prefix}.linear1.weight"]), "bias": _np(state[f"{prefix}.linear1.bias"])},
        "linear2": {"kernel": _dense(state[f"{prefix}.linear2.weight"]), "bias": _np(state[f"{prefix}.linear2.bias"])},
        "norm1": {"scale": _np(state[f"{prefix}.norm1.weight"]), "bias": _np(state[f"{prefix}.norm1.bias"])},
        "norm2": {"scale": _np(state[f"{prefix}.norm2.weight"]), "bias": _np(state[f"{prefix}.norm2.bias"])},
    }


# ---------------------------------------------------------------------------
# Full GLoRIA checkpoint
# ---------------------------------------------------------------------------

def strip_gloria_prefix(state: Mapping[str, Any]) -> dict:
    """Key surgery from the reference loaders (``gloria.py:85-89``)."""
    return {k.split("gloria.")[-1]: v for k, v in state.items()}


def import_gloria(
    state: Mapping[str, Any],
    *,
    resnet_layers: tuple[int, ...] = (3, 4, 6, 3),
    bert_layers: int = 12,
    bert_heads: int = 12,
    transformer_layers: int = 0,
    transformer_heads: int = 1,
) -> dict:
    """Reference GLoRIA state dict (prefix-stripped) → flax ``variables``."""
    state = strip_gloria_prefix(state)
    resnet_state = {k[len("img_encoder.model."):]: v for k, v in state.items() if k.startswith("img_encoder.model.")}
    bert_state = {k[len("text_encoder.model."):]: v for k, v in state.items() if k.startswith("text_encoder.model.")}
    if "features.conv0.weight" in resnet_state:  # torchvision DenseNet layout
        block_config = tuple(
            max(int(k.split(".denselayer")[1].split(".")[0])
                for k in resnet_state if k.startswith(f"features.denseblock{b}."))
            for b in range(1, 5)
        )
        rn_params, rn_stats = import_densenet(resnet_state, block_config)
    else:
        rn_params, rn_stats = import_resnet(resnet_state, resnet_layers)
    params: dict = {
        "img_encoder": {
            "backbone": rn_params,
            "global_embedder": {
                "kernel": _dense(state["img_encoder.global_embedder.weight"]),
                "bias": _np(state["img_encoder.global_embedder.bias"]),
            },
            "local_embedder": {"kernel": _conv(state["img_encoder.local_embedder.weight"])},
        },
        "text_encoder": {"bert": import_bert(bert_state, bert_layers, bert_heads)},
    }
    if "position_embeddings.image_position_embeddings.weight" in state:
        params["position_embeddings"] = {
            "table": {"embedding": _np(state["position_embeddings.image_position_embeddings.weight"])}
        }
    for i in range(transformer_layers):
        params[f"image_transformer_{i}"] = import_transformer_layer(
            state, f"image_transformer.layers.{i}", transformer_heads
        )
    if "no_attn_vec" in state:
        params["no_attn_vec"] = _np(state["no_attn_vec"])
    return {"params": params, "batch_stats": {"img_encoder": {"backbone": rn_stats}}}
