"""Export gloria_tpu parameter trees back to reference torch checkpoints.

Inverse of :mod:`gloria_tpu.utils.torch_import`: a model trained here can be
handed back to the PyTorch reference (or any of its zoo consumers) as a
Lightning-format ``.ckpt`` with the reference's ``gloria.``-prefixed keys
(``/root/reference/gloria/gloria.py:81-94``), the HF ``position_ids``
buffer its pinned transformers==4.2.1 expects under strict loading, and the
``hyper_parameters`` block (written as an OmegaConf DictConfig when
omegaconf is importable — the reference loader does attribute access on it;
plain dict otherwise, which gloria_tpu's own loader accepts).
Round-trip is exact: every conversion is a transpose/reshape of f32 arrays
(tested export→import→identical tree + identical forward).

Layout conversions (mirror of torch_import):
- conv kernels HWIO → OIHW,
- dense kernels [in, out] → [out, in],
- flax ``batch_stats`` → BN running stats,
- flax MultiHeadDotProductAttention per-head kernels → packed
  ``in_proj_weight`` qkv of torch ``nn.TransformerEncoderLayer``.
"""

from __future__ import annotations

from typing import Any

import numpy as np


def _np(x: Any) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def _conv(w) -> np.ndarray:
    return _np(w).transpose(3, 2, 0, 1)  # HWIO → OIHW


def _dense(w) -> np.ndarray:
    return _np(w).T


# ---------------------------------------------------------------------------
# ResNet / DenseNet
# ---------------------------------------------------------------------------

def export_resnet(params: dict, stats: dict) -> dict:
    """(params, batch_stats) of ``ResNet`` → torchvision state dict."""
    out: dict = {}

    def bn(src_p: dict, src_s: dict, dst: str):
        out[f"{dst}.weight"] = _np(src_p["scale"])
        out[f"{dst}.bias"] = _np(src_p["bias"])
        out[f"{dst}.running_mean"] = _np(src_s["mean"])
        out[f"{dst}.running_var"] = _np(src_s["var"])

    out["conv1.weight"] = _conv(params["conv1"]["kernel"])
    bn(params["bn1"], stats["bn1"], "bn1")
    for name in sorted(k for k in params if k.startswith("layer")):
        stage, b = name[len("layer"):].split("_")
        src_p, src_s = params[name], stats[name]
        dst = f"layer{stage}.{b}"
        k = 1
        while f"conv{k}" in src_p:
            out[f"{dst}.conv{k}.weight"] = _conv(src_p[f"conv{k}"]["kernel"])
            bn(src_p[f"bn{k}"], src_s[f"bn{k}"], f"{dst}.bn{k}")
            k += 1
        if "downsample_conv" in src_p:
            out[f"{dst}.downsample.0.weight"] = _conv(src_p["downsample_conv"]["kernel"])
            bn(src_p["downsample_bn"], src_s["downsample_bn"], f"{dst}.downsample.1")
    return out


def export_densenet(params: dict, stats: dict) -> dict:
    """(params, batch_stats) of ``DenseNet`` → torchvision state dict."""
    out: dict = {}

    def bn(src_p: dict, src_s: dict, dst: str):
        out[f"{dst}.weight"] = _np(src_p["scale"])
        out[f"{dst}.bias"] = _np(src_p["bias"])
        out[f"{dst}.running_mean"] = _np(src_s["mean"])
        out[f"{dst}.running_var"] = _np(src_s["var"])

    out["features.conv0.weight"] = _conv(params["conv0"]["kernel"])
    bn(params["norm0"], stats["norm0"], "features.norm0")
    for name in params:
        if name.startswith("denseblock"):
            block, layer = name.split("_")
            src = f"features.{block}.{layer}"
            bn(params[name]["norm1"], stats[name]["norm1"], f"{src}.norm1")
            out[f"{src}.conv1.weight"] = _conv(params[name]["conv1"]["kernel"])
            bn(params[name]["norm2"], stats[name]["norm2"], f"{src}.norm2")
            out[f"{src}.conv2.weight"] = _conv(params[name]["conv2"]["kernel"])
        elif name.startswith("transition"):
            src = f"features.{name}"
            bn(params[name]["norm"], stats[name]["norm"], f"{src}.norm")
            out[f"{src}.conv.weight"] = _conv(params[name]["conv"]["kernel"])
    bn(params["norm5"], stats["norm5"], "features.norm5")
    return out


# ---------------------------------------------------------------------------
# BERT
# ---------------------------------------------------------------------------

def export_bert(params: dict) -> dict:
    """``gloria_tpu.models.bert.BertModel`` params → HF ``BertModel`` state dict."""
    out: dict = {}

    def ln(src: dict, dst: str):
        out[f"{dst}.weight"] = _np(src["scale"])
        out[f"{dst}.bias"] = _np(src["bias"])

    def dense(src: dict, dst: str):
        out[f"{dst}.weight"] = _dense(src["kernel"])
        out[f"{dst}.bias"] = _np(src["bias"])

    out["embeddings.word_embeddings.weight"] = _np(params["word_embeddings"]["embedding"])
    out["embeddings.position_embeddings.weight"] = _np(params["position_embeddings"]["embedding"])
    # transformers==4.2.1 (the reference's pin) registers position_ids as a
    # persistent buffer, so strict load_state_dict requires the key
    out["embeddings.position_ids"] = np.arange(
        params["position_embeddings"]["embedding"].shape[0], dtype=np.int64)[None, :]
    out["embeddings.token_type_embeddings.weight"] = _np(params["token_type_embeddings"]["embedding"])
    ln(params["embeddings_ln"], "embeddings.LayerNorm")
    dense(params["pooler"], "pooler.dense")
    i = 0
    while f"layer_{i}" in params:
        src = params[f"layer_{i}"]
        dst = f"encoder.layer.{i}"
        dense(src["attention"]["query"], f"{dst}.attention.self.query")
        dense(src["attention"]["key"], f"{dst}.attention.self.key")
        dense(src["attention"]["value"], f"{dst}.attention.self.value")
        dense(src["attention"]["out"], f"{dst}.attention.output.dense")
        ln(src["attention"]["ln"], f"{dst}.attention.output.LayerNorm")
        dense(src["intermediate"], f"{dst}.intermediate.dense")
        dense(src["output"], f"{dst}.output.dense")
        ln(src["ln"], f"{dst}.output.LayerNorm")
        i += 1
    return out


# ---------------------------------------------------------------------------
# flax MultiHeadDotProductAttention layer → torch TransformerEncoderLayer
# ---------------------------------------------------------------------------

def export_transformer_layer(params: dict, prefix: str) -> dict:
    attn = params["self_attn"]
    d = _np(attn["out"]["bias"]).shape[0]
    # per-head [D, H, hd] kernels → packed [3D, D] in_proj (torch rows = out)
    qkv_w = np.concatenate(
        [_np(attn[k]["kernel"]).reshape(d, d).T for k in ("query", "key", "value")])
    qkv_b = np.concatenate(
        [_np(attn[k]["bias"]).reshape(d) for k in ("query", "key", "value")])
    out = {
        f"{prefix}.self_attn.in_proj_weight": qkv_w,
        f"{prefix}.self_attn.in_proj_bias": qkv_b,
        f"{prefix}.self_attn.out_proj.weight": _np(attn["out"]["kernel"]).reshape(d, d).T,
        f"{prefix}.self_attn.out_proj.bias": _np(attn["out"]["bias"]),
        f"{prefix}.linear1.weight": _dense(params["linear1"]["kernel"]),
        f"{prefix}.linear1.bias": _np(params["linear1"]["bias"]),
        f"{prefix}.linear2.weight": _dense(params["linear2"]["kernel"]),
        f"{prefix}.linear2.bias": _np(params["linear2"]["bias"]),
        f"{prefix}.norm1.weight": _np(params["norm1"]["scale"]),
        f"{prefix}.norm1.bias": _np(params["norm1"]["bias"]),
        f"{prefix}.norm2.weight": _np(params["norm2"]["scale"]),
        f"{prefix}.norm2.bias": _np(params["norm2"]["bias"]),
    }
    return out


# ---------------------------------------------------------------------------
# Full GLoRIA variables → reference state dict / Lightning .ckpt
# ---------------------------------------------------------------------------

def export_gloria(variables: dict) -> dict:
    """flax ``variables`` → flat ``gloria.``-prefixed reference state dict."""
    params = variables["params"]
    stats = (variables.get("batch_stats") or {}).get("img_encoder", {}).get("backbone", {})
    backbone = params["img_encoder"]["backbone"]
    if not stats:
        raise ValueError(
            "variables carry no batch_stats for the image backbone — BN "
            "running stats are part of the reference checkpoint format; "
            "export from a full checkpoint (params + batch_stats), not a "
            "params-only tree")
    if "conv0" in backbone:  # DenseNet layout
        cnn = export_densenet(backbone, stats)
    else:
        cnn = export_resnet(backbone, stats)
    out = {f"img_encoder.model.{k}": v for k, v in cnn.items()}
    out["img_encoder.global_embedder.weight"] = _dense(params["img_encoder"]["global_embedder"]["kernel"])
    out["img_encoder.global_embedder.bias"] = _np(params["img_encoder"]["global_embedder"]["bias"])
    out["img_encoder.local_embedder.weight"] = _conv(params["img_encoder"]["local_embedder"]["kernel"])
    for k, v in export_bert(params["text_encoder"]["bert"]).items():
        out[f"text_encoder.model.{k}"] = v
    if "position_embeddings" in params:
        out["position_embeddings.image_position_embeddings.weight"] = _np(
            params["position_embeddings"]["table"]["embedding"])
    i = 0
    while f"image_transformer_{i}" in params:
        out.update(export_transformer_layer(
            params[f"image_transformer_{i}"], f"image_transformer.layers.{i}"))
        i += 1
    if "no_attn_vec" in params:
        out["no_attn_vec"] = _np(params["no_attn_vec"])
    return {f"gloria.{k}": v for k, v in out.items()}


def save_reference_checkpoint(path, variables: dict, cfg=None) -> None:
    """Write a reference-zoo-format Lightning ``.ckpt`` (torch pickle with
    ``state_dict`` + ``hyper_parameters``) that ``api.load_gloria`` — and the
    reference's own ``load_gloria`` — can consume."""
    import torch

    def to_tensor(v):
        a = np.asarray(v)
        if np.issubdtype(a.dtype, np.floating):
            a = a.astype(np.float32)
        return torch.from_numpy(np.ascontiguousarray(a).copy())

    state_dict = {k: to_tensor(v) for k, v in export_gloria(variables).items()}
    hyper = cfg.to_dict() if hasattr(cfg, "to_dict") else (cfg or {})
    try:
        # the reference's loader does attribute access on hyper_parameters
        # (cfg.model.text...), i.e. expects an OmegaConf DictConfig — emit
        # one when omegaconf is available so the file loads on both sides
        from omegaconf import OmegaConf

        hyper = OmegaConf.create(hyper)
    except ImportError:
        pass
    torch.save({"state_dict": state_dict, "hyper_parameters": hyper}, str(path))


def main(argv=None) -> int:
    """CLI: gloria_tpu orbax checkpoint dir → reference torch .ckpt."""
    import argparse

    ap = argparse.ArgumentParser(description=main.__doc__)
    ap.add_argument("ckpt_dir", help="gloria_tpu orbax checkpoint directory")
    ap.add_argument("out", help="output .ckpt path (reference zoo format)")
    args = ap.parse_args(argv)

    from ..training.checkpoints import load_checkpoint

    state, cfg = load_checkpoint(args.ckpt_dir)
    variables = state if "params" in state else {"params": state}
    save_reference_checkpoint(args.out, variables, cfg)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
