"""Streamlit annotation UI for word-region attention inspection.

Equivalent of the reference ``interface.py`` (398 lines): loads a checkpoint
zoo, an ImaGenome val/gold dataset, lets the annotator pick an instance and a
sentence (or type a custom prompt), renders the attention heatmap (bilinear
or pyramid overlay) with bbox overlay and thresholding, and records 3-question
1-5 scale annotations to per-annotator CSVs (reference ``OnSubmit``,
interface.py:99-111), with optional model anonymization.

Run:  streamlit run interface.py -- --config configs/imagenome_pretrain_val_config.yaml
"""

from __future__ import annotations

import argparse
import hashlib
import os
import random
from pathlib import Path

import numpy as np
import pandas as pd

try:
    import streamlit as st
except ImportError as exc:  # streamlit is not baked into every image
    raise SystemExit(
        "streamlit is required for the annotation UI: pip install streamlit"
    ) from exc

from gloria_tpu import api
from gloria_tpu.configs import Config, load_config
from gloria_tpu.utils.viz import draw_bounding_boxes, get_attn_overlay, heatmap_overlay

ANNOTATION_DIR = Path("annotations")
QUESTIONS = [
    "Does the attention highlight the region(s) described by the sentence?",
    "Does the attention avoid unrelated regions?",
    "Overall, is the attention map intuitive for this sentence?",
]


@st.cache_resource
def get_config(path: str) -> Config:
    return load_config(path)


@st.cache_resource
def load_models(ckpt_dir: str) -> dict[str, str]:
    """Checkpoint zoo: every checkpoint directory under ckpt_dir
    (reference interface.py:28-44)."""
    zoo = {}
    for p in sorted(Path(ckpt_dir).glob("**/manifest.json")):
        for entry_dir in p.parent.iterdir():
            if entry_dir.is_dir():
                zoo[f"{p.parent.name}/{entry_dir.name}"] = str(entry_dir)
    return zoo


@st.cache_resource
def load_gloria_model(ckpt_path: str):
    return api.load_gloria(ckpt_path)


@st.cache_resource
def load_dataset(config_path: str, split: str):
    from gloria_tpu.data.data_module import build_data_module

    cfg = get_config(config_path)
    dm = build_data_module(cfg)
    return dm.dataset(split), dm


def get_attention(model, image: np.ndarray, prompt: str, mode: str = "upsample") -> np.ndarray:
    """Single (image, prompt) pair → word-mean attention overlay
    (reference get_attention, interface.py:317-334)."""
    imgs = model.process_img([image])
    txts = model.process_text([prompt])
    img_l, _, txt_l, _ = model.encode(imgs, txts)
    attn = np.asarray(model.get_attn_maps(img_l, txt_l, txts["cap_lens"]))[0]
    L = int(txts["cap_lens"][0])
    mean_attn = attn[:L].mean(0)
    side = int(round(mean_attn.shape[-1] ** 0.5))
    return get_attn_overlay(mean_attn.reshape(side, side), image.shape[:2], mode)


def on_submit(annotator: str, record: dict) -> None:
    ANNOTATION_DIR.mkdir(exist_ok=True)
    path = ANNOTATION_DIR / f"{annotator}.csv"
    df = pd.read_csv(path) if path.exists() else pd.DataFrame()
    df = pd.concat([df, pd.DataFrame([record])], ignore_index=True)
    df.to_csv(path, index=False)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="configs/imagenome_pretrain_val_config.yaml")
    parser.add_argument("--ckpt_dir", default="./data/ckpt")
    parser.add_argument("--split", default="valid")
    args, _ = parser.parse_known_args()

    st.title("Word-region attention annotation")
    annotator = st.sidebar.text_input("Annotator name", value="anonymous")
    anonymize = st.sidebar.checkbox("Anonymize models", value=True)

    zoo = load_models(args.ckpt_dir)
    if not zoo:
        st.warning(f"No checkpoints found under {args.ckpt_dir}")
        return
    names = sorted(zoo)
    display = (
        {f"model_{hashlib.sha1(n.encode()).hexdigest()[:6]}": n for n in names}
        if anonymize else {n: n for n in names}
    )
    model_key = st.sidebar.selectbox("Model", sorted(display))
    model = load_gloria_model(zoo[display[model_key]])

    dataset, _dm = load_dataset(args.config, args.split)
    idx = st.sidebar.number_input("Instance", min_value=0, max_value=len(dataset) - 1, value=0)
    instance = dataset[int(idx)]
    image = instance["image"]

    sentence_options = [instance["report"]]
    objects = instance.get("objects")
    if objects:
        sentence_options = [v["sentence"] for v in objects["sent_to_bboxes"].values()]
    use_custom = st.checkbox("Custom prompt")
    prompt = st.text_input("Prompt") if use_custom else st.selectbox("Sentence", sentence_options)

    mode = st.radio("Overlay", ["upsample", "pyramid"], horizontal=True)
    threshold = st.slider("Threshold", 0.0, 1.0, 0.0)
    show_boxes = st.checkbox("Show boxes", value=True)

    if prompt:
        overlay = get_attention(model, image, prompt, mode)
        norm = (overlay - overlay.min()) / (overlay.max() - overlay.min() + 1e-8)
        norm = np.where(norm >= threshold, norm, 0.0)
        rendered = heatmap_overlay(image, norm)
        if show_boxes and instance.get("bboxes"):
            rendered = draw_bounding_boxes(rendered, instance["bboxes"])
        st.image(rendered, caption=prompt, use_container_width=True)

        st.subheader("Annotation")
        scores = {q: st.slider(q, 1, 5, 3, key=q) for q in QUESTIONS}
        if st.button("Submit"):
            on_submit(annotator, {
                "instance_id": instance.get("id", idx),
                "model": display[model_key] if not anonymize else model_key,
                "prompt": prompt,
                "overlay_mode": mode,
                **{f"q{i}": v for i, v in enumerate(scores.values())},
            })
            st.success("Saved.")


if __name__ == "__main__":
    main()
