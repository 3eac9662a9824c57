"""Serving-path throughput on the current device.

Measures InferenceEngine.classify (image tower once + cached-class fused
similarity scoring) at the zero-shot shape: 5 CheXpert classes × 5 prompts,
ResNet-50 + BERT-base, bucketed batches.

    python scripts/bench_serving.py [--batch 64 --steps 10]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

from _timing import timeit_ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    import jax.numpy as jnp

    from gloria_tpu import api
    from gloria_tpu.configs import Config
    from gloria_tpu.data.tokenizer import WordPieceTokenizer
    from gloria_tpu.models import GLoRIA
    from gloria_tpu.serving import InferenceEngine

    cfg = Config({
        "model": {
            "gloria": {"temp1": 4.0, "temp2": 5.0, "temp3": 10.0},
            "vision": {"model_name": "resnet_50"},
            "text": {"embedding_dim": 768, "last_n_layers": 4, "agg_tokens": True,
                      "aggregate_method": "sum",
                      "bert_config": {"vocab_size": 28996, "hidden_size": 768,
                                       "num_layers": 12, "num_heads": 12,
                                       "intermediate_size": 3072,
                                       "max_position_embeddings": 512}},
        },
        "data": {"image": {"imsize": 256}, "text": {"word_num": 97}},
        "transforms": {"norm": "imagenet", "center_crop": {"crop_size": 224}},
    })
    classes = api.generate_chexpert_class_prompts(n=5)
    corpus = ["no finding"] + [p for ps in classes.values() for p in ps]
    tok = WordPieceTokenizer.from_corpus(corpus)
    model = GLoRIA(cfg)
    txt = api.TextProcessor(tok, num_words=97)(["no finding"])
    batch = {
        "imgs": np.random.RandomState(0).randn(1, 224, 224, 3).astype(np.float32),
        **{k: np.asarray(v) for k, v in txt.items() if k != "cap_lens"},
    }
    variables = model.init(jax.random.PRNGKey(0), batch)
    variables = jax.tree_util.tree_map(lambda x: jnp.asarray(x), variables)
    gm = api.GloriaModel(cfg, variables, tokenizer=tok)

    engine = InferenceEngine(gm, classes, max_batch=args.batch)
    imgs = np.random.RandomState(1).randn(args.batch, 224, 224, 3).astype(np.float32)
    imgs_u8 = (np.random.RandomState(1).rand(args.batch, 224, 224, 3) * 255).astype(np.uint8)

    def classify():
        return jnp.asarray(engine.classify(imgs))

    ms = timeit_ms(classify, steps=args.steps)
    print(f"engine.classify f32 in: {ms:.2f} ms/batch of {args.batch} "
          f"({args.batch / ms * 1000:.1f} imgs/sec, {len(classes)} classes x 5 prompts)")

    def classify_u8():
        return jnp.asarray(engine.classify(imgs_u8))

    ms_u8 = timeit_ms(classify_u8, steps=args.steps)
    print(f"engine.classify uint8 in: {ms_u8:.2f} ms/batch "
          f"({args.batch / ms_u8 * 1000:.1f} imgs/sec; 4x smaller H2D transfer)")

    # device-resident input: isolates the compute from the host->device link
    dev = jnp.asarray(imgs)

    def classify_dev():
        img_l, img_g = engine._img_fwd(gm.variables, dev)
        return engine._score(gm.variables, img_l, img_g, engine._txt_l,
                             engine._txt_g, engine._caps, engine._class_onehot)

    ms_dev = timeit_ms(classify_dev, steps=args.steps)
    print(f"device-resident compute: {ms_dev:.2f} ms/batch "
          f"({args.batch / ms_dev * 1000:.1f} imgs/sec)")

    # reference-shaped comparison: re-encode the images per class like
    # api.zero_shot_classification does
    txts = {k: gm.process_text(v) for k, v in classes.items()}

    def per_class():
        outs = [gm.get_similarities(imgs, t, similarity_type="both") for t in txts.values()]
        return jnp.asarray(np.stack(outs))

    ms2 = timeit_ms(per_class, steps=max(2, args.steps // 2))
    print(f"api per-class re-encode: {ms2:.2f} ms/batch "
          f"({args.batch / ms2 * 1000:.1f} imgs/sec) -> engine speedup {ms2 / ms:.2f}x")


if __name__ == "__main__":
    main()
