"""Component-level timing of the pretrain step on the current device.

Times each piece of the B=48 flagship train step as its own jitted program
(value-materialized — block_until_ready is unreliable through the axon
tunnel) to locate where the ~89 ms go:

    python scripts/profile_step.py [--steps 20]

Components: full train step, image-encoder fwd+bwd, text-encoder fwd+bwd
(with and without dropout), matching-loss fwd+bwd, optimizer update,
full forward (no grad).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp


from _timing import timeit_ms as timeit  # noqa: E402  (median-of-3, value-materialized)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--batch-size", type=int, default=48)
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    from gloria_tpu.builder import default_pretrain_config, init_gloria
    from gloria_tpu.data.synthetic import make_synthetic_batch
    from gloria_tpu.models.text_model import TextEncoder
    from gloria_tpu.models.vision_model import ImageEncoder
    from gloria_tpu.models.bert import BertConfig
    from gloria_tpu.ops import gloria_loss

    B, T, IM = args.batch_size, 97, 224
    D = 768
    bf16 = jnp.bfloat16
    results = {}

    cfg = default_pretrain_config()
    cfg.model.text.bert_config = {
        "vocab_size": 28996, "hidden_size": 768, "num_layers": 12, "num_heads": 12,
        "intermediate_size": 3072, "max_position_embeddings": 512,
    }
    raw = make_synthetic_batch(batch_size=B, num_tokens=T, imsize=IM, vocab_size=28996)
    batch = {k: jnp.asarray(v) for k, v in raw.items()}

    # ---- full train step (donates state → thread it through the loop) --------
    model, state, train_step, _ = init_gloria(cfg, raw, dtype=bf16)
    state, m = train_step(state, batch)
    float(m["loss"])
    rates = []
    for _ in range(3):
        acc = []
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, m = train_step(state, batch)
            acc.append(m["loss"])
        float(jnp.stack(acc).sum())
        rates.append((time.perf_counter() - t0) / args.steps * 1000)
    rates.sort()
    results["full_train_step"] = rates[1]
    print("full_train_step", results["full_train_step"], flush=True)
    del state

    # ---- image encoder fwd+bwd -------------------------------------------------
    enc = ImageEncoder(model_name="resnet_50", output_dim=D, dtype=bf16)
    imgs = batch["imgs"]
    v_img = enc.init(jax.random.PRNGKey(0), imgs, train=False)

    @jax.jit
    def img_step(params, stats, x):
        def loss(p):
            (g, l, _), muts = enc.apply({"params": p, "batch_stats": stats}, x,
                                        train=True, mutable=["batch_stats"])
            return jnp.sum(g.astype(jnp.float32) ** 2) + jnp.sum(l.astype(jnp.float32) ** 2), muts
        (val, _), grads = jax.value_and_grad(loss, has_aux=True)(params)
        return (val, grads)

    results["img_encoder_fwd_bwd"] = timeit(
        img_step, (v_img["params"], v_img["batch_stats"], imgs), args.steps)
    print("img_encoder_fwd_bwd", results["img_encoder_fwd_bwd"], flush=True)

    @jax.jit
    def img_fwd(params, stats, x):
        g, l, _ = enc.apply({"params": params, "batch_stats": stats}, x, train=False)
        return (jnp.sum(g.astype(jnp.float32)), g)

    results["img_encoder_fwd"] = timeit(
        img_fwd, (v_img["params"], v_img["batch_stats"], imgs), args.steps)
    print("img_encoder_fwd", results["img_encoder_fwd"], flush=True)
    del v_img

    # ---- text encoder fwd+bwd ---------------------------------------------------
    tcfg = BertConfig()
    tenc = TextEncoder(bert_config=tcfg, embedding_dim=D, dtype=bf16)
    targs = (batch["caption_ids"], batch["attention_mask"], batch["token_type_ids"],
             batch["word_assignment"])
    v_txt = tenc.init(jax.random.PRNGKey(0), *targs)

    def make_txt_step(det: bool):
        @jax.jit
        def txt_step(params, rng, *xs):
            def loss(p):
                w, s = tenc.apply({"params": p}, *xs, deterministic=det,
                                  rngs={} if det else {"dropout": rng})
                return jnp.sum(w.astype(jnp.float32) ** 2) + jnp.sum(s.astype(jnp.float32) ** 2)
            val, grads = jax.value_and_grad(loss)(params)
            return (val, grads)
        return txt_step

    rng = jax.random.PRNGKey(1)
    results["txt_encoder_fwd_bwd_dropout"] = timeit(
        make_txt_step(False), (v_txt["params"], rng) + targs, args.steps)
    print("txt_encoder_fwd_bwd_dropout", results["txt_encoder_fwd_bwd_dropout"], flush=True)
    results["txt_encoder_fwd_bwd_nodrop"] = timeit(
        make_txt_step(True), (v_txt["params"], rng) + targs, args.steps)
    print("txt_encoder_fwd_bwd_nodrop", results["txt_encoder_fwd_bwd_nodrop"], flush=True)
    del v_txt

    # ---- matching loss fwd+bwd ---------------------------------------------------
    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    regions = jax.random.normal(k1, (B, 361, D), jnp.float32)
    words = jax.random.normal(k2, (B, T, D), jnp.float32)
    cap_lens = jnp.asarray(np.random.RandomState(0).randint(5, T - 2, B))

    for chunk in (0, 8, 16):
        @jax.jit
        def loss_step(r, w):
            def loss(rw):
                r_, w_ = rw
                l0, l1, *_ = gloria_loss.local_loss(r_, w_, cap_lens, chunk=chunk)
                g0, g1 = gloria_loss.global_loss(r_.mean(1), w_.mean(1))
                return l0 + l1 + g0 + g1
            val, grads = jax.value_and_grad(loss)((r, w))
            return (val, grads)

        results[f"match_loss_fwd_bwd_chunk{chunk}"] = timeit(
            loss_step, (regions, words), args.steps)
        print(f"match_loss_fwd_bwd_chunk{chunk}",
              results[f"match_loss_fwd_bwd_chunk{chunk}"], flush=True)

    # ---- optimizer update ---------------------------------------------------------
    import optax

    model2, state2, _, _ = init_gloria(cfg, raw, dtype=bf16)
    tx = optax.adam(5e-5, b1=0.5, b2=0.999)
    opt_state = tx.init(state2.params)
    fake_grads = jax.tree_util.tree_map(lambda x: jnp.ones_like(x) * 1e-4, state2.params)

    @jax.jit
    def opt_step(g, o, p):
        u, o2 = tx.update(g, o, p)
        p2 = optax.apply_updates(p, u)
        return (jax.tree_util.tree_leaves(p2)[0], p2)

    results["optimizer_update"] = timeit(
        opt_step, (fake_grads, opt_state, state2.params), args.steps)
    print("optimizer_update", results["optimizer_update"], flush=True)

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
