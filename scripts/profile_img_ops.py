"""Op-level profile of the image-encoder train step (fwd+bwd).

Captures a jax.profiler device trace of the standalone image tower at the
flagship shape and prints the top ops by total device time, grouped by
fusion kind — the tool behind DESIGN.md's convert+reduce analysis.

    python scripts/profile_img_ops.py [--batch-size 48] [--variant baseline]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def build_step(variant: str, batch_size: int, img_size: int = 224):
    from gloria_tpu.models.vision_model import ImageEncoder

    enc = ImageEncoder(model_name="resnet_50", output_dim=768, dtype=jnp.bfloat16)
    imgs = jnp.asarray(np.random.RandomState(0).rand(batch_size, img_size, img_size, 3), jnp.bfloat16)
    v = enc.init(jax.random.PRNGKey(0), imgs, train=False)

    @jax.jit
    def img_step(params, stats, x):
        def loss(p):
            (g, l, _), muts = enc.apply({"params": p, "batch_stats": stats}, x,
                                        train=True, mutable=["batch_stats"])
            return jnp.sum(g.astype(jnp.float32) ** 2) + jnp.sum(l.astype(jnp.float32) ** 2), muts
        (val, _), grads = jax.value_and_grad(loss, has_aux=True)(params)
        return val, grads

    return img_step, (v["params"], v["batch_stats"], imgs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=48)
    ap.add_argument("--img-size", type=int, default=224)
    ap.add_argument("--variant", default="baseline")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--trace-dir", default="/tmp/img_trace")
    ap.add_argument("--parse-only", action="store_true",
                    help="skip capture; parse an existing --trace-dir")
    args = ap.parse_args()

    if not args.parse_only:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        step, xs = build_step(args.variant, args.batch_size, args.img_size)
        out = step(*xs)
        float(out[0])  # compile + settle

        jax.profiler.start_trace(args.trace_dir)
        acc = []
        for _ in range(5):
            val, _ = step(*xs)
            acc.append(val)
        float(jnp.stack(acc).sum())
        jax.profiler.stop_trace()

    # parse the trace protobuf-exported .json.gz (trace-viewer format)
    files = sorted(glob.glob(f"{args.trace_dir}/**/*.trace.json.gz", recursive=True))
    if not files:
        print("NO TRACE FILES — profiler unsupported through this backend")
        return 1
    with gzip.open(files[-1], "rt") as fh:
        trace = json.load(fh)
    events = [e for e in trace.get("traceEvents", [])
              if e.get("ph") == "X" and e.get("dur")]

    import re

    _OP = re.compile(r"^[a-zA-Z][\w.-]*$")

    def is_op(name: str) -> bool:
        # XLA device op events only: exclude lane ids, module events, and
        # host python frames ($file.py:line, spaces, parens)
        if name.isdigit() or name.startswith(("jit_", "$", "PJRT", "Batched")):
            return False
        if not _OP.match(name):
            return False
        # host-side profiler helpers that sneak through the regex
        return name not in {"backend_compile_and_load", "custom-call"}

    total = defaultdict(float)
    for e in events:
        if is_op(e["name"]):
            total[e["name"]] += e["dur"]
    ranked = sorted(total.items(), key=lambda kv: -kv[1])
    grand = sum(total.values())
    print(f"op events total: {grand/1000/5:.3f} ms/step over 5 steps")

    def category(name: str) -> str:
        base = name.split(".")[0]
        for key in ("convert_reduce_fusion", "convert_fusion", "reduce_fusion",
                    "convolution", "select_and_scatter", "copy", "transpose",
                    "all_reduce", "scatter", "dynamic"):
            if base.startswith(key):
                return key
        if base.endswith("fusion") or base == "fusion":
            return "fusion(other)"
        return base
    by_cat = defaultdict(float)
    for name, dur in total.items():
        by_cat[category(name)] += dur
    print("-- by category --")
    for cat, dur in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"{dur/1000/5:8.3f} ms/step  {100*dur/grand:5.1f}%  {cat}")
    print("-- top ops --")
    for name, dur in ranked[: args.top]:
        print(f"{dur/1000/5:8.3f} ms/step  {100*dur/grand:5.1f}%  {name[:110]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
