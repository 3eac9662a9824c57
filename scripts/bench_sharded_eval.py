"""Mesh-sharded eval similarities: fused Pallas (shard_map) vs sharded XLA.

VERDICT r3 item 3 measurement: does the fused local-sim kernel retain its
single-device win (2.42x, docs/DESIGN.md) when inference is mesh-sharded
via ``local_similarities_eval_sharded``?  Shapes are the 5x200 zero-shot
benchmark's hot call (``gloria_tpu/evaluation.py::evaluate_zero_shot``):
an image batch of 64 against 5 classes x 5 prompts = 25 texts, 361+sink
regions, 97 words, D=768 — plus the retrieval-style square 48x48 shape the
single-device number was recorded at.

    python scripts/bench_sharded_eval.py            # mesh over all devices
    python scripts/bench_sharded_eval.py --devices 1

Reference hot path: ``gloria/models/gloria_model.py:171-207``.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from _timing import timeit_ms


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=None)
    ap.add_argument("--force-fused", action="store_true",
                    help="time the fused Pallas path even off-TPU (interpret "
                         "mode: minutes per call at these shapes)")
    args = ap.parse_args()

    import os

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # the axon TPU plugin re-sets JAX_PLATFORMS at registration; the
        # config knob outranks the env var (same gotcha as tests/conftest.py)
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    from gloria_tpu.ops import gloria_loss as gl
    from gloria_tpu.parallel.mesh import create_mesh

    n = args.devices or jax.device_count()
    mesh = create_mesh(n_devices=n)
    rng = np.random.RandomState(0)
    on_tpu = "TPU" in jax.devices()[0].device_kind
    # off-TPU the Pallas kernel runs in interpret mode — minutes per call at
    # these shapes; a CPU-mesh run then validates the SHARDED XLA path and
    # the scaling shape only (the fused/XLA equivalence under shard_map is
    # covered at small shapes by tests/test_pallas_local_sim.py)
    time_fused = on_tpu or args.force_fused
    # off-TPU: a virtual mesh on a 1-core host gives no parallelism and the
    # highest-precision eval matmuls run ~10s+/call at full shapes — shrink
    # the timing loop so the run validates the sharded program in minutes
    # (the number is a shape check, not a perf figure)
    steps, repeats = (20, 3) if on_tpu else (2, 1)
    results = {"n_devices": n, "device": jax.devices()[0].device_kind,
               "fused_timed": time_fused, "timing_steps": steps}

    shapes = ({"5x200_batch": (64, 25), "square_48": (48, 48)} if on_tpu
              else {"5x200_batch_small": (16, 8), "square_16": (16, 16)})
    for name, (B, T) in shapes.items():
        S, W, D = 362, 97, 768  # 361 regions + learned sink row
        regions = jnp.asarray(rng.randn(B, S, D).astype(np.float32) * 0.3)
        words = jnp.asarray(rng.randn(T, W, D).astype(np.float32) * 0.3)
        cap_lens = jnp.asarray(rng.randint(5, W - 2, T))

        def fused():
            return gl.local_similarities_eval_sharded(
                regions, words, cap_lens, mesh=mesh, use_fused=True)

        def xla():
            return gl.local_similarities_eval_sharded(
                regions, words, cap_lens, mesh=mesh, use_fused=False)

        ms_xla = timeit_ms(xla, steps=steps, repeats=repeats)
        if time_fused:
            np.testing.assert_allclose(np.asarray(fused()), np.asarray(xla()),
                                       rtol=2e-2, atol=2e-2)
            ms_fused = timeit_ms(fused, steps=steps, repeats=repeats)
            results[name] = {"fused_ms": round(ms_fused, 3),
                             "xla_ms": round(ms_xla, 3),
                             "speedup": round(ms_xla / ms_fused, 3)}
        else:
            results[name] = {"xla_ms": round(ms_xla, 3)}
        # stream per-shape results: the fused compiles run ~8 min each on the
        # tunnel, so a bounded run should still record completed shapes
        print(json.dumps({name: results[name]}), file=sys.stderr, flush=True)

    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
