"""Shared value-materialized timing harness for the standalone benchmarks.

Through remote-execution tunnels (axon), ``block_until_ready`` can return
before device compute finishes and measures dispatch rate, not execution
(docs/DESIGN.md "measurement trap").  The honest protocol, used by every
script here: accumulate one scalar per call that depends on the whole
computation, materialize the stack ONCE per repeat, report the median of 3
repeats.  ``bench.py`` at the repo root implements the same protocol inline
because its timed quantity threads optimizer state between steps.
"""

from __future__ import annotations

import time

import jax.numpy as jnp


def _default_sink(out):
    return out[0] if isinstance(out, tuple) else out


def timeit_ms(fn, args=(), steps: int = 20, repeats: int = 3, sink=_default_sink) -> float:
    """Median-of-``repeats`` runs of ``steps`` calls; returns ms/call.
    ``sink(out)`` must reduce to something depending on the whole result."""
    out = fn(*args)
    float(jnp.sum(sink(out)))  # compile + settle
    rates = []
    for _ in range(repeats):
        acc = []
        t0 = time.perf_counter()
        for _ in range(steps):
            acc.append(jnp.sum(sink(fn(*args))))
        float(jnp.stack(acc).sum())  # materialization barrier over every call
        rates.append((time.perf_counter() - t0) / steps * 1000)
    rates.sort()
    return rates[len(rates) // 2]
