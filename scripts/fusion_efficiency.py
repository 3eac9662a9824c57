"""Per-kernel roofline table for the image-tower train step.

For every device kernel in a captured trace (profile_img_ops.py), compute an
empirical floor from the compiled HLO:

    floor(op) = max(bytes(op) / BW_triad,  conv_flops(op) / PEAK_bf16)

where bytes are the op's fused-computation parameter + result shapes (what
the kernel must read and write from HBM, ignoring cache reuse — an upper
bound on achievable speed) and conv_flops are counted from ``convolution``
instructions inside the op.  Comparing sum-of-floors against sum-of-measured
durations bounds how much the op mix COULD improve without changing the
program structure: if measured ~= floor, the remaining gap to peak MFU is
the op mix itself (memory-bound ops exist), not kernel quality.

Bytes come from fused-computation definition lines — single-line, no
cross-instruction references:

    %fused_computation.9 (param_0.1: bf16[48,75,75,64], ...) -> bf16[...] {

    python scripts/fusion_efficiency.py --trace-dir /tmp/img_trace_299
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import re
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TRIAD_GBS = 649.0  # measured streaming bandwidth, scripts/roofline.py
PEAK_TFLOPS = 197.0  # v5e bf16

DTYPE_BYTES = {"pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2,
               "f16": 2, "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8,
               "f64": 8}

_SHAPE = re.compile(r"\b(pred|s8|u8|s16|u16|bf16|f16|s32|u32|f32|s64|u64|f64)\[([0-9,]*)\]")


def shape_bytes(text: str) -> int:
    total = 0
    for dt, dims in _SHAPE.findall(text):
        n = 1
        if dims:
            for d in dims.split(","):
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def shape_elems(text: str) -> int:
    m = _SHAPE.search(text)
    if not m:
        return 0
    n = 1
    if m.group(2):
        for d in m.group(2).split(","):
            n *= int(d)
    return n


def parse_hlo(hlo: str):
    """Returns (comp_bytes, comp_flops, inst_comp, inst_bytes):
    - comp_bytes[comp_name]   = param bytes + result bytes of the fused comp
    - comp_flops[comp_name]   = 2*out_elems*ci*kh*kw summed over convolutions
    - inst_comp[inst_name]    = called computation (fusions)
    - inst_bytes[inst_name]   = bytes for non-fusion entry ops (line-local
                                shapes only: output + any shape literal on
                                the line; operands of entry non-fusion ops
                                are rarely needed — convolution and
                                select-and-scatter lines carry no operand
                                shapes, handled via their windows below)
    """
    comp_bytes: dict[str, int] = {}
    comp_flops: dict[str, float] = defaultdict(float)
    inst_comp: dict[str, str] = {}
    inst_bytes: dict[str, int] = {}
    inst_flops: dict[str, float] = defaultdict(float)
    inst_ops: dict[str, list] = {}
    out_shape: dict[str, str] = {}

    comp_def = re.compile(r"^(?:ENTRY\s+)?%?([\w.\-]+)\s+\((.*)\)\s*->\s*(.+?)\s*\{\s*$")
    inst_def = re.compile(r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(.+)$")
    calls_re = re.compile(r"calls=%?([\w.\-]+)")
    window_re = re.compile(r"window=\{[^}]*?size=(\d+)(?:x(\d+))?")
    groups_re = re.compile(r"feature_group_count=(\d+)")

    cur_comp = None
    for raw in hlo.splitlines():
        m = comp_def.match(raw.strip()) if ("{" in raw and "->" in raw) else None
        if m and not raw.lstrip().startswith("%constant"):
            cur_comp = m.group(1)
            comp_bytes[cur_comp] = shape_bytes(m.group(2)) + shape_bytes(m.group(3))
            continue
        m = inst_def.match(raw)
        if not m:
            continue
        name, rest = m.groups()
        # record this instruction's output shape (first shape literal on line)
        sm = _SHAPE.search(rest)
        if sm:
            out_shape[name] = rest[: sm.end() + 40]
        if " fusion(" in rest:
            cm = calls_re.search(rest)
            if cm:
                inst_comp[name] = cm.group(1)
            # unique operand refs for byte dedup (same array passed twice —
            # e.g. x to both the stats and apply sides — reads HBM once)
            ops = re.findall(r"%([\w.\-]+)", rest.split("), kind=")[0])
            inst_ops[name] = list(dict.fromkeys(ops))
        elif " convolution(" in rest:
            wm = window_re.search(rest)
            kh = int(wm.group(1)) if wm else 1
            kw = int(wm.group(2)) if (wm and wm.group(2)) else kh
            gm = groups_re.search(rest)
            g = int(gm.group(1)) if gm else 1
            out_elems = shape_elems(rest)
            # input feature count: parse operand kernel shape is not on the
            # line; use dim_labels + the called-computation params instead —
            # approximate ci from the kernel size via flops formula needs ci.
            # The kernel operand IS a param of the enclosing computation for
            # fused convs; for entry convs it is another instruction.  We
            # recover ci from dim_labels->kernel shape when resolvable,
            # falling back to out_channels (square-ish estimate) otherwise.
            ci = None
            opm = re.findall(r"%([\w.\-]+)", rest.split("),")[0])
            if len(opm) >= 2 and opm[1] in out_shape:
                ks = out_shape[opm[1]]
                em = _SHAPE.search(ks)
                if em and em.group(2):
                    dims = [int(d) for d in em.group(2).split(",")]
                    if len(dims) == 4:
                        # dim_labels like 01io->kernel [kh,kw,ci,co]
                        ci = dims[-2]
            if ci is None:
                ci = out_elems and 1  # unknown; count minimal
            flops = 2.0 * out_elems * ci * kh * kw / g
            if cur_comp is not None and cur_comp in comp_bytes:
                comp_flops[cur_comp] += flops
            inst_flops[name] += flops
        else:
            # non-fusion entry op: bytes = all shape literals on the line
            # (output only, typically) — refined for select-and-scatter and
            # copy below by adding the output again for the read side.
            pass
        if sm:
            inst_bytes[name] = shape_bytes(rest)
    return comp_bytes, comp_flops, inst_comp, inst_bytes, inst_flops, inst_ops, out_shape


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace-dir", default="/tmp/img_trace_299")
    ap.add_argument("--batch-size", type=int, default=48)
    ap.add_argument("--img-size", type=int, default=299)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    files = sorted(glob.glob(f"{args.trace_dir}/**/*.trace.json.gz", recursive=True))
    if not files:
        print("no trace found; run profile_img_ops.py first")
        return 1
    with gzip.open(files[-1], "rt") as fh:
        trace = json.load(fh)
    dur = defaultdict(float)
    for e in trace.get("traceEvents", []):
        if e.get("ph") == "X" and e.get("dur"):
            n = e["name"]
            if re.match(r"^[a-z][\w.\-]*$", n) and not n.startswith(
                    ("jit_", "custom", "backend", "lower", "shard", "batched",
                     "slice-", "Parse", "Execute")):
                dur[n] += e["dur"]

    from profile_img_ops import build_step

    step, xs = build_step("baseline", args.batch_size, args.img_size)
    hlo = step.lower(*xs).compile().as_text()
    (comp_bytes, comp_flops, inst_comp, inst_bytes, inst_flops,
     inst_ops, out_shape) = parse_hlo(hlo)

    rows, unmapped = [], []
    for name, total_us in sorted(dur.items(), key=lambda kv: -kv[1]):
        ms = total_us / 1000 / args.steps
        comp = inst_comp.get(name)
        if comp and comp in comp_bytes:
            # bytes: unique caller operands + own output when resolvable
            # (dedupes an array passed to two fusion params); fall back to
            # the fused computation's param+result shapes
            ops = inst_ops.get(name, [])
            resolved = [out_shape[o] for o in ops if o in out_shape]
            if resolved and len(resolved) == len(ops):
                b = sum(shape_bytes(s) for s in resolved) + inst_bytes.get(name, 0)
            else:
                b = comp_bytes[comp]
            fl = comp_flops.get(comp, 0.0)
        elif name in inst_bytes:
            b, fl = inst_bytes[name], inst_flops.get(name, 0.0)
            if "select_and_scatter" in name or name.startswith("copy"):
                b *= 2  # reads its source too; line carries output shape only
            if "select_and_scatter" in name:
                b += b  # also reads the source-select array
        else:
            unmapped.append((ms, name))
            continue
        bw_floor_ms = b / 1e9 / TRIAD_GBS * 1e3
        fl_floor_ms = fl / 1e12 / PEAK_TFLOPS * 1e3
        floor = max(bw_floor_ms, fl_floor_ms)
        rows.append((ms, floor, b / 1e6, fl / 1e9, name))

    print(f"{'ms':>7} {'floor':>7} {'x':>5} {'MB':>8} {'GF':>7}  name")
    for ms, floor, mb, gf, name in rows[: args.top]:
        x = ms / floor if floor else float("inf")
        print(f"{ms:7.3f} {floor:7.3f} {x:5.1f} {mb:8.1f} {gf:7.1f}  {name[:70]}")
    tot = sum(r[0] for r in rows)
    tot_floor = sum(r[1] for r in rows)
    un = sum(u[0] for u in unmapped)
    print(f"\nmapped: {tot:.2f} ms measured vs {tot_floor:.2f} ms floor "
          f"(x{tot/max(tot_floor,1e-9):.2f}); unmapped device time: {un:.2f} ms")
    if unmapped:
        print("unmapped top:", [(round(m, 2), n) for m, n in unmapped[:8]])
    return 0


if __name__ == "__main__":
    sys.exit(main())
