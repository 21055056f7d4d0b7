"""Rank materialized HBM buffers in a compiled serving graph.

PERF.md §2: every serving shape is HBM-bound, so the optimization
currency is bytes. The ablation marginals (stage_bytes.py) are too
coarse to direct work — this tool compiles a serving graph, walks the
POST-FUSION optimized HLO, and ranks instructions by output-buffer size
(every non-fused instruction output is a materialized HBM buffer; its
consumers re-read it). The top entries are the literal intermediates
the pipeline pays bandwidth for, with op names that map back to Python
via XLA metadata.

Compile-only (deterministic, safe while the chip is busy — CLAUDE.md).

Usage: python -m cardio_dmz_tpu.tools.hlo_hogs [--streams 256]
           [--graph scan|camera|pan] [--top 40]
"""

import argparse
import os
import re
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, _REPO_ROOT)

import numpy as np

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2, "f16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
}

_SHAPE_RE = re.compile(r"([a-z]+[0-9]+|pred)\[([0-9,]*)\]")


def shape_bytes(shape_str):
    """Total bytes over all leaf shapes in an HLO shape string (handles
    tuples by summing every dtype[dims] occurrence)."""
    total = 0
    for dtype, dims in _SHAPE_RE.findall(shape_str):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES.get(dtype, 4)
    return total


_INSTR_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?([\w.-]+)\s*=\s*((?:\([^)]*\)|[a-z0-9]+\[[0-9,]*\][^ ]*))\s*([\w-]+)\(")
_META_RE = re.compile(r'op_name="([^"]+)"')


def rank_hlo(hlo_text, top):
    """Yield (bytes, instr_name, opcode, op_name_metadata) rows, largest
    output buffers first, for the entry computation + fusions' outputs.

    Only counts instructions in the top-level (non-fused) computations:
    buffers inside a fusion body are not materialized. Heuristic: fused
    computation bodies are serialized as `%fused_computation...` /
    `%region...` blocks — skip lines until the matching entry/while/cond
    computations resume. Simpler and robust: count only lines whose
    instruction is NOT inside a computation whose name contains
    "fused_computation" or "region".
    """
    rows = []
    in_fused_body = False
    for line in hlo_text.splitlines():
        comp = re.match(r"^(%?[\w.-]+)\s*(\([^)]*\))?\s*->", line)
        if comp or line.startswith(("ENTRY", "HloModule")):
            name = line.split()[0]
            in_fused_body = ("fused_computation" in name or
                             "region" in name or "wide." in name)
            continue
        if in_fused_body:
            continue
        m = _INSTR_RE.match(line)
        if not m:
            continue
        name, shape_str, opcode = m.groups()
        if opcode in ("parameter", "constant", "get-tuple-element",
                      "tuple", "bitcast"):
            continue
        b = shape_bytes(shape_str)
        meta = _META_RE.search(line)
        src = _SRC_RE.search(line)
        label = meta.group(1) if meta else ""
        if src:
            label += f"  {src.group(1).split('/')[-1]}:{src.group(2)}"
        rows.append((b, name, opcode, label))
    rows.sort(key=lambda r: -r[0])
    return rows[:top]


_CYCLES_RE = re.compile(r'"estimated_cycles":"(\d+)"')
_SRC_RE = re.compile(r'source_file="([^"]+)" source_line=(\d+)')


def rank_cycles(hlo_text, top):
    """Rank top-level instructions / source lines by the TPU backend's own
    estimated_cycles (backend_config). This is the analysis that exposed
    the round-4 hot spots the byte counts missed: the PAN conv pool's
    layout-shattering reduce was priced ~3 ms/model while touching only
    ~56 MB. Returns (per_line, per_src) where per_src aggregates by
    source_file:line."""
    rows, per_src = [], {}
    in_fused = False
    for line in hlo_text.splitlines():
        s = line.strip()
        if s.startswith("%fused_computation"):
            in_fused = True
            continue
        if s.startswith("ENTRY") or (s.startswith("}") and in_fused):
            in_fused = False
        if in_fused:
            continue
        c = _CYCLES_RE.search(s)
        if not c:
            continue
        cyc = int(c.group(1))
        m = _INSTR_RE.match(line)
        name = m.group(1) if m else "?"
        meta = _SRC_RE.search(s)
        src = (f"{meta.group(1).split('/')[-1]}:{meta.group(2)}"
               if meta else "?")
        rows.append((cyc, name, src))
        per_src[src] = per_src.get(src, 0) + cyc
    rows.sort(key=lambda r: -r[0])
    srcs = sorted(per_src.items(), key=lambda kv: -kv[1])
    return rows[:top], srcs[:top], sum(per_src.values())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=256)
    ap.add_argument("--graph", default="scan",
                    choices=["scan", "pan", "camera"])
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--cycles", action="store_true",
                    help="also rank by the backend's estimated_cycles")
    ap.add_argument("--hlo-file", default=None,
                    help="analyze an existing dump instead of compiling")
    args = ap.parse_args()

    if args.hlo_file:
        hlo = open(args.hlo_file).read()
    else:
        import jax
        from cardio_dmz_tpu.tools.stage_bytes import build_graphs

        fn, inputs = build_graphs(args.graph, args.streams)
        compiled = jax.jit(fn).lower(*inputs).compile()
        hlo = compiled.as_text()
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        total_gb = float(cost.get("bytes accessed", 0.0)) / 1e9
        print(f"# {args.graph} @{args.streams}: {total_gb:.2f} GB/step "
              f"(XLA bytes accessed)")
    print(f"{'MB out':>9}  {'opcode':<18} op_name")
    for b, name, opcode, meta in rank_hlo(hlo, args.top):
        print(f"{b / 1e6:9.1f}  {opcode:<18} {meta or name}")
    if args.cycles:
        rows, srcs, tot = rank_cycles(hlo, args.top)
        print(f"\n# estimated_cycles total {tot / 1e6:.1f}M "
              f"(~{tot / 0.94e9 * 1e3:.1f} ms at 940 MHz; pessimistic "
              f"in absolute terms, trust the ranking)")
        print("# -- by source line --")
        for s, c in srcs:
            print(f"{c / 1e6:8.2f}M ({c / 0.94e9 * 1e3:6.2f} ms)  {s}")
        print("# -- top single ops --")
        for c, name, src in rows[:15]:
            print(f"{c / 1e6:8.2f}M  {name:30s} {src}")


if __name__ == "__main__":
    main()
