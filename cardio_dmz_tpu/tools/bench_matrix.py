"""Bench matrix: every serving shape, one JSON line each.

Round 3 shipped headline work unmeasured because only the default bench
shape was run ("a perf claim that isn't recorded doesn't exist" —
VERDICT.md). This tool runs ALL the shapes that matter, sequentially in
separate processes (never two TPU processes at once — CLAUDE.md), and
emits one JSON line per shape plus an optional combined artifact:

  full            256-stream rectified PAN+expiry (the driver's default)
  pan             256-stream rectified PAN-only
  camera          256-stream whole camera path (640x480 -> digits)
  latency         single-stream rectified p50 frame->digits latency
  camera_latency  single-stream camera-path p50 latency

Usage:
  python -m cardio_dmz_tpu.tools.bench_matrix [--out PERF_rNN.json]
                                              [--shapes full,pan,...]
"""

import argparse
import json
import subprocess
import sys

# Latency shapes pin a high iteration count: 50-iteration single-stream
# loops on the axon tunnel show multi-x drift (measured 4.2 ms vs a stable
# 1.6-1.7 ms at 100+ iters); throughput shapes are long enough already.
SHAPES = {
    "full": [],
    "pan": ["--no-expiry"],
    "camera": ["--camera"],
    "latency": ["--latency", "--iters", "200"],
    "camera_latency": ["--camera", "--latency", "--iters", "200"],
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None,
                    help="also write the combined results to this JSON file")
    ap.add_argument("--shapes", default=",".join(SHAPES),
                    help="comma list of shapes to run")
    ap.add_argument("--iters", type=int, default=None)
    ap.add_argument("--timeout", type=int, default=3600,
                    help="per-shape timeout (first compiles are slow)")
    args = ap.parse_args()

    results = {}
    for shape in args.shapes.split(","):
        shape = shape.strip()
        cmd = [sys.executable, "-m", "cardio_dmz_tpu.tools.bench"] + \
            SHAPES[shape]
        if args.iters:
            cmd += ["--iters", str(args.iters)]
        try:
            out = subprocess.run(cmd, capture_output=True, text=True,
                                 timeout=args.timeout)
            line = [ln for ln in out.stdout.strip().splitlines()
                    if ln.startswith("{")]
            rec = json.loads(line[-1]) if line else {
                "error": (out.stderr or "no output")[-400:]}
        except subprocess.TimeoutExpired:
            rec = {"error": f"timeout after {args.timeout}s"}
        rec["shape"] = shape
        results[shape] = rec
        print(json.dumps(rec), flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
        print(f"# wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
