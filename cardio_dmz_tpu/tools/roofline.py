"""Roofline / MFU accounting for every serving graph (VERDICT r3 ask #4).

For each serving shape this tool compiles the real graph, pulls XLA's
compiled cost analysis (FLOPs + HBM bytes accessed), times the same graph
with the state-carrying loop bench.py uses (the only timing shape the axon
tunnel reports faithfully — CLAUDE.md), and reports:

  * FLOPs/frame and HBM bytes/frame,
  * the compute-bound and bandwidth-bound step-time floors on v5e,
  * achieved MFU (fraction of peak FLOP/s) and HBM utilization,
  * the roofline fps ceiling  streams / max(t_flops, t_mem).

Peaks (TPU v5e / "v5 lite", one chip): 197e12 bf16 FLOP/s (MXU),
819e9 B/s HBM. XLA's "bytes accessed" counts per-HLO operand bytes, so
fusion-internal traffic is partially double-counted — the bandwidth floor
is therefore an UPPER bound on required traffic and the fps ceiling a
LOWER bound on the true roofline. Reference framing: SURVEY.md §6
north-star targets.

Usage: python -m cardio_dmz_tpu.tools.roofline [--streams 256] [--iters 30]
"""

import argparse
import json
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, _REPO_ROOT)

import numpy as np

PEAK_FLOPS = 197e12     # v5e bf16 MXU peak, FLOP/s
PEAK_HBM = 819e9        # v5e HBM bandwidth, B/s


def _analyze(name, make_step, make_state, inputs, streams, iters):
    import jax
    step = jax.jit(make_step)
    state = make_state()
    lowered = step.lower(state, *inputs)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):          # older jax returns [dict]
        cost = cost[0]
    flops = float(cost.get("flops", 0.0))
    byts = float(cost.get("bytes accessed", 0.0))

    state, _ = step(state, *inputs)
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, _ = step(state, *inputs)
    jax.block_until_ready(state)
    sec = (time.perf_counter() - t0) / iters

    t_flops = flops / PEAK_FLOPS
    t_mem = byts / PEAK_HBM
    rec = {
        "shape": name,
        "streams": streams,
        "step_ms": round(1e3 * sec, 3),
        "fps": round(streams / sec, 1),
        "gflops_per_step": round(flops / 1e9, 3),
        "mflops_per_frame": round(flops / streams / 1e6, 3),
        "hbm_mb_per_step": round(byts / 1e6, 2),
        "hbm_kb_per_frame": round(byts / streams / 1e3, 1),
        "mfu_pct": round(100.0 * flops / (sec * PEAK_FLOPS), 3),
        "hbm_util_pct": round(100.0 * byts / (sec * PEAK_HBM), 1),
        "floor_ms_compute": round(1e3 * t_flops, 4),
        "floor_ms_hbm": round(1e3 * t_mem, 3),
        "roofline_fps_ceiling": round(streams / max(t_flops, t_mem, 1e-12)),
        "bound": "hbm" if t_mem > t_flops else "mxu",
    }
    print(json.dumps(rec), flush=True)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=256)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--out", default=None)
    ap.add_argument("--shapes", default="full,pan,camera")
    args = ap.parse_args()

    import jax
    from cardio_dmz_tpu import api
    from cardio_dmz_tpu.constants import ORIENTATION_LANDSCAPE_RIGHT
    from cardio_dmz_tpu.models.weights import load_all_params
    from cardio_dmz_tpu.parallel.streams import (batched_scanner_step,
                                                 init_stream_states)
    from cardio_dmz_tpu.session.state import FrameTelemetry, scanner_add_frame
    import jax.numpy as jnp

    params = load_all_params()
    S = args.streams
    rng = np.random.RandomState(0)
    frames = jax.device_put(
        rng.randint(0, 256, (S, 270, 428)).astype(np.uint8))
    y = jax.device_put(rng.randint(0, 256, (S, 480, 640)).astype(np.uint8))
    cb = jax.device_put(rng.randint(0, 256, (S, 240, 320)).astype(np.uint8))
    cr = jax.device_put(rng.randint(0, 256, (S, 240, 320)).astype(np.uint8))

    def telem(ys):
        return FrameTelemetry(
            focus_score=api.focus_score(ys),
            brightness_score=api.brightness_score(ys),
            iso_speed=jnp.zeros((), jnp.int32),
            shutter_speed=jnp.zeros((), jnp.float32),
            torch_is_on=jnp.zeros((), bool),
            flipped=jnp.zeros((), bool))

    def camera_one(state, ys, cbs, crs):
        found, card = api.preprocess_frame(ys, cbs, crs,
                                           ORIENTATION_LANDSCAPE_RIGHT)
        return scanner_add_frame(params, state, card, True,
                                 telemetry=telem(ys), frame_gate=found)

    shapes = {
        "full": (lambda st, fr: batched_scanner_step(params, st, fr, True),
                 (frames,)),
        "pan": (lambda st, fr: batched_scanner_step(params, st, fr, False),
                (frames,)),
        "camera": (jax.vmap(camera_one), (y, cb, cr)),
    }
    results = {}
    for name in args.shapes.split(","):
        step_fn, inputs = shapes[name]
        results[name] = _analyze(name, step_fn,
                                 lambda: init_stream_states(S),
                                 inputs, S, args.iters)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
