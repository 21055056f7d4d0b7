"""Per-stage HBM-traffic accounting via XLA cost analysis (no timing).

PERF.md §2 shows every serving shape is HBM-bandwidth-bound, so the
byte budget — not step time — is the optimization currency. This tool
compiles the same ablated camera-step variants as profile_camera_ablate
(full / detect-ablated / warp-ablated / scan-only / pan-only) and the
expiry on/off pair, pulls XLA's compiled FLOPs + bytes-accessed for
each, and reports marginal bytes per stage as differences. Cost
analysis is deterministic — safe to run while the chip or host is busy
(unlike timing, CLAUDE.md tunnel rules).

Usage: python -m cardio_dmz_tpu.tools.stage_bytes [--streams 256]
"""

import argparse
import json
import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, _REPO_ROOT)

import numpy as np


def _cost(fn, *inputs):
    import jax
    compiled = jax.jit(fn).lower(*inputs).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return float(cost.get("flops", 0.0)), float(cost.get("bytes accessed", 0.0))


def build_graphs(graph, streams):
    """(fn, inputs) for a serving graph: scan | pan | camera (full)."""
    import jax
    import jax.numpy as jnp
    from cardio_dmz_tpu import api
    from cardio_dmz_tpu.constants import (CARD_HEIGHT, CARD_WIDTH,
                                          ORIENTATION_LANDSCAPE_RIGHT)
    from cardio_dmz_tpu.models.weights import load_all_params
    from cardio_dmz_tpu.parallel.streams import (batched_scanner_step,
                                                 init_stream_states)
    from cardio_dmz_tpu.session.state import (FrameTelemetry,
                                              scanner_add_frame)

    params = load_all_params()
    S = streams
    rng = np.random.RandomState(0)
    states = init_stream_states(S)
    if graph in ("scan", "pan"):
        frames = rng.randint(0, 256, (S, 270, 428)).astype(np.uint8)
        expiry = graph == "scan"
        return (lambda st, fr: batched_scanner_step(params, st, fr, expiry),
                (states, frames))

    y = rng.randint(0, 256, (S, 480, 640)).astype(np.uint8)
    cb = rng.randint(0, 256, (S, 240, 320)).astype(np.uint8)
    cr = rng.randint(0, 256, (S, 240, 320)).astype(np.uint8)

    def telem(ys):
        return FrameTelemetry(
            focus_score=api.focus_score(ys),
            brightness_score=api.brightness_score(ys),
            iso_speed=jnp.zeros((), jnp.int32),
            shutter_speed=jnp.zeros((), jnp.float32),
            torch_is_on=jnp.zeros((), bool),
            flipped=jnp.zeros((), bool))

    def step_full(state, ys, cbs, crs):
        found, card = api.preprocess_frame(ys, cbs, crs,
                                           ORIENTATION_LANDSCAPE_RIGHT)
        return scanner_add_frame(params, state, card, True,
                                 telemetry=telem(ys), frame_gate=found)

    return (lambda st, a, b, c: jax.vmap(step_full)(st, a, b, c),
            (states, y, cb, cr))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=256)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from cardio_dmz_tpu import api
    from cardio_dmz_tpu.constants import (CARD_HEIGHT, CARD_WIDTH,
                                          ORIENTATION_LANDSCAPE_RIGHT)
    from cardio_dmz_tpu.models.weights import load_all_params
    from cardio_dmz_tpu.parallel.streams import (batched_scanner_step,
                                                 init_stream_states)
    from cardio_dmz_tpu.session.state import (FrameTelemetry,
                                              scanner_add_frame)

    params = load_all_params()
    S = args.streams
    rng = np.random.RandomState(0)
    y = rng.randint(0, 256, (S, 480, 640)).astype(np.uint8)
    cb = rng.randint(0, 256, (S, 240, 320)).astype(np.uint8)
    cr = rng.randint(0, 256, (S, 240, 320)).astype(np.uint8)
    frames = rng.randint(0, 256, (S, 270, 428)).astype(np.uint8)
    states = init_stream_states(S)

    def telem(ys):
        return FrameTelemetry(
            focus_score=api.focus_score(ys),
            brightness_score=api.brightness_score(ys),
            iso_speed=jnp.zeros((), jnp.int32),
            shutter_speed=jnp.zeros((), jnp.float32),
            torch_is_on=jnp.zeros((), bool),
            flipped=jnp.zeros((), bool))

    def step_full(state, ys, cbs, crs):
        found, card = api.preprocess_frame(ys, cbs, crs,
                                           ORIENTATION_LANDSCAPE_RIGHT)
        return scanner_add_frame(params, state, card, True,
                                 telemetry=telem(ys), frame_gate=found)

    def step_no_detect(state, ys, cbs, crs):
        corners = jnp.asarray([[106.0, 105.0], [533.0, 108.0],
                               [103.0, 374.0], [530.0, 377.0]], jnp.float32)
        from cardio_dmz_tpu.ops.warp import unwarp_card
        bounds = api.warp_src_bounds(ys.shape, ORIENTATION_LANDSCAPE_RIGHT)
        card = unwarp_card(ys, corners, (CARD_HEIGHT, CARD_WIDTH),
                           src_bounds=bounds)
        return scanner_add_frame(params, state, card, True,
                                 telemetry=telem(ys),
                                 frame_gate=jnp.asarray(True))

    def step_no_warp(state, ys, cbs, crs):
        _, corners = api.detect_edges(ys, cbs, crs,
                                      ORIENTATION_LANDSCAPE_RIGHT)
        card = ys[105:105 + CARD_HEIGHT, 106:106 + CARD_WIDTH]
        return scanner_add_frame(params, state, card, True,
                                 telemetry=telem(ys),
                                 frame_gate=corners.found_all)

    rows = {}
    rows["camera_full"] = _cost(
        lambda st, a, b, c: jax.vmap(step_full)(st, a, b, c),
        states, y, cb, cr)
    rows["camera_no_detect"] = _cost(
        lambda st, a, b, c: jax.vmap(step_no_detect)(st, a, b, c),
        states, y, cb, cr)
    rows["camera_no_warp"] = _cost(
        lambda st, a, b, c: jax.vmap(step_no_warp)(st, a, b, c),
        states, y, cb, cr)
    rows["scan_full"] = _cost(
        lambda st, fr: batched_scanner_step(params, st, fr, True),
        states, frames)
    rows["scan_pan"] = _cost(
        lambda st, fr: batched_scanner_step(params, st, fr, False),
        states, frames)

    print(f"{'graph':<22}{'GFLOP/step':>12}{'GB/step':>10}{'MB/frame':>10}")
    for k, (fl, by) in rows.items():
        print(f"{k:<22}{fl / 1e9:>12.2f}{by / 1e9:>10.2f}"
              f"{by / S / 1e6:>10.2f}")

    def marg(a, b, label):
        dfl = rows[a][0] - rows[b][0]
        dby = rows[a][1] - rows[b][1]
        print(f"{label:<22}{dfl / 1e9:>12.2f}{dby / 1e9:>10.2f}"
              f"{dby / S / 1e6:>10.2f}")

    print("-- marginals --")
    marg("camera_full", "camera_no_detect", "detect (marginal)")
    marg("camera_full", "camera_no_warp", "warp (marginal)")
    marg("camera_full", "scan_full", "camera side (total)")
    marg("scan_full", "scan_pan", "expiry (marginal)")
    out = {k: {"gflops": rows[k][0] / 1e9, "gb": rows[k][1] / 1e9}
           for k in rows}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
