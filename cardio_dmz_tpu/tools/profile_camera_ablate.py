"""Ablation profile of the fused camera step (state-carrying, reliable).

Per CLAUDE.md, independent per-stage chains mis-time on the axon tunnel;
this tool instead times the FULL camera step with individual stages
bypassed and reports the marginal cost of each as a difference of
20-iteration state-carrying loops:

* full           — camera_scanner_step as served
* no-detect      — corners pinned to a static quad (detection bypassed)
* no-warp        — rectified card replaced by a static center crop
* scan-only      — batched_scanner_step on pre-rectified frames

Usage: python -m cardio_dmz_tpu.tools.profile_camera_ablate [--streams 64]
"""

import argparse
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, _REPO_ROOT)

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=64)
    ap.add_argument("--iters", type=int, default=20)
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

    def step_full(state, ys, cbs, crs):
        found, card = api.preprocess_frame(ys, cbs, crs,
                                           ORIENTATION_LANDSCAPE_RIGHT)
        return scanner_add_frame(params, state, card, True,
                                 telemetry=telem(ys), frame_gate=found)

    def step_no_detect(state, ys, cbs, crs):
        # static centered quad -> warp only (detection ablated)
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
        # detection runs, rectification ablated to a static center crop
        _, corners = api.detect_edges(ys, cbs, crs,
                                      ORIENTATION_LANDSCAPE_RIGHT)
        card = ys[105:105 + CARD_HEIGHT, 106:106 + CARD_WIDTH]
        return scanner_add_frame(params, state, card, True,
                                 telemetry=telem(ys),
                                 frame_gate=corners.found_all)

    def timed(name, fn, inputs):
        step = jax.jit(jax.vmap(fn))
        states = init_stream_states(S)
        states, _ = step(states, *inputs)
        jax.block_until_ready(states)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            states, _ = step(states, *inputs)
        jax.block_until_ready(states)
        ms = 1000.0 * (time.perf_counter() - t0) / args.iters
        print(f"{name:<28}{ms:8.2f} ms ({S * 1000.0 / ms:8.0f} fps)")
        return ms

    full = timed("camera step (full)", step_full, (y, cb, cr))
    nd = timed("  detect ablated", step_no_detect, (y, cb, cr))
    nw = timed("  warp ablated", step_no_warp, (y, cb, cr))

    frames = jax.device_put(
        rng.randint(0, 256, (S, 270, 428)).astype(np.uint8))

    def scan_only(states, fr):
        return batched_scanner_step(params, states, fr, True)

    states = init_stream_states(S)
    step = jax.jit(scan_only)
    states, _ = step(states, frames)
    jax.block_until_ready(states)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        states, _ = step(states, frames)
    jax.block_until_ready(states)
    so = 1000.0 * (time.perf_counter() - t0) / args.iters
    print(f"{'scan only (no camera)':<28}{so:8.2f} ms")
    print(f"\nmarginal detect ~{full - nd:.2f} ms, marginal warp "
          f"~{full - nw:.2f} ms, camera-side total ~{full - so:.2f} ms")


if __name__ == "__main__":
    main()
