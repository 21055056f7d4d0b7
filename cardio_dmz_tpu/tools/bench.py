"""Benchmark: full scan-pipeline throughput in frames/sec/chip.

Runs the production serving shape — a batch of concurrent camera streams
stepped through the complete jitted scan pipeline (vseg -> hseg -> 3-conv
digit ensemble -> session EWMA + acceptance) on one chip — and prints ONE
JSON line for the driver.

vs_baseline compares against the only published reference number: ~22 fps
full-pipeline on iPhone 4S (reference eigen.h:15-21; BASELINE.md). The
TPU north-star is >=1000 frames/sec/chip.
"""

import argparse
import json
import sys
import time

import numpy as np

BASELINE_FPS = 22.0


def main():
    ap = argparse.ArgumentParser()
    # the north-star serving shape: 256 concurrent 30 fps streams in one
    # graph (the fastest measured batch; see README/CLAUDE.md for the
    # driver-captured numbers)
    ap.add_argument("--streams", type=int, default=256)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--expiry", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="include the in-graph expiry path (default on; "
                         "--no-expiry for the PAN-only pipeline)")
    ap.add_argument("--camera", action="store_true",
                    help="bench the full camera path: 480x640 YCbCr frame "
                         "-> edge detection -> rectification -> digits, "
                         "one graph (the reference's whole per-frame work, "
                         "dmz.cpp:371-497 + scan stack)")
    ap.add_argument("--warp-bf16", action=argparse.BooleanOptionalAction,
                    default=False,
                    help="bf16 warp contractions in --camera mode (the "
                         "GL-warp analogue). Measured neutral on v5e — the "
                         "warp cost is hat-weight generation, not the "
                         "contraction — so the f32 cv-faithful path is the "
                         "default")
    ap.add_argument("--latency", action="store_true",
                    help="report p50 frame->digits latency instead of "
                         "throughput: a single-stream step, timed as the "
                         "steady-state per-step time of the one jitted "
                         "graph (no host round-trips inside a step)")
    ap.add_argument("--noise-frames", action="store_true",
                    help="camera mode: uniform-noise frames (worst-case "
                         "probe) instead of rendered card previews")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny sizes for CI smoke")
    args = ap.parse_args()
    if args.smoke:
        args.streams, args.iters, args.warmup = 8, 3, 1
    if args.latency:
        args.streams = 1
        args.iters = max(args.iters, 50)

    import jax
    from cardio_dmz_tpu.models.weights import load_all_params
    from cardio_dmz_tpu.parallel.streams import (
        batched_camera_step, batched_scanner_step, init_stream_states)

    params = load_all_params()
    rng = np.random.RandomState(0)

    if args.camera:
        from cardio_dmz_tpu.config import ScanConfig
        # --latency: batch-1-specialized scan stages (dynamic slices
        # instead of one-hot contractions) behind the detect+warp stages,
        # which are shape-agnostic (the Pallas gather grid is per stream)
        cam_config = ScanConfig(scan_expiry=args.expiry,
                                warp_bf16=args.warp_bf16,
                                latency_shape=args.latency)

        @jax.jit
        def step(states, y, cb, cr):
            states, (found, frame_results, results) = batched_camera_step(
                params, states, y, cb, cr, scan_expiry=args.expiry,
                config=cam_config)
            return states, results.complete

        if args.noise_frames:
            # worst-case probe: uniform noise (content-independence check)
            y = rng.randint(0, 256,
                            (args.streams, 480, 640)).astype(np.uint8)
            cb = rng.randint(0, 256,
                             (args.streams, 240, 320)).astype(np.uint8)
            cr = rng.randint(0, 256,
                             (args.streams, 240, 320)).astype(np.uint8)
        else:
            # representative input: rendered card previews (distinct PANs,
            # jittered PAN rows, background noise) so the detect stage
            # (canny candidate density, hough votes) sees real content —
            # 16 distinct frames tiled across the stream batch
            from cardio_dmz_tpu import synthetic
            from cardio_dmz_tpu.constants import (
                LANDSCAPE_HORIZONTAL_INSET, LANDSCAPE_VERTICAL_INSET)
            n_distinct = min(args.streams, 16)
            ys, cbs, crs = [], [], []
            for i in range(n_distinct):
                pan = synthetic.safe_pan(np.random.default_rng(100 + i))
                card = np.asarray(synthetic.render_frame(
                    pan, y0=150 + (i % 5) * 8, seed=i, noise=2), np.int32)
                fy = np.full((480, 640), 50, np.int32)
                fy += rng.randint(-3, 4, fy.shape)
                x0, yy0 = (LANDSCAPE_HORIZONTAL_INSET,
                           LANDSCAPE_VERTICAL_INSET)
                fy[yy0:yy0 + 270, x0:x0 + 428] = card
                ys.append(np.clip(fy, 0, 255).astype(np.uint8))
                cbs.append(np.full((240, 320), 128, np.uint8))
                crs.append(np.full((240, 320), 128, np.uint8))
            reps = -(-args.streams // n_distinct)
            y = np.tile(np.stack(ys), (reps, 1, 1))[:args.streams]
            cb = np.tile(np.stack(cbs), (reps, 1, 1))[:args.streams]
            cr = np.tile(np.stack(crs), (reps, 1, 1))[:args.streams]
        inputs = tuple(map(jax.device_put, (y, cb, cr)))
        metric = "camera_pipeline_throughput"
    else:
        from cardio_dmz_tpu.config import ScanConfig
        # batch 1 cannot amortize the one-hot throughput forms' flat
        # work; the latency bench runs the batch-1-specialized graph
        scan_config = ScanConfig(scan_expiry=args.expiry,
                                 latency_shape=args.latency)

        @jax.jit
        def step(states, frames):
            states, (frame_results, results) = batched_scanner_step(
                params, states, frames, config=scan_config)
            return states, results.complete

        frames = rng.randint(0, 256,
                             (args.streams, 270, 428)).astype(np.uint8)
        inputs = (jax.device_put(frames),)
        metric = "scan_pipeline_throughput"

    states = init_stream_states(args.streams)

    for _ in range(args.warmup):
        states, complete = step(states, *inputs)
    jax.block_until_ready(states)

    t0 = time.perf_counter()
    for _ in range(args.iters):
        states, complete = step(states, *inputs)
    jax.block_until_ready(states)
    elapsed = time.perf_counter() - t0

    n_frames = args.streams * args.iters
    fps = n_frames / elapsed
    step_ms = 1000.0 * elapsed / args.iters

    print(f"# device={jax.devices()[0].device_kind} streams={args.streams} "
          f"iters={args.iters} step={step_ms:.1f}ms expiry={args.expiry} "
          f"camera={args.camera}",
          file=sys.stderr)
    if args.latency:
        # steady-state per-step time of the deterministic single-stream
        # graph == p50 frame->digits latency; baseline = 1/22 fps = 45.5 ms
        print(json.dumps({
            "metric": ("camera_frame_latency_p50" if args.camera
                       else "scan_frame_latency_p50"),
            "value": round(step_ms, 2),
            "unit": "ms",
            "vs_baseline": round((1000.0 / BASELINE_FPS) / step_ms, 2),
        }))
        return
    print(json.dumps({
        "metric": metric,
        "value": round(fps, 1),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / BASELINE_FPS, 2),
    }))


if __name__ == "__main__":
    main()
