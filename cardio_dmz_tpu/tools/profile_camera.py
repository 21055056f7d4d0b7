"""Per-stage profiler for the fused camera->digits path (TPU).

Times each stage of preprocess_frame (sobel7, adaptive canny, hough, warp)
and the downstream card-scan step, batched over streams, to locate where
the camera-step milliseconds go. Companion to profile_expiry.

CAVEAT (CLAUDE.md): on the axon tunnel, block_until_ready timing of
independent calls is unreliable for some output shapes — treat these
numbers as relative hints and confirm absolute costs with a
state-carrying loop (profile_pan.bench_chain style) or bench.py.

Usage: python -m cardio_dmz_tpu.tools.profile_camera [--streams 64]
"""

import argparse
import os
import sys
import time

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, _REPO_ROOT)


def bench(fn, *args, iters=20, warmup=3):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return 1000.0 * (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=64)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    from cardio_dmz_tpu import api
    from cardio_dmz_tpu.ops import (adaptive_canny7, hough_best_line, sobel7,
                                    unwarp_card)
    from cardio_dmz_tpu.models.weights import load_all_params
    from cardio_dmz_tpu.parallel.streams import (batched_scanner_step,
                                                 init_stream_states)

    S = args.streams
    rng = np.random.RandomState(0)
    y = jax.device_put(rng.randint(0, 256, (S, 480, 640)).astype(np.uint8))
    cb = jax.device_put(rng.randint(0, 256, (S, 240, 320)).astype(np.uint8))
    cr = jax.device_put(rng.randint(0, 256, (S, 240, 320)).astype(np.uint8))

    boxes = api.detection_boxes((480, 640), 3)
    print(f"# streams={S} device={jax.devices()[0].device_kind}")

    def report(name, ms):
        print(f"{name:34s} {ms:8.2f} ms")

    # stage: sobel7 on the four Y bands
    def band(edge):
        x, yy, w, h = boxes[edge]
        return y[:, yy:yy + h, x:x + w]

    for edge, vertical in (("top", False), ("left", True)):
        b = band(edge)
        f_sob = jax.jit(lambda im: (sobel7(im, dx=True, dy=False),
                                    sobel7(im, dx=False, dy=True)))
        report(f"sobel7 {edge} band {tuple(b.shape)}", bench(f_sob, b, iters=args.iters))

        f_canny = jax.jit(lambda im: adaptive_canny7(im))
        report(f"canny {edge} band", bench(f_canny, b, iters=args.iters))

        def f_hough_impl(im, vertical=vertical):
            edges_, dx, dy = adaptive_canny7(im)
            import math
            from cardio_dmz_tpu.constants import (
                HORIZONTAL_ANGLE, VERTICAL_ANGLE, MAX_ANGLE_DEVIATION,
                HOUGH_THETA_RES, HOUGH_GRADIENT_ANGLE_THRESHOLD,
                HOUGH_THRESHOLD_LENGTH_DIVISOR)
            base = VERTICAL_ANGLE if vertical else HORIZONTAL_ANGLE
            h, w = im.shape[-2], im.shape[-1]
            thr = max(w, h) // HOUGH_THRESHOLD_LENGTH_DIVISOR
            return jax.vmap(lambda e, a, b2: hough_best_line(
                e, a, b2, rho=1.0, theta=HOUGH_THETA_RES, threshold=thr,
                theta_min=base - MAX_ANGLE_DEVIATION,
                theta_max=base + MAX_ANGLE_DEVIATION, vertical=vertical,
                gradient_angle_threshold=HOUGH_GRADIENT_ANGLE_THRESHOLD))(
                    edges_, dx, dy)
        report(f"canny+hough {edge} band",
               bench(jax.jit(f_hough_impl), b, iters=args.iters))

    # stage: full detect_edges (12 bands, 3 planes)
    f_detect = jax.jit(jax.vmap(lambda a, b, c: api.detect_edges(a, b, c)))
    report("detect_edges (all 12 bands)", bench(f_detect, y, cb, cr, iters=args.iters))

    # stage: warp
    corners = jax.device_put(
        np.tile(np.float32([[106, 105], [533, 105], [106, 374], [533, 374]]),
                (S, 1, 1)))
    f_warp = jax.jit(jax.vmap(lambda im, c: unwarp_card(im, c)))
    report("warp 428x270", bench(f_warp, y, corners, iters=args.iters))

    # stage: full preprocess
    f_pre = jax.jit(jax.vmap(lambda a, b, c: api.preprocess_frame(a, b, c)))
    report("preprocess_frame (fused)", bench(f_pre, y, cb, cr, iters=args.iters))

    # stage: card scan step (PAN+expiry)
    params = load_all_params()
    cards = jax.device_put(rng.randint(0, 256, (S, 270, 428)).astype(np.uint8))
    states = init_stream_states(S)
    f_scan = jax.jit(lambda st, fr: batched_scanner_step(
        params, st, fr, scan_expiry=True)[1][1].complete)
    report("scanner_step (PAN+expiry)", bench(f_scan, states, cards, iters=args.iters))


if __name__ == "__main__":
    main()
