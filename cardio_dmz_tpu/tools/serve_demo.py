"""Production serving loop demo: native ingest -> sharded device step.

Simulated camera threads push frames into the C++ framepump ring; the
serving loop acquires latest-frame batches and steps every stream's
scanner session through the jitted PAN(+expiry) graph. Demonstrates the
whole deployment shape end to end and reports accepted card reads.

Usage:
  python tools/serve_demo.py --streams 16 --seconds 5
"""

import argparse
import os
import sys
import threading
import time

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=16)
    ap.add_argument("--seconds", type=float, default=5.0)
    ap.add_argument("--fps", type=float, default=30.0)
    ap.add_argument("--expiry", action="store_true")
    args = ap.parse_args()

    import jax
    sys.path.insert(0, os.path.join(_REPO_ROOT, "tests"))
    from cardio_dmz_tpu import synthetic
    from cardio_dmz_tpu.models.weights import load_all_params
    from cardio_dmz_tpu.parallel.mesh import make_mesh
    from cardio_dmz_tpu.parallel.streams import make_sharded_step
    from cardio_dmz_tpu.runtime import FramePump

    params = load_all_params()
    mesh = make_mesh()
    step, place, init = make_sharded_step(params, mesh,
                                          scan_expiry=args.expiry)
    # warm the compile before the serving window opens (first compile of
    # the full graph takes tens of seconds on TPU)
    warm = init(args.streams)
    import jax.numpy as jnp
    step(warm, place(jnp.zeros((args.streams, 270, 428), jnp.uint8)))
    states = init(args.streams)
    pump = FramePump(args.streams, frame_shape=(270, 428))

    # each simulated camera shows a different card
    rng = np.random.RandomState(0)
    pans = [synthetic.safe_pan(rng) for _ in range(args.streams)]
    stop = threading.Event()

    def camera(sid):
        i = 0
        while not stop.is_set():
            i += 1
            frame = synthetic.render_frame(
                pans[sid], y0=150, width=18.0, offset=35,
                seed=(sid * 97 + i) % 6, noise=1)
            pump.push(sid, frame, frame_id=i)
            time.sleep(1.0 / args.fps)

    threads = [threading.Thread(target=camera, args=(s,), daemon=True)
               for s in range(args.streams)]
    for t in threads:
        t.start()

    from cardio_dmz_tpu.runtime.metrics import Metrics
    metrics = Metrics()
    metrics.set("streams", args.streams)

    deadline = time.time() + args.seconds
    done = set()
    while time.time() < deadline:
        with metrics.time("acquire"):
            batch, ids, fresh = pump.acquire_batch()
        metrics.inc("frames_fresh", int(np.asarray(fresh).sum()))
        metrics.inc("frames_stale", args.streams - int(np.asarray(fresh).sum()))
        with metrics.time("step"):
            states, (frames, results) = step(states, place(batch))
            complete = np.asarray(results.complete)
        metrics.inc("steps")
        metrics.inc("frames_scanned", args.streams)
        metrics.inc("frames_usable", int(np.asarray(frames.usable).sum()))
        digits = np.asarray(states.completed_digits)
        n = np.asarray(states.completed_n)
        for s in range(args.streams):
            if complete[s] and s not in done:
                got = "".join(map(str, digits[s][:n[s]]))
                ok = "OK " if got == pans[s] else "MISMATCH"
                metrics.inc("reads_accepted")
                metrics.inc("reads_correct" if got == pans[s]
                            else "reads_mismatched")
                print(f"stream {s}: {ok} {got} (truth {pans[s]})")
                done.add(s)
        metrics.set("streams_completed", len(done))
    stop.set()
    for t in threads:
        t.join(timeout=2)
    pump.close()
    print(f"{metrics.snapshot().get('counter_steps', 0)} serving steps, "
          f"{len(done)}/{args.streams} streams completed in {args.seconds}s")
    print("--- metrics ---")
    print(metrics.render_text(), end="")
    return 0


if __name__ == "__main__":
    sys.exit(main())
