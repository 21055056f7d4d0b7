"""Session-level accepted-read correctness sweep (the >=99.5% gate).

Runs hundreds of randomized synthetic card sessions (PAN, geometry,
photometrics varied) through the full batched scan pipeline and reports:

* acceptance rate — sessions whose PAN completes within the frame budget
* accepted-read correctness — of the accepted reads, how many equal the
  true PAN (the scanner's contract: the Luhn + stability + frame-lead
  gates make a WRONG accepted read far rarer than a non-read)
* per-digit accuracy over usable frames

Usage: python -m cardio_dmz_tpu.tools.accuracy_sweep [--sessions 512]
(TPU; use --sessions 64 for a CPU smoke.)
"""

import argparse
import json
import os
import sys

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, _REPO_ROOT)
sys.path.insert(0, os.path.join(_REPO_ROOT, "tests"))


def render_sessions(rng, n_sessions, frames_per_session):
    from cardio_dmz_tpu import synthetic

    frames = np.zeros((n_sessions, frames_per_session, 270, 428), np.uint8)
    pans = []
    for s in range(n_sessions):
        length = 16 if s % 4 else 15
        prefix = (4,) if length == 16 else (3, 4)
        pan = synthetic.safe_pan(rng, length=length, prefix=prefix)
        y0 = int(rng.integers(140, 232))
        width = float(rng.uniform(17.5, 19.3))
        offset = int(rng.integers(25, 45))
        noise = int(rng.integers(0, 4))
        brightness = int(rng.integers(-25, 26))
        contrast = float(rng.uniform(0.85, 1.15))
        shading = int(rng.integers(0, 30))
        for t in range(frames_per_session):
            frames[s, t] = synthetic.render_frame(
                pan, y0=y0, width=width, offset=offset, seed=997 * s + t,
                noise=noise, brightness=brightness, contrast=contrast,
                shading=shading)
        pans.append(pan)
    return frames, pans


def render_camera_sessions(rng, n_sessions, frames_per_session, warp_batch):
    """Place each session's card under per-frame jittered perspective quads
    in a 480x640 preview (same placement family as tools/parity_ab.py's
    camera sweep; dmz.cpp:371-497 is the per-frame work being exercised)."""
    import jax
    import jax.numpy as jnp
    from cardio_dmz_tpu import synthetic
    from cardio_dmz_tpu.ops.warp import calc_persp_transform, warp_perspective

    S, T = n_sessions, frames_per_session
    cards = np.zeros((S, 270, 428), np.uint8)
    pans = []
    quads = np.zeros((S, T, 4, 2), np.float32)
    base = np.float32([[106, 105], [534, 105], [106, 375], [534, 375]])
    for s in range(S):
        length = 16 if s % 4 else 15
        prefix = (4,) if length == 16 else (3, 4)
        pan = synthetic.safe_pan(rng, length=length, prefix=prefix)
        cards[s] = synthetic.render_frame(
            pan, y0=int(rng.integers(145, 230)), width=18.5,
            offset=int(rng.integers(25, 42)), seed=7700 * s,
            noise=int(rng.integers(0, 3)),
            brightness=int(rng.integers(-20, 21)))
        pans.append(pan)
        jit = rng.uniform(-6, 6, (4, 2)).astype(np.float32)  # per session
        for t in range(T):
            quads[s, t] = base + jit + \
                rng.uniform(-1.5, 1.5, (4, 2)).astype(np.float32)

    src = jnp.float32([[0, 0], [427, 0], [0, 269], [427, 269]])

    def place(card, quad):
        h = calc_persp_transform(src, quad)
        warped = warp_perspective(card, h, (480, 640))
        return jnp.where(warped > 0, warped, 50).astype(jnp.uint8)

    place_b = jax.jit(jax.vmap(place))
    flat_cards = np.repeat(cards[:, None], T, axis=1).reshape(S * T, 270, 428)
    flat_quads = quads.reshape(S * T, 4, 2)
    ys = np.zeros((S * T, 480, 640), np.uint8)
    for i in range(0, S * T, warp_batch):
        j = min(i + warp_batch, S * T)
        n = j - i
        cb = np.concatenate([flat_cards[i:j],
                             np.repeat(flat_cards[i:i + 1],
                                       warp_batch - n, 0)])
        qb = np.concatenate([flat_quads[i:j],
                             np.repeat(flat_quads[i:i + 1],
                                       warp_batch - n, 0)])
        ys[i:j] = np.asarray(place_b(cb, qb))[:n]
    return ys.reshape(S, T, 480, 640), pans


def run_camera_sweep(n_sessions=128, frames_per_session=8, batch=32,
                     seed=2026, quiet=False):
    """End-to-end camera-path version of run_sweep: 480x640 preview frames
    through detect -> exact warp -> scan (the serving-default camera graph,
    batched_camera_step) with randomized perspective + photometrics."""
    import jax
    from cardio_dmz_tpu.models.weights import load_all_params
    from cardio_dmz_tpu.parallel.streams import (batched_camera_step,
                                                 init_stream_states)

    params = load_all_params()
    rng = np.random.default_rng(seed)

    step = jax.jit(lambda st, y, cb, cr: batched_camera_step(
        params, st, y, cb, cr, scan_expiry=False))

    accepted = correct = 0
    wrong_reads = []
    done = 0
    while done < n_sessions:
        n = min(batch, n_sessions - done)
        ys, pans = render_camera_sessions(rng, n, frames_per_session,
                                          warp_batch=batch)
        if n < batch:
            ys = np.concatenate([ys, np.repeat(ys[:1], batch - n, 0)])
        cbcr = np.full((batch, 240, 320), 128, np.uint8)
        states = init_stream_states(batch)
        for t in range(frames_per_session):
            states, _ = step(states, ys[:, t], cbcr, cbcr)
        complete = np.asarray(states.number_complete)[:n]
        digits = np.asarray(states.completed_digits)[:n]
        n_num = np.asarray(states.completed_n)[:n]
        for i in range(n):
            if not complete[i]:
                continue
            accepted += 1
            got = "".join(map(str, digits[i][:n_num[i]]))
            if got == pans[i]:
                correct += 1
            else:
                wrong_reads.append((pans[i], got))
        done += n
        if not quiet:
            print(f"# camera {done}/{n_sessions} accepted={accepted} "
                  f"correct={correct}", file=sys.stderr)

    return {
        "mode": "camera",
        "sessions": n_sessions,
        "frames_per_session": frames_per_session,
        "accepted": accepted,
        "acceptance_rate_pct": round(100.0 * accepted / n_sessions, 2),
        "accepted_correct_pct": (round(100.0 * correct / accepted, 3)
                                 if accepted else None),
        "wrong_reads": wrong_reads[:10],
    }


def run_sweep(n_sessions=512, frames_per_session=8, batch=64, seed=2026,
              quiet=False):
    import jax
    from cardio_dmz_tpu.models.weights import load_all_params
    from cardio_dmz_tpu.parallel.streams import batched_scan_frames

    params = load_all_params()
    rng = np.random.default_rng(seed)

    run = jax.jit(lambda fr: batched_scan_frames(params, fr))

    accepted = correct = 0
    wrong_reads = []
    done = 0
    while done < n_sessions:
        n = min(batch, n_sessions - done)
        frames, pans = render_sessions(rng, n, frames_per_session)
        if n < batch:  # pad to the compiled batch shape
            pad = np.repeat(frames[:1], batch - n, axis=0)
            frames = np.concatenate([frames, pad])
        state, _ = run(jax.device_put(frames))
        complete = np.asarray(state.number_complete)[:n]
        digits = np.asarray(state.completed_digits)[:n]
        n_num = np.asarray(state.completed_n)[:n]
        for i in range(n):
            if not complete[i]:
                continue
            accepted += 1
            got = "".join(map(str, digits[i][:n_num[i]]))
            if got == pans[i]:
                correct += 1
            else:
                wrong_reads.append((pans[i], got))
        done += n
        if not quiet:
            print(f"# {done}/{n_sessions} accepted={accepted} "
                  f"correct={correct}", file=sys.stderr)

    report = {
        "sessions": n_sessions,
        "frames_per_session": frames_per_session,
        "accepted": accepted,
        "acceptance_rate_pct": round(100.0 * accepted / n_sessions, 2),
        "accepted_correct_pct": (round(100.0 * correct / accepted, 3)
                                 if accepted else None),
        "wrong_reads": wrong_reads[:10],
    }
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sessions", type=int, default=512)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--seed", type=int, default=2026)
    ap.add_argument("--camera", action="store_true",
                    help="end-to-end camera path (480x640 preview frames "
                         "with randomized perspective)")
    args = ap.parse_args()
    if args.camera:
        report = run_camera_sweep(args.sessions, args.frames, args.batch,
                                  args.seed)
    else:
        report = run_sweep(args.sessions, args.frames, args.batch, args.seed)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
