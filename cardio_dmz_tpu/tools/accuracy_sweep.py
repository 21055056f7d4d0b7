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
    args = ap.parse_args()
    report = run_sweep(args.sessions, args.frames, args.batch, args.seed)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
