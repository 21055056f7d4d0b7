"""Tune the embossed-glyph renderer against the COMPILED reference.

Grid-searches the relief parameters (EMBOSS_AV/AH/TINT and the expiry
font size) for synthetic.py's style="emboss" renderer, scoring each combo
by how often the compiled reference session reader (refbridge) reads
randomized expiry dates at randomized layouts — the acceptance criterion
the round-3 evidence was missing (VERDICT.md: reads in only 52/100
sessions, half on a hand-picked reliable layout).

Usage: python -m cardio_dmz_tpu.tools.tune_emboss [--sessions 12]
"""

import argparse
import itertools
import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, _REPO_ROOT)
sys.path.insert(0, os.path.join(_REPO_ROOT, "tests"))

import numpy as np


def expiry_score(o, synthetic, rng, sessions, frames=10, style="emboss",
                 eymax=252):
    reads = correct = 0
    for s in range(sessions):
        text = "%02d/%02d" % (rng.integers(1, 13), rng.integers(27, 31))
        want = (int(text[:2]), 2000 + int(text[3:]))
        pan = synthetic.safe_pan(rng)
        y0 = int(rng.integers(145, 205))
        ex = int(rng.integers(90, 170))
        ey = min(y0 + 27 + int(rng.integers(30, 46)), eymax)
        sp = int(rng.integers(12, 15))
        h = o.scanner_create()
        ref_date = None
        for i in range(frames):
            y = np.asarray(synthetic.render_frame_with_expiry(
                pan, text, y0=y0, expiry_y=ey, expiry_x=ex,
                expiry_spacing=sp, noise=1, seed=7000 * s + i,
                style=style), np.uint8)
            o.scanner_add_frame(h, y, scan_expiry=True)
            r = o.scanner_result(h)
            if r and r[1] and r[2]:
                ref_date = (r[1], r[2])
                break
        o.scanner_destroy(h)
        reads += int(ref_date is not None)
        correct += int(ref_date == want)
    return reads, correct


def pan_score(o, synthetic, rng, sessions, frames=10, style="emboss"):
    ok = 0
    for s in range(sessions):
        pan = synthetic.safe_pan(rng)
        h = o.scanner_create()
        got = None
        for i in range(frames):
            y = np.asarray(synthetic.render_frame(
                pan, y0=150 + (s % 5) * 4, seed=1000 * s + i, noise=1,
                style=style), np.uint8)
            o.scanner_add_frame(h, y, scan_expiry=False)
            r = o.scanner_result(h)
            if r:
                got = "".join(map(str, r[0]))
                break
        o.scanner_destroy(h)
        ok += int(got == pan)
    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sessions", type=int, default=12)
    ap.add_argument("--av", default="40,55,70")
    ap.add_argument("--ah", default="30,45,60")
    ap.add_argument("--tint", default="-25,-10,0")
    ap.add_argument("--fsize", default="18")
    ap.add_argument("--pan", action="store_true",
                    help="score the PAN row instead of expiry")
    ap.add_argument("--style", default="emboss")
    ap.add_argument("--eymax", type=int, default=252)
    ap.add_argument("--frames", type=int, default=10)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    from cardio_dmz_tpu import refbridge, synthetic

    assert refbridge.available()
    o = refbridge.RefOracle.shared()

    grid = itertools.product(
        [int(v) for v in args.av.split(",")],
        [int(v) for v in args.ah.split(",")],
        [int(v) for v in args.tint.split(",")],
        [int(v) for v in args.fsize.split(",")])
    best = None
    for av, ah, tint, fs in grid:
        synthetic.EMBOSS_AV = av
        synthetic.EMBOSS_AH = ah
        synthetic.EMBOSS_TINT = tint
        synthetic._EXPIRY_DIGIT_FONTS = {
            d: (synthetic.FONT_BOLD_PATH, fs) for d in range(10)}
        rng = np.random.default_rng(11)
        if args.pan:
            ok = pan_score(o, synthetic, rng, args.sessions,
                           frames=args.frames, style=args.style)
            print(f"av={av} ah={ah} tint={tint} fs={fs}: pan {ok}/"
                  f"{args.sessions}", flush=True)
            key = ok
        else:
            reads, correct = expiry_score(o, synthetic, rng, args.sessions,
                                          frames=args.frames,
                                          style=args.style,
                                          eymax=args.eymax)
            print(f"av={av} ah={ah} tint={tint} fs={fs}: reads {reads}/"
                  f"{args.sessions} correct {correct}", flush=True)
            key = (correct, reads)
        if best is None or key > best[0]:
            best = (key, (av, ah, tint, fs))
    print("BEST:", best)


if __name__ == "__main__":
    main()
