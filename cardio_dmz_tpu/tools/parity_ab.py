"""Large-sweep A/B parity measurement vs the COMPILED reference C++.

Runs the TPU pipeline and the compiled reference (cardio_dmz_tpu.refbridge)
over a sweep of synthetic frames and sessions, and prints the
digit-agreement / stage-agreement numbers recorded in PARITY.md.

Usage: python tools/parity_ab.py [--frames N] [--sessions N] [--json]
"""

import argparse
import collections
import json
import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, _REPO_ROOT)
sys.path.insert(0, os.path.join(_REPO_ROOT, "tests"))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=200)
    ap.add_argument("--sessions", type=int, default=30)
    ap.add_argument("--expiry-sessions", type=int, default=100)
    ap.add_argument("--camera-frames", type=int, default=60)
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")

    from cardio_dmz_tpu import synthetic
    from cardio_dmz_tpu import refbridge
    from cardio_dmz_tpu.models.weights import load_all_params
    from cardio_dmz_tpu.models import zoo
    from cardio_dmz_tpu.scan import scan_card_image
    from cardio_dmz_tpu.session.host import HostScanner

    assert refbridge.available(), "reference checkout/toolchain unavailable"
    o = refbridge.RefOracle.shared()
    params = load_all_params()
    zoo.set_precision("highest")
    scan = jax.jit(lambda y: scan_card_image(params, y))

    c = collections.Counter()
    rng = np.random.default_rng(2026)

    # ---------------- per-frame PAN sweep ----------------
    for i in range(args.frames):
        length = 16 if i % 4 else 15
        prefix = (4,) if length == 16 else (3, 4)
        pan = synthetic.safe_pan(rng, length=length, prefix=prefix)
        y0 = int(rng.integers(140, 236))
        width = float(rng.uniform(17.3, 19.0))
        offset = int(rng.integers(25, 45))
        noise = int(rng.integers(0, 4))
        y = np.asarray(synthetic.render_frame(
            pan, y0=y0, width=width, offset=offset, seed=i, noise=noise,
            style=("emboss" if i % 3 else "flat")), dtype=np.uint8)

        ref = o.scan_card_image(y, scan_expiry=False)
        ours = scan(y)

        c["frames"] += 1
        c["usable_agree"] += int(ref.usable == bool(ours.usable))
        if not (ref.usable and bool(ours.usable)):
            continue
        c["usable_frames"] += 1
        c["vseg_agree"] += int(int(ours.vseg.y_offset) == ref.vseg_y_offset
                               and int(ours.vseg.pattern_type) == ref.vseg_pattern_type)
        n = int(ours.hseg.n_offsets)
        if n != ref.hseg_n_offsets:
            c["nlen_mismatch"] += 1
            continue
        our_offsets = list(map(int, np.asarray(ours.hseg.offsets)[:n]))
        hseg_same = our_offsets == ref.hseg_offsets
        c["hseg_agree"] += int(hseg_same)
        our_digits = list(map(int, np.asarray(ours.scores).argmax(1)[:n]))
        truth = [int(d) for d in pan]
        c["digits"] += n
        c["digit_agree"] += sum(a == b for a, b in zip(our_digits, ref.digits))
        c["our_correct"] += sum(a == t for a, t in zip(our_digits, truth))
        c["ref_correct"] += sum(b == t for b, t in zip(ref.digits, truth))
        if hseg_same:
            c["digits_same_hseg"] += n
            c["digit_agree_same_hseg"] += sum(
                a == b for a, b in zip(our_digits, ref.digits))

    # ---------------- session-level PAN sweep ----------------
    for s in range(args.sessions):
        length = 16 if s % 3 else 15
        prefix = (4,) if length == 16 else (3, 4)
        pan = synthetic.safe_pan(rng, length=length, prefix=prefix)
        ours = HostScanner(params, scan_expiry=False)
        handle = o.scanner_create()
        ref_pan = our_pan = None
        for i in range(10):
            y = np.asarray(synthetic.render_frame(
                pan, y0=150 + (s % 5) * 4, seed=1000 * s + i, noise=1,
                style=("emboss" if s % 3 else "flat")), dtype=np.uint8)
            ours.add_frame(y)
            o.scanner_add_frame(handle, y, scan_expiry=False)
            if ref_pan is None:
                r = o.scanner_result(handle)
                if r:
                    ref_pan = "".join(map(str, r[0]))
            if our_pan is None:
                res = ours.result()
                if res.complete:
                    our_pan = "".join(
                        map(str, np.asarray(res.predictions)[:int(res.n_numbers)]))
        o.scanner_destroy(handle)
        c["sessions"] += 1
        c["session_agree"] += int(ref_pan == our_pan)
        c["session_ref_correct"] += int(ref_pan == pan)
        c["session_our_correct"] += int(our_pan == pan)

    # ---------------- session-level expiry sweep ----------------
    # Randomized sessions: date (incl. out-of-window rejects), layout
    # (position, spacing, PAN row), noise — both the HOST oracle and the
    # DEVICE in-graph expiry path (scanner_step(scan_expiry=True)) are
    # measured DIRECTLY against the compiled reference session.
    from cardio_dmz_tpu.config import ScanConfig
    from cardio_dmz_tpu.session.state import scanner_reset, scanner_step

    # the compiled reference harness is the CYTHON_DMZ configuration,
    # whose date sanity also accepts past dates — match it for the A/B
    ab_config = ScanConfig(scan_expiry=True, expiry_allow_past_dates=True)
    dev_step = jax.jit(
        lambda st, y: scanner_step(params, st, y, config=ab_config))
    now = (2026, 8)
    # Round-4: every session uses FULLY randomized layout (position,
    # spacing, PAN row, noise) — the round-3 "reliable layout" crutch is
    # gone. 3/4 of sessions use the embossed renderer (the training-
    # distribution-shaped glyphs, tools/tune_emboss.py), 1/4 the flat
    # renderer for diversity; dates are unrestricted digits (embossed
    # glyphs read all ten).
    for s in range(args.expiry_sessions):
        if s % 8 == 7:       # out-of-window date: rejection agreement
            text = "%02d/%02d" % (rng.integers(1, 13), rng.integers(32, 40))
        elif s % 8 == 3:     # past date
            text = "%02d/%02d" % (rng.integers(1, 13), rng.integers(20, 26))
        else:                # fully random in-window date
            text = "%02d/%02d" % (rng.integers(1, 13), rng.integers(27, 31))
        want = (int(text[:2]), 2000 + int(text[3:]))
        style = "flat" if s % 4 == 1 else "emboss"
        y0 = int(rng.integers(145, 205))
        ex = int(rng.integers(90, 170))
        ey = min(y0 + 27 + int(rng.integers(30, 46)), 240)
        spacing = int(rng.integers(12, 15))
        noise = int(rng.integers(0, 3))
        pan = synthetic.safe_pan(rng)

        ours = HostScanner(params, scan_expiry=True, now=now,
                           allow_past_dates=True)
        dev = scanner_reset(now=now)
        handle = o.scanner_create()
        ref_date = our_date = dev_date = None
        for i in range(16):
            y = np.asarray(synthetic.render_frame_with_expiry(
                pan, text, y0=y0, expiry_y=ey, expiry_x=ex,
                expiry_spacing=spacing, noise=noise, style=style,
                seed=7000 * s + i), dtype=np.uint8)
            ours.add_frame(y)
            dev, (_, dres) = dev_step(dev, y)
            o.scanner_add_frame(handle, y, scan_expiry=True)
            r = o.scanner_result(handle)
            if ref_date is None and r and r[1] and r[2]:
                ref_date = (r[1], r[2])
            res = ours.result()
            if our_date is None and res.complete and res.expiry_month:
                our_date = (res.expiry_month, res.expiry_year)
            if dev_date is None and bool(dres.complete) and \
                    int(dres.expiry_month):
                dev_date = (int(dres.expiry_month), int(dres.expiry_year))
        o.scanner_destroy(handle)
        c["expiry_sessions"] += 1
        c["expiry_agree"] += int(ref_date == our_date)
        c["expiry_dev_agree"] += int(ref_date == dev_date)
        c["expiry_read_sessions"] += int(ref_date is not None)
        c["expiry_ref_correct"] += int(ref_date == want)
        c["expiry_our_correct"] += int(our_date == want)

    # ---------------- camera-path sweep (detect + warp + scan) ----------
    # cards embedded with randomized slight PERSPECTIVE, so this measures
    # the dense two-pass warp deviation vs cvWarpPerspective end to end.
    from cardio_dmz_tpu import api
    from cardio_dmz_tpu.ops.warp import calc_persp_transform, warp_perspective

    detect = jax.jit(lambda a, b, cc: api.detect_edges(a, b, cc))
    bounds = api.warp_src_bounds((480, 640), 3)
    # the round-3 serving default: the bit-exact fixed-point warp
    tf = jax.jit(lambda s, cp: api.transform_card(s, cp, src_bounds=bounds,
                                                  method="exact"))
    # the full-float two-pass warp (the former serving default, kept as
    # the better-than-reference precision configuration)
    tf_gather = jax.jit(lambda s, cp: api.transform_card(s, cp,
                                                         src_bounds=bounds,
                                                         method="dense"))
    for i in range(args.camera_frames):
        pan = synthetic.safe_pan(rng)
        card = np.asarray(synthetic.render_frame(
            pan, y0=int(rng.integers(145, 230)), width=18.5,
            offset=int(rng.integers(25, 42)), seed=9000 + i,
            noise=int(rng.integers(0, 3))), np.uint8)
        # place the card quad with jittered corners (slight perspective)
        gx, gy = 106, 105
        quad = np.float32([[gx, gy], [gx + 428, gy],
                           [gx, gy + 270], [gx + 428, gy + 270]])
        quad += rng.uniform(-6, 6, (4, 2)).astype(np.float32)
        hmat = calc_persp_transform(
            np.float32([[0, 0], [427, 0], [0, 269], [427, 269]]), quad)
        warped = np.asarray(warp_perspective(card, hmat, (480, 640)))
        y = np.where(warped > 0, warped, 50).astype(np.uint8)
        cb = np.full((240, 320), 128, np.uint8)

        ok_ref, _, _, ref_corners = o.detect_edges(y, cb, cb)
        edges, corners = detect(y, cb, cb)
        c["cam_frames"] += 1
        c["cam_found_agree"] += int(bool(corners.found_all) == ok_ref)
        if not (ok_ref and bool(corners.found_all)):
            continue
        c["cam_both_found"] += 1   # denominator for corner/warp metrics
        ours_c = np.stack([np.asarray(corners.top_left),
                           np.asarray(corners.top_right),
                           np.asarray(corners.bottom_left),
                           np.asarray(corners.bottom_right)])
        c["cam_corner_agree"] += int(np.abs(ours_c - ref_corners).max() < 0.5)
        ref_card = o.transform_card(y, ref_corners)
        our_card = np.asarray(tf(y, corners))
        diff = np.abs(our_card.astype(int) - ref_card.astype(int))
        c["cam_warp_close"] += int((diff <= 2).mean() > 0.99)
        c["cam_warp_exact"] += int((diff == 0).all())
        ref = o.scan_card_image(ref_card, scan_expiry=False)
        ours = scan(our_card)
        if ref.usable and bool(ours.usable) and \
                int(ours.hseg.n_offsets) == ref.hseg_n_offsets:
            n = ref.hseg_n_offsets
            our_digits = list(map(int, np.asarray(ours.scores).argmax(1)[:n]))
            c["cam_digits"] += n
            c["cam_digit_agree"] += sum(
                a == b for a, b in zip(our_digits, ref.digits))
        g_card = np.asarray(tf_gather(y, corners))
        g = scan(g_card)
        if ref.usable and bool(g.usable) and \
                int(g.hseg.n_offsets) == ref.hseg_n_offsets:
            n = ref.hseg_n_offsets
            g_digits = list(map(int, np.asarray(g.scores).argmax(1)[:n]))
            c["cam_float_digits"] += n
            c["cam_float_digit_agree"] += sum(
                a == b for a, b in zip(g_digits, ref.digits))

    def pct(a, b):
        return round(100.0 * a / b, 2) if b else None

    report = {
        "frames": c["frames"],
        "usable_agreement_pct": pct(c["usable_agree"], c["frames"]),
        "usable_frames": c["usable_frames"],
        "vseg_agreement_pct": pct(c["vseg_agree"], c["usable_frames"]),
        "hseg_exact_agreement_pct": pct(c["hseg_agree"], c["usable_frames"]),
        "digits_compared": c["digits"],
        "digit_agreement_pct": pct(c["digit_agree"], c["digits"]),
        "digit_agreement_given_same_hseg_pct": pct(
            c["digit_agree_same_hseg"], c["digits_same_hseg"]),
        "our_digit_accuracy_pct": pct(c["our_correct"], c["digits"]),
        "ref_digit_accuracy_pct": pct(c["ref_correct"], c["digits"]),
        "pan_sessions": c["sessions"],
        "session_pan_agreement_pct": pct(c["session_agree"], c["sessions"]),
        "session_our_accuracy_pct": pct(c["session_our_correct"], c["sessions"]),
        "session_ref_accuracy_pct": pct(c["session_ref_correct"], c["sessions"]),
        "expiry_sessions": c["expiry_sessions"],
        "expiry_date_agreement_pct": pct(c["expiry_agree"], c["expiry_sessions"]),
        "expiry_device_date_agreement_pct": pct(
            c["expiry_dev_agree"], c["expiry_sessions"]),
        "expiry_sessions_ref_read": c["expiry_read_sessions"],
        "expiry_our_accuracy_pct": pct(c["expiry_our_correct"], c["expiry_sessions"]),
        "expiry_ref_accuracy_pct": pct(c["expiry_ref_correct"], c["expiry_sessions"]),
        "camera_frames": c["cam_frames"],
        "camera_found_agreement_pct": pct(c["cam_found_agree"], c["cam_frames"]),
        "camera_corner_exact_pct": pct(c["cam_corner_agree"], c["cam_both_found"]),
        "camera_warp_close_pct": pct(c["cam_warp_close"], c["cam_both_found"]),
        "camera_warp_bit_exact_pct": pct(c["cam_warp_exact"],
                                         c["cam_both_found"]),
        "camera_digit_agreement_pct": pct(c["cam_digit_agree"], c["cam_digits"]),
        "camera_digit_agreement_float_warp_pct": pct(
            c["cam_float_digit_agree"], c["cam_float_digits"]),
    }
    print(json.dumps(report, indent=None if args.json else 2))


if __name__ == "__main__":
    main()
