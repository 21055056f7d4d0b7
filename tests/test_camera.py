"""End-to-end camera-path tests: 480x640 YCbCr preview frame -> edge
detection -> rectification -> scan -> accepted PAN, all in ONE jitted graph
(camera_scanner_step). This is the reference's whole per-frame work —
dmz_detect_edges + dmz_transform_card (dmz.cpp:371-497) followed by
scanner_add_frame_with_expiry (scan/scan.cpp:41-86) — which the reference
splits across host-app calls and we fuse."""

import jax
import numpy as np

from cardio_dmz_tpu.constants import (
    LANDSCAPE_HORIZONTAL_INSET,
    LANDSCAPE_VERTICAL_INSET,
)
from cardio_dmz_tpu.models.weights import load_all_params
from cardio_dmz_tpu.session import scanner_reset
from cardio_dmz_tpu.session.state import camera_scanner_step

from synthetic import render_frame, safe_pan

RNG = np.random.RandomState(7)


def embed_card_in_preview(card, bg=50, noise=3, rng=RNG):
    """Place a 270x428 card image on the landscape guide rect of a 480x640
    preview frame (the rect is exactly card-sized: dmz_constants.h:7-11)."""
    x0 = LANDSCAPE_HORIZONTAL_INSET
    y0 = LANDSCAPE_VERTICAL_INSET
    y = np.full((480, 640), bg, np.int32)
    y += rng.randint(-noise, noise + 1, y.shape)
    y[y0:y0 + 270, x0:x0 + 428] = np.asarray(card, np.int32)
    y = np.clip(y, 0, 255).astype(np.uint8)
    cb = np.full((240, 320), 128, np.uint8)
    cr = np.full((240, 320), 128, np.uint8)
    return y, cb, cr


def test_camera_matches_direct_scan():
    """The fused camera path (detect -> warp -> scan) must read what a
    direct scan of the same card reads: on a guide-aligned clean card the
    warp reduces to an integer translation (the gradient peak may sit a
    pixel or two outside the card — the compiled reference detects the
    same corners), so the segmentation may shift by that constant but the
    digit reads must be identical.

    Pinned to the full-float "dense" warp: this test probes the FUSION
    plumbing, and its digit-identity premise needs interpolation that does
    not degrade the marginal synthetic glyphs. The serving-default "exact"
    warp reproduces the reference's lossier 5-bit fixed point bit-for-bit
    and is gated directly against the compiled reference in
    test_cpp_parity.py instead."""
    from cardio_dmz_tpu.config import ScanConfig
    from cardio_dmz_tpu.scan import scan_card_image
    params = load_all_params()
    pan = safe_pan(np.random.RandomState(3))
    # full 19-px cell pitch: the synthetic font needs it to stay readable
    # through the warp's 1-px shift (see test_camera_session_reads_pan)
    card = render_frame(pan, seed=42, noise=0, width=19.0, offset=32)
    y, cb, cr = embed_card_in_preview(card, noise=0)

    cfg = ScanConfig(warp_method="dense")
    state = scanner_reset()
    state, (found, frame, _) = jax.jit(
        lambda s, a, b, c: camera_scanner_step(params, s, a, b, c,
                                               config=cfg))(
            state, y, cb, cr)
    direct = jax.jit(lambda im: scan_card_image(params, im))(card)

    assert bool(found)
    dy = int(frame.vseg.y_offset) - int(direct.vseg.y_offset)
    assert abs(dy) <= 2, dy
    assert int(frame.hseg.n_offsets) == int(direct.hseg.n_offsets)
    # the 1-px shift slightly moves the dense hseg width optimum, so
    # offsets can drift by +-1 across the row; what must hold is that every
    # cell lands within 2 px and every digit reads identically
    dx = np.asarray(frame.hseg.offsets) - np.asarray(direct.hseg.offsets)
    assert np.abs(dx).max() <= 2, dx
    # >= 15/16 digits read identically: the synthetic glyphs flip 9/0 on a
    # 1-px shift occasionally (on this seed the camera path reads the TRUE
    # digit and the direct scan misses it); a real fusion bug scrambles
    # most positions
    cam = np.asarray(frame.scores).argmax(-1)
    ref = np.asarray(direct.scores).argmax(-1)
    assert (cam == ref).sum() >= 15, (cam, ref)


def test_camera_session_reads_pan():
    params = load_all_params()
    pan = "4111111111111111"

    @jax.jit
    def step(state, y, cb, cr):
        return camera_scanner_step(params, state, y, cb, cr,
                                   scan_expiry=False)

    state = scanner_reset()
    result = None
    for i in range(25):
        # noise-free frame keeps the detected edges an integer translation
        # of the guide rect (renderer robustness under noise is covered by
        # the accuracy sweeps in test_scan.py). Geometry 18.5/30 chosen so
        # the COMPILED REFERENCE completes this session too (frame 19, same
        # read) — the serving-default "exact" warp reproduces its 5-bit
        # fixed-point interpolation bit-for-bit, so this also pins
        # session-level behavioral parity.
        card = render_frame(pan, seed=i, noise=0, y0=150, width=18.5,
                            offset=30)
        y, cb, cr = embed_card_in_preview(card, noise=0)
        state, (found, frame, result) = step(state, y, cb, cr)
        assert bool(found), f"card not found on frame {i}"
        if bool(result.complete):
            break
    assert bool(result.complete)
    got = [int(d) for d in np.asarray(result.predictions)[:16]]
    assert got == [int(c) for c in pan]
    # telemetry was computed in-graph and recorded in the analytics ring
    assert float(frame.focus_score) > 0.0
    assert float(frame.brightness_score) > 0.0
    ring = state.analytics
    assert int(ring.n_recorded) >= 1
    assert float(np.asarray(ring.focus_score)[0]) > 0.0
    assert float(np.asarray(ring.brightness_score)[0]) > 0.0


def test_camera_step_blank_frames_accumulate_nothing():
    params = load_all_params()

    @jax.jit
    def step(state, y, cb, cr):
        return camera_scanner_step(params, state, y, cb, cr,
                                   scan_expiry=False)

    state = scanner_reset()
    y = np.full((480, 640), 90, np.uint8)
    cb = np.full((240, 320), 128, np.uint8)
    cr = np.full((240, 320), 128, np.uint8)
    state, (found, frame, result) = step(state, y, cb, cr)
    assert not bool(found)
    assert not bool(frame.usable)
    assert int(state.count15) == 0 and int(state.count16) == 0
    assert not bool(result.complete)


def test_frame_result_telemetry_field_parity():
    """FrameResult carries every FrameScanResult field (frame.h:14-28)."""
    from cardio_dmz_tpu.scan.frame import FrameResult
    fields = set(FrameResult._fields)
    for want in ("focus_score", "scores", "hseg", "vseg", "expiry_groups",
                 "name_groups", "usable", "upside_down", "flipped",
                 "brightness_score", "iso_speed", "shutter_speed",
                 "torch_is_on"):
        assert want in fields, want
