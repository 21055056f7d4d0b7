"""Cross-frame scanner session state machine (scan/scan.cpp equivalents).

The reference's ScannerState (scan/scan.h:33-48) becomes an immutable pytree
threaded through a pure step function — the TPU-native shape: fold frames
with lax.scan over time and vmap the whole session over concurrent streams,
yielding one jitted program for hundreds of cameras per chip with on-device
PAN aggregation and acceptance (no host round-trips).

Semantics mirrored from the C++:
* per-frame EWMA of score matrices, decay 0.8, into separate 15- and
  16-digit accumulators (scan.cpp:69-85)
* completion: >=3-frame lead AND 2x count ratio between the 15/16
  hypotheses (scan.cpp:99-111), per-digit stability max/sum >= 0.7
  (scan.cpp:128-147), BIN-prefix and Luhn validation (scan.cpp:149-160)
* once complete, the result latches (scan.cpp:95-97)
* expiry grace: the reference waits ~1s of wall time after PAN completion
  for the expiry to resolve (scan.cpp:163-193 — its "1000 µs" constant is
  compared against milliseconds, i.e. effectively 1 s). Wall clocks don't
  belong inside a jitted graph; we count frames instead:
  EXPIRY_GRACE_FRAMES = 30 ≈ 1 s at the 30 fps camera rate
  (docs/camera_resolution.md:4-9).
"""

import typing

import jax
import jax.numpy as jnp
from jax import lax

from ..constants import (
    MIN_FRAME_LEAD,
    PAN_DECAY_FACTOR,
    PAN_MIN_STABILITY,
)
from ..utils.olm import card_type_valid_jax, luhn_checksum_jax
from ..scan.frame import FrameResult, FrameTelemetry, scan_card_image
from ..scan.expiry_device import (
    ExpiryState,
    aggregate_windows,
    categorize_windows,
    expiry_state_init,
    extract_expiry,
)
from .analytics import ScanAnalytics, analytics_init, analytics_record_frame

EXPIRY_GRACE_FRAMES = 30  # ~1 s at 30 fps (scan.cpp:14,175 quirk)


class ScannerState(typing.NamedTuple):
    count15: jnp.ndarray           # int32
    count16: jnp.ndarray           # int32
    aggregated15: jnp.ndarray      # (16, 10) f32 (row 15 unused)
    aggregated16: jnp.ndarray      # (16, 10) f32
    # most recent usable segmentation (scan.cpp:71-72)
    last_offsets: jnp.ndarray      # (16,) int32
    last_n_offsets: jnp.ndarray    # int32
    last_number_width: jnp.ndarray  # f32
    last_pattern_offset: jnp.ndarray  # int32
    last_vseg_y: jnp.ndarray       # int32
    last_vseg_pattern: jnp.ndarray  # int32
    # completion latch (scan.cpp:95-97,158-159)
    number_complete: jnp.ndarray   # bool
    completed_digits: jnp.ndarray  # (16,) int32
    completed_n: jnp.ndarray       # int32
    frames_since_complete: jnp.ndarray  # int32
    # expiry (device expiry subsystem, scan/expiry_device.py)
    scan_expiry: jnp.ndarray       # bool
    expiry_month: jnp.ndarray      # int32
    expiry_year: jnp.ndarray       # int32
    expiry: ExpiryState
    now_year: jnp.ndarray          # int32 (current date for expiry sanity)
    now_month: jnp.ndarray         # int32
    analytics: ScanAnalytics


class ScannerResult(typing.NamedTuple):
    """ScannerResult equivalent (scan/scan.h:19-31)."""
    complete: jnp.ndarray     # bool
    n_numbers: jnp.ndarray    # int32
    predictions: jnp.ndarray  # (16,) int32 digit values
    expiry_month: jnp.ndarray  # int32
    expiry_year: jnp.ndarray  # int32


def scanner_reset(now=None) -> ScannerState:
    """scanner_reset (scan.cpp:23-35). `now` = (year, month) for the expiry
    date-sanity window (the reference reads the wall clock,
    expiry_categorize.cpp:352-354; a pure graph takes it as state)."""
    if now is None:
        import time as _time
        now = _time.localtime()[:2]
    z32 = jnp.zeros((), jnp.int32)
    return ScannerState(
        count15=z32, count16=z32,
        aggregated15=jnp.zeros((16, 10), jnp.float32),
        aggregated16=jnp.zeros((16, 10), jnp.float32),
        last_offsets=jnp.zeros((16,), jnp.int32),
        last_n_offsets=z32,
        last_number_width=jnp.zeros((), jnp.float32),
        last_pattern_offset=z32,
        last_vseg_y=z32,
        last_vseg_pattern=z32,
        number_complete=jnp.zeros((), bool),
        completed_digits=jnp.zeros((16,), jnp.int32),
        completed_n=z32,
        frames_since_complete=z32,
        scan_expiry=jnp.zeros((), bool),
        expiry_month=z32,
        expiry_year=z32,
        expiry=expiry_state_init(),
        now_year=jnp.asarray(int(now[0]), jnp.int32),
        now_month=jnp.asarray(int(now[1]), jnp.int32),
        analytics=analytics_init(),
    )


scanner_initialize = scanner_reset  # scan.cpp:19-21


def _accumulate(state: ScannerState, frame: FrameResult) -> ScannerState:
    """EWMA update for a usable frame (scan.cpp:69-85)."""
    is15 = frame.hseg.n_offsets == 15
    is16 = frame.hseg.n_offsets == 16

    def decayed(agg, active):
        upd = agg * PAN_DECAY_FACTOR + frame.scores * (1 - PAN_DECAY_FACTOR)
        return jnp.where(active, upd, agg)

    return state._replace(
        aggregated15=decayed(state.aggregated15, is15),
        aggregated16=decayed(state.aggregated16, is16),
        count15=state.count15 + is15.astype(jnp.int32),
        count16=state.count16 + is16.astype(jnp.int32),
        last_offsets=frame.hseg.offsets,
        last_n_offsets=frame.hseg.n_offsets,
        last_number_width=frame.hseg.number_width,
        last_pattern_offset=frame.hseg.pattern_offset,
        last_vseg_y=frame.vseg.y_offset,
        last_vseg_pattern=frame.vseg.pattern_type,
    )


def scanner_add_frame(params, state: ScannerState, y,
                      scan_expiry=False, telemetry=None,
                      frame_gate=None, allow_past_dates=False,
                      config=None) -> tuple:
    """scanner_add_frame_with_expiry (scan.cpp:41-86): run the frame
    pipeline and fold the result into the session state.

    y: (270, 428) uint8. telemetry: optional FrameTelemetry (camera
    metadata, frame.h:15-27). frame_gate: optional traced bool — the fused
    camera path's "card was found" flag; a False gate makes the frame
    unusable exactly as the reference host app would simply not call
    scanner_add_frame. Returns (new_state, FrameResult).
    """
    still_need_number = ~state.number_complete
    # scan.cpp:44: expiry seg runs only while the date is still unresolved
    still_need_expiry = (state.expiry_month == 0) | (state.expiry_year == 0)
    expiry_gate = still_need_expiry
    if frame_gate is not None:
        expiry_gate = expiry_gate & frame_gate
    if config is not None:
        frame = scan_card_image(params, y, scan_expiry=scan_expiry,
                                expiry_gate=expiry_gate,
                                telemetry=telemetry, config=config)
    else:
        frame = scan_card_image(params, y, scan_expiry=scan_expiry,
                                expiry_gate=expiry_gate,
                                telemetry=telemetry)
    if frame_gate is not None:
        frame = frame._replace(usable=frame.usable & frame_gate)

    record = ~frame.upside_down
    if frame_gate is not None:
        # the reference host app never calls scanner_add_frame for frames
        # where detection failed — don't record them in analytics either
        record = record & frame_gate
    state = state._replace(
        analytics=analytics_record_frame(state.analytics, frame, record))

    fold = frame.usable & ~frame.upside_down & still_need_number
    folded = _accumulate(state, frame)
    state = lax.cond(fold, lambda: folded, lambda: state)

    if scan_expiry:
        # scan.cpp:62-66: categorize + aggregate the frame's expiry groups
        windows = frame.expiry_groups
        scores = categorize_windows(params["expiry_conv"], y, windows)
        # the reference's expiry_extract is a no-op when segmentation found
        # nothing (expiry_categorize.cpp:454-456): gate the aggregation.
        # windows.valid already embeds the vseg/room/still-needed gates.
        # The session additionally drops the frame on !usable (scan.cpp:57)
        # — and `usable` there is computed with collect_card_number =
        # still_need_number (frame.cpp:49-69): while the number is still
        # being collected it includes the number-score check; once the
        # number is complete it relaxes to the vseg-only gate that
        # windows.valid already carries.
        session_ok = frame.usable | state.number_complete
        any_new = jnp.any(windows.valid) & session_ok
        merged = aggregate_windows(state.expiry, windows, scores)
        expiry_state = jax.tree.map(
            lambda a, b: jnp.where(any_new, a, b), merged, state.expiry)
        month, year = extract_expiry(
            expiry_state, state.expiry_month, state.expiry_year,
            state.now_year, state.now_month,
            allow_past_dates=allow_past_dates)
        month = jnp.where(any_new, month, state.expiry_month)
        year = jnp.where(any_new, year, state.expiry_year)
        state = state._replace(expiry=expiry_state,
                               expiry_month=month.astype(jnp.int32),
                               expiry_year=year.astype(jnp.int32))

    state = state._replace(
        scan_expiry=state.scan_expiry | jnp.asarray(scan_expiry),
        frames_since_complete=jnp.where(
            state.number_complete, state.frames_since_complete + 1, 0),
    )
    return state, frame


def _try_complete(state: ScannerState):
    """The acceptance decision (scan.cpp:99-160). Returns
    (accept: bool, digits: (16,) int32, n: int32, stable: bool)."""
    c15, c16 = state.count15, state.count16
    max_c = jnp.maximum(c15, c16)
    min_c = jnp.minimum(c15, c16)
    lead_ok = (max_c - min_c >= MIN_FRAME_LEAD) & (min_c * 2 <= max_c)

    use15 = c15 > c16
    aggregated = jnp.where(use15, state.aggregated15, state.aggregated16)
    n = jnp.where(use15, 15, 16).astype(jnp.int32)

    digits = jnp.argmax(aggregated, axis=-1).astype(jnp.int32)  # (16,)
    row_max = jnp.max(aggregated, axis=-1)
    row_sum = jnp.sum(aggregated, axis=-1)
    stability = row_max / jnp.where(row_sum > 0, row_sum, 1.0)
    active = jnp.arange(16) < n
    stable = jnp.all(jnp.where(active, stability >= PAN_MIN_STABILITY, True))

    luhn_ok = luhn_checksum_jax(digits, n)
    type_ok = card_type_valid_jax(digits, n)

    accept = lead_ok & stable & luhn_ok & type_ok
    return accept, digits, n


def scanner_result(state: ScannerState, scan_forever=False) -> tuple:
    """scanner_result (scan.cpp:88-194). Returns (new_state, ScannerResult).

    Pure-functional twist: completion latches into the state, so callers
    thread the returned state. scan_forever (static) mirrors SCAN_FOREVER
    (scan.cpp:13,91-93): never complete — steady-state profiling mode.
    """
    if scan_forever:
        return state, ScannerResult(
            complete=jnp.zeros((), bool),
            n_numbers=jnp.zeros((), jnp.int32),
            predictions=jnp.zeros((16,), jnp.int32),
            expiry_month=jnp.zeros((), jnp.int32),
            expiry_year=jnp.zeros((), jnp.int32))
    accept, digits, n = _try_complete(state)
    newly = accept & ~state.number_complete
    state = state._replace(
        number_complete=state.number_complete | accept,
        completed_digits=jnp.where(newly, digits, state.completed_digits),
        completed_n=jnp.where(newly, n, state.completed_n),
    )

    have_number = state.number_complete
    expiry_found = (state.expiry_month > 0) & (state.expiry_year > 0)
    grace_over = state.frames_since_complete > EXPIRY_GRACE_FRAMES
    expiry_done = jnp.where(state.scan_expiry,
                            expiry_found | grace_over,
                            True)
    complete = have_number & expiry_done

    result = ScannerResult(
        complete=complete,
        n_numbers=state.completed_n,
        predictions=state.completed_digits,
        expiry_month=jnp.where(complete & state.scan_expiry,
                               state.expiry_month, 0),
        expiry_year=jnp.where(complete & state.scan_expiry,
                              state.expiry_year, 0),
    )
    return state, result


def scanner_step(params, state: ScannerState, y, scan_expiry=False,
                 config=None, telemetry=None, frame_gate=None):
    """One full frame step: add_frame + result. The unit that vmaps over
    streams and folds over time. config (static ScanConfig) overrides the
    scan_expiry flag and supplies scan_forever / pallas gates."""
    scan_forever = False
    allow_past_dates = False
    if config is not None:
        scan_expiry = config.scan_expiry
        scan_forever = config.scan_forever
        allow_past_dates = config.expiry_allow_past_dates
    state, frame = scanner_add_frame(params, state, y, scan_expiry,
                                     telemetry=telemetry,
                                     frame_gate=frame_gate,
                                     allow_past_dates=allow_past_dates,
                                     config=config)
    state, result = scanner_result(state, scan_forever=scan_forever)
    return state, (frame, result)


def camera_scanner_step(params, state: ScannerState, y, cb, cr,
                        scan_expiry=False, config=None,
                        orientation=None, iso_speed=None, shutter_speed=None,
                        torch_is_on=None):
    """Camera frame -> digits as ONE graph: the per-preview-frame host loop
    of the reference (dmz_detect_edges + dmz_transform_card, dmz.cpp:371-497,
    then scanner_add_frame) fused with the scan pipeline — no host
    round-trips between detection, rectification, and recognition.

    y: (480, 640) u8 luma; cb/cr: (240, 320) u8 half-size chroma.
    iso/shutter/torch: optional traced camera metadata scalars.
    Returns (state, (found, FrameResult, ScannerResult)).

    Frames where the card isn't found contribute nothing: the frame gate
    masks `usable` exactly like the reference host app, which only calls
    scanner_add_frame after a successful edge detection.
    """
    from ..api import brightness_score, focus_score, preprocess_frame
    from ..constants import ORIENTATION_LANDSCAPE_RIGHT

    if orientation is None:
        orientation = ORIENTATION_LANDSCAPE_RIGHT
    warp_dtype = None
    method = "exact" if config is None else config.warp_method
    if config is not None and config.warp_bf16 and method == "dense":
        warp_dtype = jnp.bfloat16
    found, card = preprocess_frame(y, cb, cr, orientation,
                                   warp_dtype=warp_dtype, method=method)
    telemetry = FrameTelemetry(
        focus_score=focus_score(y),
        brightness_score=brightness_score(y),
        iso_speed=(jnp.zeros((), jnp.int32) if iso_speed is None
                   else jnp.asarray(iso_speed, jnp.int32)),
        shutter_speed=(jnp.zeros((), jnp.float32) if shutter_speed is None
                       else jnp.asarray(shutter_speed, jnp.float32)),
        torch_is_on=(jnp.zeros((), bool) if torch_is_on is None
                     else jnp.asarray(torch_is_on, bool)),
        flipped=jnp.zeros((), bool),
    )
    state, (frame, result) = scanner_step(
        params, state, card, scan_expiry, config, telemetry=telemetry,
        frame_gate=found)
    return state, (found, frame, result)


def scan_frames(params, frames, scan_expiry=False):
    """Fold a (T, 270, 428) frame sequence through one session with
    lax.scan. Returns (final_state, (per-frame FrameResults, results))."""
    def step(state, y):
        return scanner_step(params, state, y, scan_expiry)
    return lax.scan(step, scanner_reset(), frames)
