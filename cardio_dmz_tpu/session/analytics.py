"""Per-session frame analytics ring buffer (scan/scan_analytics.cpp).

The reference keeps a 20-frame ring of per-frame scan records intended for
telemetry upload (scan_analytics.h:22-32; the capture hook itself is an
empty skeleton, scan_analytics.cpp:16-19). Here the ring is a fixed-shape
pytree so it lives on-device inside the jitted session; numeric fields only
(a device graph has no strings — consumers format host-side).
"""

import typing

import jax.numpy as jnp

RING_SIZE = 20  # kScanSessionAnalyticsMaxScannedFrames


class ScanAnalytics(typing.NamedTuple):
    n_recorded: jnp.ndarray      # int32 total frames recorded
    write_idx: jnp.ndarray       # int32 ring cursor
    vseg_score: jnp.ndarray      # (20,) f32
    vseg_y: jnp.ndarray          # (20,) int32
    pattern_type: jnp.ndarray    # (20,) int32
    hseg_score: jnp.ndarray      # (20,) f32
    usable: jnp.ndarray          # (20,) bool
    # camera telemetry carried on FrameScanResult (frame.h:15-27)
    focus_score: jnp.ndarray       # (20,) f32
    brightness_score: jnp.ndarray  # (20,) f32
    iso_speed: jnp.ndarray         # (20,) int32
    shutter_speed: jnp.ndarray     # (20,) f32
    torch_is_on: jnp.ndarray       # (20,) bool
    upside_down: jnp.ndarray       # (20,) bool
    flipped: jnp.ndarray           # (20,) bool


def analytics_init() -> ScanAnalytics:
    z = jnp.zeros((RING_SIZE,), jnp.float32)
    zi = jnp.zeros((RING_SIZE,), jnp.int32)
    zb = jnp.zeros((RING_SIZE,), bool)
    return ScanAnalytics(
        n_recorded=jnp.zeros((), jnp.int32),
        write_idx=jnp.zeros((), jnp.int32),
        vseg_score=z,
        vseg_y=zi,
        pattern_type=zi,
        hseg_score=z,
        usable=zb,
        focus_score=z,
        brightness_score=z,
        iso_speed=zi,
        shutter_speed=z,
        torch_is_on=zb,
        upside_down=zb,
        flipped=zb,
    )


def analytics_record_frame(a: ScanAnalytics, frame, record) -> ScanAnalytics:
    """scan_analytics_record_frame (scan_analytics.cpp:34-54) — masked write
    so it stays branch-free inside the scan step."""
    i = a.write_idx

    def put(arr, val):
        return jnp.where(record, arr.at[i].set(val), arr)

    return ScanAnalytics(
        n_recorded=a.n_recorded + record.astype(jnp.int32),
        write_idx=jnp.where(record, (i + 1) % RING_SIZE, i),
        vseg_score=put(a.vseg_score, frame.vseg.score),
        vseg_y=put(a.vseg_y, frame.vseg.y_offset),
        pattern_type=put(a.pattern_type, frame.vseg.pattern_type),
        hseg_score=put(a.hseg_score, frame.hseg.score),
        usable=put(a.usable, frame.usable),
        focus_score=put(a.focus_score, frame.focus_score),
        brightness_score=put(a.brightness_score, frame.brightness_score),
        iso_speed=put(a.iso_speed, frame.iso_speed),
        shutter_speed=put(a.shutter_speed, frame.shutter_speed),
        torch_is_on=put(a.torch_is_on, frame.torch_is_on),
        upside_down=put(a.upside_down, frame.upside_down),
        flipped=put(a.flipped, frame.flipped),
    )
