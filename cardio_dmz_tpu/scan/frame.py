"""Per-frame orchestration on the rectified 428x270 card image.

scan_card_image equivalent (scan/frame.cpp:24-81) as ONE pure jittable
function: vseg -> upside-down check -> usability gate -> hseg on the
27-row strip -> digit scores -> usability. Because jit traces a single
graph, the reference's early-outs become masks; every stage always runs
(they are cheap, fused tensor ops) and the gates select what is believed.

The whole function vmaps over a stream batch and jits into one XLA program
with no host round-trips — the BASELINE.json north-star shape.
"""

import typing

import jax.numpy as jnp
from jax import lax

from ..config import DEFAULT_CONFIG

from ..constants import (
    CARD_HEIGHT,
    FLIP_VSEG_Y_OFFSET_CUTOFF,
    MAX_NUMBER_SCORE_DELTA,
    MIN_VSEG_SCORE,
    NUMBER_HEIGHT,
    SMALL_CHARACTER_HEIGHT,
)
from .categorize import number_scores
from .expiry_device import ExpiryWindows, best_expiry_seg_device, no_windows
from .hseg import HSeg, best_n_hseg
from .vseg import VSeg, best_n_vseg


class FrameTelemetry(typing.NamedTuple):
    """Host/camera-supplied per-frame metadata (frame.h:15-27 tail fields).

    In the reference these are filled in by the host app from the camera
    driver before scan_card_image; in a fused camera->digits graph the
    focus/brightness scores are computed in-graph from the preview frame
    (api.focus_score / api.brightness_score) and the rest ride along."""
    focus_score: jnp.ndarray       # f32
    brightness_score: jnp.ndarray  # f32
    iso_speed: jnp.ndarray         # int32 (uint16_t in frame.h:25)
    shutter_speed: jnp.ndarray     # f32
    torch_is_on: jnp.ndarray       # bool
    flipped: jnp.ndarray           # bool (frame was pre-flipped, frame.h:23)


def telemetry_zeros() -> FrameTelemetry:
    return FrameTelemetry(
        focus_score=jnp.zeros((), jnp.float32),
        brightness_score=jnp.zeros((), jnp.float32),
        iso_speed=jnp.zeros((), jnp.int32),
        shutter_speed=jnp.zeros((), jnp.float32),
        torch_is_on=jnp.zeros((), bool),
        flipped=jnp.zeros((), bool),
    )


class FrameResult(typing.NamedTuple):
    """FrameScanResult equivalent — full field parity with frame.h:14-28."""
    vseg: VSeg
    hseg: HSeg
    scores: jnp.ndarray       # (16, 10) float32
    usable: jnp.ndarray       # bool
    upside_down: jnp.ndarray  # bool
    focus_score: jnp.ndarray       # f32 (frame.h:15)
    brightness_score: jnp.ndarray  # f32 (frame.h:24)
    iso_speed: jnp.ndarray         # int32 (frame.h:25)
    shutter_speed: jnp.ndarray     # f32 (frame.h:26)
    torch_is_on: jnp.ndarray       # bool (frame.h:27)
    flipped: jnp.ndarray           # bool (frame.h:23)
    expiry_groups: ExpiryWindows   # (frame.h:19)
    name_groups: ExpiryWindows     # (frame.h:20) — empty in serving: the
    # reference's name-supergroup path is disabled (expiry_seg.cpp:544-548).
    # The path itself IS implemented, flag-gated and off by default, on the
    # host oracle (expiry_seg_host.best_expiry_seg(collect_name_groups=True),
    # session.host.HostScanner(collect_name_groups=True)), A/B-validated
    # against the compiled reference's own gather/regrid/optimize internals.


def scan_card_image(params, y, collect_card_number=None, scan_expiry=False,
                    expiry_gate=True, telemetry=None,
                    config=DEFAULT_CONFIG) -> FrameResult:
    """y: (270, 428) uint8 rectified card luma. params: load_all_params().

    Matches frame.cpp:24-81 gating:
    * upside_down iff vseg.y_offset < (270-27)/2 (frame.cpp:38-41)
    * usable iff vseg.score > 15 (frame.cpp:43)
    * and n_offsets - sum(scores) < 3 (frame.cpp:63-64)
    * expiry seg when usable and the PAN row leaves >= 2 small char heights
      below (frame.cpp:71-80)

    scan_expiry is STATIC (whether the expiry subgraph is compiled at all —
    the SCAN_EXPIRY #ifdef analogue); expiry_gate is traced (the runtime
    "still needed" flag the session passes in, scan.cpp:44).

    config: ScanConfig feature gates (static; each config compiles its own
    graph — the jit analogue of the reference's #ifdef flags).
    """
    if collect_card_number is None:
        collect_card_number = config.collect_card_number
    if telemetry is None:
        telemetry = telemetry_zeros()
    vseg = best_n_vseg(params["vseg_mlp"], y)

    upside_down = vseg.y_offset < FLIP_VSEG_Y_OFFSET_CUTOFF
    vseg_usable = vseg.score > MIN_VSEG_SCORE

    # PAN strip: 27 rows at the vseg offset (frame.cpp:50), fetched as a
    # one-hot row contraction (a batched dynamic_slice under the stream
    # vmap lowers to per-lane slice sequences; u8 values are exact).
    # latency_shape picks the plain dynamic_slice (batch-1 serving).
    y_off = jnp.clip(vseg.y_offset, 0, CARD_HEIGHT - NUMBER_HEIGHT)
    if config.latency_shape:
        strip = lax.dynamic_slice(y, (y_off, jnp.zeros((), y_off.dtype)),
                                  (NUMBER_HEIGHT, y.shape[-1]))
    else:
        rsel = ((y_off + jnp.arange(NUMBER_HEIGHT))[:, None]
                == jnp.arange(CARD_HEIGHT)[None, :]).astype(jnp.float32)
        strip = jnp.einsum("xr,rc->xc", rsel,
                           y.astype(jnp.float32)).astype(y.dtype)

    hseg = best_n_hseg(strip, vseg.pattern_type, vseg.number_length)
    from ..utils.platform import has_pallas_tpu
    use_pallas = config.use_pallas and has_pallas_tpu()
    scores = number_scores(params, strip, hseg.offsets, hseg.n_offsets,
                           use_pallas=use_pallas,
                           latency_shape=config.latency_shape)

    number_score = hseg.n_offsets.astype(jnp.float32) - jnp.sum(scores)
    number_usable = number_score < MAX_NUMBER_SCORE_DELTA

    if collect_card_number:
        usable = vseg_usable & number_usable & ~upside_down
    else:
        usable = vseg_usable & ~upside_down

    if scan_expiry:
        # frame.cpp:71-80: expiry seg runs for right-side-up frames that
        # passed the VSEG gate and leave room below the PAN row. The
        # number-score usability check (frame.cpp:65) does NOT gate it —
        # the reference falls through to the SCAN_EXPIRY block even when
        # number_score marks the frame unusable (scan.cpp:58 discards such
        # frames later, but FrameScanResult.expiry_groups is populated).
        room = vseg.y_offset < CARD_HEIGHT - 2 * SMALL_CHARACTER_HEIGHT
        enabled = vseg_usable & ~upside_down & room & expiry_gate
        expiry_groups = best_expiry_seg_device(
            params["slash_mlp"], y, vseg.y_offset, enabled)
    else:
        expiry_groups = no_windows()

    return FrameResult(
        vseg=vseg,
        hseg=hseg,
        scores=scores,
        usable=usable,
        upside_down=upside_down,
        focus_score=telemetry.focus_score,
        brightness_score=telemetry.brightness_score,
        iso_speed=telemetry.iso_speed,
        shutter_speed=telemetry.shutter_speed,
        torch_is_on=telemetry.torch_is_on,
        flipped=telemetry.flipped,
        expiry_groups=expiry_groups,
        name_groups=no_windows(),
    )
