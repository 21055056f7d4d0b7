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
    CARD_WIDTH,
    FLIP_VSEG_Y_OFFSET_CUTOFF,
    MAX_NUMBER_SCORE_DELTA,
    MIN_VSEG_SCORE,
    NUMBER_HEIGHT,
)
from .categorize import number_scores
from .hseg import HSeg, best_n_hseg
from .vseg import VSeg, best_n_vseg


class FrameResult(typing.NamedTuple):
    """FrameScanResult equivalent (scan/frame.h:14-28)."""
    vseg: VSeg
    hseg: HSeg
    scores: jnp.ndarray       # (16, 10) float32
    usable: jnp.ndarray       # bool
    upside_down: jnp.ndarray  # bool


def scan_card_image(params, y, collect_card_number=None,
                    config=DEFAULT_CONFIG) -> FrameResult:
    """y: (270, 428) uint8 rectified card luma. params: load_all_params().

    Matches frame.cpp:24-81 gating:
    * upside_down iff vseg.y_offset < (270-27)/2 (frame.cpp:38-41)
    * usable iff vseg.score > 15 (frame.cpp:43)
    * and n_offsets - sum(scores) < 3 (frame.cpp:63-64)

    config: ScanConfig feature gates (static; each config compiles its own
    graph — the jit analogue of the reference's #ifdef flags).
    """
    if collect_card_number is None:
        collect_card_number = config.collect_card_number
    vseg = best_n_vseg(params["vseg_mlp"], y)

    upside_down = vseg.y_offset < FLIP_VSEG_Y_OFFSET_CUTOFF
    vseg_usable = vseg.score > MIN_VSEG_SCORE

    # PAN strip: 27 rows at the vseg offset (frame.cpp:50)
    y_off = jnp.clip(vseg.y_offset, 0, CARD_HEIGHT - NUMBER_HEIGHT)
    strip = lax.dynamic_slice(y, (y_off, 0), (NUMBER_HEIGHT, CARD_WIDTH))

    hseg = best_n_hseg(strip, vseg.pattern_type, vseg.number_length)
    from ..utils.platform import has_pallas_tpu
    use_pallas = config.use_pallas and has_pallas_tpu()
    scores = number_scores(params, strip, hseg.offsets, hseg.n_offsets,
                           use_pallas=use_pallas)

    number_score = hseg.n_offsets.astype(jnp.float32) - jnp.sum(scores)
    number_usable = number_score < MAX_NUMBER_SCORE_DELTA

    if collect_card_number:
        usable = vseg_usable & number_usable & ~upside_down
    else:
        usable = vseg_usable & ~upside_down

    return FrameResult(
        vseg=vseg,
        hseg=hseg,
        scores=scores,
        usable=usable,
        upside_down=upside_down,
    )
