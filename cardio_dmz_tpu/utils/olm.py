"""Pure utilities: Luhn, card-type-from-prefix, guide frame, rects/points.

TPU-native counterpart of the reference's "no OpenCV, no Eigen" zone
(reference: dmz_olm.h / dmz_olm.cpp). Two flavours are provided where it
matters:

* plain-Python versions mirroring the C++ exactly (host-side use, oracle for
  tests) -- dmz_olm.cpp:40-130
* jax versions usable *inside* a jitted scanner step, so the Luhn/prefix
  acceptance gate (scan/scan.cpp:149-160) runs on-device with no host
  round-trip.
"""

from dataclasses import dataclass
from enum import IntEnum

import jax.numpy as jnp
import numpy as np

from ..constants import (
    ORIENTATION_LANDSCAPE_LEFT,
    ORIENTATION_LANDSCAPE_RIGHT,
    ORIENTATION_PORTRAIT,
    ORIENTATION_PORTRAIT_UPSIDE_DOWN,
    PORTRAIT_HORIZONTAL_PERCENT_INSET,
    PORTRAIT_VERTICAL_PERCENT_INSET,
    LANDSCAPE_HORIZONTAL_PERCENT_INSET,
    LANDSCAPE_VERTICAL_PERCENT_INSET,
)


class CardType(IntEnum):
    # values match dmz_olm.h's CardType enum semantics
    UNRECOGNIZED = 0
    AMBIGUOUS = 1
    AMEX = 2
    JCB = 3
    VISA = 4
    MASTERCARD = 5
    DISCOVER = 6
    MAESTRO = 7


@dataclass(frozen=True)
class CardInfo:
    card_type: CardType
    number_length: int
    prefix_length: int
    min_prefix: int
    max_prefix: int


# BIN table (dmz_olm.cpp:59-81)
CARD_TABLE = (
    CardInfo(CardType.MASTERCARD, 16, 4, 2221, 2720),
    CardInfo(CardType.DISCOVER,   14, 3, 300, 305),
    CardInfo(CardType.DISCOVER,   14, 3, 309, 309),
    CardInfo(CardType.AMEX,       15, 2, 34, 34),
    CardInfo(CardType.JCB,        16, 4, 3528, 3589),
    CardInfo(CardType.DISCOVER,   14, 2, 36, 36),
    CardInfo(CardType.DISCOVER,   14, 2, 38, 39),
    CardInfo(CardType.AMEX,       15, 2, 37, 37),
    CardInfo(CardType.VISA,       16, 1, 4, 4),
    CardInfo(CardType.MAESTRO,    16, 2, 50, 50),
    CardInfo(CardType.MASTERCARD, 16, 2, 51, 55),
    CardInfo(CardType.MAESTRO,    16, 2, 56, 59),
    CardInfo(CardType.DISCOVER,   16, 4, 6011, 6011),
    CardInfo(CardType.MAESTRO,    16, 2, 61, 61),
    CardInfo(CardType.DISCOVER,   16, 2, 62, 62),
    CardInfo(CardType.MAESTRO,    16, 2, 63, 63),
    CardInfo(CardType.DISCOVER,   16, 3, 644, 649),
    CardInfo(CardType.DISCOVER,   16, 2, 65, 65),
    CardInfo(CardType.MAESTRO,    16, 2, 66, 69),
    CardInfo(CardType.DISCOVER,   16, 2, 88, 88),
)


def passes_luhn_checksum(digits) -> bool:
    """Exact mirror of dmz_passes_luhn_checksum (dmz_olm.cpp:40-49)."""
    even = 0
    total = 0
    for d in reversed(list(digits)):
        addend = int(d) * (1 << (even & 1))
        even += 1
        total += addend % 10 + addend // 10
    return total % 10 == 0


def card_info_for_prefix_and_length(digits, allow_incomplete=False) -> CardInfo:
    """Exact mirror of dmz_card_info_for_prefix_and_length (dmz_olm.cpp:51-130)."""
    digits = list(int(d) for d in digits)
    n = len(digits)
    unrecognized = CardInfo(CardType.UNRECOGNIZED, -1, 1, 9, 9)
    ambiguous = CardInfo(CardType.AMBIGUOUS, -1, 1, 9, 9)
    if n == 0:
        return unrecognized
    found = unrecognized
    n_compatible = 0
    for info in CARD_TABLE:
        if allow_incomplete:
            if n > info.number_length:
                continue
        elif n != info.number_length:
            continue
        relevant = info.prefix_length
        factor = 1
        while relevant > n:
            factor *= 10
            relevant -= 1
        prefix = 0
        for j in range(relevant):
            prefix = prefix * 10 + digits[j]
        if info.min_prefix // factor <= prefix <= info.max_prefix // factor:
            n_compatible += 1
            found = info
    if n_compatible == 1:
        return found
    if n_compatible > 1:
        return ambiguous
    return unrecognized


# ---------------------------------------------------------------------------
# In-graph (jax) versions for the on-device scanner acceptance gate.
# ---------------------------------------------------------------------------

# table tensors, complete-number entries only matter for lengths 14/15/16
_TBL_LEN = np.array([i.number_length for i in CARD_TABLE], np.int32)
_TBL_PREFIX_LEN = np.array([i.prefix_length for i in CARD_TABLE], np.int32)
_TBL_MIN = np.array([i.min_prefix for i in CARD_TABLE], np.int32)
_TBL_MAX = np.array([i.max_prefix for i in CARD_TABLE], np.int32)
_TBL_TYPE = np.array([int(i.card_type) for i in CARD_TABLE], np.int32)


def luhn_checksum_jax(digits, n_digits):
    """Luhn validity of ``digits[:n_digits]``, fully vectorized / jittable.

    digits: (16,) int array, leading digits valid; n_digits: scalar (15/16).
    Matches dmz_olm.cpp:40-49: doubling starts from the *last* digit
    (even index 0 == last digit => x1, second-to-last => x2, ...).
    """
    digits = jnp.asarray(digits, jnp.int32)
    idx = jnp.arange(16, dtype=jnp.int32)
    # position from the end within the active prefix
    from_end = n_digits - 1 - idx
    active = (idx < n_digits) & (from_end >= 0)
    mult = jnp.where(from_end % 2 == 1, 2, 1)
    addend = digits * mult
    contrib = addend % 10 + addend // 10
    total = jnp.sum(jnp.where(active, contrib, 0))
    return total % 10 == 0


def card_type_valid_jax(digits, n_digits):
    """On-device equivalent of the scan.cpp:150-153 prefix sanity gate.

    True iff exactly one BIN-table entry matches (type is neither ambiguous
    nor unrecognized).  digits: (16,) int; n_digits: 15 or 16 scalar.
    """
    digits = jnp.asarray(digits, jnp.int32)
    # prefixes of lengths 1..4
    p1 = digits[0]
    p2 = p1 * 10 + digits[1]
    p3 = p2 * 10 + digits[2]
    p4 = p3 * 10 + digits[3]
    prefixes = jnp.stack([p1, p2, p3, p4])  # index by prefix_length-1

    tbl_len = jnp.asarray(_TBL_LEN)
    tbl_plen = jnp.asarray(_TBL_PREFIX_LEN)
    tbl_min = jnp.asarray(_TBL_MIN)
    tbl_max = jnp.asarray(_TBL_MAX)

    prefix_vals = prefixes[tbl_plen - 1]
    match = (tbl_len == n_digits) & (prefix_vals >= tbl_min) & (prefix_vals <= tbl_max)
    return jnp.sum(match.astype(jnp.int32)) == 1


# ---------------------------------------------------------------------------
# rects / points / guide frame
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class Point:
    x: float
    y: float


@dataclass(frozen=True)
class Rect:
    x: float
    y: float
    w: float
    h: float


def rect_points(rect: Rect):
    """dmz_rect_get_points (dmz_olm.cpp:31-36): tl, tr, bl, br."""
    return (
        Point(rect.x, rect.y),
        Point(rect.x + rect.w, rect.y),
        Point(rect.x, rect.y + rect.h),
        Point(rect.x + rect.w, rect.y + rect.h),
    )


def scale_point(p: Point, src: Rect, dst: Rect) -> Point:
    """dmz_scale_point (dmz_olm.cpp:20-23)."""
    return Point(
        dst.x + (p.x - src.x) * dst.w / src.w,
        dst.y + (p.y - src.y) * dst.h / src.h,
    )


def guide_frame(orientation, preview_width, preview_height) -> Rect:
    """dmz_guide_frame (dmz_olm.cpp:134-164)."""
    if orientation in (ORIENTATION_PORTRAIT, ORIENTATION_PORTRAIT_UPSIDE_DOWN):
        inset_w = PORTRAIT_HORIZONTAL_PERCENT_INSET * preview_width
        inset_h = PORTRAIT_VERTICAL_PERCENT_INSET * preview_height
    elif orientation in (ORIENTATION_LANDSCAPE_LEFT, ORIENTATION_LANDSCAPE_RIGHT):
        inset_w = LANDSCAPE_VERTICAL_PERCENT_INSET * preview_width
        inset_h = LANDSCAPE_HORIZONTAL_PERCENT_INSET * preview_height
    else:
        inset_w = 0.0
        inset_h = 0.0
    return Rect(inset_w, inset_h,
                preview_width - 2.0 * inset_w, preview_height - 2.0 * inset_h)


def opposite_orientation(orientation):
    """dmz_opposite_orientation (dmz_olm.cpp:166-179)."""
    return {
        ORIENTATION_PORTRAIT: ORIENTATION_PORTRAIT_UPSIDE_DOWN,
        ORIENTATION_PORTRAIT_UPSIDE_DOWN: ORIENTATION_PORTRAIT,
        ORIENTATION_LANDSCAPE_RIGHT: ORIENTATION_LANDSCAPE_LEFT,
        ORIENTATION_LANDSCAPE_LEFT: ORIENTATION_LANDSCAPE_RIGHT,
    }.get(orientation, ORIENTATION_PORTRAIT)
