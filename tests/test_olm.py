"""Tests for the pure utility layer (Luhn, BIN table, guide frame, geometry).

Golden values derived from the reference's documented behavior
(dmz_olm.cpp:40-130, geometry.cpp:14-43).
"""

import math

import numpy as np
import pytest

from cardio_dmz_tpu.utils import (
    CardType,
    passes_luhn_checksum,
    luhn_checksum_jax,
    card_info_for_prefix_and_length,
    card_type_valid_jax,
    guide_frame,
    opposite_orientation,
    ParametricLine,
    parametric_intersect,
    line_by_shifting_origin,
)
from cardio_dmz_tpu.constants import (
    ORIENTATION_PORTRAIT,
    ORIENTATION_LANDSCAPE_LEFT,
    ORIENTATION_LANDSCAPE_RIGHT,
)


def digits(s):
    return [int(c) for c in s]


# well-known test PANs (valid Luhn)
VALID_PANS = [
    "4111111111111111",   # Visa
    "5500005555555559",   # MasterCard
    "343434343434343",    # Amex (15)
    "6011000995500000",   # Discover
    "3528000700000000",   # JCB
    "2221000000000009",   # MC 2-series
]


@pytest.mark.parametrize("pan", VALID_PANS)
def test_luhn_valid(pan):
    assert passes_luhn_checksum(digits(pan))


def test_luhn_invalid():
    assert not passes_luhn_checksum(digits("4111111111111112"))
    assert not passes_luhn_checksum(digits("1234567890123456"))


@pytest.mark.parametrize("pan", VALID_PANS + ["4111111111111112", "9999999999999999"])
def test_luhn_jax_matches_python(pan):
    d = digits(pan)
    padded = d + [0] * (16 - len(d))
    got = bool(luhn_checksum_jax(np.array(padded), len(d)))
    assert got == passes_luhn_checksum(d)


@pytest.mark.parametrize("pan,expected", [
    ("4111111111111111", CardType.VISA),
    ("5500005555555559", CardType.MASTERCARD),
    ("2221000000000009", CardType.MASTERCARD),
    ("343434343434343", CardType.AMEX),
    ("370000002000000", CardType.AMEX),
    ("6011000995500000", CardType.DISCOVER),
    ("3528000700000000", CardType.JCB),
    ("6200000000000005", CardType.DISCOVER),   # China UnionPay -> Discover
    ("5000000000000009", CardType.MAESTRO),
    ("6444444444444444", CardType.DISCOVER),
    ("8800000000000000", CardType.DISCOVER),
    ("1111111111111111", CardType.UNRECOGNIZED),
    ("9999999999999999", CardType.UNRECOGNIZED),
])
def test_card_type(pan, expected):
    info = card_info_for_prefix_and_length(digits(pan))
    assert info.card_type == expected


@pytest.mark.parametrize("pan", [
    "4111111111111111", "5500005555555559", "2221000000000009",
    "340000002222228", "1111111111111111", "9999999999999999",
    "6011000995500000",
])
def test_card_type_jax_gate_matches_python(pan):
    d = digits(pan)
    padded = d + [0] * (16 - len(d))
    info = card_info_for_prefix_and_length(d)
    host_valid = info.card_type not in (CardType.UNRECOGNIZED, CardType.AMBIGUOUS)
    got = bool(card_type_valid_jax(np.array(padded), len(d)))
    assert got == host_valid


def test_card_type_wrong_length():
    # Visa prefix but 15 digits -> unrecognized (length must match exactly)
    info = card_info_for_prefix_and_length(digits("411111111111111"))
    assert info.card_type == CardType.UNRECOGNIZED


def test_guide_frame_landscape():
    g = guide_frame(ORIENTATION_LANDSCAPE_RIGHT, 640, 480)
    # landscape: inset_w uses the *vertical* percent inset and vice versa
    # (dmz_olm.cpp:149-150): inset_w = 105/480*640 = 140, inset_h = 106/640*480
    assert g.x == pytest.approx(140.0, rel=1e-5)
    assert g.y == pytest.approx(106 / 640 * 480, rel=1e-5)
    assert g.w == pytest.approx(640 - 2 * g.x)
    assert g.h == pytest.approx(480 - 2 * g.y)


def test_opposite_orientation():
    assert opposite_orientation(ORIENTATION_LANDSCAPE_LEFT) == ORIENTATION_LANDSCAPE_RIGHT
    assert opposite_orientation(ORIENTATION_PORTRAIT) != ORIENTATION_PORTRAIT


def test_parametric_intersect_perpendicular():
    # horizontal line y=10 (theta=pi/2, rho=10), vertical line x=20 (theta=0, rho=20)
    l1 = ParametricLine(10.0, math.pi / 2)
    l2 = ParametricLine(20.0, 0.0)
    ok, x, y = parametric_intersect(l2, l1)
    assert ok
    assert x == pytest.approx(20.0, abs=1e-4)
    assert y == pytest.approx(10.0, abs=1e-4)


def test_line_shift_origin():
    # vertical line x=5 in ROI at offset (100, 50) -> x=105 in image coords
    line = ParametricLine(5.0, 0.0)
    shifted = line_by_shifting_origin(line, 100, 50)
    assert shifted.theta == line.theta
    assert shifted.rho == pytest.approx(105.0, abs=1e-3)
    # horizontal line y=7 shifted by (0, 30) -> y=37
    line2 = ParametricLine(7.0, math.pi / 2)
    shifted2 = line_by_shifting_origin(line2, 0, 30)
    assert shifted2.rho == pytest.approx(37.0, abs=1e-3)
