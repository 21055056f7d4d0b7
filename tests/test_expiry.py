"""Expiry subsystem tests: host segmentation + categorization + full
session with expiry."""

import functools

import numpy as np
import pytest

import synthetic
from cardio_dmz_tpu.models.weights import load_all_params
from cardio_dmz_tpu.scan import expiry_seg_host as seg
from cardio_dmz_tpu.scan import expiry_categorize_host as cat
from cardio_dmz_tpu.scan.expiry_types import GroupedRects, CharacterRect


@functools.lru_cache(maxsize=None)
def _params():
    return load_all_params()


def _frame(seed=0, expiry="08/28"):
    return synthetic.render_frame_with_expiry(
        "4111111111111111", expiry, y0=150, offset=35, expiry_y=212, expiry_x=120,
        noise=1, seed=seed)


def test_stripe_selection_finds_expiry_row():
    y = _frame()
    sobel = seg.scharr_dx_abs_below(y, 150)
    stripes = seg.select_stripes(sobel, 150)
    assert len(stripes) >= 1
    # the strongest stripe must bracket the expiry text (rows ~214-229)
    bases = [b for b, _ in stripes]
    assert any(210 <= b <= 218 for b in bases)
    # stripes are non-overlapping
    bases.sort()
    assert all(b2 - b1 >= 15 for b1, b2 in zip(bases, bases[1:]))


def test_sobel_zero_above_numbers():
    y = _frame()
    sobel = seg.scharr_dx_abs_below(y, 150)
    assert (sobel[:177] == 0).all()
    assert sobel[215:225].sum() > 0


def test_segmentation_finds_mmyy_group():
    y = _frame()
    groups, name_groups = seg.best_expiry_seg(y, 150, _params()["slash_mlp"])
    assert name_groups == []
    assert len(groups) >= 1
    g = groups[0]
    assert len(g.character_rects) == 5
    lefts = [r.left for r in g.character_rects]
    # rendered at x=120 with 13px advance
    for got, want in zip(lefts, [120, 133, 146, 159, 172]):
        assert abs(got - want) <= 3
    assert abs(g.character_rects[0].top - 214) <= 3


def test_categorization_reads_digits():
    y = _frame()
    groups, _ = seg.best_expiry_seg(y, 150, _params()["slash_mlp"])
    scores = cat.categorize_expiry_digits(y, groups[0],
                                          _params()["expiry_conv"])
    digits = scores[:5].argmax(-1)
    assert list(digits[[0, 1, 3, 4]]) == [0, 8, 2, 8]
    assert (scores[2] == 0).all()  # slash position not scored


def test_expiry_extract_needs_three_sightings():
    params = _params()
    aggregated = []
    month = year = 0
    results = []
    for s in range(6):
        y = _frame(seed=s)
        groups, _ = seg.best_expiry_seg(y, 150, params["slash_mlp"])
        month, year = cat.expiry_extract(
            y, aggregated, groups, params["expiry_conv"], now=(2026, 8),
            best_month=month, best_year=year)
        results.append((month, year))
    assert results[0] == (0, 0)       # first sighting: not trusted yet
    assert results[-1] == (8, 2028)   # converged


def test_date_sanity_rejects_past_and_far_future():
    # stale date (already expired relative to `now`)
    m, y = cat.expiry_from_digits([0, 1, None, 2, 0], 0, 0, 0, now=(2026, 8))
    assert (m, y) == (0, 0)
    # more than 5 years out
    m, y = cat.expiry_from_digits([0, 1, None, 3, 5], 0, 0, 0, now=(2026, 8))
    assert (m, y) == (0, 0)
    # valid
    m, y = cat.expiry_from_digits([0, 8, None, 2, 7], 0, 0, 0, now=(2026, 8))
    assert (m, y) == (8, 2027)
    # month/year swap (reversed print order)
    m, y = cat.expiry_from_digits([2, 7, None, 0, 8], 0, 0, 0, now=(2026, 8))
    assert (m, y) == (8, 2027)
    # prefer-later rule
    m, y = cat.expiry_from_digits([0, 8, None, 2, 7], 0, 12, 2028, now=(2026, 8))
    assert (m, y) == (12, 2028)


def test_group_aggregation_decay_and_forget():
    g = GroupedRects(top=10, left=20, width=60, height=16)
    g.character_rects = [CharacterRect(10, 20 + 12 * i) for i in range(5)]
    g.scores = np.ones((11, 10), np.float32)
    aggregated = []
    cat.aggregate_grouped_rects(aggregated, [g])
    assert len(aggregated) == 1
    assert aggregated[0].recently_seen_count == 3
    # three frames with no new sightings -> forgotten
    for _ in range(3):
        cat.aggregate_grouped_rects(aggregated, [])
    assert aggregated == []


def test_full_host_session_with_expiry():
    from cardio_dmz_tpu.session.host import HostScanner
    scanner = HostScanner(_params(), scan_expiry=True, now=(2026, 8))
    result = None
    for s in range(8):
        frame, result = scanner.add_frame(_frame(seed=s))
    assert scanner.card_number == "4111111111111111"
    assert result.complete
    assert result.expiry_month == 8
    assert result.expiry_year == 2028
