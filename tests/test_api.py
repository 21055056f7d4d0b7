"""API-layer tests: focus/brightness scoring, full edge-detect -> corner ->
transform path on a synthetic YCbCr sample (config-1 of the reference's
call stacks, SURVEY.md §3.1-3.2)."""

import numpy as np
import pytest

from cardio_dmz_tpu import api
from cardio_dmz_tpu.constants import (
    CARD_HEIGHT,
    CARD_WIDTH,
    LANDSCAPE_HORIZONTAL_INSET,
    LANDSCAPE_VERTICAL_INSET,
    ORIENTATION_LANDSCAPE_RIGHT,
)

RNG = np.random.RandomState(11)


def synth_ycbcr_card(card_val=190, bg=50, noise=4):
    """640x480 landscape frame with the card exactly on the guide frame."""
    x0, x1 = LANDSCAPE_HORIZONTAL_INSET, 640 - LANDSCAPE_HORIZONTAL_INSET
    y0, y1 = LANDSCAPE_VERTICAL_INSET, 480 - LANDSCAPE_VERTICAL_INSET
    y = np.full((480, 640), bg, np.int32)
    y[y0:y1, x0:x1] = card_val
    y += RNG.randint(-noise, noise + 1, y.shape)
    y = np.clip(y, 0, 255).astype(np.uint8)
    cb = np.full((240, 320), 128, np.uint8)
    cr = np.full((240, 320), 128, np.uint8)
    return y, cb, cr, (x0, y0, x1, y1)


def test_focus_score_sharp_vs_blurred():
    y, _, _, _ = synth_ycbcr_card()
    sharp = api.focus_score(y)
    # crude blur: 4x4 box average
    k = 4
    blurred = y[:480 - 480 % k, :640 - 640 % k].reshape(120, k, 160, k).mean((1, 3))
    blurred = np.repeat(np.repeat(blurred, k, 0), k, 1).astype(np.uint8)
    assert float(api.focus_score(blurred)) < float(sharp)


def test_brightness_score():
    y = np.full((480, 640), 77, np.uint8)
    assert float(api.brightness_score(y)) == pytest.approx(77.0, abs=0.5)


def test_detect_edges_and_corners():
    y, cb, cr, (x0, y0, x1, y1) = synth_ycbcr_card()
    edges, corners = api.detect_edges(y, cb, cr, ORIENTATION_LANDSCAPE_RIGHT)
    assert bool(edges.top.found)
    assert bool(edges.bottom.found)
    assert bool(edges.left.found)
    assert bool(edges.right.found)
    assert bool(corners.found_all)
    tl = np.asarray(corners.top_left)
    br = np.asarray(corners.bottom_right)
    # abs=4: with the bit-faithful float32 hough tables the vote peak can
    # land a few pixels inside the drawn rect on noisy draws — verified
    # corner-identical against the compiled reference (refbridge)
    assert tl[0] == pytest.approx(x0, abs=4)
    assert tl[1] == pytest.approx(y0, abs=4)
    assert br[0] == pytest.approx(x1, abs=4)
    assert br[1] == pytest.approx(y1, abs=4)


def test_detect_edges_batched_canny_equals_per_band():
    """The packed-canvas batched canny path inside detect_edges
    (api._band_lines_batched) is BIT-identical to running each of the 12
    detection bands through its own canny (api._find_edge, the oracle
    form) — the zero-gradient moats make the bands independent. Checked
    on a card frame AND pure noise (worst case for moat crossings)."""
    import jax
    import jax.numpy as jnp

    mults = (1.0, 2.0, 2.0)
    edge_specs = (("top", False), ("bottom", False),
                  ("left", True), ("right", True))

    def oracle(y, cb, cr):
        samples = (jnp.asarray(y), jnp.asarray(cb), jnp.asarray(cr))
        boxes = [api.detection_boxes(s.shape, ORIENTATION_LANDSCAPE_RIGHT)
                 for s in samples]
        return {n: api._find_edge(samples, boxes, n, v, mults)
                for n, v in edge_specs}

    def batched(y, cb, cr):
        samples = (jnp.asarray(y), jnp.asarray(cb), jnp.asarray(cr))
        boxes = [api.detection_boxes(s.shape, ORIENTATION_LANDSCAPE_RIGHT)
                 for s in samples]
        lines = api._band_lines_batched(samples, boxes)
        return {n: api._select_edge(lines[n], mults) for n, _ in edge_specs}

    oj, bj = jax.jit(oracle), jax.jit(batched)
    rng = np.random.RandomState(2)
    frames = [synth_ycbcr_card()[:3],
              (rng.randint(0, 256, (480, 640)).astype(np.uint8),
               rng.randint(0, 256, (240, 320)).astype(np.uint8),
               rng.randint(0, 256, (240, 320)).astype(np.uint8))]
    for y, cb, cr in frames:
        want, got = oj(y, cb, cr), bj(y, cb, cr)
        for name, _ in edge_specs:
            for field in ("found", "rho", "theta"):
                np.testing.assert_array_equal(
                    np.asarray(getattr(got[name], field)),
                    np.asarray(getattr(want[name], field)),
                    err_msg=f"{name}.{field}")


def test_transform_card_rectifies():
    y, cb, cr, rect = synth_ycbcr_card()
    _, corners = api.detect_edges(y, cb, cr, ORIENTATION_LANDSCAPE_RIGHT)
    card = np.asarray(api.transform_card(y, corners,
                                         ORIENTATION_LANDSCAPE_RIGHT))
    assert card.shape == (CARD_HEIGHT, CARD_WIDTH)
    # interior should be the card value, not background
    assert abs(card[40:230, 40:390].mean() - 190) < 8


def test_transform_card_upsample_halves_coords():
    y, cb, cr, rect = synth_ycbcr_card()
    _, corners = api.detect_edges(y, cb, cr, ORIENTATION_LANDSCAPE_RIGHT)
    half = np.asarray(api.transform_card(cb, corners,
                                         ORIENTATION_LANDSCAPE_RIGHT,
                                         upsample=True))
    assert half.shape == (CARD_HEIGHT, CARD_WIDTH)
    assert abs(half.astype(float).mean() - 128) < 2  # neutral chroma plane


def test_blur_card():
    from cardio_dmz_tpu.session import scanner_reset
    import jax.numpy as jnp
    state = scanner_reset()._replace(
        last_n_offsets=jnp.asarray(16, jnp.int32),
        last_offsets=jnp.asarray([30 + 19 * i for i in range(16)], jnp.int32),
        last_number_width=jnp.asarray(18.0, jnp.float32),
        last_vseg_y=jnp.asarray(150, jnp.int32),
    )
    card = RNG.randint(0, 256, (CARD_HEIGHT, CARD_WIDTH)).astype(np.uint8)
    out = api.blur_card(card, state, unblur_digits=4)
    assert out.shape == card.shape
    # the last 4 digit cells are untouched
    x_keep = 30 + 19 * 12
    np.testing.assert_array_equal(out[:, x_keep + 24:], card[:, x_keep + 24:])
    # the first digit region changed (blurred)
    assert (out[150:177, 30:49] != card[150:177, 30:49]).any()


def test_preprocess_frame_jitted():
    import jax
    y, cb, cr, (x0, y0, x1, y1) = synth_ycbcr_card()
    f = jax.jit(lambda a, b, c: api.preprocess_frame(a, b, c))
    found, card = f(y, cb, cr)
    assert bool(found)
    card = np.asarray(card)
    assert card.shape == (CARD_HEIGHT, CARD_WIDTH)
    assert abs(card[40:230, 40:390].mean() - 190) < 8


def test_preprocess_frame_not_found_on_blank():
    import jax
    rng = np.random.RandomState(3)
    y = rng.randint(118, 138, (480, 640)).astype(np.uint8)  # featureless
    cb = np.full((240, 320), 128, np.uint8)
    cr = np.full((240, 320), 128, np.uint8)
    found, card = jax.jit(lambda a, b, c: api.preprocess_frame(a, b, c))(y, cb, cr)
    assert not bool(found)
    np.testing.assert_array_equal(np.asarray(card), 0)
