"""Kernel-layer parity tests vs independent numpy oracles.

Mirrors the reference's own TEST_* A/B oracle pattern (SURVEY.md §4.2):
every jnp kernel must match a scalar implementation written straight from
the documented algorithm, pixel-exact for integer ops.
"""

import math

import numpy as np
import pytest

import oracles
import tiers
from cardio_dmz_tpu import ops

RNG = np.random.RandomState(42)


def rand_u8(*shape):
    return RNG.randint(0, 256, size=shape).astype(np.uint8)


def test_morph_grad3_1d():
    x = rand_u8(408)
    got = np.asarray(ops.morph_grad3_1d_u8(x))
    np.testing.assert_array_equal(got, oracles.morph_grad3_1d(x))


def test_morph_grad3_1d_batched():
    x = rand_u8(270, 408)
    got = np.asarray(ops.morph_grad3_1d_u8(x))
    expected = np.stack([oracles.morph_grad3_1d(r) for r in x])
    np.testing.assert_array_equal(got, expected)


def test_morph_grad3_2d_cross():
    x = rand_u8(27, 64)
    got = np.asarray(ops.morph_grad3_2d_cross_u8(x))
    np.testing.assert_array_equal(got, oracles.morph_grad3_2d_cross(x))


def test_lineardown2():
    x = rand_u8(408)
    got = np.asarray(ops.lineardown2_1d_u8(x))
    np.testing.assert_array_equal(got, oracles.lineardown2_1d(x))


def test_norm_convert():
    x = rand_u8(204)
    got = np.asarray(ops.norm_convert_minmax(x))
    np.testing.assert_allclose(got, oracles.norm_convert(x), atol=1e-6)
    # degenerate: constant input -> all zeros
    const = np.full((204,), 77, np.uint8)
    got_c = np.asarray(ops.norm_convert_minmax(const))
    np.testing.assert_array_equal(got_c, np.zeros((204,), np.float32))


def test_split_u8():
    x = rand_u8(16, 64)
    c1, c2 = ops.split_u8(x)
    np.testing.assert_array_equal(np.asarray(c1), x[:, 0::2])
    np.testing.assert_array_equal(np.asarray(c2), x[:, 1::2])


def test_ycbcr_to_rgb_bit_exact():
    y, cb, cr = rand_u8(32, 48), rand_u8(32, 48), rand_u8(32, 48)
    got = np.asarray(ops.ycbcr_to_rgb(y, cb, cr))
    np.testing.assert_array_equal(got, oracles.ycbcr_to_rgb(y, cb, cr))
    rgba = np.asarray(ops.ycbcr_to_rgb(y, cb, cr, add_alpha=True))
    assert rgba.shape[-1] == 4
    np.testing.assert_array_equal(rgba[..., 3], 255)


@pytest.mark.parametrize("dx", [True, False])
def test_sobel7(dx):
    x = rand_u8(40, 56)
    got = np.asarray(ops.sobel7(x, dx=dx, dy=not dx))
    np.testing.assert_array_equal(got, oracles.sobel7(x, dx))


def test_sobel3_dx_dy():
    x = rand_u8(30, 40)
    got = np.asarray(ops.sobel3_dx_dy(x))
    np.testing.assert_array_equal(got, oracles.sobel3_dx_dy(x))


def test_scharr3_abs():
    x = rand_u8(24, 32)
    np.testing.assert_array_equal(
        np.asarray(ops.scharr3_dx_abs(x)), oracles.scharr3_dx_abs(x))
    np.testing.assert_array_equal(
        np.asarray(ops.scharr3_dy_abs(x)), oracles.scharr3_dy_abs(x))


def test_equalize_hist():
    x = rand_u8(27, 19)
    got = np.asarray(ops.equalize_hist(x))
    np.testing.assert_array_equal(got, oracles.equalize_hist(x))


def test_equalize_hist_batched():
    x = rand_u8(5, 27, 19)
    got = np.asarray(ops.equalize_hist(x))
    expected = np.stack([oracles.equalize_hist(c) for c in x])
    np.testing.assert_array_equal(got, expected)


def test_stddev_of_abs():
    x = RNG.randint(-3000, 3000, size=(30, 40)).astype(np.int32)
    got = float(ops.stddev_of_abs(x))
    assert got == pytest.approx(float(oracles.stddev_of_abs(x)), rel=1e-5)


def _smooth_edges_image(h, w, line_row=None, line_col=None):
    """Low-noise image with a step edge: canny-friendly."""
    img = np.full((h, w), 60, np.uint8)
    if line_row is not None:
        img[line_row:, :] = 190
    if line_col is not None:
        img[:, line_col:] = 190
    noise = RNG.randint(-6, 7, size=(h, w))
    return np.clip(img.astype(int) + noise, 0, 255).astype(np.uint8)


def test_canny_matches_reference_flood():
    img = _smooth_edges_image(40, 60, line_row=18)
    dx = np.asarray(ops.sobel7(img, dx=True, dy=False))
    dy = np.asarray(ops.sobel7(img, dx=False, dy=True))
    mean = (np.abs(dx).sum() + np.abs(dy).sum()) / img.size
    low, high = int(math.floor(mean)), int(math.floor(3 * mean))
    from cardio_dmz_tpu.ops.canny import canny7_precomputed_sobel
    got = np.asarray(canny7_precomputed_sobel(dx, dy, low, high))
    expected = oracles.canny_reference(dx, dy, low, high)
    np.testing.assert_array_equal(got, expected)


def test_bounded_hysteresis_equals_flood_on_detection_bands():
    """The serving default (static-sweep hysteresis) must equal the exact
    flood on the detection-band input distribution: bands cut from a
    camera frame containing a rendered card edge (plus noisy background).
    Measured run-distance there is 0; DEFAULT_SWEEPS is pure margin."""
    import jax.numpy as jnp
    from cardio_dmz_tpu import api
    from cardio_dmz_tpu.ops.canny import (
        canny_nms, hysteresis, hysteresis_bounded)
    import synthetic

    boxes = api.detection_boxes((480, 640), 3)
    rng = np.random.RandomState(5)
    for trial in range(tiers.sweep(2, 1)):
        card = np.asarray(synthetic.render_frame(
            synthetic.safe_pan(np.random.default_rng(trial)), seed=trial))
        y = np.full((480, 640), 50, np.int32) + rng.randint(-4, 5, (480, 640))
        y[105:105 + 270, 106:106 + 428] = card
        y = np.clip(y, 0, 255).astype(np.uint8)
        for x, yy, w, h in boxes.values():
            band = y[yy:yy + h, x:x + w]
            dx = np.asarray(ops.sobel7(band, dx=True, dy=False))
            dy = np.asarray(ops.sobel7(band, dx=False, dy=True))
            mean = (np.abs(dx).sum() + np.abs(dy).sum()) / band.size
            low = int(math.floor(mean))
            high = int(math.floor(3 * mean))
            m = np.abs(dx) + np.abs(dy)
            cand = np.asarray(canny_nms(jnp.asarray(dx), jnp.asarray(dy),
                                        low))
            strong = cand & (m > high)
            exact = np.asarray(hysteresis(jnp.asarray(cand),
                                          jnp.asarray(strong)))
            got = np.asarray(hysteresis_bounded(jnp.asarray(cand),
                                                jnp.asarray(strong)))
            np.testing.assert_array_equal(got, exact)


def test_bounded_hysteresis_sandwich_on_percolating_noise():
    """On adversarial low-amplitude noise mazes (card-free bands) the
    bounded form may under-reach the flood but must stay sandwiched:
    (strong & candidate) <= bounded <= flood, monotone in sweep count."""
    import jax.numpy as jnp
    from cardio_dmz_tpu.ops.canny import (
        canny_nms, hysteresis, hysteresis_bounded)

    rng = np.random.RandomState(1)
    band = np.clip(128 + rng.randint(-8, 9, (54, 536)), 0,
                   255).astype(np.uint8)
    dx = np.asarray(ops.sobel7(band, dx=True, dy=False))
    dy = np.asarray(ops.sobel7(band, dx=False, dy=True))
    mean = (np.abs(dx).sum() + np.abs(dy).sum()) / band.size
    low, high = int(math.floor(mean)), int(math.floor(3 * mean))
    m = np.abs(dx) + np.abs(dy)
    cand = np.asarray(canny_nms(jnp.asarray(dx), jnp.asarray(dy), low))
    strong = cand & (m > high)
    assert strong.any()  # the probe is only meaningful with seeds
    exact = np.asarray(hysteresis(jnp.asarray(cand), jnp.asarray(strong)))
    prev = strong & cand
    for k in tiers.sweep((1, 3, 8), (1, 3)):
        got = np.asarray(hysteresis_bounded(jnp.asarray(cand),
                                            jnp.asarray(strong), sweeps=k))
        assert (got >= prev).all()       # monotone in sweeps
        assert (exact | ~got).all()      # subset of the flood
        prev = got


def test_hysteresis_packed_equals_unpacked():
    """The bit-packed hysteresis (32 cols/uint32 word, the serving form)
    equals the boolean-mask form bit for bit — random masks, widths that
    are not multiples of 32, several densities and sweep counts."""
    import jax
    import jax.numpy as jnp
    from cardio_dmz_tpu.ops.canny import (hysteresis_bounded,
                                          hysteresis_bounded_unpacked)

    rng = np.random.RandomState(11)
    for trial in range(tiers.sweep(8, 4)):
        h = rng.randint(3, 70)
        w = rng.randint(3, 300)
        cand = rng.rand(h, w) < rng.uniform(0.2, 0.8)
        strong = cand & (rng.rand(h, w) < 0.05)
        sweeps = rng.randint(1, 4)
        a = np.asarray(jax.jit(hysteresis_bounded_unpacked,
                               static_argnums=2)(
            jnp.asarray(cand), jnp.asarray(strong), sweeps))
        b = np.asarray(jax.jit(hysteresis_bounded, static_argnums=2)(
            jnp.asarray(cand), jnp.asarray(strong), sweeps))
        np.testing.assert_array_equal(b, a, err_msg=f"trial {trial}")
    # batched (the stream-vmapped serving shape)
    cand = rng.rand(4, 40, 231) < 0.5
    strong = cand & (rng.rand(4, 40, 231) < 0.05)
    a = np.asarray(hysteresis_bounded_unpacked(jnp.asarray(cand),
                                               jnp.asarray(strong)))
    b = np.asarray(hysteresis_bounded(jnp.asarray(cand),
                                      jnp.asarray(strong)))
    np.testing.assert_array_equal(b, a)


def test_run_flood_matches_scalar_oracle():
    """Both run-flood forms (ops/canny._run_flood_scan for CPU,
    _run_flood_doubling for TPU) light exactly the candidates whose
    maximal run (along the axis) contains a seed — checked against a
    per-run scalar oracle on random masks, both axes, non-power-of-two
    lengths included."""
    import jax.numpy as jnp
    from cardio_dmz_tpu.ops.canny import (_run_flood_doubling,
                                          _run_flood_scan)

    def oracle(edge, cand, axis):
        e, c = np.array(edge), np.array(cand)
        if axis % 2 == 0:
            e, c = e.T, c.T
        out = e.copy()
        for i in range(e.shape[0]):
            j, n = 0, e.shape[1]
            while j < n:
                if not c[i, j]:
                    j += 1
                    continue
                k = j
                while k < n and c[i, k]:
                    k += 1
                if e[i, j:k].any():
                    out[i, j:k] = True
                j = k
        return out.T if axis % 2 == 0 else out

    rng = np.random.RandomState(3)
    for trial in range(tiers.sweep(12, 5)):
        h, w = rng.randint(2, 45), rng.randint(2, 45)
        cand = rng.rand(h, w) < rng.uniform(0.2, 0.8)
        edge = cand & (rng.rand(h, w) < 0.1)
        for axis in (-1, -2):
            want = oracle(edge, cand, axis)
            for impl in (_run_flood_scan, _run_flood_doubling):
                got = np.asarray(impl(jnp.asarray(edge),
                                      jnp.asarray(cand), axis))
                np.testing.assert_array_equal(got, want,
                                              err_msg=impl.__name__)


def test_adaptive_canny_runs_and_finds_edge():
    img = _smooth_edges_image(54, 300, line_row=25)
    edges, dx, dy = ops.adaptive_canny7(img)
    edges = np.asarray(edges)
    # the horizontal step edge must be detected around row 24-26
    assert edges[23:28, 10:-10].any(axis=0).mean() > 0.9
    # and almost nothing far away from it
    assert edges[:15].mean() < 0.05


@pytest.mark.parametrize("vertical", [False, True])
def test_hough_matches_reference(vertical):
    h, w = 40, 60
    if vertical:
        img = _smooth_edges_image(h, w, line_col=33)
        base = math.pi
    else:
        img = _smooth_edges_image(h, w, line_row=21)
        base = math.pi / 2
    dx = np.asarray(ops.sobel7(img, dx=True, dy=False))
    dy = np.asarray(ops.sobel7(img, dx=False, dy=True))
    mean = (np.abs(dx).sum() + np.abs(dy).sum()) / img.size
    from cardio_dmz_tpu.ops.canny import canny7_precomputed_sobel
    edges = np.asarray(canny7_precomputed_sobel(
        dx, dy, int(math.floor(mean)), int(math.floor(3 * mean))))
    kwargs = dict(
        rho=1.0, theta=math.pi / 180, threshold=max(w, h) // 6,
        theta_min=base - 5 * math.pi / 180, theta_max=base + 5 * math.pi / 180,
        vertical=vertical, gradient_angle_threshold=10.0)
    is_null, rho_got, ang_got = ops.hough_best_line(edges, dx, dy, **kwargs)
    null_ref, rho_ref, ang_ref = oracles.hough_reference(
        edges, dx, dy, 1.0, math.pi / 180, max(w, h) // 6,
        kwargs["theta_min"], kwargs["theta_max"], vertical, 10.0)
    assert bool(is_null) == null_ref
    if not null_ref:
        assert float(rho_got) == pytest.approx(rho_ref, abs=1e-3)
        assert float(ang_got) == pytest.approx(ang_ref, abs=1e-5)
        # sanity: the line is where we drew it. Loose bound: with noise the
        # NMS can emit two edge rows and an off-axis angle that aliases both
        # into one rho bin can out-vote the axis-aligned cell (verified
        # bit-identical against the compiled reference via refbridge).
        if vertical:
            assert abs(rho_ref) == pytest.approx(33, abs=4.0)
        else:
            assert rho_ref == pytest.approx(21, abs=4.0)


def test_warp_identity():
    img = rand_u8(40, 50)
    src = np.array([[0, 0], [49, 0], [0, 39], [49, 39]], np.float32)
    out = np.asarray(ops.unwarp_card(img, src, out_shape=(40, 50)))
    np.testing.assert_array_equal(out, img)


def test_warp_scale():
    # upscale a 2x2 checkerboard: corners must map exactly
    img = np.array([[0, 255], [255, 0]], np.uint8)
    src = np.array([[0, 0], [1, 0], [0, 1], [1, 1]], np.float32)
    out = np.asarray(ops.unwarp_card(img, src, out_shape=(11, 11)))
    assert out[0, 0] == 0 and out[0, 10] == 255
    assert out[10, 0] == 255 and out[10, 10] == 0
    assert out[5, 5] in (127, 128)  # bilinear midpoint (127.5 +- solve eps)


def test_persp_transform_roundtrip():
    src = np.array([[10.0, 12.0], [600.0, 20.0], [15.0, 460.0], [610.0, 470.0]],
                   np.float32)
    dst = np.array([[0.0, 0.0], [427.0, 0.0], [0.0, 269.0], [427.0, 269.0]],
                   np.float32)
    hm = np.asarray(ops.calc_persp_transform(src, dst))
    for s, d in zip(src, dst):
        v = hm @ np.array([s[0], s[1], 1.0])
        np.testing.assert_allclose(v[:2] / v[2], d, atol=1e-2)


def test_bilateral_preserves_edges_smooths_noise():
    img = np.full((16, 11), 40, np.uint8)
    img[:, 6:] = 200
    noisy = np.clip(img.astype(int) + RNG.randint(-5, 6, img.shape), 0, 255
                    ).astype(np.uint8)
    out = np.asarray(ops.bilateral3x3(noisy))
    assert out.shape == img.shape
    # edge magnitude preserved
    assert abs(int(out[8, 7]) - int(out[8, 4])) > 120
    # interior noise reduced
    assert np.std(out[2:-2, 1:4].astype(float)) <= np.std(noisy[2:-2, 1:4].astype(float)) + 1e-6


def test_median_blur():
    img = rand_u8(40, 40)
    out = ops.median_blur(img, ksize=5)
    assert out.shape == img.shape
    # median of a constant region is constant
    const = np.full((30, 30), 99, np.uint8)
    np.testing.assert_array_equal(ops.median_blur(const, 5), const)


def test_window_select_matches_direct_slices():
    """ops/select.window_select == direct column-window slicing, batched
    and unbatched, both serving widths (18 trim / 11 slash+digit), with
    out-of-range lefts clipped like the one-hot forms it replaced."""
    import jax.numpy as jnp
    from cardio_dmz_tpu.ops.select import window_select

    rng = np.random.RandomState(7)
    for X, dtype in ((18, jnp.float32), (11, jnp.bfloat16)):
        band = rng.randint(0, 256, (3, 21, 428)).astype(np.float32)
        lefts = rng.randint(-4, 430, (3, 64)).astype(np.int32)
        got = np.asarray(window_select(jnp.asarray(band),
                                       jnp.asarray(lefts), X,
                                       dtype=dtype)).astype(np.float32)
        cl = np.clip(lefts, 0, 428 - X)
        want = np.stack([np.stack([band[s, :, l:l + X] for l in cl[s]])
                         for s in range(3)])
        np.testing.assert_array_equal(got, want)
