"""A/B parity against the COMPILED reference C++ (cardio_dmz_tpu.refbridge).

These tests measure the TPU pipeline against the actual card.io-dmz binary
(dmz_all.cpp built in its own research-harness configuration,
cython_dmz/dmz.pyxbld), not against hand-transcribed oracles — closing the
"oracle and device agree with each other" loophole.  Skipped when the
reference checkout or toolchain is unavailable.
"""

import functools

import numpy as np
import pytest

import synthetic
import tiers

from cardio_dmz_tpu import refbridge
from cardio_dmz_tpu.models.weights import load_all_params
from cardio_dmz_tpu.models import zoo

pytestmark = pytest.mark.skipif(
    not refbridge.available(), reason="reference checkout/toolchain unavailable"
)


@functools.lru_cache(maxsize=None)
def _oracle():
    return refbridge.RefOracle.shared()


@functools.lru_cache(maxsize=None)
def _params():
    return load_all_params()


@pytest.fixture(autouse=True)
def _highest_precision():
    zoo.set_precision("highest")
    yield
    zoo.set_precision("default")


def test_reference_selfcheck():
    assert _oracle().models_selfcheck()


# ---------------------------------------------------------------- models


def test_vseg_mlp_parity_fuzz():
    rng = np.random.default_rng(0)
    p = _params()["vseg_mlp"]
    for _ in range(8):
        x = rng.uniform(0, 1, 204).astype(np.float32)
        ours = np.asarray(zoo.apply_mlp(p, x))
        ref = _oracle().model_vseg(x)
        np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_pan_conv_parity_fuzz():
    rng = np.random.default_rng(1)
    params = _params()
    keys = ["pan_conv_a", "pan_conv_b", "pan_conv_c"]
    for which, key in enumerate(keys):
        for _ in range(4):
            img = rng.uniform(0, 1, (27, 19)).astype(np.float32)
            ours = np.asarray(zoo.apply_pan_conv(params[key], img))
            ref = _oracle().model_pan(which, img)
            np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_slash_mlp_parity_fuzz():
    rng = np.random.default_rng(2)
    p = _params()["slash_mlp"]
    for _ in range(8):
        x = rng.uniform(0, 1, 176).astype(np.float32)
        ours = np.asarray(zoo.apply_mlp(p, x))
        ref = _oracle().model_slash(x)
        np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_expiry_conv_parity_fuzz():
    rng = np.random.default_rng(3)
    p = _params()["expiry_conv"]
    for _ in range(4):
        img = rng.uniform(0, 1, (16, 11)).astype(np.float32)
        ours = np.asarray(zoo.apply_expiry_conv(p, img))
        ref = _oracle().model_expiry(img)
        np.testing.assert_allclose(ours, ref, atol=1e-5)


# ---------------------------------------------------------------- kernels


def _rand_img(rng, h, w):
    return rng.integers(0, 256, (h, w), dtype=np.uint8)


def test_sobel7_parity():
    from cardio_dmz_tpu.ops.sobel import sobel7

    rng = np.random.default_rng(4)
    img = _rand_img(rng, 54, 160)
    for dx in (True, False):
        ours = np.asarray(sobel7(img, dx, not dx))
        ref = _oracle().sobel7(img, dx)
        np.testing.assert_array_equal(ours, ref)


def test_scharr3_parity():
    from cardio_dmz_tpu.ops.sobel import scharr3_dx_abs, scharr3_dy_abs

    rng = np.random.default_rng(5)
    img = _rand_img(rng, 60, 120)
    np.testing.assert_array_equal(
        np.asarray(scharr3_dx_abs(img)).astype(np.int16),
        _oracle().scharr3_abs(img, True))
    np.testing.assert_array_equal(
        np.asarray(scharr3_dy_abs(img)).astype(np.int16),
        _oracle().scharr3_abs(img, False))


def test_morph_grad_parity():
    from cardio_dmz_tpu.ops.morph import morph_grad3_1d_u8, morph_grad3_2d_cross_u8

    rng = np.random.default_rng(6)
    strip = _rand_img(rng, 1, 408)
    np.testing.assert_array_equal(np.asarray(morph_grad3_1d_u8(strip[0]))[None, :],
                                  _oracle().morph_grad3(strip, False))
    img = _rand_img(rng, 27, 428)
    np.testing.assert_array_equal(np.asarray(morph_grad3_2d_cross_u8(img)),
                                  _oracle().morph_grad3(img, True))


def test_equalize_hist_parity():
    from cardio_dmz_tpu.ops.stats import equalize_hist

    rng = np.random.default_rng(7)
    img = _rand_img(rng, 16, 11)
    np.testing.assert_array_equal(np.asarray(equalize_hist(img)),
                                  _oracle().equalize_hist(img))


def test_focus_brightness_parity():
    from cardio_dmz_tpu import api

    rng = np.random.default_rng(8)
    img = _rand_img(rng, 270, 428)
    ours_f = float(api.focus_score(img, use_full_image=False))
    ref_f = _oracle().focus_score(img, use_full_image=False)
    assert ours_f == pytest.approx(ref_f, rel=1e-4)
    ours_b = float(api.brightness_score(img, use_full_image=False))
    ref_b = _oracle().brightness_score(img, use_full_image=False)
    assert ours_b == pytest.approx(ref_b, rel=1e-4)


def test_persp_transform_bit_exact_parity():
    """llcv_calc_persp_transform (Eigen f32 householderQr, cv/warp.cpp:
    34-125) vs (a) the numpy twin and (b) the in-graph emulation routed
    through it on CPU — BIT-exact over randomized detector-realistic
    corner sets. The 8x8 system's conditioning amplifies any 1-ulp
    sequence deviation to ~1e3 ulp, so equality here is a strong gate."""
    import jax
    import jax.numpy as jnp
    from cardio_dmz_tpu.ops import persp_host
    from cardio_dmz_tpu.ops.persp import eigen_persp_transform

    rng = np.random.default_rng(42)
    dst = np.float32([[0, 0], [427, 0], [0, 269], [427, 269]])
    jept = jax.jit(lambda sp: eigen_persp_transform(sp, jnp.asarray(dst)))
    for t in range(50):
        src = (np.float32([[106, 105], [534, 105], [106, 375], [534, 375]])
               + rng.uniform(-25, 25, (4, 2)).astype(np.float32))
        ref = _oracle().persp_transform(src, dst)
        host = persp_host.persp_transform(src, dst)
        np.testing.assert_array_equal(ref.view(np.uint32),
                                      host.view(np.uint32))
        ing = np.asarray(jept(src))
        np.testing.assert_array_equal(ref.view(np.uint32),
                                      ing.view(np.uint32))


def test_warp_exact_pixel_parity():
    """warp_perspective_exact == cvWarpPerspective BIT-FOR-BIT: the whole
    rectification chain (homography + double coords + 5-bit fixed-point
    bilinear) on random noise images (worst case: every quantization flip
    would change the output), windowed and unwindowed."""
    import jax
    from cardio_dmz_tpu import api
    from cardio_dmz_tpu.ops.warp import unwarp_card

    rng = np.random.default_rng(7)
    bounds = api.warp_src_bounds((480, 640), 3)
    dst = np.float32([[0, 0], [427, 0], [0, 269], [427, 269]])
    uw = jax.jit(lambda im, sp: unwarp_card(im, sp, method="exact",
                                            src_bounds=bounds))
    uw_nb = jax.jit(lambda im, sp: unwarp_card(im, sp, method="exact"))
    for t in range(4):
        src = (np.float32([[106, 105], [534, 105], [106, 375], [534, 375]])
               + rng.uniform(-12, 12, (4, 2)).astype(np.float32))
        img = rng.integers(0, 256, (480, 640)).astype(np.uint8)
        m = _oracle().persp_transform(src, dst)
        ref = _oracle().warp_perspective(img, m, (270, 428))
        np.testing.assert_array_equal(np.asarray(uw(img, src)), ref)
        if t < 2:
            np.testing.assert_array_equal(np.asarray(uw_nb(img, src)), ref)


def test_canny7_kernel_parity():
    """Direct adaptive-canny7 A/B vs the compiled reference
    (llcv_adaptive_canny7_precomputed_sobel, cv/canny.cpp:568-580) on
    detection-band-like content — exact-flood hysteresis for kernel
    parity; the serving default's bounded form is separately gated
    (tests/test_ops.py)."""
    from cardio_dmz_tpu.ops.canny import adaptive_canny7

    rng = np.random.default_rng(5)
    card = np.asarray(synthetic.render_frame(
        synthetic.safe_pan(rng), seed=3))
    y = np.full((480, 640), 50, np.int32) + rng.integers(-4, 5, (480, 640))
    y[105:105 + 270, 106:106 + 428] = card
    y = np.clip(y, 0, 255).astype(np.uint8)
    from cardio_dmz_tpu import api
    boxes = api.detection_boxes((480, 640), 3)
    for x, yy, w, h in boxes.values():
        band = y[yy:yy + h, x:x + w]
        ref = _oracle().canny7(band)
        got, _, _ = adaptive_canny7(band, sweeps=None)
        np.testing.assert_array_equal(np.asarray(got), ref)
        # and the serving bounded form agrees on this input distribution
        got_b, _, _ = adaptive_canny7(band)
        np.testing.assert_array_equal(np.asarray(got_b), ref)


def test_hough_kernel_parity():
    """Direct gradient-gated-hough A/B vs the compiled reference
    (llcv_hough, cv/hough.cpp:52-195), fed the reference's own canny/sobel
    planes so the gate isolates the vote/argmax machinery."""
    import math as _math
    from cardio_dmz_tpu.ops import hough_best_line, sobel7

    rng = np.random.default_rng(9)
    card = np.asarray(synthetic.render_frame(
        synthetic.safe_pan(rng), seed=4))
    y = np.full((480, 640), 50, np.int32) + rng.integers(-3, 4, (480, 640))
    y[105:105 + 270, 106:106 + 428] = card
    y = np.clip(y, 0, 255).astype(np.uint8)
    from cardio_dmz_tpu import api
    boxes = api.detection_boxes((480, 640), 3)
    for name, (x, yy, w, h) in boxes.items():
        band = y[yy:yy + h, x:x + w]
        vertical = name in ("left", "right")
        dx = _oracle().sobel7(band, True)
        dy = _oracle().sobel7(band, False)
        edges = _oracle().canny7(band)
        base = _math.pi if vertical else _math.pi / 2
        kwargs = dict(rho_res=1.0, theta_res=_math.pi / 180,
                      threshold=max(w, h) // 6,
                      theta_min=base - 5 * _math.pi / 180,
                      theta_max=base + 5 * _math.pi / 180,
                      vertical=vertical, gradient_angle_threshold=10.0)
        ref_rho, ref_theta, ref_null = _oracle().hough(edges, dx, dy,
                                                       **kwargs)
        is_null, rho, theta = hough_best_line(
            edges, dx.astype(np.int32), dy.astype(np.int32),
            rho=1.0, theta=_math.pi / 180, threshold=max(w, h) // 6,
            theta_min=kwargs["theta_min"], theta_max=kwargs["theta_max"],
            vertical=vertical, gradient_angle_threshold=10.0)
        assert bool(is_null) == ref_null
        if not ref_null:
            assert float(rho) == pytest.approx(ref_rho, abs=1e-4)
            assert float(theta) == pytest.approx(ref_theta, abs=1e-6)


# ----------------------------------------------------------- frame stages


def _frames(n=6, with_expiry=False, seed0=0):
    out = []
    rng = np.random.default_rng(seed0)
    for i in range(n):
        pan = synthetic.safe_pan(rng, length=16, prefix=(4,))
        if with_expiry:
            y = synthetic.render_frame_with_expiry(pan, "08/28", seed=i)
        else:
            y = synthetic.render_frame(pan, y0=150 + (i % 3) * 8, seed=i)
        out.append((pan, np.asarray(y, dtype=np.uint8)))
    return out


def test_vseg_parity_on_synthetic_frames():
    from cardio_dmz_tpu.scan import best_n_vseg

    p = _params()["vseg_mlp"]
    for pan, y in _frames(6):
        v = best_n_vseg(p, y)
        ref_y, ref_score, ref_pat, ref_len = _oracle().vseg(y)
        assert int(v.y_offset) == ref_y
        assert int(v.pattern_type) == ref_pat
        assert float(v.score) == pytest.approx(ref_score, abs=2e-3)


def test_hseg_staged_exact_parity():
    """The staged hseg search must match the compiled C++ candidate-for-
    candidate: identical (width, pattern_offset, offsets) on every frame
    (scan/hseg.py best_n_hseg reproduces n_hseg.cpp:110-147 exactly,
    including the f32 width accumulation)."""
    import jax
    import jax.numpy as jnp
    from cardio_dmz_tpu.scan.hseg import best_n_hseg

    f = jax.jit(best_n_hseg)
    rng = np.random.default_rng(11)
    checked = 0
    for i in range(10):
        length = 16 if i % 3 else 15
        pan = synthetic.safe_pan(rng, length=length,
                                 prefix=(4,) if length == 16 else (3, 4))
        y = synthetic.render_frame(pan, y0=int(rng.integers(150, 230)),
                                   width=float(rng.uniform(17.3, 19.2)),
                                   offset=int(rng.integers(25, 45)),
                                   noise=int(rng.integers(0, 4)), seed=i)
        vy, _, vp, vn = _oracle().vseg(y)
        if vp == 0:
            continue
        hn, hoffs, hw, hpo, _ = _oracle().hseg(y, vy)
        ours = f(jnp.asarray(y[vy:vy + 27]), jnp.asarray(vp), jnp.asarray(vn))
        assert int(ours.pattern_offset) == hpo
        assert float(ours.number_width) == pytest.approx(hw, abs=1e-6)
        assert list(np.asarray(ours.offsets))[:hn] == hoffs
        checked += 1
    assert checked >= 6


def test_frame_digit_parity_on_synthetic_frames():
    """Digit-level agreement with the compiled reference.

    hseg now reproduces the reference's 4-stage search exactly, so every
    usable frame must agree on the segmentation AND >= 99.5% of digits.
    The large-sweep number lives in PARITY.md (tools/parity_ab.py).
    """
    import jax
    from cardio_dmz_tpu.scan import scan_card_image

    params = _params()
    scan = jax.jit(lambda y: scan_card_image(params, y))
    total = agree = usable_frames = 0
    for pan, y in _frames(8):
        ref = _oracle().scan_card_image(y, scan_expiry=False)
        ours = scan(y)
        assert ref.usable == bool(ours.usable)
        if not ref.usable:
            continue
        usable_frames += 1
        n = int(ours.hseg.n_offsets)
        assert n == ref.hseg_n_offsets
        our_offsets = list(np.asarray(ours.hseg.offsets))[:n]
        assert our_offsets == ref.hseg_offsets
        our_digits = list(np.asarray(ours.scores).argmax(1)[:n])
        for a, b in zip(our_digits, ref.digits):
            total += 1
            agree += int(a == b)
    assert usable_frames >= 3, "too few usable frames"
    if total:
        assert agree / total >= 0.995, f"digit agreement {agree}/{total}"


def test_digit_parity_given_reference_hseg():
    """Categorize-stage parity: force the reference's hseg offsets into OUR
    digit pipeline — cells, prep, and 3-conv ensemble must reproduce the
    reference digits exactly (isolates categorize from the hseg deviation)."""
    import jax.numpy as jnp
    from cardio_dmz_tpu.scan.categorize import number_scores

    params = _params()
    total = agree = 0
    for pan, y in _frames(8):
        ref = _oracle().scan_card_image(y, scan_expiry=False)
        if not ref.usable:
            continue
        strip = y[ref.vseg_y_offset:ref.vseg_y_offset + 27, :]
        offsets = np.zeros(16, np.int32)
        offsets[: ref.hseg_n_offsets] = ref.hseg_offsets
        ours = np.asarray(number_scores(params, jnp.asarray(strip),
                                        jnp.asarray(offsets),
                                        ref.hseg_n_offsets))
        our_digits = list(ours.argmax(1)[: ref.hseg_n_offsets])
        np.testing.assert_allclose(ours[: ref.hseg_n_offsets],
                                   ref.scores[: ref.hseg_n_offsets],
                                   atol=2e-4)
        for a, b in zip(our_digits, ref.digits):
            total += 1
            agree += int(a == b)
    assert total >= 30
    assert agree == total, f"digit agreement {agree}/{total}"


def test_session_parity_final_pan():
    from cardio_dmz_tpu.session.host import HostScanner

    params = _params()
    for pan, _ in _frames(2, seed0=42):
        ours = HostScanner(params, scan_expiry=False)
        handle = _oracle().scanner_create()
        try:
            ref_result = None
            for i in range(8):
                y = np.asarray(
                    synthetic.render_frame(pan, y0=152, seed=100 + i, noise=1),
                    dtype=np.uint8)
                ours.add_frame(y)
                _oracle().scanner_add_frame(handle, y, scan_expiry=False)
                if ref_result is None:
                    ref_result = _oracle().scanner_result(handle)
            our_result = ours.result()
            assert ref_result is not None, "reference never completed"
            ref_digits = "".join(str(d) for d in ref_result[0])
            assert ref_digits == pan
            assert our_result.complete
            assert "".join(str(d) for d in np.asarray(our_result.predictions)[
                : int(our_result.n_numbers)]) == pan
        finally:
            _oracle().scanner_destroy(handle)


# ------------------------------------------------------------------ expiry


def test_name_supergroup_path_parity():
    """The flag-gated name super-group path (expiry_seg_host with
    collect_name_groups=True) matches the compiled reference's OWN
    gather/regrid/optimize internals invoked with the disabled call's
    parameters (gather_into_groups(super, local, 2*kSmallCharacterWidth),
    expiry_seg.cpp:544-548) — stage for stage on frames carrying a
    name-like two-word line (13 px word gap: >=9 splits local groups,
    <18 merges the super)."""
    from cardio_dmz_tpu.refbridge.oracle import RefGroupResult
    from cardio_dmz_tpu.scan import expiry_seg_host as H
    from cardio_dmz_tpu.scan.expiry_types import (MIN_NAME_STRIP_CHARS,
                                                  SMALL_CHAR_WIDTH)

    def to_ref(g):
        return RefGroupResult(
            top=g.top, left=g.left, width=g.width, height=g.height,
            character_width=g.character_width, pattern=0,
            recently_seen_count=0, total_seen_count=0,
            char_tops=[r.top for r in g.character_rects],
            char_lefts=[r.left for r in g.character_rects],
            char_sums=[r.sum for r in g.character_rects])

    def assert_same(og, rg, what):
        assert (og.top, og.left, og.width, og.height) == \
            (rg.top, rg.left, rg.width, rg.height), what
        assert [r.top for r in og.character_rects] == rg.char_tops, what
        assert [r.left for r in og.character_rects] == rg.char_lefts, what
        assert [r.sum for r in og.character_rects] == rg.char_sums, what

    multi_local_supers = 0
    survivors = 0
    for i in range(4):
        y = np.asarray(synthetic.render_frame_with_expiry(
            "4111111111111111", "08/28", seed=i), np.uint8)
        y = np.asarray(synthetic.render_text_small(
            y, "1234 56789", 150 + 27 + 35 + 26, 100), np.uint8)
        sobel = H.scharr_dx_abs_below(y, 150)
        for base, total in H.select_stripes(sobel, 150):
            local = H.local_groups_for_stripe(sobel, base, total)
            if not local:
                continue
            ours = H.gather_into_groups(local, 2 * SMALL_CHAR_WIDTH)
            refs = _oracle().gather_groups([to_ref(g) for g in local],
                                           2 * SMALL_CHAR_WIDTH)
            assert len(ours) == len(refs)
            for og, rg in zip(ours, refs):
                assert_same(og, rg, "gather")
                if len(og.character_rects) > max(
                        len(g.character_rects) for g in local):
                    multi_local_supers += 1
                if len(og.character_rects) < MIN_NAME_STRIP_CHARS - 1:
                    continue
                H.regrid_group(sobel, og)
                rg = _oracle().regrid_group(sobel, rg)
                assert_same(og, rg, "regrid")
                H.optimize_character_rects(sobel, og)
                rg = _oracle().optimize_character_rects(sobel, rg)
                assert_same(og, rg, "optimize")
                if len(og.character_rects) >= MIN_NAME_STRIP_CHARS:
                    survivors += 1
    # the sweep must actually exercise multi-local-group supers and
    # full-path survivors, not just degenerate single groups
    assert multi_local_supers >= 1
    assert survivors >= 2

    # end-to-end: the flag returns name groups, and the flag OFF (the
    # serving default, matching the reference's disabled path) returns none
    params = _params()
    y = np.asarray(synthetic.render_frame_with_expiry(
        "4111111111111111", "08/28", seed=0), np.uint8)
    y = np.asarray(synthetic.render_text_small(
        y, "1234 56789", 150 + 27 + 35 + 26, 100), np.uint8)
    _, names_on = H.best_expiry_seg(y, 150, params["slash_mlp"],
                                    collect_name_groups=True)
    _, names_off = H.best_expiry_seg(y, 150, params["slash_mlp"])
    assert names_off == []
    assert len(names_on) >= 1


def test_expiry_seg_parity_host_vs_reference():
    """Host expiry segmentation == compiled reference, group for group
    (tops, lefts, pattern), on synthetic expiry frames."""
    from cardio_dmz_tpu.scan import expiry_seg_host as H

    params = _params()
    frames_with_groups = 0
    for i in range(6):
        y = np.asarray(synthetic.render_frame_with_expiry(
            "4111111111111111", "08/28", seed=i), dtype=np.uint8)
        ref_groups, ref_names = _oracle().expiry_seg(y, 150)
        our_groups, our_names = H.best_expiry_seg(y, 150, params["slash_mlp"])
        assert ref_names == [] and our_names == []
        assert len(ref_groups) == len(our_groups), f"frame {i}"
        frames_with_groups += bool(ref_groups)
        for rg, og in zip(ref_groups, our_groups):
            assert (rg.top, rg.left) == (og.top, og.left)
            assert rg.char_tops == [r.top for r in og.character_rects]
            assert rg.char_lefts == [r.left for r in og.character_rects]
    assert frames_with_groups >= 2


def test_expiry_session_randomized_device_parity():
    """Randomized expiry sessions (dates incl. past/out-of-window, layout,
    spacing, noise): the DEVICE in-graph expiry path (scanner_step with
    scan_expiry) and the host oracle both agree with the compiled
    reference session date-for-date. The A/B runs the CYTHON_DMZ
    date-sanity configuration (expiry_allow_past_dates=True) because the
    compiled oracle IS that configuration (expiry_categorize.cpp:382-397).
    The full-scale sweep (100+ sessions) lives in tools/parity_ab.py;
    this is its CI-sized pin."""
    import jax
    from cardio_dmz_tpu.config import ScanConfig
    from cardio_dmz_tpu.session.host import HostScanner
    from cardio_dmz_tpu.session.state import scanner_reset, scanner_step

    params = _params()
    cfg = ScanConfig(scan_expiry=True, expiry_allow_past_dates=True)
    dev_step = jax.jit(lambda st, y: scanner_step(params, st, y, config=cfg))
    rng = np.random.default_rng(77)
    now = (2026, 8)
    read_sessions = 0
    for s in range(8):
        if s == 3:
            text = "01/22"   # past date: the CYTHON_DMZ branch accepts it
        elif s == 7:
            text = "%02d/%02d" % (rng.integers(1, 13), rng.integers(33, 39))
        else:
            text = "%02d/%02d" % (rng.integers(1, 13), rng.integers(27, 31))
        y0 = int(rng.integers(145, 200))
        ex = int(rng.integers(95, 160))
        ey = min(y0 + 27 + int(rng.integers(30, 44)), 240)
        spacing = int(rng.integers(12, 15))
        style = "flat" if s % 4 == 1 else "emboss"
        pan = synthetic.safe_pan(rng)

        ours = HostScanner(params, scan_expiry=True, now=now,
                           allow_past_dates=True)
        dev = scanner_reset(now=now)
        handle = _oracle().scanner_create()
        try:
            ref_date = our_date = dev_date = None
            for i in range(12):
                y = np.asarray(synthetic.render_frame_with_expiry(
                    pan, text, y0=y0, expiry_y=ey, expiry_x=ex,
                    expiry_spacing=spacing, style=style,
                    seed=5100 * s + i), np.uint8)
                ours.add_frame(y)
                dev, (_, dres) = dev_step(dev, y)
                _oracle().scanner_add_frame(handle, y, scan_expiry=True)
                r = _oracle().scanner_result(handle)
                if ref_date is None and r and r[1] and r[2]:
                    ref_date = (r[1], r[2])
                res = ours.result()
                if our_date is None and res.complete and res.expiry_month:
                    our_date = (res.expiry_month, res.expiry_year)
                if dev_date is None and bool(dres.complete) and \
                        int(dres.expiry_month):
                    dev_date = (int(dres.expiry_month),
                                int(dres.expiry_year))
        finally:
            _oracle().scanner_destroy(handle)
        assert our_date == ref_date, (s, text, our_date, ref_date)
        assert dev_date == ref_date, (s, text, dev_date, ref_date)
        read_sessions += int(ref_date is not None)
    assert read_sessions >= 2   # the sweep must exercise real reads


def test_expiry_session_date_parity():
    """Full-session expiry reads AGREE with the compiled reference (both the
    accepted dates and the frames where nothing is accepted), and on pinned
    known-good renders both read the true date."""
    from cardio_dmz_tpu.session.host import HostScanner

    params = _params()
    for text in ("08/28", "12/28", "03/27"):
        want = (int(text[:2]), 2000 + int(text[3:]))
        pan = "4111111111111111"
        ours = HostScanner(params, scan_expiry=True, now=(2026, 8))
        handle = _oracle().scanner_create()
        try:
            ref_date = our_date = None
            for i in range(12):
                y = np.asarray(synthetic.render_frame_with_expiry(
                    pan, text, seed=i), dtype=np.uint8)
                ours.add_frame(y)
                _oracle().scanner_add_frame(handle, y, scan_expiry=True)
                r = _oracle().scanner_result(handle)
                if ref_date is None and r and r[1] and r[2]:
                    ref_date = (r[1], r[2])
                res = ours.result()
                if our_date is None and res.complete and res.expiry_month:
                    our_date = (res.expiry_month, res.expiry_year)
            assert ref_date == want, f"reference failed {text}: {ref_date}"
            assert our_date == want, f"ours failed {text}: {our_date}"
        finally:
            _oracle().scanner_destroy(handle)


def test_detect_edges_and_transform_parity():
    """Camera-stage parity vs the compiled reference: dmz_detect_edges
    (corner points, per-edge rho/theta — dmz.cpp:371-439) and
    dmz_transform_card (428x270 warp — dmz.cpp:443-497) on synthetic
    preview frames with the card on the landscape guide rect."""
    import jax
    from cardio_dmz_tpu import api
    from cardio_dmz_tpu.constants import (
        LANDSCAPE_HORIZONTAL_INSET, LANDSCAPE_VERTICAL_INSET)

    detect = jax.jit(lambda a, b, c: api.detect_edges(a, b, c))
    rng = np.random.RandomState(5)
    found_frames = 0
    for i in range(5):
        card = np.asarray(synthetic.render_frame(
            "4111111111111111", seed=i, noise=i % 3), dtype=np.uint8)
        y = np.full((480, 640), 50, np.int32)
        y += rng.randint(-(i % 3) - 1, (i % 3) + 2, y.shape)
        y[LANDSCAPE_VERTICAL_INSET:LANDSCAPE_VERTICAL_INSET + 270,
          LANDSCAPE_HORIZONTAL_INSET:LANDSCAPE_HORIZONTAL_INSET + 428] = card
        y = np.clip(y, 0, 255).astype(np.uint8)
        cb = np.full((240, 320), 128, np.uint8)
        cr = np.full((240, 320), 128, np.uint8)

        ok, found, rho_theta, ref_corners = _oracle().detect_edges(y, cb, cr)
        edges, corners = detect(y, cb, cr)
        assert bool(corners.found_all) == ok, f"frame {i}"
        if not ok:
            continue
        found_frames += 1
        ours = np.stack([np.asarray(corners.top_left),
                         np.asarray(corners.top_right),
                         np.asarray(corners.bottom_left),
                         np.asarray(corners.bottom_right)])
        np.testing.assert_allclose(ours, ref_corners, atol=1e-2)

        ref_card = _oracle().transform_card(y, ref_corners)
        our_card = np.asarray(api.transform_card(y, corners))
        # cvWarpPerspective interpolates in 5-bit fixed point; ours is f32
        diff = np.abs(our_card.astype(int) - ref_card.astype(int))
        assert (diff <= 1).mean() > 0.995, f"frame {i}: {diff.max()}"
        assert diff.max() <= 16
    assert found_frames >= 4


@pytest.mark.parametrize("orientation", tiers.sweep([1, 2, 3, 4], [1, 3]))
def test_detect_and_transform_all_orientations(orientation):
    """Corner detection + warp parity for every FrameOrientation
    (dmz_olm.h:19-22): the insets and the corner reordering
    (dmz.cpp:446-471) differ per orientation. Fast tier covers one
    portrait + one landscape; CARDIO_FULL_SWEEPS=1 runs all four."""
    import jax
    from cardio_dmz_tpu import api

    rng = np.random.RandomState(orientation)
    boxes = api.detection_boxes((480, 640), orientation)
    # card edges at the midlines of the detection bands
    left = boxes["left"][0] + boxes["left"][2] // 2
    right = boxes["right"][0] + boxes["right"][2] // 2
    top = boxes["top"][1] + boxes["top"][3] // 2
    bottom = boxes["bottom"][1] + boxes["bottom"][3] // 2
    y = np.full((480, 640), 50, np.int32)
    y += rng.randint(-2, 3, y.shape)
    y[top:bottom, left:right] = 190
    y = np.clip(y, 0, 255).astype(np.uint8)
    cb = np.full((240, 320), 128, np.uint8)

    ok, found, rho_theta, ref_corners = _oracle().detect_edges(
        y, cb, cb, orientation)
    edges, corners = jax.jit(
        lambda a, b, c: api.detect_edges(a, b, c, orientation))(y, cb, cb)
    assert bool(corners.found_all) == ok, f"orientation {orientation}"
    if not ok:
        return
    ours = np.stack([np.asarray(corners.top_left),
                     np.asarray(corners.top_right),
                     np.asarray(corners.bottom_left),
                     np.asarray(corners.bottom_right)])
    np.testing.assert_allclose(ours, ref_corners, atol=1e-2)

    ref_card = _oracle().transform_card(y, ref_corners, orientation)
    our_card = np.asarray(api.transform_card(y, corners, orientation))
    diff = np.abs(our_card.astype(int) - ref_card.astype(int))
    assert (diff <= 2).mean() > 0.99, \
        f"orientation {orientation}: {diff.max()}"
