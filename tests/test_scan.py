"""Scan-pipeline tests: vseg/hseg recovery and frame-level gating on
synthetic rendered cards, plus an hseg dense-search-vs-reference-search
oracle comparison."""

import functools

import jax
import numpy as np
import pytest

import synthetic
from cardio_dmz_tpu.constants import (
    HSEG_GRAD_SUM_PATTERN,
    PATTERN_MASKS,
    PATTERN_LENGTH_FOR_PATTERN,
)
from cardio_dmz_tpu.models.weights import load_all_params
from cardio_dmz_tpu.scan import scan_card_image, best_n_vseg


@functools.lru_cache(maxsize=None)
def _params():
    return load_all_params()


@functools.lru_cache(maxsize=None)
def _scan_fn():
    params = _params()
    return jax.jit(lambda y: scan_card_image(params, y))


def test_vseg_finds_pan_row():
    y = synthetic.render_frame("4111111111111111", y0=155, width=18.0,
                               offset=30, seed=1, noise=1)
    v = best_n_vseg(_params()["vseg_mlp"], y)
    assert abs(int(v.y_offset) - 155) <= 4
    assert int(v.pattern_type) == 1
    assert float(v.score) > 15


def test_vseg_unknown_on_blank_card():
    rng = np.random.RandomState(0)
    y = np.clip(140 + rng.randint(-2, 3, (270, 428)), 0, 255).astype(np.uint8)
    v = best_n_vseg(_params()["vseg_mlp"], y)
    # blank card: no PAN row should score above the usability cutoff
    assert float(v.score) < 15


def test_frame_pipeline_recovers_geometry():
    y = synthetic.render_frame("4111111111111111", y0=150, width=18.0,
                               offset=35, seed=0, noise=1)
    r = _scan_fn()(y)
    assert abs(int(r.vseg.y_offset) - 150) <= 3
    assert int(r.hseg.n_offsets) == 16
    assert float(r.hseg.number_width) == pytest.approx(18.0, abs=0.3)
    assert abs(int(r.hseg.pattern_offset) - 35) <= 2
    assert not bool(r.upside_down)


def test_frame_pipeline_reads_digits():
    y = synthetic.render_frame("4111111111111111", y0=150, width=18.0,
                               offset=35, seed=0, noise=1)
    r = _scan_fn()(y)
    assert bool(r.usable)
    pred = "".join(map(str, np.asarray(r.scores).argmax(-1)[:16]))
    assert pred == "4111111111111111"


def test_upside_down_detection():
    # PAN row in the top half -> upside-down flag (frame.cpp:38-41)
    y = synthetic.render_frame("4111111111111111", y0=60, width=18.0,
                               offset=35, seed=0, noise=1)
    r = _scan_fn()(y)
    assert bool(r.upside_down)
    assert not bool(r.usable)


def test_amex_pattern_spacing():
    y = synthetic.render_frame("411111111111111", y0=150, width=18.0,
                               offset=40, seed=2, noise=1)
    r = _scan_fn()(y)
    # 15-digit spacing: digit cells must sit at the amex mask positions
    if int(r.vseg.pattern_type) == 2:
        assert int(r.hseg.n_offsets) == 15
        offs = np.asarray(r.hseg.offsets)[:15]
        w = float(r.hseg.number_width)
        o = int(r.hseg.pattern_offset)
        mask_idx = [k for k, m in enumerate(PATTERN_MASKS[2]) if m]
        expected = [o + int(round(k * w)) for k in mask_idx]
        np.testing.assert_array_equal(offs, expected)


# ---------------------------------------------------------------------------
# hseg dense search vs the reference's 4-stage coarse-to-fine search
# ---------------------------------------------------------------------------

def _stamp_template(pattern_type, width, offset):
    """Build the reference's stamped pattern vector (n_hseg.cpp:54-68)."""
    p = np.zeros(428, np.float32)
    tmpl = np.array(HSEG_GRAD_SUM_PATTERN, np.float32)
    for k in range(PATTERN_LENGTH_FOR_PATTERN[pattern_type]):
        if PATTERN_MASKS[pattern_type][k]:
            c = offset + int(np.rint(k * width))
            p[c:c + 19] = tmpl[:min(19, 428 - c)]
    return p


def _reference_search(gs, pattern_type):
    """Numpy port of best_n_hseg's 4-stage search (n_hseg.cpp:88-152)."""
    plen = PATTERN_LENGTH_FOR_PATTERN[pattern_type]
    mask = PATTERN_MASKS[pattern_type]
    tmpl = np.array(HSEG_GRAD_SUM_PATTERN, np.float32)

    def constrained(best, wmin, wmax, wstep, omin, omax, ostep):
        score, bw, bo = best
        width = wmin
        while width < wmax:
            pattern_width = plen * width
            max_off = 428 - int(np.rint(pattern_width))
            o_hi = min(omax, max_off) if omax is not None else max_off
            for o in range(omin, o_hi, ostep):
                p = np.zeros(428, np.float32)
                ok = True
                for k in range(plen):
                    if mask[k]:
                        c = o + int(np.rint(k * width))
                        if c + 19 < 428:
                            p[c:c + 19] = tmpl
                        else:
                            ok = False
                if ok:
                    s = np.abs(gs - p).sum()
                    if s < score:
                        score, bw, bo = s, width, o
            width += wstep
        return score, bw, bo

    best = (428.0, 0.0, 0)
    best = constrained(best, 17.1, 19.7, 0.5, 0, None, 10)
    for (dw, ws, do, os_) in ((0.5, 0.2, 10, 1), (0.2, 0.1, 3, 1),
                              (0.1, 0.05, 3, 1)):
        _, bw, bo = best
        best = constrained(best, bw - dw, bw + dw, ws,
                           max(bo - do, 0), bo + do, os_)
    return best


@pytest.mark.parametrize("width,offset", [(18.0, 35), (17.5, 10), (19.25, 50)])
def test_hseg_dense_matches_or_beats_reference_search(width, offset):
    from cardio_dmz_tpu.scan.hseg import _template_bank, N_OFFSETS
    rng = np.random.RandomState(int(width * 10) + offset)
    gs = 0.1 * rng.rand(428).astype(np.float32)
    gs += _stamp_template(1, width, offset)
    gs = np.clip(gs, 0, 1)

    ref_score, ref_w, ref_o = _reference_search(gs, 1)

    # feed the dense matcher the same profile by constructing a strip whose
    # profile stage we bypass: call the internal matcher via a fake strip is
    # awkward, so instead evaluate the template bank directly.
    templates, valid, centers = _template_bank()
    win = np.zeros((N_OFFSETS, 428), np.float32)
    for o in range(N_OFFSETS):
        n = 428 - o
        win[o, :n] = gs[o:]
    prefix = np.concatenate([[0], np.cumsum(gs)])[:N_OFFSETS]
    scores = np.abs(win[None, :, :] - templates[0][:, None, :]).sum(-1) + prefix[None, :]
    scores[~valid[0]] = np.inf
    wi, o = np.unravel_index(np.argmin(scores), scores.shape)
    dense_score = scores[wi, o]
    dense_w = 17.1 + 0.05 * wi

    # dense global argmin can only match or beat the staged search
    assert dense_score <= ref_score + 1e-3
    # and on a template-generated profile it recovers the truth
    assert dense_w == pytest.approx(width, abs=0.051)
    assert abs(o - offset) <= 1


def test_aggregate_digit_accuracy_on_usable_frames():
    """Digit-level accuracy proxy for the >=99.5%-agreement target: on
    varied synthetic renders, usable frames must read >=90% of digits
    correctly single-frame (the session EWMA + acceptance gates then push
    accepted reads to 100% — see test_session / serve_demo)."""
    params = _params()
    f = jax.jit(jax.vmap(lambda y: scan_card_image(params, y)))
    rng = np.random.RandomState(42)
    frames, truths = [], []
    for i in range(32):
        pan = synthetic.safe_pan(rng)
        frames.append(synthetic.render_frame(
            pan, y0=135 + (i % 10) * 8, width=17.4 + 0.15 * (i % 8),
            offset=20 + (i % 8) * 4, seed=i, noise=1))
        truths.append(pan)
    r = f(np.stack(frames))
    usable = np.asarray(r.usable)
    pred = np.asarray(r.scores).argmax(-1)
    total = correct = 0
    for i in range(32):
        if usable[i]:
            got = "".join(map(str, pred[i][:16]))
            correct += sum(a == b for a, b in zip(got, truths[i]))
            total += 16
    assert usable.sum() >= 16          # most varied configs are scannable
    assert correct / total >= 0.90


def test_latency_shape_config_identical_results():
    """ScanConfig(latency_shape=True) — the batch-1 serving graph with
    dynamic-slice fetches instead of one-hot contractions — produces
    IDENTICAL FrameResults and session outcomes to the throughput graph."""
    import jax
    import numpy as np
    from synthetic import render_frame, safe_pan
    from cardio_dmz_tpu.config import ScanConfig
    from cardio_dmz_tpu.session.state import scanner_reset, scanner_step

    params = _params()
    cfg_t = ScanConfig(scan_expiry=True)
    cfg_l = ScanConfig(scan_expiry=True, latency_shape=True)
    step_t = jax.jit(lambda st, y: scanner_step(params, st, y, config=cfg_t))
    step_l = jax.jit(lambda st, y: scanner_step(params, st, y, config=cfg_l))

    pan = safe_pan(np.random.default_rng(5))
    st_t = scanner_reset(now=(2026, 8))
    st_l = scanner_reset(now=(2026, 8))
    for i in range(5):
        y = np.asarray(render_frame(pan, seed=i, noise=1, y0=160),
                       np.uint8)
        st_t, (fr_t, res_t) = step_t(st_t, y)
        st_l, (fr_l, res_l) = step_l(st_l, y)
        np.testing.assert_array_equal(np.asarray(fr_t.scores),
                                      np.asarray(fr_l.scores))
        np.testing.assert_array_equal(np.asarray(fr_t.usable),
                                      np.asarray(fr_l.usable))
        np.testing.assert_array_equal(np.asarray(res_t.complete),
                                      np.asarray(res_l.complete))
        np.testing.assert_array_equal(np.asarray(res_t.predictions),
                                      np.asarray(res_l.predictions))
    # the PAN must actually have resolved (the sweep exercised real reads;
    # full `complete` additionally needs an expiry read or the 30-frame
    # grace, which 5 expiry-less frames deliberately don't provide)
    assert bool(st_t.number_complete) and bool(st_l.number_complete)
    got = "".join(map(str, np.asarray(st_t.completed_digits)[
        :int(st_t.completed_n)]))
    assert got == pan
