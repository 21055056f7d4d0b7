"""Device (jittable) expiry path tests: parity vs the host oracle +
full in-graph session with expiry."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

import synthetic
from cardio_dmz_tpu.models.weights import load_all_params
from cardio_dmz_tpu.scan import expiry_seg_host as host_seg
from cardio_dmz_tpu.scan.expiry_device import (
    aggregate_windows,
    best_expiry_seg_device,
    categorize_windows,
    expiry_state_init,
    extract_expiry,
)


@functools.lru_cache(maxsize=None)
def _params():
    return load_all_params()


@functools.lru_cache(maxsize=None)
def _seg_fn():
    params = _params()
    return jax.jit(lambda img, yv: best_expiry_seg_device(
        params["slash_mlp"], img, yv, jnp.asarray(True)))


def _frame(seed=0, expiry="08/28"):
    return synthetic.render_frame_with_expiry(
        "4111111111111111", expiry, y0=150, offset=35, expiry_y=212,
        expiry_x=120, noise=1, seed=seed)


def test_device_seg_matches_host():
    for seed in range(3):
        y = _frame(seed=seed)
        hg, _ = host_seg.best_expiry_seg(y, 150, _params()["slash_mlp"])
        w = _seg_fn()(y, jnp.asarray(150))
        n_dev = int(np.asarray(w.valid).sum())
        assert n_dev == len(hg), (seed, n_dev, len(hg))
        if hg:
            assert int(np.asarray(w.top)[0]) == hg[0].top
            assert int(np.asarray(w.left)[0]) == hg[0].left
            np.testing.assert_array_equal(
                np.asarray(w.char_lefts)[0],
                [r.left for r in hg[0].character_rects])
            np.testing.assert_array_equal(
                np.asarray(w.char_tops)[0],
                [r.top for r in hg[0].character_rects])


def test_device_seg_disabled_gate():
    y = _frame()
    params = _params()
    w = jax.jit(lambda img: best_expiry_seg_device(
        params["slash_mlp"], img, jnp.asarray(150), jnp.asarray(False)))(y)
    assert not np.asarray(w.valid).any()


def test_device_categorize_matches_host():
    y = _frame()
    params = _params()
    hg, _ = host_seg.best_expiry_seg(y, 150, params["slash_mlp"])
    from cardio_dmz_tpu.scan.expiry_categorize_host import (
        categorize_expiry_digits)
    h_scores = categorize_expiry_digits(y, hg[0], params["expiry_conv"])

    w = _seg_fn()(y, jnp.asarray(150))
    d_scores = np.asarray(jax.jit(
        lambda img, win: categorize_windows(params["expiry_conv"], img, win)
    )(y, w))
    np.testing.assert_allclose(d_scores[0], h_scores[:5], atol=1e-5)


def test_device_aggregation_and_extract():
    params = _params()
    seg = _seg_fn()
    cat = jax.jit(lambda img, w: categorize_windows(
        params["expiry_conv"], img, w))
    agg = jax.jit(aggregate_windows)
    ext = jax.jit(lambda st, m, yy: extract_expiry(st, m, yy, 2026, 8))

    st = expiry_state_init()
    month = jnp.asarray(0)
    year = jnp.asarray(0)
    history = []
    for s in range(8):
        y = _frame(seed=s)
        w = seg(y, jnp.asarray(150))
        st = agg(st, w, cat(y, w))
        month, year = ext(st, month, year)
        history.append((int(month), int(year)))
    assert history[0] == (0, 0)      # needs >= 3 sightings
    assert history[-1] == (8, 2028)


def test_full_session_in_graph_with_expiry():
    """The north-star shape: PAN + expiry in ONE jitted lax.scan graph."""
    params = _params()
    frames = np.stack([_frame(seed=s) for s in range(8)])

    from cardio_dmz_tpu.session import scanner_reset, scanner_step

    @jax.jit
    def run(fr):
        def step(state, y):
            return scanner_step(params, state, y, scan_expiry=True)
        return lax.scan(step, scanner_reset(now=(2026, 8)), fr)

    state, (f, res) = run(frames)
    assert bool(state.number_complete)
    assert "".join(map(str, np.asarray(state.completed_digits)[:16])) == \
        "4111111111111111"
    assert int(state.expiry_month) == 8
    assert int(state.expiry_year) == 2028
    assert bool(np.asarray(res.complete)[-1])
    assert int(np.asarray(res.expiry_month)[-1]) == 8


def test_caps_hold_on_text_heavy_frame():
    """A frame with many text lines must respect the fixed caps (<= 4
    windows, no crash) and keep all reported windows in-bounds."""
    import synthetic
    y = synthetic.render_frame("4111111111111111", y0=120, offset=35,
                               width=18.0, seed=0, noise=1)
    for row, x in ((175, 40), (175, 200), (200, 60), (225, 100), (250, 50)):
        y = synthetic.render_text_small(y, "01/29 08/31", row, x,
                                        size=20, spacing=12)
    w = _seg_fn()(y, jnp.asarray(120))
    valid = np.asarray(w.valid)
    assert valid.sum() <= 4
    lefts = np.asarray(w.char_lefts)[valid]
    tops = np.asarray(w.char_tops)[valid]
    assert (lefts >= 0).all() and (lefts <= 428 - 11).all()
    assert (tops >= 0).all() and (tops <= 270 - 16).all()


def test_device_matches_host_on_fuzzed_frames():
    """Device/host parity under noise + random distractor text lines."""
    rng = np.random.RandomState(0)
    params = _params()
    for trial in range(4):
        vy = 120 + (trial % 4) * 10
        y = synthetic.render_frame("4111111111111111", y0=vy, offset=30,
                                   width=18.0, seed=trial, noise=2)
        for _ in range(rng.randint(0, 3)):
            row = rng.randint(170, 248)
            x = rng.randint(30, 200)
            txt = "".join(rng.choice(list("0123456789/"))
                          for _ in range(rng.randint(4, 9)))
            y = synthetic.render_text_small(y, txt, row, x, size=20,
                                            spacing=12)
        hg, _ = host_seg.best_expiry_seg(y, vy, params["slash_mlp"])
        w = _seg_fn()(y, jnp.asarray(vy))
        host_set = {(g.top, g.left, tuple(r.left for r in g.character_rects))
                    for g in hg}
        dev_set = set()
        for i in range(4):
            if np.asarray(w.valid)[i]:
                dev_set.add((int(np.asarray(w.top)[i]),
                             int(np.asarray(w.left)[i]),
                             tuple(int(x) for x in np.asarray(w.char_lefts)[i])))
        assert host_set == dev_set, (trial, host_set, dev_set)


def test_aggregate_slot_assignment_is_exclusive():
    """Two new windows matching the SAME slot in one frame: only the first
    merges into the slot (position/scores must not be summed); the second
    stays unconsumed and opens a fresh slot — the documented deviation from
    the reference's in-turn sweep (expiry_categorize.cpp:256-331)."""
    from cardio_dmz_tpu.scan.expiry_device import (MAX_SLOTS, MAX_WINDOWS,
                                                   ExpiryState, ExpiryWindows)

    # one active slot at (top=100, left=50)
    st = expiry_state_init()
    st = st._replace(
        active=jnp.asarray([True] + [False] * (MAX_SLOTS - 1)),
        top=jnp.asarray([100] + [0] * (MAX_SLOTS - 1), jnp.int32),
        left=jnp.asarray([50] + [0] * (MAX_SLOTS - 1), jnp.int32),
        scores=jnp.zeros((MAX_SLOTS, 5, 10), jnp.float32).at[0, 0, 3].set(1.0),
        recently_seen=jnp.asarray([3] + [0] * (MAX_SLOTS - 1), jnp.int32),
        total_seen=jnp.asarray([3] + [0] * (MAX_SLOTS - 1), jnp.int32),
    )
    # windows at top-8 and top+8: both within +-8 of the slot but 16 apart,
    # so within-frame coalescing does NOT merge them
    valid = jnp.asarray([True, True] + [False] * (MAX_WINDOWS - 2))
    tops = jnp.asarray([92, 108] + [0] * (MAX_WINDOWS - 2), jnp.int32)
    lefts = jnp.asarray([50, 50] + [0] * (MAX_WINDOWS - 2), jnp.int32)
    w = ExpiryWindows(valid=valid, top=tops, left=lefts,
                      char_tops=jnp.zeros((MAX_WINDOWS, 5), jnp.int32),
                      char_lefts=jnp.zeros((MAX_WINDOWS, 5), jnp.int32))
    scores = jnp.zeros((MAX_WINDOWS, 5, 10), jnp.float32)
    scores = scores.at[0, 0, 1].set(1.0).at[1, 0, 2].set(1.0)

    st2 = jax.jit(aggregate_windows)(st, w, scores)
    # slot 0 merged ONLY window 0: its top is EWMA'd toward 92, not 92+108
    assert int(st2.top[0]) == 92
    assert int(st2.left[0]) == 50
    # scores: decay*old + (1-decay)*window0 — window 1's digit-2 mass must
    # NOT appear in slot 0
    assert float(st2.scores[0, 0, 2]) == 0.0
    assert float(st2.scores[0, 0, 1]) > 0.0
    # window 1 opened a fresh slot at its own position
    fresh = np.asarray(st2.active) & (np.asarray(st2.top) == 108)
    assert fresh.any()
