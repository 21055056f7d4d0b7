"""Canny edge detection with aperture-7 Sobel inputs (cv/canny.cpp).

TPU-native dense reformulation of the reference's stack-based algorithm
(llcv_canny7_precomputed_sobel, cv/canny.cpp:58-336):

* magnitude = |dx| + |dy| (L1, as the reference uses)
* non-maximum suppression with the exact fixed-point tan(22.5°) sector logic
  (cv/canny.cpp:222-285), vectorized over the whole image
* hysteresis: edges = candidate pixels 8-connected to a strong pixel. The
  reference's grow-stack (cv/canny.cpp:294-325) computes exactly this set
  (its prev_flag/seed suppression only avoids redundant pushes). Two
  formulations:
  - `hysteresis_bounded` (serving default): a STATIC number of sweeps,
    each = one 8-neighbor dilate step + full horizontal and vertical
    run-flooding, evaluated BIT-PACKED (32 columns per uint32 word).
    Content-independent cost, no while_loop in the serving graph.
    Equivalence: after k sweeps every candidate whose run-alternation
    distance from a strong pixel is <= k is lit (see the function
    docstring for the argument + the measured margins behind
    DEFAULT_SWEEPS). The unpacked boolean twin
    (`hysteresis_bounded_unpacked`, whose run floods are prefix scans on
    CPU / log-doubling on TPU) is the tested equivalence oracle.
  - `hysteresis` (research/oracle): dilate-and-mask iterated to a fixed
    point with lax.while_loop — exact flood, data-dependent trip count.

Adaptive thresholds (llcv_adaptive_canny7_precomputed_sobel,
cv/canny.cpp:568-580): low = floor(mean(|dx|+|dy|)), high = floor(3 * low_f).
"""

import jax
import jax.numpy as jnp
from jax import lax

from .sobel import sobel7

CANNY_SHIFT = 15
TG22 = int(0.4142135623730950488016887242097 * (1 << CANNY_SHIFT) + 0.5)


def _shift2d(x, di, dj, fill=0):
    """x shifted so out[i, j] = x[i+di, j+dj], zero fill; supports batch."""
    out = x
    if di > 0:
        out = jnp.concatenate(
            [out[..., di:, :], jnp.full(out.shape[:-2] + (di, out.shape[-1]), fill, out.dtype)], axis=-2)
    elif di < 0:
        out = jnp.concatenate(
            [jnp.full(out.shape[:-2] + (-di, out.shape[-1]), fill, out.dtype), out[..., :di, :]], axis=-2)
    if dj > 0:
        out = jnp.concatenate(
            [out[..., :, dj:], jnp.full(out.shape[:-2] + (out.shape[-2], dj), fill, out.dtype)], axis=-1)
    elif dj < 0:
        out = jnp.concatenate(
            [jnp.full(out.shape[:-2] + (out.shape[-2], -dj), fill, out.dtype), out[..., :, :dj]], axis=-1)
    return out


def _dilate8(mask):
    m = mask
    out = m
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            if di == 0 and dj == 0:
                continue
            out = out | _shift2d(m, di, dj)
    return out


def canny_nms(dx, dy, low):
    """Per-pixel NMS candidate mask using the reference's integer sector
    logic (cv/canny.cpp:220-285). dx, dy: (..., H, W) int (int16-saturated
    values; int16 or int32 carrier). Returns bool."""
    # |dx|,|dy| are int16-saturated (<= 32768), so the sector comparisons fit
    # in uint32: y<<15 <= 2^30, x*TG22 <= 4.5e8, tg67x <= 2.6e9 < 2^32.
    adx = jnp.abs(dx.astype(jnp.int32))
    ady = jnp.abs(dy.astype(jnp.int32))
    x = adx.astype(jnp.uint32)
    y = ady.astype(jnp.uint32) << CANNY_SHIFT
    m = adx + ady  # int32 magnitude
    s = jnp.where((dx ^ dy) < 0, -1, 1)

    tg22x = x * jnp.uint32(TG22)
    tg67x = tg22x + ((x + x) << CANNY_SHIFT)

    # neighbor magnitudes (zero outside, matching the reference's zero
    # border) as SLICES of one padded plane: the _shift2d concat form
    # materialized 8 full int32 canvas copies (XLA does not fuse concat
    # into the compare fusion; slices of one shared pad do fuse — the
    # shifted-copy chain was ~2 ms-est of the camera step, hlo_hogs
    # --cycles round 5)
    h, w = m.shape[-2], m.shape[-1]
    mp = jnp.pad(m, [(0, 0)] * (m.ndim - 2) + [(1, 1), (1, 1)])

    def nb(di, dj):
        return lax.slice_in_dim(
            lax.slice_in_dim(mp, 1 + di, 1 + di + h, axis=-2),
            1 + dj, 1 + dj + w, axis=-1)

    m_l = nb(0, -1)
    m_r = nb(0, 1)
    m_u = nb(-1, 0)
    m_d = nb(1, 0)
    # diagonal: above col j-s, below col j+s
    m_ul = nb(-1, -1)
    m_ur = nb(-1, 1)
    m_dl = nb(1, -1)
    m_dr = nb(1, 1)
    m_diag_a = jnp.where(s == 1, m_ul, m_ur)  # above, col j-s
    m_diag_b = jnp.where(s == 1, m_dr, m_dl)  # below, col j+s

    horiz = y < tg22x
    vert = y > tg67x
    keep_h = (m > m_l) & (m >= m_r)
    keep_v = (m > m_u) & (m >= m_d)
    keep_d = (m > m_diag_a) & (m > m_diag_b)
    keep = jnp.where(horiz, keep_h, jnp.where(vert, keep_v, keep_d))
    return (m > low) & keep


def hysteresis(candidate, strong):
    """Flood strong through candidate via 8-connectivity to a fixed point.

    Exact flood (== the reference's grow-stack, cv/canny.cpp:294-325) with
    a data-dependent lax.while_loop trip count — the research/oracle form.
    Serving graphs use `hysteresis_bounded`."""
    edge0 = strong & candidate

    def cond(state):
        edge, changed = state
        return changed

    def body(state):
        edge, _ = state
        grown = (_dilate8(edge) & candidate) | edge
        return grown, jnp.any(grown != edge)

    edge, _ = lax.while_loop(cond, body, (edge0, jnp.any(edge0)))
    return edge


# Static sweep count for the serving-path hysteresis. Measured sweeps
# needed to reach the flood fixed point on 480x640-frame detection bands
# (api.detection_boxes geometry): 0 on every band that contains a card
# edge (perspective-jittered renders, background noise amplitudes 1-8 —
# the adaptive low threshold sits above the noise floor whenever a real
# edge is in the band, so NMS output is strong-seeded lines), and 0 on
# pure uniform noise (no strong seeds at all). Only card-free bands with
# LOW-amplitude texture percolate (measured up to 15 on synthetic ±8
# noise mazes); there the bounded form returns a strict subset of the
# flood (fewer weak hough votes — strictly conservative detection). See
# tests/test_ops.py::test_bounded_hysteresis_*.
DEFAULT_SWEEPS = 3


def _run_flood(edge, candidate, axis):
    """Light every candidate in any maximal candidate run (along `axis`)
    that contains a lit pixel. Two exact formulations, picked by backend:

    * TPU: `_run_flood_doubling` — lax.cummax lowers to ~1.4 ms/scan on
      detection-band shapes there; the doubling form is ~10 cheap i1
      vector ops per level.
    * CPU (tests, oracles): `_run_flood_scan` — two prefix scans per
      direction; the doubling form's unrolled shift chains inflate XLA:CPU
      compile of every camera graph by minutes, the scans compile fast.

    Both are tested against the same scalar oracle
    (tests/test_ops.py::test_run_flood_matches_scalar_oracle)."""
    if jax.default_backend() == "tpu":
        return _run_flood_doubling(edge, candidate, axis)
    return _run_flood_scan(edge, candidate, axis)


def _run_flood_scan(edge, candidate, axis):
    """Run flood via cummax/cummin prefix scans (see `_run_flood`)."""
    axis = axis % edge.ndim
    n = edge.shape[axis]
    shape = [1] * edge.ndim
    shape[axis] = n
    idx = jnp.arange(n, dtype=jnp.int32).reshape(shape)
    big = jnp.int32(n + 1)
    # forward: a seed at index <= i lights i iff no run break in between
    brk_f = lax.cummax(jnp.where(candidate, -1, idx), axis=axis)
    seed_f = lax.cummax(jnp.where(edge, idx, -1), axis=axis)
    lit_f = candidate & (seed_f > brk_f)
    # backward: a seed at index >= i
    brk_b = lax.cummin(jnp.where(candidate, big, idx), axis=axis,
                       reverse=True)
    seed_b = lax.cummin(jnp.where(edge, idx, big), axis=axis, reverse=True)
    lit_b = candidate & (seed_b < brk_b)
    return edge | lit_f | lit_b


def _run_flood_doubling(edge, candidate, axis):
    """Run flood via log-doubling bool propagation (see `_run_flood`).

    Invariants at level d (a power of two), proved by induction:

      R[i] = all of candidate[i-d+1 .. i]   (run cover ending at i)
      L[i] = all of candidate[i .. i+d-1]   (run cover starting at i)
      v[i] = some lit seed at j in [i-d+1, i] with candidate[j..i] all set
      u[i] = mirror of v toward higher indices

    so v[i] | u[i] converges to "i is in a candidate run containing a
    seed" after ceil(log2(n)) doublings. Exact (== the reference flood
    restricted to one axis)."""
    axis = axis % edge.ndim
    n = edge.shape[axis]

    def sh(x, s):
        """out[i] = x[i - s], False fill."""
        return _shift2d(x, -s if axis == edge.ndim - 2 else 0,
                        -s if axis == edge.ndim - 1 else 0)

    v = edge
    u = edge
    r_cov = candidate
    l_cov = candidate
    d = 1
    while d < n:
        v = v | (sh(v, d) & r_cov)
        u = u | (sh(u, -d) & l_cov)
        if 2 * d < n:
            r_cov = r_cov & sh(r_cov, d)
            l_cov = l_cov & sh(l_cov, -d)
        d *= 2
    return v | u


# ---------------------------------------------------------------------------
# bit-packed mask machinery: 32 columns per uint32 word. The hysteresis
# sweeps are pure boolean recurrences, so packing shrinks their data (and
# the vector op count) 32x; the recurrences below are the SAME ones the
# unpacked forms implement, evaluated per bit lane.

def _pack_bits(mask):
    """(..., H, W) bool -> (..., ceil(W/32), H) uint32. Bit k of word i
    holds column 32*i + k; pad columns are 0 (= not-candidate, matching
    the unpacked forms' zero fill).

    Layout note: the word axis goes on -2 (sublanes) and H stays on -1
    (lanes) — with only 4-8 words per detection canvas, words-on-lanes
    would waste the TPU's 128-lane vregs on padding; H-on-lanes keeps
    every packed op ~word_count/32 of the unpacked cost."""
    w = mask.shape[-1]
    nw = -(-w // 32)
    m = jnp.pad(mask, [(0, 0)] * (mask.ndim - 1) + [(0, nw * 32 - w)])
    v = m.reshape(m.shape[:-1] + (nw * 32,)).astype(jnp.uint32)
    # pairwise fold instead of a 32-wide weighted reduce: 5 strided
    # or+shift levels on halving data (the broadcast-multiply-reduce form
    # was ~2.7 ms-est of the camera step across its two canvases,
    # hlo_hogs --cycles round 5). Level s combines 2s-bit groups:
    # v[k] = v0[2k] | v0[2k+1] << s, so bit b of the final word i is
    # column 32*i + b, identical to the weighted sum.
    for s in (1, 2, 4, 8, 16):
        v = v[..., 0::2] | (v[..., 1::2] << jnp.uint32(s))
    return jnp.swapaxes(v, -1, -2)                        # (..., nw, H)


def _unpack_bits(words, w):
    """Inverse of _pack_bits: (..., nw, H) uint32 -> (..., H, w) bool.

    Kept as the flat 32-wide broadcast: a "cheaper" two-level u8 variant
    (split words into bytes, then test 8 bits per byte) was tried in
    round 5 and measured WORSE — its minor axis of 8 wastes 120 of the
    TPU's 128 vreg lanes, and XLA inserts ~300 MB/step of layout copies
    to repack (hlo_hogs bytes, camera @256)."""
    wt = jnp.swapaxes(words, -1, -2)                     # (..., H, nw)
    bits = (wt[..., :, None] >> jnp.arange(32, dtype=jnp.uint32)) & 1
    return (bits.reshape(wt.shape[:-1] + (-1,)) != 0)[..., :w]


def _wshift(words, k):
    """Word-granular column shift: out[i] = words[i - k], zero fill.
    Words live on axis -2."""
    return _shift2d(words, -k, 0)


def _shift_cols_packed(words, s):
    """Bit-granular column shift: out bit c = in bit (c - s), zero fill.
    s: static python int (any sign/magnitude)."""
    if s == 0:
        return words
    if s > 0:
        q, r = divmod(s, 32)
        if r == 0:
            return _wshift(words, q)
        return (_wshift(words, q) << jnp.uint32(r)) | \
            (_wshift(words, q + 1) >> jnp.uint32(32 - r))
    q, r = divmod(-s, 32)
    if r == 0:
        return _wshift(words, -q)
    return (_wshift(words, -q) >> jnp.uint32(r)) | \
        (_wshift(words, -q - 1) << jnp.uint32(32 - r))


def _dilate8_packed(words):
    # rows live on axis -1 in the packed layout
    h = words | _shift_cols_packed(words, 1) | _shift_cols_packed(words, -1)
    return h | _shift2d(h, 0, 1) | _shift2d(h, 0, -1)


def _flood_packed(edge, cand, axis, n):
    """The `_run_flood_doubling` recurrence on packed words. axis=-1
    floods along image COLUMNS (bit-granular shifts, n = true column
    count); axis=-2 floods along image ROWS (which live on the packed
    layout's last axis, n = row count)."""
    def sh(x, s):
        if axis == -1:
            return _shift_cols_packed(x, s)
        return _shift2d(x, 0, -s)

    v, u = edge, edge
    r_cov, l_cov = cand, cand
    d = 1
    while d < n:
        v = v | (sh(v, d) & r_cov)
        u = u | (sh(u, -d) & l_cov)
        if 2 * d < n:
            r_cov = r_cov & sh(r_cov, d)
            l_cov = l_cov & sh(l_cov, -d)
        d *= 2
    return v | u


def hysteresis_bounded(candidate, strong, sweeps=DEFAULT_SWEEPS):
    """Hysteresis with a STATIC sweep count (content-independent cost).

    Each sweep: one 8-neighbor dilate-and-mask step (crosses diagonal-only
    and single-pixel links), then full horizontal and vertical candidate
    run-floods (a lit pixel lights its entire maximal run in one step).

    Equivalence argument: model the candidate set as a graph whose nodes
    are maximal horizontal/vertical candidate runs, with edges between
    8-adjacent runs. One sweep advances the lit set by at least one whole
    node along every such edge, so after k sweeps every candidate whose
    run-alternation distance from a strong pixel is <= k is lit. The
    result is always sandwiched: strong <= bounded <= exact flood, and
    equals the flood whenever every candidate component's run-distance
    from its strong seeds is <= sweeps. On the detection-band input
    distribution (bands containing a card edge) the measured distance is
    0 — NMS output there is strong-seeded lines — so DEFAULT_SWEEPS is
    pure margin; only card-free low-amplitude-texture bands can exceed it,
    where the bounded form degrades conservatively (subset of the flood).
    The regression tests assert flood-equality on rendered camera bands
    and the sandwich property on adversarial percolation mazes.

    Implementation: the sweeps run BIT-PACKED (32 columns per uint32
    word, `_pack_bits`) — the same dilate/flood recurrences on 32x less
    data; `tests/test_ops.py::test_hysteresis_packed_equals_unpacked`
    pins equality with the unpacked boolean form.
    """
    w = candidate.shape[-1]
    h = candidate.shape[-2]
    cand = _pack_bits(candidate)
    edge = _pack_bits(strong & candidate)

    def body(_, edge):
        edge = (_dilate8_packed(edge) & cand) | edge
        edge = _flood_packed(edge, cand, axis=-1, n=w)
        edge = _flood_packed(edge, cand, axis=-2, n=h)
        return edge

    edge = lax.fori_loop(0, sweeps, body, edge, unroll=True)
    return _unpack_bits(edge, w)


def hysteresis_bounded_unpacked(candidate, strong, sweeps=DEFAULT_SWEEPS):
    """The boolean-mask form of `hysteresis_bounded` (same recurrences,
    no packing) — kept as the equivalence oracle for the packed form."""
    edge = strong & candidate

    def body(_, edge):
        edge = (_dilate8(edge) & candidate) | edge
        edge = _run_flood(edge, candidate, axis=-1)
        edge = _run_flood(edge, candidate, axis=-2)
        return edge

    return lax.fori_loop(0, sweeps, body, edge, unroll=True)


def canny7_precomputed_sobel(dx, dy, low, high, sweeps=DEFAULT_SWEEPS):
    """Full canny given precomputed aperture-7 sobel dx/dy.

    Returns uint8 edge map (255 = edge), matching
    llcv_canny7_precomputed_sobel output (cv/canny.cpp:327-335).
    low/high are the integer thresholds (already floored).

    sweeps: static hysteresis sweep count (`hysteresis_bounded`);
    sweeps=None selects the exact while_loop flood (`hysteresis`) for
    research/oracle use. dx/dy accept int16 carriers (values are
    int16-saturated either way); low/high accept broadcastable vectors
    (per-row/per-column thresholds for packed band canvases).
    """
    m = jnp.abs(dx.astype(jnp.int32)) + jnp.abs(dy.astype(jnp.int32))
    candidate = canny_nms(dx, dy, low)
    strong = candidate & (m > high)
    if sweeps is None:
        edge = hysteresis(candidate, strong)
    else:
        edge = hysteresis_bounded(candidate, strong, sweeps)
    return (edge * jnp.uint8(255)).astype(jnp.uint8)


def adaptive_canny7(image, dx=None, dy=None, sweeps=DEFAULT_SWEEPS):
    """llcv_adaptive_canny7_precomputed_sobel (cv/canny.cpp:568-580).

    image: (..., H, W) uint8. dx/dy optional precomputed sobel7 outputs.
    Returns (edges_u8, dx, dy) — dx/dy are reused by the Hough stage.
    sweeps: see canny7_precomputed_sobel (None = exact flood).
    """
    if dx is None:
        dx = sobel7(image, dx=True, dy=False)
    if dy is None:
        dy = sobel7(image, dx=False, dy=True)
    h, w = image.shape[-2], image.shape[-1]
    n = h * w
    mean = (jnp.sum(jnp.abs(dx), axis=(-2, -1)) +
            jnp.sum(jnp.abs(dy), axis=(-2, -1))).astype(jnp.float64 if jax.config.jax_enable_x64 else jnp.float32) / n
    low = jnp.floor(mean).astype(jnp.int32)
    high = jnp.floor(3.0 * mean).astype(jnp.int32)
    if low.ndim > 0:
        low = low[..., None, None]
        high = high[..., None, None]
    edges = canny7_precomputed_sobel(dx, dy, low, high, sweeps=sweeps)
    return edges, dx, dy


def canny7(image, low, high, sweeps=DEFAULT_SWEEPS):
    """llcv_canny7 (cv/canny.cpp:338-352) with explicit thresholds."""
    dx = sobel7(image, dx=True, dy=False)
    dy = sobel7(image, dx=False, dy=True)
    return canny7_precomputed_sobel(dx, dy, int(low), int(high),
                                    sweeps=sweeps)
