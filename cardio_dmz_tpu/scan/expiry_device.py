"""Expiry segmentation + categorization — fully jittable device path.

The reference's expiry pipeline is deeply sequential (sorts, greedy masks,
recursion — scan/expiry_seg.cpp:386-704). This module re-expresses every
stage under static shapes so the WHOLE card read (PAN + expiry) is one XLA
program that vmaps over streams:

* stripe selection      -> dense candidate scoring + 3x iterated argmax
* greedy non-overlap    -> iterated parallel local-maxima selection over the
                           interval graph (provably equal to take-best-first)
* grouping              -> run-length labeling on the accepted-rect sequence
* whitespace stripping  -> (start, count) contraction loop, bounded
* regrid                -> dense (spacing x phase) grid scoring
* char trimming         -> fixed-bound shave loops, vmapped over chars
* slash anchoring       -> batched slash-MLP over all window middles
* cross-frame merge     -> fixed 4-slot group table with masked EWMA

Fixed caps (all generous vs real cards): 3 stripes, 4 groups/frame,
16 chars/group, 4 MM/YY windows/frame, 4 aggregated slots.

Host oracle: expiry_seg_host.py / expiry_categorize_host.py (tested
equivalent on synthetic frames).
"""

import typing

import jax
import jax.numpy as jnp
from jax import lax

from ..constants import (
    CARD_HEIGHT,
    CARD_WIDTH,
    EXPIRY_DECAY_FACTOR,
    EXPIRY_MIN_STABILITY,
    NUMBER_HEIGHT,
)
from ..models import apply_expiry_conv_mm
from ..ops import bilateral3x3, equalize_hist, morph_grad3_2d_cross_u8
from ..ops.select import coarse_blocks

SMALL_W = 9
SMALL_H = 15
TRIM_W = 11
TRIM_H = 16
BAND_H = SMALL_H + 2          # 17
MAX_STRIPES = 3
MAX_GROUPS = 4                # processed local groups per frame
MAX_CHARS = 16                # chars per group
MAX_WINDOWS = 4               # emitted MM/YY windows per frame
MAX_SLOTS = 4                 # aggregated cross-frame group slots
N_RECT_POS = CARD_WIDTH - SMALL_W + 1   # 420 sliding rect positions
EXPANDED_W = 18               # char trim crop (max char_width 14 + 4)
EXPANDED_H = 21               # height 17 + 4
V_ALLOW = TRIM_H // 2         # coalescing tolerances
H_ALLOW = TRIM_W // 2
MIN_SEEN = 3


class ExpiryWindows(typing.NamedTuple):
    """Per-frame MM/YY candidate windows (fixed MAX_WINDOWS slots)."""
    valid: jnp.ndarray       # (W,) bool
    top: jnp.ndarray         # (W,) int32 group top (min char top)
    left: jnp.ndarray        # (W,) int32 first char left
    char_tops: jnp.ndarray   # (W, 5) int32
    char_lefts: jnp.ndarray  # (W, 5) int32


def no_windows() -> ExpiryWindows:
    """An all-invalid window set — the empty GroupedRectsList. Also the
    permanent value of FrameResult.name_groups (the reference's name
    supergroup path is disabled, expiry_seg.cpp:544-548)."""
    zi = jnp.zeros((MAX_WINDOWS,), jnp.int32)
    return ExpiryWindows(
        valid=jnp.zeros((MAX_WINDOWS,), bool), top=zi, left=zi,
        char_tops=jnp.zeros((MAX_WINDOWS, 5), jnp.int32),
        char_lefts=jnp.zeros((MAX_WINDOWS, 5), jnp.int32))


class ExpiryState(typing.NamedTuple):
    """Cross-frame aggregated group table (the GroupedRectsList role)."""
    active: jnp.ndarray      # (S,) bool
    top: jnp.ndarray         # (S,) int32
    left: jnp.ndarray        # (S,) int32
    scores: jnp.ndarray      # (S, 5, 10) f32
    recently_seen: jnp.ndarray  # (S,) int32
    total_seen: jnp.ndarray  # (S,) int32


def expiry_state_init() -> ExpiryState:
    z = jnp.zeros((MAX_SLOTS,), jnp.int32)
    return ExpiryState(
        active=jnp.zeros((MAX_SLOTS,), bool),
        top=z, left=z,
        scores=jnp.zeros((MAX_SLOTS, 5, 10), jnp.float32),
        recently_seen=z, total_seen=z,
    )


# ---------------------------------------------------------------------------
# stage A: scharr |dx| below the PAN (ROI-clamped like the reference)
# ---------------------------------------------------------------------------

# Rows above this never contribute: expiry runs only on non-upside-down
# frames (vseg_y >= 121 at the flip cutoff, frame.cpp:22) so y_start =
# vseg_y + 27 >= 148 and every group band top (g_top - 2) >= 140. The whole
# seg path therefore works on a static 136-row lower band — all the one-hot
# row contractions downstream shrink 2x vs contracting over the full 270
# rows. Row coordinates stay ABSOLUTE throughout; only the band selects are
# band-relative.
_BAND_ROWS = 136
_SCHARR_BASE = CARD_HEIGHT - _BAND_ROWS


def scharr_dx_abs_below(y_img, y_start):
    """expiry_seg.cpp:714-739 with the ROI realized as masking + boundary
    clamp at the dynamic row y_start (= vseg_y + 27, always >= 142).

    Returns the (136, 428) int16 lower band (rows [_SCHARR_BASE, 270) of
    the card, absolute row r at band index r - _SCHARR_BASE). int16 on
    purpose: values are <= 3*(255+255) + 10*255 = 4080, and the plane and
    its maskings are materialized several times per step — int32 cost
    ~0.4 GB/step @256 streams (hlo_hogs round 5)."""
    xi = y_img[_SCHARR_BASE:].astype(jnp.int16)
    left = jnp.concatenate([xi[:, :1], xi[:, :-1]], axis=1)
    right = jnp.concatenate([xi[:, 1:], xi[:, -1:]], axis=1)
    d = jnp.abs(right - left)
    rows = _SCHARR_BASE + jnp.arange(_BAND_ROWS)[:, None]
    d = jnp.where(rows >= y_start, d, 0)
    up = jnp.concatenate([d[:1], d[:-1]], axis=0)
    up = jnp.where(rows <= y_start, d, up)  # clamp at the ROI top
    dn = jnp.concatenate([d[1:], d[-1:]], axis=0)
    out = 3 * (up + dn) + 10 * d
    return jnp.where(rows >= y_start, out, 0)


# ---------------------------------------------------------------------------
# stage B/C: stripe scoring + top-3 selection
# ---------------------------------------------------------------------------

def select_stripes(sobel, y_start):
    """expiry_seg.cpp:745-871. sobel: (136, 428) lower band from
    scharr_dx_abs_below. Returns (bases (3,), sums (3,), valid (3,)) —
    bases in absolute card rows."""
    left_edge = SMALL_W * 3
    right_edge = (CARD_WIDTH * 2) // 3
    ls = jnp.pad(jnp.sum(sobel[:, left_edge:right_edge].astype(jnp.int32),
                         axis=1),
                 (_SCHARR_BASE, 0))                       # (270,) int32

    first_base = y_start + 1
    last_base = CARD_HEIGHT - (SMALL_H + 1)

    # stripe_line[b, k] = ls[b + k] for k < 15: k static shifted copies
    # (rolls lower to slice+concat) instead of a (270, 15) gather, which
    # lowers to per-lane loads under the stream vmap
    idx = jnp.arange(CARD_HEIGHT)[:, None] + jnp.arange(SMALL_H)[None, :]
    line = jnp.stack([jnp.roll(ls, -k) for k in range(SMALL_H)], axis=1)
    line = jnp.where(idx < CARD_HEIGHT, line, 0)
    totals = jnp.sum(line, axis=1)
    thr = jnp.max(line, axis=1) // 2

    top_ok = (line[:, 0] + line[:, 1]) >= thr
    bot_ok = (line[:, SMALL_H - 2] + line[:, SMALL_H - 1]) >= thr
    # interior: bad iff line[k] < thr and line[k+1] < thr for any k in 1..12
    interior_bad = jnp.zeros(CARD_HEIGHT, bool)
    for k in range(1, SMALL_H - 2):
        interior_bad = interior_bad | ((line[:, k] < thr) &
                                       (line[:, k + 1] < thr))

    bases = jnp.arange(CARD_HEIGHT)
    valid = ((bases >= first_base) & (bases < last_base) &
             top_ok & bot_ok & ~interior_bad)
    masked_totals = jnp.where(valid, totals, -1)

    sel_base = jnp.zeros((MAX_STRIPES,), jnp.int32)
    sel_sum = jnp.zeros((MAX_STRIPES,), jnp.int32)
    sel_ok = jnp.zeros((MAX_STRIPES,), bool)
    for s in range(MAX_STRIPES):
        best = jnp.argmax(masked_totals)
        ok = masked_totals[best] > -1
        sel_base = sel_base.at[s].set(best.astype(jnp.int32))
        sel_sum = sel_sum.at[s].set(totals[best].astype(jnp.int32))
        sel_ok = sel_ok.at[s].set(ok)
        overlap = jnp.abs(bases - best) < SMALL_H
        masked_totals = jnp.where(overlap, -1, masked_totals)
    return sel_base, sel_sum, sel_ok


# ---------------------------------------------------------------------------
# stage D: per-stripe character group extraction
# ---------------------------------------------------------------------------

def _nonoverlap_select(rect_sums, cand):
    """Greedy take-best-first over the 9-wide interval graph, as iterated
    parallel local-maxima (equivalent result, O(rounds) fused sweeps
    instead of a 420-step serial loop).

    rect_sums: (420,) int32; cand: (420,) bool. Returns accepted (420,) bool.
    """
    # strict total order: sum desc, then left asc (deterministic tie-break).
    # rect sums <= 4080*9*17 ~ 6.2e5, so sum*1024 + 1023 fits int32.
    key = rect_sums.astype(jnp.int32) * 1024 + (1023 - jnp.arange(N_RECT_POS))
    neg = jnp.int32(-1)

    win = 2 * SMALL_W - 1  # rects within +-8 positions overlap

    def window_max(k):
        # single fused sliding-max over the overlap window
        return lax.reduce_window(
            k, neg, lax.max, window_dimensions=(win,), window_strides=(1,),
            padding=((SMALL_W - 1, SMALL_W - 1),))

    def body(_, state):
        accepted, alive = state
        k = jnp.where(alive, key, neg)
        is_max = alive & (k == window_max(k)) & (k > neg)
        accepted = accepted | is_max
        # kill everything overlapping a newly accepted rect (sliding any)
        killed = lax.reduce_window(
            is_max.astype(jnp.int32), 0, lax.max, window_dimensions=(win,),
            window_strides=(1,),
            padding=((SMALL_W - 1, SMALL_W - 1),)) > 0
        alive = alive & ~killed
        return accepted, alive

    # Fixed round count instead of run-to-convergence: each round accepts
    # every current local maximum, so R rounds cover greedy chains of
    # depth R. Card text produces chains of depth 2-4; 8 rounds only
    # truncates pathological noise (conservatively: fewer candidate rects),
    # and a fixed unrolled bound keeps the vmapped program free of global
    # convergence sync (a rolled while-loop cost ~1 ms/step @64 streams).
    accepted0 = jnp.zeros((N_RECT_POS,), bool)
    accepted, _ = lax.fori_loop(0, 8, body, (accepted0, cand), unroll=True)
    return accepted


def _whitespace_strip(sums, start, count):
    """strip_group_white_space (expiry_seg.cpp:107-133) on a contiguous
    (start, count) run within fixed `sums`. Returns (start, count).

    Fixed-bound loop (at most n-5 removals) with one-hot reads: indexing
    sums[traced_scalar] would lower to a per-lane gather per iteration
    under the stripe/group vmaps."""
    n = sums.shape[0]
    iota = jnp.arange(n)

    def at(i):
        return jnp.sum(jnp.where(iota == i, sums, 0))

    def body(_, sc):
        s, c = sc
        idx = s + (c - 4) // 2
        mid = (at(idx) + at(jnp.clip(idx + 1, 0, n - 1)) +
               at(jnp.clip(idx + 2, 0, n - 1)) +
               at(jnp.clip(idx + 3, 0, n - 1))) // 4
        thr = (mid.astype(jnp.float32) * 0.8).astype(jnp.int32)
        first_dim = at(s) < thr
        last_dim = at(jnp.clip(s + c - 1, 0, n - 1)) < thr
        go = (c > 5) & (first_dim | last_dim)
        s2 = jnp.where(go & first_dim, s + 1, s)
        c2 = jnp.where(go, c - 1, c)
        return s2, c2

    return lax.fori_loop(0, n - 5, body, (start, count), unroll=True)


def _onehot_read(vec, idx):
    """vec[idx] for a small batch of indices as dense where+reduce — an
    index gather lowers to a while-looped load under the stream vmap."""
    iota = jnp.arange(vec.shape[0])
    return jnp.sum(jnp.where(idx[..., None] == iota, vec, 0), axis=-1)


def _regrid(col_sums_full, bounds_left, bounds_width, n_min=11, n_max=15):
    """regrid_group grid search + regridded sums (expiry_seg.cpp:174-241).

    col_sums_full: (428,) int column sums over the group's rows.
    Returns (char_lefts (MAX_CHARS,), char_sums, n_chars, spacing).

    Gridline sums are computed in ABSOLUTE columns via strided-reshape
    residue sums — no dynamic roll (a traced-shift jnp.roll lowers to a
    while-looped gather, ~1 ms/step @64 streams): the gridlines for
    (spacing s, phase p) are exactly the columns ≡ (bounds_left + p) mod s
    inside the masked bounds window, and p < s guarantees no gridline
    precedes bounds_left + p.
    """
    rel = jnp.arange(CARD_WIDTH)
    in_bounds = (rel >= bounds_left) & (rel < bounds_left + bounds_width)
    cs_abs = jnp.where(in_bounds, col_sums_full, 0)
    group_sum = jnp.sum(cs_abs).astype(jnp.float32)
    csum_abs = jnp.concatenate([jnp.zeros((1,), cs_abs.dtype),
                                jnp.cumsum(cs_abs)])     # (429,)
    min_lines = bounds_width // n_min

    phases = jnp.arange(n_max)                           # (15,)
    spacings = jnp.arange(n_min, n_max + 1)              # (5,)
    line_sum_rows = []
    for s_ in range(n_min, n_max + 1):
        pad = (-CARD_WIDTH) % s_
        residue_sums = jnp.pad(cs_abs, (0, pad)).reshape(-1, s_).sum(0)
        res = (bounds_left + phases) % s_
        line_sum_rows.append(_onehot_read(residue_sums, res))
    line_sum = jnp.stack(line_sum_rows).astype(jnp.float32)  # (5, 15)

    n_lines = jnp.where(
        phases[None, :] < bounds_width,
        (bounds_width - phases[None, :] + spacings[:, None] - 1)
        // spacings[:, None], 0)
    avg = line_sum / jnp.maximum(n_lines, 1)
    eff = avg * min_lines
    ratio = eff / jnp.maximum(group_sum - eff, 1e-6)
    phase_ok = phases[None, :] < spacings[:, None]
    ratio = jnp.where(phase_ok, ratio, jnp.inf)
    flat = jnp.argmin(ratio.reshape(-1))   # spacing-major, phase-minor order
    si = flat // n_max
    phase = (flat % n_max).astype(jnp.int32)
    spacing = (n_min + si).astype(jnp.int32)

    # regridded rects: off = phase + k*spacing while off + 1 < bounds_width
    offs = phase + jnp.arange(MAX_CHARS) * spacing
    char_valid = offs + 1 < bounds_width
    seg_end = jnp.minimum(offs + spacing, bounds_width)
    char_sums = (_onehot_read(csum_abs, bounds_left + seg_end) -
                 _onehot_read(csum_abs, bounds_left + offs + 1))
    char_sums = jnp.where(char_valid, char_sums, 0)
    char_lefts = bounds_left + offs + 1
    n_chars = jnp.sum(char_valid.astype(jnp.int32))
    return char_lefts.astype(jnp.int32), char_sums.astype(jnp.int32), \
        n_chars, spacing


_TRIM_WIDE = 16 + EXPANDED_W          # 34: coarse window width for trimming


def _trim_char(wide, rem, char_left, group_top, char_width):
    """optimize_character_rects inner loop for one char
    (expiry_seg.cpp:255-331). Returns (top, left, valid).

    wide: (21, 34) = band columns [16q, 16q + 34) around the char, where
    l0 = char_left - 2 = 16q + rem; the char's 18 columns sit at
    [rem, rem + 18) inside `wide`. Operating directly on the 16-aligned
    coarse window (masks shifted by rem) avoids materializing per-char
    crops entirely: the fine-selection matmul/stack forms this replaces
    cost 4.3 GB (chained shift-stack pads) / ~6 ms (batched-tiny-dot
    layout copies) per step @256 streams."""
    cw = char_width + 4          # dynamic, <= 18
    ch = EXPANDED_H              # height always 17 + 4
    left0 = char_left - 2
    top0 = group_top - 2
    valid = (left0 >= 0) & (left0 + cw <= CARD_WIDTH) & \
        (top0 + ch <= CARD_HEIGHT) & (top0 >= 0)

    # column u of `wide` is crop column u - rem
    cols_iota = jnp.arange(_TRIM_WIDE) - rem          # crop-relative index
    col_in = (cols_iota >= 0) & (cols_iota < cw)
    # int16 carriers end-to-end: band values (<= 4080), normalized values
    # (<= 255) and the shave sums (<= 34*255) are all small integers, so
    # int16 halves every materialized trim tensor over the
    # (streams x stripes x chars) batch; only the normalize multiply
    # runs in f32 (on the same integer inputs -> identical rounding).
    crop0 = jnp.where(col_in[None, :], wide, 0)       # int16
    m = jnp.max(jnp.abs(crop0.astype(jnp.int32)))
    mf = jnp.maximum(m.astype(jnp.float32), 1e-6)
    crop = jnp.round(crop0.astype(jnp.float32) * (255.0 / mf)
                     ).astype(jnp.int16)
    crop = jnp.where(m > 0, crop, crop0)
    crop = jnp.where(crop > 100, crop, 0)

    # Edge-shave loops, evaluated as a REACHABILITY DP instead of
    # sequential traced reads. The loop only ever compares the current
    # END sums (col_sums[lc] vs col_sums[rc]) and drops one end, so after
    # t steps the state is (lc = a, rc = cw-1-(t-a)): at most 8 left
    # positions x 8 right drops. Precompute every end-vs-end comparison
    # once (two small one-hot matmuls for the dynamic ends), then advance
    # an 8-wide boolean reach vector through the 7 static steps — the
    # per-step traced one-hot reads this replaces were ~24 select+reduce
    # fusions over the (streams x stripes x chars) batch, the two
    # heaviest expiry lines in the round-5 camera HLO (hlo_hogs --cycles:
    # ~3.4 ms-est combined). Bit-exact: the comparison sequence and
    # tie-breaks are identical by induction on t.
    n_sh = EXPANDED_W - TRIM_W + 1                        # 8 states
    col_sums = jnp.sum(crop, axis=0)
    sh_iota = jnp.arange(n_sh)
    # left8[a] = col_sums at crop col a; right8[d] = at crop col cw-1-d
    oh_l = cols_iota[None, :] == sh_iota[:, None]
    oh_r = cols_iota[None, :] == (cw - 1 - sh_iota)[:, None]
    # explicit where+reduce (a tiny per-char matvec would lower to
    # batched-tiny-dot layout copies under the stream vmap)
    left8 = jnp.sum(jnp.where(oh_l, col_sums[None, :], 0), axis=-1)
    right8 = jnp.sum(jnp.where(oh_r, col_sums[None, :], 0), axis=-1)
    C = left8[:, None] <= right8[None, :]                 # (a, d)
    T_col = cw - TRIM_W                                   # shaves needed
    reach = sh_iota == 0
    for t in range(EXPANDED_W - TRIM_W):
        gl = C[sh_iota, jnp.clip(t - sh_iota, 0, n_sh - 1)]  # go-left at (a,t)
        stepped = (jnp.concatenate([jnp.zeros((1,), bool),
                                    (reach & gl)[:-1]]) |
                   (reach & ~gl))
        reach = jnp.where(t < T_col, stepped, reach)
    lc = jnp.sum(jnp.where(reach, sh_iota, 0)).astype(jnp.int32)
    shaves = jnp.clip(T_col, 0, EXPANDED_W - TRIM_W)
    rc = (cw - 1 - (shaves - lc)).astype(jnp.int32)

    # row shave: ch is STATIC (21 -> always 5 shaves), and the end rows
    # are static indices (tops 0..5, bottoms 15..20) — plain slices
    row_mask = (cols_iota >= lc) & (cols_iota <= rc)
    row_sums = jnp.sum(jnp.where(row_mask[None, :], crop, 0), axis=1)
    n_rs = EXPANDED_H - TRIM_H + 1                        # 6 states
    rs_iota = jnp.arange(n_rs)
    # bot_rev[d] = row_sums[EXPANDED_H - 1 - d], built from static
    # 1-element slices: a ::-1 reverse here crashes the TPU fusion
    # emitter (jellyfish ReverseInput window check, libtpu F-check)
    bot_rev = jnp.concatenate(
        [row_sums[EXPANDED_H - 1 - d:EXPANDED_H - d] for d in range(n_rs)])
    C2 = row_sums[:n_rs][:, None] <= bot_rev[None, :]
    reach2 = rs_iota == 0
    for t in range(EXPANDED_H - TRIM_H):
        gl = C2[rs_iota, jnp.clip(t - rs_iota, 0, n_rs - 1)]
        reach2 = (jnp.concatenate([jnp.zeros((1,), bool),
                                   (reach2 & gl)[:-1]]) |
                  (reach2 & ~gl))
    tr = jnp.sum(jnp.where(reach2, rs_iota, 0)).astype(jnp.int32)
    return (top0 + tr).astype(jnp.int32), (left0 + lc).astype(jnp.int32), valid


def slash_probs_conv(slash_params, bands, roffs, lefts):
    """P(slash) for every candidate window, without materializing crops.

    is_slash (expiry_seg.cpp:29-54) evaluates the slash MLP on an 11x16
    sobel crop / 255. The MLP's first layer is linear in the crop, so the
    per-window hidden pre-activations are computed as two MXU
    contractions — no gathers, no per-window dynamic slices (both lower to
    per-lane loads under the stream vmap; measured 2.4 ms -> 0.96 ms @64):

      1. columns: contract the band against ONE combined one-hot
         oh[w, j, c] = (c == left_w + j)  ->  A[w, j, r] = band[r, left_w+j].
         Folding the column shift j into the one-hot (instead of stacking
         11 shifted band copies and one-hotting only the left position)
         matters: XLA rewrites the 11-way stack into a CHAIN of full-size
         concat fusions — 11 x 148 MB/step @256, the largest HBM hog in
         the round-4 scan HLO (hlo_hogs). The combined one-hot is one
         broadcast-compare fusion (~350 MB) consumed by one shared-
         contraction matmul; a two-level 16-aligned selection was also
         tried and lost (its fine stage is a per-window tiny dot, which
         lowers to batched-tiny-dot layout copies — 12.2 vs 10.1 ms/step).
      2. rows + weights: one matmul against the 6 row-offset-shifted
         copies of the first-layer weights (row offsets are only 0..5),
         then a one-hot contraction picks the window's offset.

    bands: (3, 21, 428) int; roffs/lefts: (3, K) window positions relative
    to the band (roffs in [0, 6)). Returns (3, K) slash probabilities.
    """
    n_s, band_h, band_w = bands.shape
    n_r = band_h - TRIM_H + 1                        # 6 row offsets
    k_win = roffs.shape[-1]
    w1 = (slash_params["hidden_w"].reshape(-1, TRIM_H, TRIM_W) / 255.0)

    # stage 1: A[s, w, j, r] = band[s, r, left + j] via the combined
    # one-hot (same bf16 band values as the stacked form -> bit-identical:
    # every output is exactly one 1.0 * value product)
    l0 = jnp.clip(lefts, 0, band_w - TRIM_W)          # (3, K)
    oh = ((l0[:, :, None, None] + jnp.arange(TRIM_W)[None, None, :, None])
          == jnp.arange(band_w)).astype(jnp.bfloat16)  # (3, K, 11, 428)
    A = jnp.einsum("swjc,src->swjr", oh, bands.astype(jnp.bfloat16),
                   preferred_element_type=jnp.bfloat16)  # (3, K, 11, 21)

    # stage 2: TW[ro*80+o, j*21+r] = w1[o, r-ro, j]; one matmul for all 6
    # row offsets, then select the window's offset.
    tw = jnp.stack([jnp.pad(w1, ((0, 0), (s, n_r - 1 - s), (0, 0)))
                    for s in range(n_r)])             # (6, 80, 21, 11)
    tw = tw.transpose(0, 1, 3, 2).reshape(n_r * w1.shape[0],
                                          TRIM_W * band_h).astype(jnp.bfloat16)
    h_all = jnp.einsum("swk,ok->swo", A.reshape(n_s, k_win, -1), tw,
                       preferred_element_type=jnp.float32)  # (3, K, 480)
    oh_r = (jnp.clip(roffs, 0, n_r - 1)[..., None]
            == jnp.arange(n_r)).astype(jnp.float32)       # (3, K, 6)
    h_pre = jnp.einsum("swr,swro->swo", oh_r,
                       h_all.reshape(n_s, k_win, n_r, -1))
    h = jnp.tanh(h_pre + slash_params["hidden_b"])
    logits = h @ slash_params["logistic_w"].T + slash_params["logistic_b"]
    return jax.nn.softmax(logits, axis=-1)[..., 0]


def _process_stripe(sobel, base, stripe_sum, stripe_valid):
    """find_character_groups_for_stripe (expiry_seg.cpp:386-704) for one
    stripe. Returns per-group regridded char geometry:
    (char_lefts (G, 16), group_top (G,), char_width (G,), alive (G, 16));
    trimming + slash anchoring happen at the top level in flat batches."""
    base = jnp.clip(base, 1, CARD_HEIGHT - BAND_H)
    # rows-only crop as a one-hot contraction (dynamic_slice of the shared
    # sobel serializes under the stripe vmap; scharr values < 2^24 so the
    # f32 selection products are exact). Selects over the 136-row band
    # (valid bases are always >= y_start + 1 >= 149 > _SCHARR_BASE).
    base_rel = jnp.clip(base - _SCHARR_BASE, 0, _BAND_ROWS - BAND_H)
    rsel = ((base_rel + jnp.arange(BAND_H))[:, None]
            == jnp.arange(_BAND_ROWS)[None, :]).astype(jnp.float32)
    band = jnp.einsum("xr,rc->xc", rsel,
                      sobel.astype(jnp.float32)).astype(jnp.int32)
    col_sums = jnp.sum(band, axis=0)
    csum = jnp.concatenate([jnp.zeros((1,), col_sums.dtype),
                            jnp.cumsum(col_sums)])
    rect_sums = (csum[SMALL_W:] - csum[:-SMALL_W]).astype(jnp.int32)  # (420,)

    rect_avg = (stripe_sum.astype(jnp.int32) * SMALL_W) // CARD_WIDTH
    dim_thr = (rect_avg // 5).astype(jnp.int32)
    cand = rect_sums > dim_thr
    n_cand = jnp.sum(cand.astype(jnp.int32))
    mean = jnp.sum(jnp.where(cand, rect_sums, 0)).astype(jnp.float32) / \
        jnp.maximum(n_cand, 1)
    sum_thr = 0.8 * mean
    cand = cand & (rect_sums.astype(jnp.float32) > sum_thr) & stripe_valid

    accepted = _nonoverlap_select(rect_sums, cand)

    # shared by every group of this stripe: regrid rows [base-1, base+16) —
    # only the column sums are used, so select rows with one contraction
    rbase_rel = jnp.clip(base - 1 - _SCHARR_BASE, 0, _BAND_ROWS - BAND_H)
    rsel2 = ((rbase_rel + jnp.arange(BAND_H))[:, None]
             == jnp.arange(_BAND_ROWS)[None, :]).astype(jnp.float32)
    col_sums_grp = jnp.einsum("xr,rc->c", rsel2,
                              sobel.astype(jnp.float32)).astype(jnp.int32)

    # compact accepted lefts in ascending order (sentinel 9999): rank by
    # prefix count + one-hot contraction — a 420-wide sort costs ~1 ms/step
    # under the stream vmap, the dense form fuses away
    rank = jnp.cumsum(accepted.astype(jnp.int32)) - 1       # (420,)
    slots = jnp.arange(MAX_CHARS * MAX_GROUPS)              # (64,)
    hit = accepted[None, :] & (rank[None, :] == slots[:, None])  # (64, 420)
    lefts_sorted = jnp.sum(
        jnp.where(hit, jnp.arange(N_RECT_POS)[None, :], 0), axis=1)
    got = jnp.any(hit, axis=1)
    lefts_sorted = jnp.where(got, lefts_sorted, 9999)
    present = got
    prev = jnp.concatenate([lefts_sorted[:1], lefts_sorted[:-1]])
    breaks = jnp.concatenate([
        jnp.zeros((1,), bool),
        (lefts_sorted[1:] - prev[1:]) >= 2 * SMALL_W]) & present
    gid = jnp.cumsum(breaks.astype(jnp.int32)) * present - (~present)  # -1 pad

    # group sizes via dense one-hot count (scatter-add is TPU poison);
    # groups ordered left-to-right by construction
    gids = jnp.arange(MAX_GROUPS * MAX_CHARS)
    member = present[None, :] & (gid[None, :] == gids[:, None])  # (64, 64)
    sizes = jnp.sum(member.astype(jnp.int32), axis=1)
    # pick the first MAX_GROUPS group-ids with size >= 4 (same dense rank
    # trick as the left compaction above)
    big = sizes >= 4
    brank = jnp.cumsum(big.astype(jnp.int32)) - 1
    bslot = jnp.arange(MAX_GROUPS)
    bhit = big[None, :] & (brank[None, :] == bslot[:, None])     # (4, 64)
    chosen = jnp.sum(jnp.where(bhit, gids[None, :], 0), axis=1)
    group_ok = jnp.any(bhit, axis=1)
    chosen = jnp.where(group_ok, chosen, 9999)

    def per_group(gsel, ok):
        member = (gid == gsel) & present
        n_m = jnp.sum(member.astype(jnp.int32))
        # contiguous run: start index within lefts_sorted
        start_i = jnp.argmax(member)
        # raw char arrays (<= MAX_CHARS kept, left-to-right)
        take = jnp.arange(MAX_CHARS) + start_i
        take_ok = jnp.arange(MAX_CHARS) < jnp.minimum(n_m, MAX_CHARS)
        raw_lefts = jnp.where(
            take_ok,
            _onehot_read(lefts_sorted,
                         jnp.clip(take, 0, lefts_sorted.shape[0] - 1)), 0)
        raw_sums = jnp.where(
            take_ok,
            _onehot_read(rect_sums,
                         jnp.clip(raw_lefts, 0, N_RECT_POS - 1)),
            0).astype(jnp.int32)

        # whitespace strip on the raw run
        s0 = jnp.asarray(0, jnp.int32)
        c0 = jnp.minimum(n_m, MAX_CHARS).astype(jnp.int32)
        s1, c1 = _whitespace_strip(raw_sums, s0, c0)

        first_left = raw_lefts[jnp.clip(s1, 0, MAX_CHARS - 1)]
        last_left = raw_lefts[jnp.clip(s1 + c1 - 1, 0, MAX_CHARS - 1)]
        width = last_left + SMALL_W - first_left

        # regrid over the group's rows [base-1, base+16) — column sums
        # computed once per stripe and shared by all groups
        top = base - 1
        bounds_left = jnp.maximum(first_left - 2 * SMALL_W, 0)
        bounds_right = jnp.minimum(first_left + width + 2 * SMALL_W, CARD_WIDTH)
        bounds_width = bounds_right - bounds_left
        r_lefts, r_sums, r_n, spacing = _regrid(col_sums_grp, bounds_left,
                                                bounds_width)

        # second whitespace strip on the regridded run
        s2, c2 = _whitespace_strip(r_sums, jnp.asarray(0, jnp.int32),
                                   jnp.minimum(r_n, MAX_CHARS))
        in_run = (jnp.arange(MAX_CHARS) >= s2) & \
            (jnp.arange(MAX_CHARS) < s2 + c2)
        # per-char trimming and slash anchoring run at the top level over
        # ONE flat batch (nesting them here serializes into per-lane slice
        # loops) — return the regridded char geometry instead.
        char_width = spacing - 1
        return r_lefts, top, char_width, in_run & ok

    return jax.vmap(per_group)(chosen, group_ok)


def best_expiry_seg_device(slash_params, y_img, vseg_y, enabled) -> ExpiryWindows:
    """best_expiry_seg (expiry_seg.cpp:706-902) as one jittable graph.

    y_img: (270, 428) u8; vseg_y: traced scalar; enabled: bool scalar gate
    (frame usable, number row leaves >= 2 char heights below).
    Returns up to MAX_WINDOWS MM/YY window candidates.
    """
    y_start = jnp.clip(vseg_y + NUMBER_HEIGHT, 0, CARD_HEIGHT - 1)
    sobel = scharr_dx_abs_below(y_img, y_start)
    bases, sums, stripe_ok = select_stripes(sobel, y_start)
    stripe_ok = stripe_ok & enabled

    def one(base, ssum, ok):
        return _process_stripe(sobel, base, ssum, ok)

    r_lefts, g_top, g_cw, alive0 = jax.vmap(one)(bases, sums, stripe_ok)
    # shapes: (3, G, 16) r_lefts/alive0; (3, G) g_top/g_cw

    # per-char trimming batched per stripe (band fixed per outer lane —
    # indexing bands[i] inside a flat vmap would gather a full band copy
    # per char, ~330 MB of HBM traffic per step)
    S_, G_ = r_lefts.shape[0], r_lefts.shape[1]
    band_top = jnp.clip(g_top[:, 0] - 2, 0, CARD_HEIGHT - EXPANDED_H)  # (3,)
    # rows-only crops as one one-hot contraction over the 136-row band
    # (see _process_stripe; valid band tops are >= 140 > _SCHARR_BASE, and
    # rows [140, 142) of the band are zero by the y_start mask)
    bt_rel = jnp.clip(band_top - _SCHARR_BASE, 0, _BAND_ROWS - EXPANDED_H)
    bsel = ((bt_rel[:, None, None] + jnp.arange(EXPANDED_H)[None, :, None])
            == jnp.arange(_BAND_ROWS)[None, None, :]).astype(jnp.float32)
    bands = jnp.einsum("sxr,rc->sxc", bsel,
                       sobel.astype(jnp.float32))             # (3, 21, 428)

    def stripe_trim(band, lefts_s, tops_s, cw_s):
        # all chars of a stripe share the band: hand each char the
        # 16-aligned 34-wide coarse window around its left position
        # (l0 = 16q + rem; one small one-hot matmul over ~27 positions,
        # built by reshape + 3-way concat — ops/select.coarse_blocks) and
        # let _trim_char mask by rem. No per-char crop is materialized:
        # the 18-wide shifted-copy stack this replaces lowered to a chain
        # of full-size bf16[256,3,18,21,411] pad fusions (~4.3 GB/step
        # @256), and a fine-selection matmul lowers to batched-tiny-dot
        # layout copies (~6 ms/step) — both measured worse.
        l0 = jnp.clip(lefts_s - 2, 0, CARD_WIDTH - EXPANDED_W)
        q, rem = l0 // 16, l0 % 16
        blocks = coarse_blocks(band, _TRIM_WIDE)          # (21, Q, 34)
        ohq = (q[:, None] == jnp.arange(blocks.shape[-2])).astype(
            jnp.float32)
        # int16 window values (sobel band <= 4080, exact): halves the
        # per-char trim tensors downstream (_trim_char)
        wide = jnp.einsum("kq,rqu->kru", ohq, blocks
                          ).astype(jnp.int16)             # (K, 21, 34)
        return jax.vmap(_trim_char)(wide, rem, lefts_s, tops_s, cw_s)

    tops_f, lefts_f, valid_f = jax.vmap(stripe_trim)(
        bands,
        r_lefts.reshape(S_, G_ * MAX_CHARS),
        jnp.broadcast_to(g_top[:, :, None],
                         (S_, G_, MAX_CHARS)).reshape(S_, G_ * MAX_CHARS),
        jnp.broadcast_to(g_cw[:, :, None],
                         (S_, G_, MAX_CHARS)).reshape(S_, G_ * MAX_CHARS))
    tops = tops_f.reshape(S_, G_, MAX_CHARS)
    lefts2 = lefts_f.reshape(S_, G_, MAX_CHARS)
    char_alive = alive0 & valid_f.reshape(S_, G_, MAX_CHARS)

    # compact alive chars left-to-right within each group — dense rank +
    # one-hot contraction (an argsort lowers to a while-looped bitonic sort)
    rank = jnp.cumsum(char_alive.astype(jnp.int32), axis=-1) - 1
    hit = (char_alive[:, :, None, :] &
           (rank[:, :, None, :] == jnp.arange(MAX_CHARS)[None, None, :, None]))
    tops_c = jnp.sum(jnp.where(hit, tops[:, :, None, :], 0), axis=-1)
    lefts_c = jnp.sum(jnp.where(hit, lefts2[:, :, None, :], 0), axis=-1)
    n_alive = jnp.sum(char_alive.astype(jnp.int32), axis=-1)  # (3, G)

    # slash windows: first in [0, n_alive-5]; middle char = first+2
    firsts = jnp.arange(MAX_CHARS - 4)
    win_ok = (firsts[None, None, :] + 4 < n_alive[:, :, None]) & \
        (n_alive[:, :, None] >= 5)
    mid_idx = jnp.clip(firsts + 2, 0, MAX_CHARS - 1)
    mid_tops = tops_c[:, :, mid_idx]
    mid_lefts = lefts_c[:, :, mid_idx]

    # slash classification via band convolution (see slash_probs_conv)
    F_ = mid_tops.shape[-1]
    roff = (mid_tops - band_top[:, None, None]).reshape(S_, G_ * F_)
    lefts_w = mid_lefts.reshape(S_, G_ * F_)
    slash_p = slash_probs_conv(slash_params, bands, roff, lefts_w)
    win_ok = win_ok & (slash_p.reshape(win_ok.shape) > 0.7)

    # flatten candidates in (stripe, group, first) order and take the first
    # MAX_WINDOWS valid ones — matching the reference's append order.
    # Dense rank compaction instead of a sort (see above).
    S, G, F = win_ok.shape
    flat_ok = win_ok.reshape(-1)
    frank = jnp.cumsum(flat_ok.astype(jnp.int32)) - 1
    fhit = flat_ok[None, :] & (frank[None, :] ==
                               jnp.arange(MAX_WINDOWS)[:, None])
    pick = jnp.sum(jnp.where(fhit, jnp.arange(S * G * F)[None, :], 0), axis=1)
    picked_ok = jnp.any(fhit, axis=1)
    pick = jnp.clip(pick, 0, S * G * F - 1)
    si = pick // (G * F)
    gi = (pick // F) % G
    fi = pick % F

    def gather_window(s, g, f, ok):
        # (s, g) row select + 5-char window, both as one-hot contractions
        # (per-lane indexed reads serialize under the window vmap)
        oh_sg = (jnp.arange(S * G) == s * G + g).astype(jnp.float32)
        trow = oh_sg @ tops_c.reshape(S * G, MAX_CHARS).astype(jnp.float32)
        lrow = oh_sg @ lefts_c.reshape(S * G, MAX_CHARS).astype(jnp.float32)
        # f <= MAX_CHARS-5 always (firsts grid), so the window is in-bounds
        sel5 = ((f + jnp.arange(5))[:, None]
                == jnp.arange(MAX_CHARS)[None, :]).astype(jnp.float32)
        ct = (sel5 @ trow).astype(tops_c.dtype)
        cl = (sel5 @ lrow).astype(lefts_c.dtype)
        top = jnp.min(ct)
        left = cl[0]
        return ok, top, left, ct, cl

    valid, top, left, char_tops, char_lefts = jax.vmap(gather_window)(
        si, gi, fi, picked_ok)
    return ExpiryWindows(valid=valid, top=top, left=left,
                         char_tops=char_tops, char_lefts=char_lefts)


# ---------------------------------------------------------------------------
# categorization + cross-frame aggregation (expiry_categorize.cpp)
# ---------------------------------------------------------------------------

def categorize_windows(expiry_params, y_img, windows: ExpiryWindows):
    """Per window, classify chars 0,1,3,4 (expiry_categorize.cpp:149-252).
    Returns (MAX_WINDOWS, 5, 10) scores (slash row zero).

    Crops come from per-window 21-row luma bands via the same dense one-hot
    column contraction + row take as slash_probs_conv — per-char dynamic
    slices lower to per-lane slice loops under the stream vmap and were the
    stage's dominant cost. Band values <= 255 are exact in bf16 and exactly
    one one-hot term is 1, so the extracted crops are bit-exact."""
    digit_idx = jnp.asarray([0, 1, 3, 4])

    band_tops = jnp.clip(windows.top - 2, 0, CARD_HEIGHT - EXPANDED_H)
    # rows-only crops as one one-hot contraction (dynamic_slice of the
    # shared luma serializes under the window vmap; u8 values are exact).
    # Valid windows always sit in the lower card (top >= 142, see
    # _SCHARR_BASE), so contract over the static 136-row luma band;
    # invalid windows read arbitrary band rows and are masked below.
    bt_rel = jnp.clip(band_tops - _SCHARR_BASE, 0, _BAND_ROWS - EXPANDED_H)
    bsel = ((bt_rel[:, None, None] + jnp.arange(EXPANDED_H)[None, :, None])
            == jnp.arange(_BAND_ROWS)[None, None, :]).astype(jnp.float32)
    bands = jnp.einsum("wxr,rc->wxc", bsel,
                       y_img[_SCHARR_BASE:].astype(jnp.float32)
                       ).astype(jnp.uint8)

    ctops = windows.char_tops[:, digit_idx]                 # (W, 4)
    clefts = windows.char_lefts[:, digit_idx]
    # combined one-hot oh[w, k, j, c] = (c == left_wk + j): the 11-way
    # shifted band stack this replaces was rewritten by XLA into a chain
    # of 11 full-size u8 concat fusions (11 x 99 MB/step @256, hlo_hogs
    # round 5); u8 band values are exact in bf16 so the selection is
    # bit-identical
    l0 = jnp.clip(clefts, 0, CARD_WIDTH - TRIM_W)           # (W, 4)
    oh = ((l0[..., None, None] + jnp.arange(TRIM_W)[:, None])
          == jnp.arange(CARD_WIDTH)).astype(jnp.bfloat16)   # (W, 4, 11, 428)
    A = jnp.einsum("wkjc,wrc->wkrj", oh, bands.astype(jnp.bfloat16),
                   preferred_element_type=jnp.bfloat16)     # (W, 4, 21, 11)
    roff = jnp.clip(ctops - band_tops[:, None], 0, EXPANDED_H - TRIM_H)
    ridx = roff[..., None] + jnp.arange(TRIM_H)[None, None, :]  # (W, 4, 16)
    oh_row = (ridx[..., None] == jnp.arange(EXPANDED_H)).astype(
        jnp.float32)                                        # (W, 4, 16, 21)
    crops = jnp.einsum("wkxr,wkrj->wkxj", oh_row,
                       A.astype(jnp.float32))               # (W, 4, 16, 11)
    cells_u8 = crops.astype(jnp.uint8)

    grad = morph_grad3_2d_cross_u8(cells_u8)
    eq = equalize_hist(grad)
    sm = bilateral3x3(eq)
    cells = (sm.astype(jnp.float32) / 255.0)
    cells = cells.reshape(-1, TRIM_H, TRIM_W)               # (W*4, 16, 11)
    probs = apply_expiry_conv_mm(expiry_params, cells)      # (W*4, 10)
    probs = probs.reshape(MAX_WINDOWS, 4, 10)
    scores = jnp.zeros((MAX_WINDOWS, 5, 10), jnp.float32)
    scores = scores.at[:, digit_idx, :].set(probs)
    return jnp.where(windows.valid[:, None, None], scores, 0.0)


def aggregate_windows(state: ExpiryState, windows: ExpiryWindows,
                      scores) -> ExpiryState:
    """expiry_aggregate_grouped_rects (expiry_categorize.cpp:256-331) over
    the fixed slot table: EWMA-merge matches, decay, insert fresh.

    Vectorized matching (no scatter chains): each new window is assigned to
    its first matching slot and each slot merges its first assigned window.
    This matches the reference's ordered sweep except when several windows
    match the same slot in one frame (the reference merges each in turn;
    we merge the first and let the rest coalesce or open fresh slots) —
    which its within-frame coalescing step makes vanishingly rare.
    """
    new_valid = windows.valid
    new_top = windows.top
    new_left = windows.left
    new_scores = scores

    # coalesce within new: window j>i folds into the first equivalent i
    for i in range(MAX_WINDOWS):
        coalesced = jnp.asarray(1.0)
        for j in range(MAX_WINDOWS - 1, i, -1):
            match = (new_valid[i] & new_valid[j] &
                     (jnp.abs(new_top[j] - new_top[i]) <= V_ALLOW) &
                     (jnp.abs(new_left[j] - new_left[i]) <= H_ALLOW))
            merged = (new_scores[i] * coalesced + new_scores[j]) / (coalesced + 1.0)
            sel = jnp.where(match, 1.0, 0.0)
            row = new_scores[i] * (1 - sel) + merged * sel
            new_scores = jnp.where(
                (jnp.arange(MAX_WINDOWS) == i)[:, None, None], row[None],
                new_scores)
            coalesced = coalesced + sel
            new_valid = new_valid & ~((jnp.arange(MAX_WINDOWS) == j) & match)

    # slot-window match matrix (S, W)
    near = ((jnp.abs(new_top[None, :] - state.top[:, None]) <= V_ALLOW) &
            (jnp.abs(new_left[None, :] - state.left[:, None]) <= H_ALLOW))
    m = state.active[:, None] & new_valid[None, :] & near

    # each window -> first matching slot; each slot -> first assigned window
    win_slot = jnp.argmax(m, axis=0)                      # (W,)
    win_has = jnp.any(m, axis=0)
    assign = (jnp.arange(MAX_SLOTS)[:, None] == win_slot[None, :]) & \
        win_has[None, :]                                  # (S, W)
    slot_has = jnp.any(assign, axis=1)
    # make the assignment EXCLUSIVE per slot (first assigned window wins;
    # later same-slot windows stay unconsumed and may open fresh slots, the
    # documented deviation) — without this, two windows matching one slot
    # would SUM their positions/scores into the EWMA
    slot_win = jnp.argmax(assign, axis=1)                 # (S,) first True
    assign = assign & (jnp.arange(MAX_WINDOWS)[None, :] == slot_win[:, None])

    # one-hot reductions, not indexed gathers (traced-index loads lower to
    # while loops under the stream vmap)
    picked_scores = jnp.sum(
        jnp.where(assign[:, :, None, None], new_scores[None], 0.0), axis=1)
    picked_top = jnp.sum(jnp.where(assign, new_top[None, :], 0), axis=1)
    picked_left = jnp.sum(jnp.where(assign, new_left[None, :], 0), axis=1)

    sel = slot_has[:, None, None]
    sc = jnp.where(sel,
                   state.scores * EXPIRY_DECAY_FACTOR +
                   picked_scores * (1 - EXPIRY_DECAY_FACTOR),
                   state.scores)
    top = jnp.where(slot_has, picked_top, state.top)
    left = jnp.where(slot_has, picked_left, state.left)
    recently = state.recently_seen + slot_has.astype(jnp.int32)
    total = state.total_seen + slot_has.astype(jnp.int32)
    active = state.active

    # windows consumed by a merge (only the per-slot picked ones)
    consumed = jnp.any(assign, axis=0)
    remaining = new_valid & ~consumed

    # decay + forget
    recently = jnp.where(active, recently - 1, recently)
    active = active & (recently > 0)

    # insert remaining windows into free slots: rank free slots and
    # remaining windows, pair by rank
    free_rank = jnp.cumsum((~active).astype(jnp.int32)) - 1   # (S,)
    new_rank = jnp.cumsum(remaining.astype(jnp.int32)) - 1    # (W,)
    # slot s takes remaining window j iff s is free with rank r and j is
    # the r-th remaining window
    pair = (~active)[:, None] & remaining[None, :] & \
        (free_rank[:, None] == new_rank[None, :])             # (S, W)
    take = jnp.any(pair, axis=1)
    taken_scores = jnp.sum(
        jnp.where(pair[:, :, None, None], new_scores[None], 0.0), axis=1)
    taken_top = jnp.sum(jnp.where(pair, new_top[None, :], 0), axis=1)
    taken_left = jnp.sum(jnp.where(pair, new_left[None, :], 0), axis=1)
    sel_t = take[:, None, None]
    sc = jnp.where(sel_t, taken_scores, sc)
    top = jnp.where(take, taken_top, top)
    left = jnp.where(take, taken_left, left)
    recently = jnp.where(take, 3, recently)
    total = jnp.where(take, 1, total)
    active = active | take

    return ExpiryState(active=active, top=top, left=left, scores=sc,
                       recently_seen=recently, total_seen=total)


def extract_expiry(state: ExpiryState, best_month, best_year,
                   now_year, now_month, allow_past_dates=False):
    """Stable digits + date sanity over all trusted slots
    (expiry_categorize.cpp:334-501). Returns (month, full_year).

    allow_past_dates (static) mirrors the reference's DMZ_DEBUG/CYTHON_DMZ
    branch (expiry_categorize.cpp:382-397): dates rejected by the shipped
    [now, now+5y) window are still accepted when < now+5y (years > 60
    re-based to 19xx). That branch's mixed 1900/2000 bases make the sweep
    order-dependent, so the flagged form runs the reference's sequential
    prefer-later sweep over slots (slot order == first-seen order == the
    reference's push_back order) instead of the vectorized argmax."""
    row_sum = jnp.sum(state.scores, axis=-1)                 # (S, 5)
    row_max = jnp.max(state.scores, axis=-1)
    stability = row_max / jnp.where(row_sum > 0, row_sum, 1.0)
    digits = jnp.argmax(state.scores, axis=-1)               # (S, 5)
    stable = (stability >= EXPIRY_MIN_STABILITY) & (row_sum > 0)

    trusted = state.active & (state.total_seen >= MIN_SEEN)
    all_stable = stable[:, 0] & stable[:, 1] & stable[:, 3] & stable[:, 4]

    month = digits[:, 0] * 10 + digits[:, 1]
    year = digits[:, 3] * 10 + digits[:, 4]
    swap = (month > 12) & (year > 0) & (year <= 12)
    month, year = (jnp.where(swap, year, month), jnp.where(swap, month, year))
    full_year = year + 2000

    # vectorized over slots: the reference's sequential prefer-later sweep
    # (expiry_categorize.cpp:370-375) is equivalent to taking the latest
    # valid date (key = year*16 + month is monotone; argmax's
    # first-occurrence tie-break matches "strictly later replaces")
    cand_ok = trusted & all_stable & (month > 0) & (month <= 12)
    window_ok = (full_year < now_year + 5) & \
        ((full_year > now_year) |
         ((full_year == now_year) & (month >= now_month)))

    if allow_past_dates:
        rebased = jnp.where(year > 60, year + 1900, full_year)
        dbg_ok = rebased < now_year + 5

        def body(i, carry):
            bm, by = carry
            later = (full_year[i] > by) | ((full_year[i] == by) &
                                           (month[i] > bm))
            outer = cand_ok[i] & later
            acc_shipped = outer & window_ok[i]
            acc_dbg = outer & ~window_ok[i] & dbg_ok[i]
            ny = jnp.where(acc_shipped, full_year[i],
                           jnp.where(acc_dbg, rebased[i], by))
            nm = jnp.where(acc_shipped | acc_dbg, month[i], bm)
            return nm, ny

        return lax.fori_loop(0, month.shape[0], body,
                             (best_month, best_year))

    key = jnp.where(cand_ok & window_ok, full_year * 16 + month, -1)
    best_cand = jnp.max(key)   # key is monotone in (year, month); month < 16
    best_key = best_year * 16 + best_month
    take = best_cand > best_key
    best_month = jnp.where(take, best_cand % 16, best_month)
    best_year = jnp.where(take, best_cand // 16, best_year)
    return best_month, best_year
