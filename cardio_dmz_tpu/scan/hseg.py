"""Horizontal segmentation: find the 15/16 digit x-offsets.

TPU-native implementation of best_n_hseg (scan/n_hseg.cpp:88-152).

Score for candidate (w, o): L1 distance between the normalized column-sum
gradient profile and a template vector built by stamping the 19-sample
empirical digit pattern (n_hseg.cpp:15-20) at x = o + lrint(k*w) for each
masked digit k, zeros elsewhere (n_hseg.cpp:54-72). Stamps can overlap for
w < 19; later stamps overwrite (Eigen segment assignment).

Two search strategies:

- `best_n_hseg` (default): reproduces the reference's 4-stage
  coarse-to-fine search EXACTLY (n_hseg.cpp:110-147) — same float32 width
  accumulation, lrintf round-half-even stamp centers, strict-< carry
  between stages, width-major/offset-minor tie order. Each stage is a
  DENSE (width x offset) evaluation of that stage's tiny grid (<=6x20
  candidates), so it is fully jittable with static shapes; the offset axis
  only shifts the stamped template, so each stage is one per-width base
  template + a Hankel-window masked L1 — cheaper than the global dense
  sweep (~280 candidates total vs 52x144).

- `best_n_hseg_dense`: evaluates the ENTIRE candidate grid at the finest
  resolution (width step 0.05 over [17.1, 19.7), all integer offsets) in
  one tensor expression — a global argmin over every candidate the
  reference's narrowing search could ever reach, so its score can only
  match or beat it. Kept for accuracy experiments; the staged search is
  the default because it matches the compiled reference bit-for-bit on
  which optimum is selected (the global argmin disagrees with the staged
  search's local optimum on ~40% of frames, with identical end accuracy).

The dense path's template bank over (pattern, width) is STATIC: built
host-side once, embedded as a constant. The per-frame work is one
(144x428) Hankel gather plus a masked L1 reduction — pure VPU work that
XLA fuses (the offset axis is bounded by the largest reachable pattern
offset, see N_OFFSETS).
"""

import functools
import typing

import jax.numpy as jnp
import numpy as np
from jax import lax

from ..constants import (
    CARD_WIDTH,
    HSEG_GRAD_SUM_PATTERN,
    HSEG_WIDTH_MAX,
    HSEG_WIDTH_MIN,
    HSEG_WIDTH_STEP,
    NUMBER_WIDTH,
    PATTERN_LENGTH_FOR_PATTERN,
    PATTERN_MASKS,
)
from ..ops import morph_grad3_2d_cross_u8

N_WIDTHS = int(round((HSEG_WIDTH_MAX - HSEG_WIDTH_MIN) / HSEG_WIDTH_STEP))  # 52
# Largest reachable pattern offset: 428 - rint(17 * 17.1) = 137 (the amex
# pattern at the minimum width). Bounding the offset axis to 144 shrinks the
# Hankel/score tensors ~3x with zero effect on results (the validity bank
# already excludes offsets >= the per-width maximum).
N_OFFSETS = 144


class HSeg(typing.NamedTuple):
    """NHorizontalSegmentation equivalent (scan/n_hseg.h:13-19)."""
    n_offsets: jnp.ndarray       # int32 (15 / 16)
    number_width: jnp.ndarray    # float32
    pattern_offset: jnp.ndarray  # int32
    offsets: jnp.ndarray         # (16,) int32 digit cell left edges
    score: jnp.ndarray           # float32, lower is better


@functools.lru_cache(maxsize=None)
def _template_bank():
    """Static (2 patterns x N_WIDTHS) template vectors + validity masks.

    Returns (templates (2, N_WIDTHS, 428) f32,
             valid_offset (2, N_WIDTHS, 428) bool,
             centers (2, N_WIDTHS, 16) int32  — stamp positions at offset 0).
    """
    tmpl19 = np.array(HSEG_GRAD_SUM_PATTERN, np.float32)
    templates = np.zeros((2, N_WIDTHS, CARD_WIDTH), np.float32)
    valid = np.zeros((2, N_WIDTHS, N_OFFSETS), bool)
    centers = np.zeros((2, N_WIDTHS, 16), np.int32)
    for p_idx, pattern_type in enumerate((1, 2)):  # visa-like, amex-like
        mask = PATTERN_MASKS[pattern_type]
        plen = PATTERN_LENGTH_FOR_PATTERN[pattern_type]
        for wi in range(N_WIDTHS):
            w = HSEG_WIDTH_MIN + wi * HSEG_WIDTH_STEP
            pattern_width = plen * w
            max_offset = CARD_WIDTH - int(np.rint(pattern_width))
            digit = 0
            max_center = 0
            for k in range(plen):
                if mask[k]:
                    c = int(np.rint(k * w))
                    templates[p_idx, wi, c:c + NUMBER_WIDTH] = tmpl19
                    centers[p_idx, wi, digit] = c
                    digit += 1
                    max_center = max(max_center, c)
            # candidate valid iff o < max_offset (n_hseg.cpp:49-53) and every
            # stamp satisfies o + c + 19 < 428 (n_hseg.cpp:60)
            for o in range(N_OFFSETS):
                valid[p_idx, wi, o] = (o < max_offset and
                                       o + max_center + NUMBER_WIDTH < CARD_WIDTH)
    return templates, valid, centers


def grad_profile(y_strip):
    """Column-sum of the 2-D morph gradient, min-max normalized to [0, 1]
    (n_hseg.cpp:88-96). y_strip: (..., 27, 428) u8 -> (..., 428) f32."""
    grad = morph_grad3_2d_cross_u8(y_strip).astype(jnp.float32)
    col = jnp.sum(grad, axis=-2)
    mn = jnp.min(col, axis=-1, keepdims=True)
    mx = jnp.max(col, axis=-1, keepdims=True)
    rng = jnp.where(mx > mn, mx - mn, 1.0)
    return (col - mn) / rng


def best_n_hseg_dense(y_strip, pattern_type, number_length) -> HSeg:
    """Global dense argmin over the full (width, offset) grid.

    y_strip: (27, 428) uint8 PAN strip; pattern_type: 1 or 2 (traced).

    Evaluates both pattern banks and selects by pattern_type (cheaper than
    lax.cond branches — the banks share all the work).
    """
    templates, valid, centers = _template_bank()
    # select the traced pattern's bank up front (a cheap where between two
    # constants) so the L1 sweep below runs once, not per pattern
    is_amex = (pattern_type == 2)
    tmpl = jnp.where(is_amex, jnp.asarray(templates[1]),
                     jnp.asarray(templates[0]))   # (W, 428)
    ok = jnp.where(is_amex, jnp.asarray(valid[1]),
                   jnp.asarray(valid[0]))         # (W, 144)
    cent = jnp.where(is_amex, jnp.asarray(centers[1]),
                     jnp.asarray(centers[0]))     # (W, 16)

    gs = grad_profile(y_strip)         # (428,)

    # Hankel windows: win[o, x'] = gs[o + x'], zero beyond the right edge.
    idx = jnp.arange(N_OFFSETS)[:, None] + jnp.arange(CARD_WIDTH)[None, :]
    in_range = idx < CARD_WIDTH
    win = jnp.where(in_range, gs[jnp.clip(idx, 0, CARD_WIDTH - 1)], 0.0)

    # prefix_abs[o] = sum of gs[x] for x < o (gs >= 0 after normalization)
    prefix = jnp.concatenate(
        [jnp.zeros((1,), gs.dtype), jnp.cumsum(gs)])[:N_OFFSETS]

    # per width: L1 between every window and the template (masked to the
    # in-image region so the zero-padding beyond the edge contributes 0)
    def score_width(t_w):
        # t_w: (428,) template for one width
        d = jnp.abs(win - t_w[None, :])                    # (144o, 428x)
        d = jnp.where(in_range, d, 0.0)
        return jnp.sum(d, axis=-1) + prefix                # (144,)

    scores = lax.map(score_width, tmpl)                    # (W, 144)
    scores = jnp.where(ok, scores, jnp.inf)

    flat = scores.reshape(-1)
    best = jnp.argmin(flat)   # first-min == width-major, offset-minor order
    wi = best // N_OFFSETS
    o = (best % N_OFFSETS).astype(jnp.int32)
    width = HSEG_WIDTH_MIN + wi.astype(jnp.float32) * HSEG_WIDTH_STEP

    offsets = o + cent[wi]                                   # (16,)
    n_offsets = number_length.astype(jnp.int32)
    active = jnp.arange(16) < n_offsets
    offsets = jnp.where(active, offsets, 0).astype(jnp.int32)

    return HSeg(
        n_offsets=n_offsets,
        number_width=width,
        pattern_offset=o,
        offsets=offsets,
        score=flat[best],
    )


# ---------------------------------------------------------------------------
# Reference-exact 4-stage coarse-to-fine search (n_hseg.cpp:110-147)
# ---------------------------------------------------------------------------

_TMPL19 = jnp.asarray(np.array(HSEG_GRAD_SUM_PATTERN, np.float32))
_MAX_PLEN = 19   # visa-like pattern length incl. gaps; amex-like is 17


def _stage1_widths():
    """float32 width grid of stage 1: w = 17.1f; w < 19.7f; w += 0.5f."""
    ws, w = [], np.float32(HSEG_WIDTH_MIN)
    while w < np.float32(HSEG_WIDTH_MAX):
        ws.append(w)
        w = np.float32(w + np.float32(0.5))
    return np.array(ws, np.float32)          # 6 widths


def _f32_width_grid(center, half, step, slots):
    """Emulate `for (w = c-half; w < c+half; w += step)` in float32.

    Returns (widths (slots,), valid (slots,)) with the exact IEEE-f32
    accumulation sequence the C++ produces (the slot count genuinely
    depends on rounding: e.g. stage 4 runs 5 iterations, not 4).
    """
    half = jnp.float32(half)
    step = jnp.float32(step)
    # the barriers stop XLA's algebraic simplifier from reassociating the
    # chained constant adds (it folds (c-h)+s into c+(s-h) in higher
    # precision, which changes which f32 widths the C++ loop visits)
    w = lax.optimization_barrier((center - half).astype(jnp.float32))
    limit = (center + half).astype(jnp.float32)
    ws = []
    for _ in range(slots):
        ws.append(w)
        w = lax.optimization_barrier((w + step).astype(jnp.float32))
    widths = jnp.stack(ws)
    return widths, widths < limit


def _pattern_consts(pattern_type):
    """Traced select of (plen f32, mask (19,) bool) by pattern type."""
    visa = np.array(PATTERN_MASKS[1], bool)   # 19-long, zero-padded
    amex = np.array(PATTERN_MASKS[2], bool)
    is_amex = pattern_type == 2
    plen = jnp.where(is_amex, jnp.float32(PATTERN_LENGTH_FOR_PATTERN[2]),
                     jnp.float32(PATTERN_LENGTH_FOR_PATTERN[1]))
    kmask = jnp.where(is_amex, jnp.asarray(amex), jnp.asarray(visa))
    return plen, kmask


# Valid pattern offsets never reach 151 (the widest reachable bound is
# 428 - lrintf(17 * 16.3) for the amex pattern at the smallest reachable
# width); offsets >= _O_FULL are always invalid and inf-masked.
_O_FULL = 160


def _window_bank(gs, cums):
    """Static Hankel of every offset row the cascade can visit.

    win_full[o, x'] = gs[o + x'] (zero past the right edge) — built ONCE
    per frame with STATIC indices, so it lowers to a cheap static gather.
    The per-stage offset rows are then selected with one-hot matmuls:
    per-lane dynamic gathers (gs[traced_offset + x]) lower to serial
    element loops on TPU and made the naive staged search ~30x slower
    than the dense sweep.
    """
    idx = jnp.arange(_O_FULL)[:, None] + jnp.arange(CARD_WIDTH)[None, :]
    in_rng = idx < CARD_WIDTH
    win_full = jnp.where(in_rng, gs[jnp.clip(idx, 0, CARD_WIDTH - 1)], 0.0)
    return win_full, cums[:_O_FULL]


def _build_base(widths, kmask):
    """Per-width stamped template (Nw, 428), gather-free.

    base[w] = the 19-sample pattern stamped at c_k = lrintf(k*w) for each
    masked k, later stamps overwriting earlier ones (n_hseg.cpp:55-67).
    Only consecutive stamps can overlap (w >= 16 > 19/2), so "overwrite"
    means: stamp k keeps its samples j < c_{k+1} - c_k when k+1 is masked.
    Decomposition: base[w, x] = sum_j D[w, j, x - j] with
    D[w, j, y] = sum_k A[w, k, j] * [y == c_k] — a tiny batched matmul
    over position indicators plus 19 static shifts (no dynamic indexing).
    """
    karange = jnp.arange(_MAX_PLEN, dtype=jnp.float32)
    # stamp centers at offset 0: lrintf(k * w) in f32 (round half to even)
    c = jnp.round(karange[None, :] * widths[:, None]).astype(jnp.int32)
    cn = jnp.concatenate(
        [c[:, 1:], jnp.full((c.shape[0], 1), 10 ** 6, jnp.int32)], axis=1)
    nmask = jnp.concatenate([kmask[1:], jnp.zeros((1,), bool)])
    gap = cn - c                                            # (Nw, 19)
    j = jnp.arange(NUMBER_WIDTH)
    keep = (kmask[None, :, None]
            & ~(nmask[None, :, None] & (j[None, None, :] >= gap[:, :, None])))
    amat = _TMPL19[None, None, :] * keep                    # (Nw, 19k, 19j)
    emat = (jnp.arange(CARD_WIDTH)[None, None, :]
            == c[:, :, None]).astype(jnp.float32)           # (Nw, 19k, 428)
    dmat = jnp.einsum("wkj,wky->wjy", amat, emat)           # (Nw, 19j, 428)
    base = dmat[:, 0, :]
    for jj in range(1, NUMBER_WIDTH):
        base = base + jnp.pad(dmat[:, jj, :CARD_WIDTH - jj],
                              ((0, 0), (jj, 0)))
    maxc = jnp.max(jnp.where(kmask[None, :], c, -(10 ** 6)), axis=1)
    return base, maxc


def _stage_best(win_full, cums_full, widths, wvalid, omin, omax_slice,
                ostep, n_off, plen, kmask, best):
    """One best_n_hseg_constrained call (n_hseg.cpp:39-85) as a dense
    (widths x offsets) evaluation + strict-< carry against `best`.

    win_full/cums_full: from `_window_bank`. widths: (Nw,) traced f32;
    omin/omax_slice traced int32 (omax_slice may be None for "no slice
    bound", stage 1). best: (score, width, offset).
    """
    base, maxc = _build_base(widths, kmask)                 # (Nw, 428)

    offsets = omin + ostep * jnp.arange(n_off, dtype=jnp.int32)
    # one-hot row select from the static Hankel (gather-free)
    sel = (jnp.arange(_O_FULL)[None, :] == offsets[:, None]).astype(
        win_full.dtype)                                     # (No, 160)
    win = sel @ win_full                                    # (No, 428)
    prefix = sel @ cums_full                                # sum gs[x], x < o

    # for VALID candidates every stamp ends before x' = 428 - o and win is
    # zero there too, so no in-range masking is needed at score time
    d = jnp.abs(win[None, :, :] - base[:, None, :])
    scores = jnp.sum(d, axis=-1) + prefix[None, :]          # (Nw, No)

    # validity: w in slice; o < min(slice max, 428 - lrintf(plen*w));
    # every masked stamp fully inside: o + max(c) + 19 < 428
    # (n_hseg.cpp:47-53,60-64)
    max_off = CARD_WIDTH - jnp.round(plen * widths).astype(jnp.int32)  # (Nw,)
    o_hi = max_off if omax_slice is None else jnp.minimum(omax_slice, max_off)
    ok = (wvalid[:, None]
          & (offsets[None, :] < o_hi[:, None])
          & (offsets[None, :] + maxc[:, None] + NUMBER_WIDTH < CARD_WIDTH))
    flat = jnp.where(ok, scores, jnp.inf).reshape(-1)

    # width-major, offset-minor first-min == the C++ scan/tie order
    i = jnp.argmin(flat)
    s = flat[i]
    w = widths[i // n_off]
    o = offsets[i % n_off]
    better = s < best[0]                                  # strict, carries
    return (jnp.where(better, s, best[0]),
            jnp.where(better, w, best[1]),
            jnp.where(better, o, best[2]))


def best_n_hseg(y_strip, pattern_type, number_length) -> HSeg:
    """Reference-exact 4-stage search (n_hseg.cpp:88-152), fully jittable.

    y_strip: (27, 428) uint8 PAN strip; pattern_type: 1 or 2 (traced).
    Matches the compiled C++ candidate-for-candidate: same f32 width
    accumulation, same lrintf centers, same strict-< carry and tie order.
    """
    plen, kmask = _pattern_consts(pattern_type)
    gs = grad_profile(y_strip)
    cums = jnp.concatenate([jnp.zeros((1,), gs.dtype), jnp.cumsum(gs)])
    win_full, cums_full = _window_bank(gs, cums)

    best = (jnp.float32(428.0), jnp.float32(0.0), jnp.int32(0))
    w1 = jnp.asarray(_stage1_widths())
    best = _stage_best(win_full, cums_full, w1, jnp.ones(w1.shape[0], bool),
                       jnp.int32(0), None, 10, 16, plen, kmask, best)
    for half, step, slots, d_o, n_off in ((0.5, 0.2, 6, 10, 20),
                                          (0.2, 0.1, 5, 3, 6),
                                          (0.1, 0.05, 6, 3, 6)):
        _, bw, bo = best
        widths, wvalid = _f32_width_grid(bw, half, step, slots)
        omin = jnp.maximum(bo - d_o, 0)   # uint16 underflow guard, :125-128
        best = _stage_best(win_full, cums_full, widths, wvalid, omin,
                           bo + d_o, 1, n_off, plen, kmask, best)

    score, width, o = best
    # digit cell left edges: o + lrintf(k*w) for MASKED k, packed in digit
    # order (n_hseg.cpp:57-66); the masked positions are static constants
    # per pattern, so the pack is a simple select
    def _positions(p):
        ks = [k for k, m in enumerate(PATTERN_MASKS[p]) if m]
        return np.array(ks + [0] * (16 - len(ks)), np.float32)
    masked_k = jnp.where(pattern_type == 2, jnp.asarray(_positions(2)),
                         jnp.asarray(_positions(1)))
    centers = o + jnp.round(masked_k * width).astype(jnp.int32)

    n_offsets = number_length.astype(jnp.int32)
    active = jnp.arange(16) < n_offsets
    offsets = jnp.where(active, centers, 0).astype(jnp.int32)

    return HSeg(
        n_offsets=n_offsets,
        number_width=width,
        pattern_offset=o.astype(jnp.int32),
        offsets=offsets,
        score=score,
    )
