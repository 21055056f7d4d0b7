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

def _stage1_widths():
    """float32 width grid of stage 1: w = 17.1f; w < 19.7f; w += 0.5f."""
    ws, w = [], np.float32(HSEG_WIDTH_MIN)
    while w < np.float32(HSEG_WIDTH_MAX):
        ws.append(w)
        w = np.float32(w + np.float32(0.5))
    return np.array(ws, np.float32)          # 6 widths


def _np_chain(center, half, step, slots):
    """Emulate `for (w = c-half; w < c+half; w += step)` in IEEE float32.

    Returns (values (slots,) f32, valid (slots,) bool). The slot count the
    C++ actually runs genuinely depends on f32 rounding (e.g. stage 4 runs
    5 iterations, not 4), hence the fixed-slot + validity-mask form.
    """
    f32 = np.float32
    w = f32(f32(center) - f32(half))
    limit = f32(f32(center) + f32(half))
    vals, valid = [], []
    for _ in range(slots):
        vals.append(w)
        valid.append(bool(w < limit))
        w = f32(w + f32(step))
    return np.array(vals, f32), np.array(valid, bool)


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

    Zero-padding gs (instead of clip + where) keeps every static index
    in range, so the bank is the gather alone — the clip+where form
    materialized gather + select_n + copy, 4 x 70 MB/step @256 streams
    in the round-5 scan HLO (hlo_hogs), the largest non-expiry buffers.
    """
    idx = jnp.arange(_O_FULL)[:, None] + jnp.arange(CARD_WIDTH)[None, :]
    win_full = jnp.pad(gs, (0, _O_FULL))[idx]
    return win_full, cums[:_O_FULL]



# relative offset window around the stage-1 optimum: stage 2 explores
# bo1 + [-10, 9], stage 3 a further +-3, stage 4 another +-3
_R_LO, _R_HI = -16, 14
_N_R = _R_HI - _R_LO


@functools.lru_cache(maxsize=None)
def _cascade_tables():
    """Static tables driving the whole 4-stage search at runtime.

    Every width any stage can visit is an IEEE-f32 chain from the static
    stage-1 grid, so the full width universe (254 values), each width's
    stamped template (deduped by rounded center-vector: 148 per pattern),
    per-width offset bounds, and the chain tables of stages 2-4 are all
    precomputed host-side.  The runtime graph contains NO width
    arithmetic: it scores one constant template bank against one offset
    window and emulates the stage argmins with one-hot selects.
    """
    f32 = np.float32
    tmpl = np.array(HSEG_GRAD_SUM_PATTERN, f32)
    w1 = _stage1_widths()
    c2 = [_np_chain(w, 0.5, 0.2, 6) for w in w1]
    parents3 = sorted({float(v) for v in w1}
                      | {float(v) for vals, _ in c2 for v in vals})
    c3 = {u: _np_chain(u, 0.2, 0.1, 5) for u in parents3}
    parents4 = sorted(set(parents3)
                      | {float(v) for vals, _ in c3.values() for v in vals})
    c4 = {u: _np_chain(u, 0.1, 0.05, 6) for u in parents4}
    allw = sorted(set(parents4)
                  | {float(v) for vals, _ in c4.values() for v in vals})
    wval = np.array(allw, f32)
    nu = len(allw)
    uidx = {v: i for i, v in enumerate(allw)}

    # pattern-independent chain tables (u-index + static loop-bound validity)
    u1 = np.array([uidx[float(v)] for v in w1], np.int32)
    u2 = np.array([[uidx[float(v)] for v in vals] for vals, _ in c2],
                  np.int32)                                   # (6, 6)
    v2 = np.array([ok for _, ok in c2], bool)
    u3 = np.zeros((nu, 5), np.int32)
    v3 = np.zeros((nu, 5), bool)
    for u in parents3:
        vals, ok = c3[u]
        u3[uidx[u]] = [uidx[float(v)] for v in vals]
        v3[uidx[u]] = ok
    u4 = np.zeros((nu, 6), np.int32)
    v4 = np.zeros((nu, 6), bool)
    for u in parents4:
        vals, ok = c4[u]
        u4[uidx[u]] = [uidx[float(v)] for v in vals]
        v4[uidx[u]] = ok

    pats = []
    for p in (1, 2):
        plen, mask = PATTERN_LENGTH_FOR_PATTERN[p], PATTERN_MASKS[p]
        cvmap = {}
        cvid = np.zeros(nu, np.int32)
        obound = np.zeros(nu, np.int32)
        for i, w in enumerate(wval):
            # stamp centers at offset 0: lrintf(k*w) in f32, half-to-even
            c = tuple(int(np.rint(f32(k) * w)) for k in range(plen))
            cvid[i] = cvmap.setdefault(c, len(cvmap))
            maxc = max(ck for k, ck in enumerate(c) if mask[k])
            # candidate (w, o) valid iff o < 428 - lrintf(plen*w) (the loop
            # bound, n_hseg.cpp:49-53) and every stamp is fully inside:
            # o + maxc + 19 < 428 (the in_bounds check, :60-64)
            max_off = CARD_WIDTH - int(np.rint(f32(plen) * w))
            obound[i] = min(max_off, CARD_WIDTH - NUMBER_WIDTH - maxc)
        bank = np.zeros((len(cvmap), CARD_WIDTH), f32)
        for c, ci in cvmap.items():
            for k in range(plen):
                if mask[k]:
                    n = min(NUMBER_WIDTH, CARD_WIDTH - c[k])
                    if n > 0:  # later stamps overwrite (n_hseg.cpp:55-67)
                        bank[ci, c[k]:c[k] + n] = tmpl[:n]
        pats.append({"cvid": cvid, "obound": obound, "bank": bank})

    ncv = max(p["bank"].shape[0] for p in pats)
    out = {"wval": wval, "u1": u1, "v2": v2, "v3": v3, "v4": v4,
           "fu2": u2.astype(f32), "fu3": u3.astype(f32),
           "fu4": u4.astype(f32)}
    for name, d in zip(("visa", "amex"), pats):
        bank = d["bank"]
        if bank.shape[0] < ncv:
            bank = np.pad(bank, ((0, ncv - bank.shape[0]), (0, 0)))
        cvid, obound = d["cvid"], d["obound"]
        out[name] = {
            "bank": bank,
            "base1": bank[cvid[u1]],                  # (6, 428)
            # per-stage templates with the cv select FOLDED IN host-side:
            # base_n[parent, slot, x] — selection commutes with |.|, so
            # comparing these directly equals selecting rows of a full
            # bank sweep, at ~1/18th the arithmetic
            "base2": bank[cvid[u2]],                  # (6, 6, 428)
            "base3": bank[cvid[u3]],                  # (nu, 5, 428)
            "base4": bank[cvid[u4]],                  # (nu, 6, 428)
            "ob1": obound[u1].astype(f32),
            "ob2": obound[u2].astype(f32),            # (6, 6)
            "ob3": obound[u3].astype(f32),            # (nu, 5)
            "ob4": obound[u4].astype(f32),            # (nu, 6)
        }
    return out


def best_n_hseg(y_strip, pattern_type, number_length) -> HSeg:
    """Reference-exact 4-stage search (n_hseg.cpp:88-152), fully jittable.

    y_strip: (27, 428) uint8 PAN strip; pattern_type: 1 or 2 (traced).
    Matches the compiled C++ candidate-for-candidate: the same f32 width
    chains (precomputed host-side), lrintf round-half-even stamp centers,
    strict-< carry between stages, and width-major/offset-minor tie order.
    Gather-free: one static-template-bank sweep over a 30-offset window
    plus one-hot-select argmin emulation (see _cascade_tables).
    """
    t = _cascade_tables()
    is_amex = pattern_type == 2

    # Select pattern-dependent data by computing tiny per-pattern RESULTS
    # and where-ing those — never the tables themselves: under the stream
    # vmap, a where() on a (336, 5, 160) constant batches to a per-stream
    # copy (tens of MB materialized per step).
    def pick(key):
        return jnp.where(is_amex, jnp.asarray(t["amex"][key]),
                         jnp.asarray(t["visa"][key]))

    gs = grad_profile(y_strip)
    cums = jnp.concatenate([jnp.zeros((1,), gs.dtype), jnp.cumsum(gs)])
    win_full, cums_full = _window_bank(gs, cums)

    # ---- stage 1: static 6-width x 16-offset grid (offsets 0,10,..,150)
    base1 = pick("base1")
    win10 = win_full[0:_O_FULL:10]                     # (16, 428)
    pref10 = cums_full[0:_O_FULL:10]
    s1 = jnp.sum(jnp.abs(win10[None, :, :] - base1[:, None, :]), -1)
    s1 = s1 + pref10[None, :]                          # (6, 16)
    o1grid = 10 * jnp.arange(16)
    ok1 = o1grid[None, :] < pick("ob1")[:, None]
    flat1 = jnp.where(ok1, s1, jnp.inf).reshape(-1)
    i1 = jnp.argmin(flat1)                # width-major == C++ scan order
    best_s = flat1[i1]
    p1 = i1 // 16
    bo1 = (10 * (i1 % 16)).astype(jnp.int32)
    # stage 1 always improves on the 428.0 init in practice; `found`
    # guards the (unreachable) all-invalid case to keep outputs defined
    found = best_s < jnp.float32(428.0)
    best_s = jnp.minimum(best_s, jnp.float32(428.0))
    oh_p1 = (jnp.arange(6) == p1).astype(gs.dtype)
    u = (oh_p1 * jnp.asarray(t["u1"]).astype(gs.dtype)).sum()
    rbest = jnp.int32(0)

    # ---- shared relative sweep: every (center-vector, bo1+r) score the
    # remaining stages can ever ask for, in one dense pass
    rr = jnp.arange(_R_LO, _R_HI)                      # (30,)
    ogrid = bo1 + rr
    selm = (jnp.arange(_O_FULL)[None, :] == ogrid[:, None]).astype(gs.dtype)
    win_r = selm @ win_full                            # (30, 428)
    pref_r = selm @ cums_full

    def stage(n_slots, base_s, ob_t, v_row, fu_row, r_lo, r_hi, state):
        """One best_n_hseg_constrained call (n_hseg.cpp:39-85): L1 of the
        stage's (slots, 428) templates against the shared offset window +
        strict-< carry against the running best."""
        best_s, u, rbest, found = state
        blk = jnp.sum(jnp.abs(win_r[None, :, :] - base_s[:, None, :]), -1)
        blk = blk + pref_r[None, :]                    # (slots, 30)
        ok = (v_row[:, None] > 0.5) & (rr >= r_lo)[None, :] \
            & (rr < r_hi)[None, :] & (ogrid >= 0)[None, :] \
            & (ogrid[None, :].astype(gs.dtype) < ob_t[:, None]) & found
        flat = jnp.where(ok, blk, jnp.inf).reshape(-1)
        i = jnp.argmin(flat)                           # C++ scan/tie order
        s = flat[i]
        slot = i // _N_R
        r = (_R_LO + i % _N_R).astype(jnp.int32)
        better = s < best_s
        oh_s = (jnp.arange(n_slots) == slot).astype(gs.dtype)
        u_new = (oh_s * fu_row).sum()
        return (jnp.where(better, s, best_s),
                jnp.where(better, u_new, u),
                jnp.where(better, r, rbest),
                found)

    # per-pattern contraction against the per-pattern CONSTANT table,
    # where-selecting only the small result (see pick() note)
    def dual(key, contract):
        return jnp.where(is_amex, contract(jnp.asarray(t["amex"][key])),
                         contract(jnp.asarray(t["visa"][key])))

    # stage 2: widths chain2(bw1), offsets bo1 +- 10 (n_hseg.cpp:123-131)
    fdt = gs.dtype
    base2 = dual("base2", lambda m: jnp.einsum("p,psx->sx", oh_p1, m))
    ob2 = dual("ob2", lambda m: oh_p1 @ m)
    v2 = oh_p1 @ jnp.asarray(t["v2"]).astype(fdt)
    fu2 = oh_p1 @ jnp.asarray(t["fu2"])
    state = stage(6, base2, ob2, v2, fu2, jnp.int32(-10), jnp.int32(10),
                  (best_s, u, rbest, found))

    # stage 3: widths chain3(bw2), offsets bo2 +- 3 (:133-139)
    nu = t["wval"].shape[0]
    oh_u = (jnp.arange(nu) == state[1].astype(jnp.int32)).astype(fdt)
    base3 = dual("base3", lambda m: jnp.einsum("u,usx->sx", oh_u, m))
    state = stage(5, base3, dual("ob3", lambda m: oh_u @ m),
                  oh_u @ jnp.asarray(t["v3"]).astype(fdt),
                  oh_u @ jnp.asarray(t["fu3"]),
                  state[2] - 3, state[2] + 3, state)

    # stage 4: widths chain4(bw3), offsets bo3 +- 3 (:141-147)
    oh_u = (jnp.arange(nu) == state[1].astype(jnp.int32)).astype(fdt)
    base4 = dual("base4", lambda m: jnp.einsum("u,usx->sx", oh_u, m))
    state = stage(6, base4, dual("ob4", lambda m: oh_u @ m),
                  oh_u @ jnp.asarray(t["v4"]).astype(fdt),
                  oh_u @ jnp.asarray(t["fu4"]),
                  state[2] - 3, state[2] + 3, state)

    score, u, rbest, found = state
    oh_u = (jnp.arange(nu) == u.astype(jnp.int32)).astype(fdt)
    width = jnp.where(found, (oh_u * jnp.asarray(t["wval"])).sum(),
                      jnp.float32(0.0))
    o = jnp.where(found, bo1 + rbest, 0).astype(jnp.int32)

    # digit cell left edges: o + lrintf(k*w) for MASKED k, packed in digit
    # order (n_hseg.cpp:57-66); the masked positions are static constants
    # per pattern, so the pack is a simple select
    def _positions(p):
        ks = [k for k, m in enumerate(PATTERN_MASKS[p]) if m]
        return np.array(ks + [0] * (16 - len(ks)), np.float32)
    masked_k = jnp.where(is_amex, jnp.asarray(_positions(2)),
                         jnp.asarray(_positions(1)))
    centers = o + jnp.round(masked_k * width).astype(jnp.int32)

    n_offsets = number_length.astype(jnp.int32)
    active = jnp.arange(16) < n_offsets
    offsets = jnp.where(active, centers, 0).astype(jnp.int32)

    return HSeg(
        n_offsets=n_offsets,
        number_width=width,
        pattern_offset=o,
        offsets=offsets,
        score=score,
    )
