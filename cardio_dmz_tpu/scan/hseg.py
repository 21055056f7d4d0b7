"""Horizontal segmentation: find the 15/16 digit x-offsets.

TPU-native reformulation of best_n_hseg (scan/n_hseg.cpp:88-152). The
reference runs a 4-stage coarse-to-fine search over (digit width, pattern
offset); we evaluate the ENTIRE candidate grid densely at the finest
resolution (width step 0.05 over [17.1, 19.7), all integer offsets) in one
tensor expression — a global argmin over every candidate the reference's
narrowing search could ever reach, so it can only match or beat it.

Score for candidate (w, o): L1 distance between the normalized column-sum
gradient profile and a template vector built by stamping the 19-sample
empirical digit pattern (n_hseg.cpp:15-20) at x = o + lrint(k*w) for each
masked digit k, zeros elsewhere (n_hseg.cpp:54-72). Stamps can overlap for
w < 19; later stamps overwrite (Eigen segment assignment) — reproduced in
the precomputed template bank.

The template bank over (pattern, width) is STATIC: built host-side once,
embedded as a constant. The per-frame work is one (144x428) Hankel gather
plus a masked L1 reduction — pure VPU work that XLA fuses (the offset
axis is bounded by the largest reachable pattern offset, see N_OFFSETS).
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


def best_n_hseg(y_strip, pattern_type, number_length) -> HSeg:
    """y_strip: (27, 428) uint8 PAN strip; pattern_type: 1 or 2 (traced).

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
