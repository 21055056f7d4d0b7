"""PAN digit categorization: score all 15/16 digit cells (scan/n_categorize.cpp).

Per digit cell (n_categorize.cpp:94-101): 19x27 crop at its hseg offset ->
2-D cross morph gradient (clamped at the CELL boundary, matching the
reference's ROI semantics) -> histogram equalize -> scale to [0,1] f32 ->
3-model conv ensemble combined as (r0+r1+r2-max)/2 (n_categorize.cpp:69-71).

All 16 cells are gathered with one vmapped dynamic_slice and classified as a
single batch — the three convs and both matmuls run once per frame over the
16-cell batch (and over the stream batch when the caller vmaps).
"""

import jax
import jax.numpy as jnp
from jax import lax

from ..constants import NUMBER_WIDTH
from ..models import pan_digit_scores
from ..ops import equalize_hist, morph_grad3_2d_cross_u8


def extract_cells(y_strip, offsets, latency_shape=False):
    """Gather 16 digit cells. y_strip: (27, 428) u8; offsets: (16,) int32.
    Returns (16, 27, 19) u8.

    Gather-free default: a vmapped dynamic_slice of the (shared) strip
    lowers to a serial slice chain under the stream vmap; one one-hot
    contraction per frame fetches all 16 cells as a single MXU matmul
    instead. Each output sums exactly one nonzero product, so the values
    are exact. latency_shape=True picks the dynamic_slice form — cheaper
    un-vmapped (the batch-1 serving config, ScanConfig.latency_shape)."""
    if latency_shape:
        def cell(off):
            return lax.dynamic_slice(
                y_strip, (0, off), (y_strip.shape[-2], NUMBER_WIDTH))
        return jax.vmap(cell)(offsets)
    cols = jnp.arange(y_strip.shape[-1])
    # sel[k, x', c] = (c == offsets[k] + x')
    sel = (cols[None, None, :]
           == (offsets[:, None] + jnp.arange(NUMBER_WIDTH))[:, :, None])
    cells = jnp.einsum("kxc,rc->krx", sel.astype(jnp.float32),
                       y_strip.astype(jnp.float32))
    return cells.astype(y_strip.dtype)


def prepare_cells(cells):
    """morph grad -> equalize -> [0,1] f32 (n_categorize.cpp:96-99).
    cells: (..., 27, 19) u8 -> same shape f32."""
    grad = morph_grad3_2d_cross_u8(cells)
    eq = equalize_hist(grad)
    return eq.astype(jnp.float32) / 255.0


def number_scores(params, y_strip, offsets, n_offsets, use_pallas=False,
                  latency_shape=False):
    """Full (16, 10) score matrix; rows >= n_offsets are zero
    (NumberScores, scan/n_categorize.h:14; unused rows stay Zero,
    n_categorize.cpp:93).

    params: dict with 'pan_conv_a'/'pan_conv_b'/'pan_conv_c' param dicts.
    use_pallas: route cell prep through the fused Pallas kernel
    (ops/pallas/digit_prep.py — bit-identical, TPU only).
    latency_shape: dynamic-slice cell fetch (see extract_cells).
    """
    if use_pallas:
        from ..ops.pallas import prepare_digit_cells_pallas
        prepped = prepare_digit_cells_pallas(y_strip, offsets)
    else:
        cells = extract_cells(y_strip, offsets, latency_shape=latency_shape)
        prepped = prepare_cells(cells)                   # (16, 27, 19)
    scores = pan_digit_scores(
        params["pan_conv_a"], params["pan_conv_b"], params["pan_conv_c"],
        prepped)                                         # (16, 10)
    active = (jnp.arange(16) < n_offsets)[:, None]
    return jnp.where(active, scores, 0.0)
