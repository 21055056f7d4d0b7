"""Dense dynamic-window selection without gathers or giant shift stacks.

Several expiry-seg stages (expiry_seg.cpp:255-331 trimming,
expiry_seg.cpp:29-54 slash crops, expiry_categorize.cpp:149-252 digit
crops) need, per candidate k, a narrow column window of a shared band:

    crops[k, r, x] = band[r, lefts[k] + x],   x < X

The round-2 form stacked X full-width shifted copies of the band and
contracted them with a one-hot over the left position. XLA lowers that
``jnp.stack`` to a CHAIN of full-size pad/concat fusions — the optimized
scan HLO showed 18 chained bf16[256,3,18,21,411] buffers (~4.3 GB/step
@256 streams) for the trim site alone, the single largest HBM cost in
the pipeline (PERF.md: every serving shape is HBM-bound).

This module factors the selection in two levels, ``left = 16*q + rem``:

  1. coarse: 16-aligned 48-wide windows built by ONE reshape + a 3-way
     concat of 16-column blocks (no X-way stack, no pad chain), then a
     small one-hot matmul over the ~27 coarse positions;
  2. fine: rem in [0, 16), applied as a per-k (U=48 x X) one-hot matmul.

Exactness: every output element is the sum of exactly one 1.0 * value
product (plus true zeros), in the same default-precision dot pipeline as
the round-2 form — bf16(value) survives both levels unchanged, so the
results are bit-identical to the stacked-shift contraction.
"""

import jax.numpy as jnp

_STRIDE = 16


def coarse_blocks(band, width):
    """16-aligned windows of ``width`` <= 48 columns, every 16 columns.

    band: (..., R, C). Returns (..., R, Q, width) with
    windows[..., r, q, u] = band[..., r, 16*q + u] (zero-padded past C),
    built from one reshape + one concat (single materialized buffer; no
    transpose — contract with einsum "...kq,...rqu->...kru").
    """
    assert width <= 3 * _STRIDE
    c = band.shape[-1]
    nb = -(-c // _STRIDE) + 2                     # blocks incl. 2 pad blocks
    pad = [(0, 0)] * (band.ndim - 1) + [(0, nb * _STRIDE - c)]
    blocks = jnp.pad(band, pad).reshape(
        band.shape[:-1] + (nb, _STRIDE))          # (..., R, nb, 16)
    wide = jnp.concatenate(
        [blocks[..., :-2, :], blocks[..., 1:-1, :], blocks[..., 2:, :]],
        axis=-1)                                  # (..., R, nb-2, 48)
    return wide[..., :width]


def window_select(band, lefts, x_width, dtype=jnp.float32):
    """crops[..., k, r, x] = band[..., r, lefts[..., k] + x] for x < x_width.

    band: (..., R, C); lefts: (..., K) int32 in [0, C - x_width] (clipped).
    Batch dims of band and lefts must agree. Returns (..., K, R, x_width)
    in ``dtype`` (the dot accumulates in f32; 0/1 selectors make every
    output a single exact product).
    """
    c = band.shape[-1]
    u = _STRIDE + x_width                         # window width needed
    assert u <= 3 * _STRIDE, "x_width > 32 unsupported"
    wide = coarse_blocks(band.astype(dtype), u)   # (..., R, Q, U)
    q_pos = wide.shape[-2]
    l0 = jnp.clip(lefts, 0, c - x_width)
    q, rem = l0 // _STRIDE, l0 % _STRIDE
    ohq = (q[..., None] == jnp.arange(q_pos)).astype(dtype)    # (..., K, Q)
    w = jnp.einsum("...kq,...rqu->...kru", ohq, wide)          # (..., K, R, U)
    fine = ((rem[..., None, None] + jnp.arange(x_width)[None, :])
            == jnp.arange(u)[:, None]).astype(dtype)           # (..., K, U, X)
    return jnp.einsum("...kru,...kux->...krx", w.astype(dtype), fine)
