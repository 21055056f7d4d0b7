"""Pallas TPU kernel: fused PAN digit-cell preparation.

Fuses the whole per-digit preprocessing chain of n_categorize.cpp:94-99 —
cell extraction at dynamic hseg offsets, 2-D cross morph gradient
(cell-clamped borders), histogram equalization, and [0,1] f32 scaling —
into ONE kernel: the 27x428 strip loads into VMEM once and each grid step
emits a finished digit cell. Digit offsets arrive via
PrefetchScalarGridSpec so the cell's dynamic position is known before the
body runs.

Mosaic-specific shape choices: dynamic lane offsets are realized as a
dynamic roll + static slice (unaligned dynamic lane slices are
unsupported), and all intermediates keep a 128-lane last dimension (the
cell occupies the first 19 lanes; pads are masked out of the morph and the
histogram). Equalization is a 256-bin sweep with a running CDF — the same
lut semantics as cv/stats.cpp:116-159 without any reshape.

Portable fallback: scan/categorize.py's jnp path (identical results —
parity-tested in interpret mode and on TPU; max abs diff 0.0 compiled).

When to use which: the Pallas kernel minimizes per-frame latency and VMEM
round-trips for a SINGLE frame; under the vmapped multi-stream serving
batch the pallas grid is serialized per stream, and XLA's fused jnp path
wins — hence config.use_pallas defaults to False for serving.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...constants import CARD_WIDTH, NUMBER_HEIGHT, NUMBER_WIDTH

N_CELLS = 16
_CELL_PIXELS = NUMBER_HEIGHT * NUMBER_WIDTH  # 513
_LANES = 128
_PADDED_W = 512  # strip width padded to a lane multiple for dynamic_rotate


def _digit_prep_kernel(offsets_ref, strip_ref, out_ref):
    """Grid step i prepares digit cell i.

    offsets_ref: (16,) int32 scalar-prefetch; strip_ref: (27, 512) int32
    (428-wide strip zero-padded to an aligned lane count — dynamic_rotate
    requires it); out_ref: (27, 128) f32 block (cell in first 19 lanes).
    """
    i = pl.program_id(0)
    off = offsets_ref[i]

    strip = strip_ref[:, :]            # (27, 512) zero-padded
    rolled = pltpu.roll(strip, _PADDED_W - off, axis=1)
    cell = rolled[:, :_LANES]          # (27, 128); cell = lanes [0, 19)
    lane = jax.lax.broadcasted_iota(jnp.int32, (NUMBER_HEIGHT, _LANES), 1)
    valid = lane < NUMBER_WIDTH

    # 2-D cross morph gradient with cell-clamped borders (cv/morph.cpp
    # semantics). Horizontal shifts clamp at lanes 0 and 18.
    w = jnp.where(lane == 0, cell, pltpu.roll(cell, 1, axis=1))
    e_shift = pltpu.roll(cell, _LANES - 1, axis=1)  # left-by-1 (shift >= 0)
    e = jnp.where(lane == NUMBER_WIDTH - 1, cell, e_shift)
    n = jnp.concatenate([cell[:1, :], cell[:-1, :]], axis=0)
    s = jnp.concatenate([cell[1:, :], cell[-1:, :]], axis=0)
    mx = jnp.maximum(jnp.maximum(jnp.maximum(n, s), jnp.maximum(w, e)), cell)
    mn = jnp.minimum(jnp.minimum(jnp.minimum(n, s), jnp.minimum(w, e)), cell)
    grad = jnp.where(valid, mx - mn, -1)   # pads -> -1: excluded from bins

    # histogram equalization (cv/stats.cpp:116-159: lut[v] =
    # sat(round(cdf[v]*255/N)), lut[0]=0) as a 256-bin sweep with a
    # running CDF
    def bin_body(v, carry):
        cdf, eq = carry
        mask = grad == v
        cdf = cdf + jnp.sum(mask.astype(jnp.int32))
        eq = jnp.where(mask, cdf.astype(jnp.float32), eq)
        return cdf, eq

    cdf0 = jnp.asarray(0, jnp.int32)
    eq0 = jnp.zeros((NUMBER_HEIGHT, _LANES), jnp.float32)
    _, cdf_at = jax.lax.fori_loop(0, 256, bin_body, (cdf0, eq0))
    vals = jnp.clip(jnp.round(cdf_at * (255.0 / _CELL_PIXELS)), 0.0, 255.0)
    eq = jnp.where(grad <= 0, 0.0, vals)

    out_ref[:, :] = eq / 255.0


@functools.partial(jax.jit, static_argnames=("interpret",))
def prepare_digit_cells_pallas(y_strip, offsets, interpret=False):
    """All 16 digit cells extracted + prepped in one fused kernel.

    y_strip: (27, 428) uint8; offsets: (16,) int32 cell left edges.
    Returns (16, 27, 19) float32 — matches
    scan.categorize.prepare_cells(extract_cells(...)).
    """
    strip = jnp.pad(y_strip.astype(jnp.int32),
                    ((0, 0), (0, _PADDED_W - CARD_WIDTH)))
    offsets = jnp.clip(offsets.astype(jnp.int32), 0,
                       CARD_WIDTH - NUMBER_WIDTH)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N_CELLS,),
        in_specs=[pl.BlockSpec((NUMBER_HEIGHT, _PADDED_W),
                               lambda i, offs: (0, 0))],
        out_specs=pl.BlockSpec((None, NUMBER_HEIGHT, _LANES),
                               lambda i, offs: (i, 0, 0)),
    )
    padded = pl.pallas_call(
        _digit_prep_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N_CELLS, NUMBER_HEIGHT, _LANES),
                                       jnp.float32),
        interpret=interpret,
    )(offsets, strip)
    return padded[:, :, :NUMBER_WIDTH]
