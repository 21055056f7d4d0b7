"""Vertical segmentation: find the PAN row and pattern type.

TPU-native reformulation of best_n_vseg (scan/n_vseg.cpp:94-168). The
reference does a coarse pass every 4 rows plus a fine pass around the best
window (a mobile-CPU optimization); on TPU we evaluate ALL 270 strip rows in
one batched MLP — the entire stage is two matmuls on the MXU. This is a
strict superset of the reference's evaluation (the coarse/fine trick can
only miss candidates), so scores differ slightly from the C++ in frames
where the coarse pass skipped the true optimum.

Per strip row (n_vseg.cpp:39-47): 408-px strip at x=10 -> 1-D morph
gradient -> 2x downsample -> min-max normalize -> MLP(204->50->3) giving
P(nothing / visa-like row / amex-like row). Window score = box sum of 27
consecutive row probabilities (n_vseg.cpp:49-92); best (pattern, offset)
by strict-> scan with visa checked before amex at each offset.
"""

import typing

import jax.numpy as jnp
import numpy as np

from ..constants import (
    CARD_HEIGHT,
    NUMBER_LENGTH_FOR_PATTERN,
    PATTERN_LENGTH_FOR_PATTERN,
    PATTERN_MASKS,
    PATTERN_UNKNOWN,
    VSEG_STRIP_X,
    VSEG_STRIP_WIDTH,
    VSEG_WINDOW,
)
from ..models import apply_mlp
from ..ops import lineardown2_1d_u8, morph_grad3_1d_u8, norm_convert_minmax

N_WINDOWS = CARD_HEIGHT - VSEG_WINDOW + 1  # 244

_NUMBER_LENGTH = np.array(NUMBER_LENGTH_FOR_PATTERN, np.int32)
_PATTERN_LENGTH = np.array(PATTERN_LENGTH_FOR_PATTERN, np.int32)
_PATTERN_MASK = np.array(PATTERN_MASKS, np.int32)  # (3, 19)


class VSeg(typing.NamedTuple):
    """NVerticalSegmentation equivalent (scan/n_vseg.h:14-21)."""
    y_offset: jnp.ndarray       # int32
    pattern_type: jnp.ndarray   # int32: 0 unknown, 1 visa-like, 2 amex-like
    score: jnp.ndarray          # float32 (sum of 27 row probabilities)
    number_length: jnp.ndarray  # int32: 16 / 15 / 0
    pattern_length: jnp.ndarray  # int32: 19 / 17 / 0
    pattern_mask: jnp.ndarray   # (19,) int32 digit-presence mask


def vseg_row_probabilities(params_vseg, y):
    """Probabilities for every strip row at once.

    y: (..., 270, 428) uint8. Returns (..., 270, 3) float32.
    """
    strips = y[..., :, VSEG_STRIP_X:VSEG_STRIP_X + VSEG_STRIP_WIDTH]
    grad = morph_grad3_1d_u8(strips)
    down = lineardown2_1d_u8(grad)              # (..., 270, 204)
    normed = norm_convert_minmax(down, axis=-1)  # per-row min-max
    return apply_mlp(params_vseg, normed)        # MXU: (270, 204) @ (204, 50)


def best_n_vseg(params_vseg, y) -> VSeg:
    """y: (270, 428) uint8 (single frame; vmap for batches)."""
    probs = vseg_row_probabilities(params_vseg, y)  # (270, 3)
    vis = probs[:, 1]
    amex = probs[:, 2]

    # 27-row box sums for every window start: cumulative-sum difference.
    def window_sums(v):
        c = jnp.cumsum(jnp.concatenate([jnp.zeros((1,), v.dtype), v]))
        return c[VSEG_WINDOW:] - c[:-VSEG_WINDOW]  # (244,)

    # reference scan order: offsets ascending, visa strictly-greater checked
    # before amex (n_vseg.cpp:74-85) == first-max of [vis0, amex0, vis1, ...]
    stacked = jnp.stack([window_sums(vis), window_sums(amex)], axis=1)  # (244, 2)
    flat = stacked.reshape(-1)
    best = jnp.argmax(flat)
    best_score = flat[best]
    y_offset = (best // 2).astype(jnp.int32)
    pattern = (best % 2 + 1).astype(jnp.int32)

    # all-zero scores -> unknown (best->score starts at 0, n_vseg.cpp:59-61)
    found = best_score > 0.0
    pattern = jnp.where(found, pattern, PATTERN_UNKNOWN)
    y_offset = jnp.where(found, y_offset, 0)

    return VSeg(
        y_offset=y_offset,
        pattern_type=pattern,
        score=best_score,
        number_length=jnp.asarray(_NUMBER_LENGTH)[pattern],
        pattern_length=jnp.asarray(_PATTERN_LENGTH)[pattern],
        pattern_mask=jnp.asarray(_PATTERN_MASK)[pattern],
    )
