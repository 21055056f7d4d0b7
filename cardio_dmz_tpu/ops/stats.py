"""Statistics kernels: focus stddev, histogram equalization, brightness.

cv/stats.cpp equivalents. equalize_hist follows the cvEqualizeHist algorithm
the reference vendored (cv/stats.cpp:116-159): 256-bin histogram -> CDF ->
rounded LUT with lut[0] forced to 0.
"""

import jax
import jax.numpy as jnp


def stddev_of_abs(x, axes=(-2, -1)):
    """Population stddev of |x| (llcv_stddev_of_abs, cv/stats.cpp:17-111).

    Note sum of squares uses x^2 == |x|^2, so only the mean uses abs.
    x: int array. Returns float32 scalar (or batch of scalars).
    """
    xf = jnp.abs(x).astype(jnp.float32)
    n = 1.0
    for a in axes:
        n = n * x.shape[a]
    mean = jnp.sum(xf, axis=axes) / n
    sumsq = jnp.sum(xf * xf, axis=axes)
    return jnp.sqrt(sumsq / n - mean * mean)


def brightness_mean(x, axes=(-2, -1)):
    """cvAvg equivalent (dmz_brightness_score_for_image, dmz.cpp:128-135)."""
    return jnp.mean(x.astype(jnp.float32), axis=axes)


# Below this pixel count the O(N^2) comparison form is used: it is pure
# fused VPU work (no scatter/gather), far faster on TPU for the small digit
# cells that dominate the hot path (27x19 = 513 px -> 513^2 comparisons).
_DENSE_EQUALIZE_MAX_PIXELS = 1024
# Below this, the direct pairwise-rank form beats even the 256-bin
# indicator form: rank_i = #(x_j <= x_i) == cdf[x_i], one (N, N)
# comparison+reduce instead of two (256, N) passes (for the 16x11 expiry
# cells: 31k vs 90k ops; measured part of cutting expiry categorize
# 2.5 -> ~1.3 ms/step @256 streams).
_PAIRWISE_EQUALIZE_MAX_PIXELS = 256


def equalize_hist(x):
    """Histogram equalization of a u8 image (cv/stats.cpp:116-159).

    lut[i] = sat_u8(round(cdf[i] * 255 / N)), lut[0] = 0; rounding is
    round-half-to-even (cvRound).

    Three lowerings with identical results:
    * tiny images (expiry cells): per-pixel rank #(x_j <= x_i) IS cdf[x_i];
      lut[0] = 0 becomes "x_i == 0 -> 0" (rank maps value 0 to lut[0])
    * small images (PAN digit cells): a (B, 256, N) value-indicator tensor
      serves twice — histogram (reduce over N) and LUT apply (contract
      over the 256 values); stays on the VPU/MXU
    * large images: scatter-add histogram + LUT gather
    x: (..., H, W) uint8 -> same shape uint8.
    """
    h, w = x.shape[-2], x.shape[-1]
    n = h * w
    batch_shape = x.shape[:-2]
    flat = x.reshape((-1, n)).astype(jnp.int32)

    if n <= _PAIRWISE_EQUALIZE_MAX_PIXELS:
        rank = jnp.sum((flat[:, None, :] <= flat[:, :, None]).astype(
            jnp.float32), axis=-1)                          # (B, N) = cdf[x]
        out = jnp.clip(jnp.round(rank * (255.0 / n)), 0, 255)
        out = jnp.where(flat == 0, 0.0, out)                # lut[0] = 0
        return out.astype(jnp.uint8).reshape(batch_shape + (h, w))

    if n <= _DENSE_EQUALIZE_MAX_PIXELS:
        # two-level factored value indicator (v = 16q + r, as in
        # ops/hough.py): the flat (B, 256, N) f32 one-hot this path used
        # as a dot operand materialized ~2 GB/step of HBM traffic @256
        # streams for the PAN digit cells. Factored, the only dot is the
        # tiny int8 (16, N)x(N, 16) histogram; the LUT apply contracts the
        # 16 q-levels then the 16 r-levels as FUSIONS (elementwise
        # multiply + reduce), never materializing a 256-wide operand.
        # Exact: indicator products are 0/1, counts and LUT values are
        # small integers.
        ohq = (flat[:, None, :] >> 4) == jnp.arange(16)[None, :, None]
        ohr = (flat[:, None, :] & 15) == jnp.arange(16)[None, :, None]
        hist = jnp.einsum("bqp,brp->bqr", ohq.astype(jnp.int8),
                          ohr.astype(jnp.int8),
                          preferred_element_type=jnp.int32)  # (B, 16, 16)
        # LUT apply via the RANK identity instead of a 256-wide per-pixel
        # selection (the joint (q, r) masked reduce this replaces was the
        # pipeline's #1 op by XLA's cost model, 256 ops/pixel):
        #   lut[v_i] = round(cdf[v_i] * 255/n),
        #   cdf[v_i] = rank_i = #(v_j < 16 q_i) + #(q_j == q_i & r_j <= r_i)
        #            = cumq[q_i] + T[r_i, q_i],  T = cumsum_r hist^T.
        # T selected by r via ONE tiny batched MXU dot against the s8
        # r-indicator; q selects fold into a 16-wide fused reduce.
        histf = hist.astype(jnp.float32)
        t_tab = jnp.cumsum(histf, axis=-1)                   # (B, q, <=r)
        cumq = jnp.cumsum(jnp.sum(histf, axis=-1), axis=-1)  # inclusive
        cumq = cumq - jnp.sum(histf, axis=-1)                # exclusive
        # counts reach n > 256, beyond bf16's exact-integer range: pin the
        # (tiny, K=16) selection dot to full f32 precision
        t_sel = jnp.einsum("brp,bqr->bqp", ohr.astype(jnp.float32),
                           t_tab, precision=jax.lax.Precision.HIGHEST)
        rank = jnp.sum(jnp.where(ohq, cumq[:, :, None] + t_sel, 0.0),
                       axis=1)                               # (B, N)
        out = jnp.clip(jnp.round(rank * (255.0 / n)), 0, 255)
        out = jnp.where(flat == 0, 0.0, out)                 # lut[0] = 0
        return out.astype(jnp.uint8).reshape(batch_shape + (h, w))

    def eq_one(v):
        hist = jnp.zeros((256,), jnp.int32).at[v].add(1)
        cdf = jnp.cumsum(hist)
        lut = jnp.clip(jnp.round(cdf.astype(jnp.float32) * (255.0 / n)), 0, 255)
        lut = lut.astype(jnp.uint8).at[0].set(0)
        return lut[v]

    out = jax.vmap(eq_one)(flat)
    return out.reshape(batch_shape + (h, w))
