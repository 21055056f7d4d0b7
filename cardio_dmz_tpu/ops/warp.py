"""Perspective rectification (cv/warp.cpp equivalents).

The reference solves an 8x8 system for the homography via Eigen householderQr
(llcv_calc_persp_transform, cv/warp.cpp:34-125) and warps with
cvWarpPerspective bilinear + fill outliers (:158-166), or a GL shader on
device GPUs. On TPU the warp is just a bilinear gather — one fused op, no GL
analogue needed (SURVEY.md §2.5 mz note).
"""

import jax.numpy as jnp

from ..constants import CARD_WIDTH, CARD_HEIGHT


def calc_persp_transform(source_points, dest_points):
    """Solve for the 3x3 homography H mapping source -> dest.

    source_points/dest_points: (4, 2) arrays of (x, y).
    Mirrors llcv_calc_persp_transform's a/b setup (cv/warp.cpp:46-67);
    uses jnp.linalg.solve (the 8x8 system is tiny).
    """
    sp = jnp.asarray(source_points, jnp.float32)
    dp = jnp.asarray(dest_points, jnp.float32)
    sx, sy = sp[:, 0], sp[:, 1]
    dx, dy = dp[:, 0], dp[:, 1]
    zeros = jnp.zeros((4,), jnp.float32)
    ones = jnp.ones((4,), jnp.float32)
    top = jnp.stack([sx, sy, ones, zeros, zeros, zeros, -sx * dx, -sy * dx], axis=1)
    bot = jnp.stack([zeros, zeros, zeros, sx, sy, ones, -sx * dy, -sy * dy], axis=1)
    a = jnp.concatenate([top, bot], axis=0)
    b = jnp.concatenate([dx, dy], axis=0)
    x = jnp.linalg.solve(a, b)
    h = jnp.concatenate([x, jnp.ones((1,), jnp.float32)]).reshape(3, 3)
    return h


def warp_perspective(image, h_matrix, out_shape, fill_value=0.0):
    """dst(p) = src(H^-1 p) with bilinear sampling, zero fill outside.

    image: (..., H, W) (u8 or float); h_matrix maps src -> dst coords.
    out_shape: (out_h, out_w) static. Matches cvWarpPerspective
    (CV_INTER_LINEAR + CV_WARP_FILL_OUTLIERS) up to its 5-bit fixed-point
    interpolation granularity.
    """
    out_h, out_w = out_shape
    hinv = jnp.linalg.inv(h_matrix)
    xs = jnp.arange(out_w, dtype=jnp.float32)
    ys = jnp.arange(out_h, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)  # (out_h, out_w)
    ones = jnp.ones_like(gx)
    src = jnp.einsum("rc,chw->rhw", hinv, jnp.stack([gx, gy, ones]))
    sx = src[0] / src[2]
    sy = src[1] / src[2]

    in_h, in_w = image.shape[-2], image.shape[-1]
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def sample(yi, xi):
        valid = (xi >= 0) & (xi < in_w) & (yi >= 0) & (yi < in_h)
        xi_c = jnp.clip(xi, 0, in_w - 1)
        yi_c = jnp.clip(yi, 0, in_h - 1)
        vals = image[..., yi_c, xi_c].astype(jnp.float32)
        return jnp.where(valid, vals, fill_value)

    v00 = sample(y0i, x0i)
    v01 = sample(y0i, x0i + 1)
    v10 = sample(y0i + 1, x0i)
    v11 = sample(y0i + 1, x0i + 1)
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    out = top * (1 - fy) + bot * fy
    if jnp.issubdtype(image.dtype, jnp.integer):
        out = jnp.round(out).astype(image.dtype)
    return out


def unwarp_card(image, source_points, out_shape=(CARD_HEIGHT, CARD_WIDTH)):
    """llcv_unwarp (cv/warp.cpp:130-169): rectify the quad `source_points`
    (tl, tr, bl, br order per dmz_rect_get_points) to a 428x270 card.

    The destination rect is (0, 0, W-1, H-1) (dmz.cpp:484)."""
    out_h, out_w = out_shape
    dest_points = jnp.asarray(
        [[0.0, 0.0], [out_w - 1.0, 0.0], [0.0, out_h - 1.0],
         [out_w - 1.0, out_h - 1.0]], jnp.float32)
    h_matrix = calc_persp_transform(source_points, dest_points)
    return warp_perspective(image, h_matrix, out_shape)
