"""Gradient-gated single-best-line polar Hough transform (cv/hough.cpp).

TPU-native dense reformulation: instead of per-pixel scatter loops, every
(pixel, angle) pair computes its rho bin and votes via a masked one-hot
accumulation — a handful of fused VPU ops plus one scatter-add. The angle
window is tiny (10 bins for the card-edge search), so the dense tensor is
cheap.

Bit-compat details kept from the reference:
* fixed-point sin/cos tables x1024, floor (cv/hough.cpp:109-115)
* rho bin r = (j*tabCos + i*tabSin) >> 10, centered (cv/hough.cpp:154-156)
* gradient gating: pixels vote only if local dy/dx slope is within
  +-gradient_angle_threshold of the expected edge normal
  (cv/hough.cpp:117-150)
* argmax scan order r-major/angle-minor with strict > (cv/hough.cpp:163-176)
"""

import math

import jax.numpy as jnp
import numpy as np


def hough_best_line(edge_mask, dx, dy, *, rho=1.0, theta=math.pi / 180.0,
                    threshold=0, theta_min=0.0, theta_max=math.pi,
                    vertical=False, gradient_angle_threshold=10.0):
    """Find the single best (rho, theta) line.

    edge_mask: (H, W) nonzero-u8/bool canny output.
    dx/dy: (H, W) int sobel7 derivatives.
    Returns (is_null, rho, angle) — jnp scalars (bool, f32, f32); usable
    inside jit. Static params must be Python scalars.

    llcv_hough (cv/hough.cpp:52-195).
    """
    h, w = edge_mask.shape[-2], edge_mask.shape[-1]
    numangle = int(round((theta_max - theta_min) / theta))
    numrho = int(round(((w + h) * 2 + 1) / rho))
    irho = 1.0 / rho

    # fixed-point tables (host-computed; static for the jit trace)
    angles = theta_min + np.arange(numangle) * theta
    tab_sin = np.floor(1024.0 * np.sin(angles) * irho).astype(np.int32)
    tab_cos = np.floor(1024.0 * np.cos(angles) * irho).astype(np.int32)

    # gradient gate (cv/hough.cpp:117-150)
    if vertical:
        slope_a = math.tan(math.radians(180.0 - gradient_angle_threshold))
        slope_b = math.tan(math.radians(180.0 + gradient_angle_threshold))
    else:
        slope_a = math.tan(math.radians(90.0 - gradient_angle_threshold))
        slope_b = math.tan(math.radians(90.0 + gradient_angle_threshold))

    dxf = dx.astype(jnp.float32)
    dyf = dy.astype(jnp.float32)
    slope = dyf / jnp.where(dx == 0, 1.0, dxf)
    if vertical:
        slope_ok = (slope >= slope_a) & (slope <= slope_b)
        zero_ok = jnp.zeros_like(slope_ok)
    else:
        slope_ok = (slope >= slope_a) | (slope <= slope_b)
        zero_ok = jnp.ones_like(slope_ok)
    gate = jnp.where(dx == 0, zero_ok, slope_ok)
    use = (edge_mask != 0) & gate  # (H, W)

    jj = jnp.arange(w, dtype=jnp.int32)[None, :, None]   # (1, W, 1)
    ii = jnp.arange(h, dtype=jnp.int32)[:, None, None]   # (H, 1, 1)
    tc = jnp.asarray(tab_cos)[None, None, :]             # (1, 1, A)
    ts = jnp.asarray(tab_sin)[None, None, :]
    r = ((jj * tc + ii * ts) >> 10) + (numrho - 1) // 2  # (H, W, A)

    votes = jnp.broadcast_to(use[..., None], r.shape).astype(jnp.int32)
    # accumulate: (numrho, numangle) laid out r-major to match the reference's
    # argmax scan order.
    accum = jnp.zeros((numrho, numangle), jnp.int32)
    a_idx = jnp.broadcast_to(jnp.arange(numangle, dtype=jnp.int32), r.shape)
    accum = accum.at[r.reshape(-1), a_idx.reshape(-1)].add(
        votes.reshape(-1), mode="drop")

    flat = accum.reshape(-1)
    best = jnp.argmax(flat)  # first occurrence wins == reference scan order
    max_val = flat[best]
    r_best = best // numangle
    n_best = best % numangle

    is_null = max_val <= threshold
    line_rho = (r_best.astype(jnp.float32) - (numrho - 1) * 0.5) * rho
    line_angle = n_best.astype(jnp.float32) * theta + theta_min
    return is_null, jnp.where(is_null, 0.0, line_rho), \
        jnp.where(is_null, 0.0, line_angle)
