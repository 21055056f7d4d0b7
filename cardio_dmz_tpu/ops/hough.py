"""Gradient-gated single-best-line polar Hough transform (cv/hough.cpp).

TPU-native dense reformulation: instead of per-pixel scatter loops, every
(pixel, angle) pair computes its rho bin and votes via a masked one-hot
comparison reduced over pixels — pure fused VPU work, no scatter. The
angle window is tiny (10 bins for the card-edge search) and, per angle,
the reachable rho span is only ~w·|cosθ| + h·|sinθ| bins (≈100 for the
detection bands), both static, so the dense (pixel, angle, rho-bin)
compare tensor is small and never materialized (XLA fuses the compare
into the reduction).

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

    # fixed-point tables (host-computed; static for the jit trace).
    # CRITICAL: the reference computes these in FLOAT32 — sinf/cosf of an
    # `ang` accumulated by repeated float32 addition (cv/hough.cpp:113-115).
    # At e.g. 90° sinf gives 0.99999994 -> table 1023, where float64 gives
    # exactly 1024; that one count shifts every rho bin for that angle.
    ang = np.float32(theta_min)
    t32 = np.float32(theta)
    irho32 = np.float32(irho)
    tab_sin = np.empty(numangle, np.int32)
    tab_cos = np.empty(numangle, np.int32)
    for n in range(numangle):
        tab_sin[n] = np.floor(np.float32(1024.0)
                              * np.sin(ang, dtype=np.float32) * irho32)
        tab_cos[n] = np.floor(np.float32(1024.0)
                              * np.cos(ang, dtype=np.float32) * irho32)
        ang = np.float32(ang + t32)

    # gradient gate (cv/hough.cpp:117-150): TO_RADIANS is double math, then
    # tanf((float)...) — degrees->radians in f64, cast to f32, tan in f32 —
    # so borderline slopes gate identically
    if vertical:
        base_deg = 180.0
    else:
        base_deg = 90.0
    slope_a = np.tan(np.float32(math.radians(base_deg - gradient_angle_threshold)),
                     dtype=np.float32)
    slope_b = np.tan(np.float32(math.radians(base_deg + gradient_angle_threshold)),
                     dtype=np.float32)

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

    # Per-angle static rho range. u = j*tabCos + i*tabSin is monotone in j
    # and i (fixed coefficient signs per angle), so its extremes sit at the
    # image corners; r = (u >> 10) + center inherits them (>> is the same
    # arithmetic floor-shift in C and jnp).
    center = (numrho - 1) // 2
    corners_j = np.array([0, w - 1], np.int64)
    corners_i = np.array([0, h - 1], np.int64)
    u_corners = (corners_j[:, None, None] * tab_cos[None, None, :]
                 + corners_i[None, :, None] * tab_sin[None, None, :])
    r_min = (u_corners.min(axis=(0, 1)) >> 10) + center   # (A,) host ints
    r_max = (u_corners.max(axis=(0, 1)) >> 10) + center
    nbins = int((r_max - r_min).max()) + 1                # static pad width

    jj = jnp.arange(w, dtype=jnp.int32)[None, :, None]   # (1, W, 1)
    ii = jnp.arange(h, dtype=jnp.int32)[:, None, None]   # (H, 1, 1)
    tc = jnp.asarray(tab_cos)[None, None, :]             # (1, 1, A)
    ts = jnp.asarray(tab_sin)[None, None, :]
    r = ((jj * tc + ii * ts) >> 10) + center             # (H, W, A)
    k = r - jnp.asarray(r_min.astype(np.int32))          # per-angle bin idx

    # counts[a, b] = number of gated edge pixels with bin b at angle a.
    # Factored two-level one-hot: b = 16*q + rem, so the count is a
    # contraction of the q-indicator with the rem-indicator over pixels —
    # a batched (per-angle) MXU matmul with ~4x less VPU indicator work
    # than the flat (H, W, A, nbins) compare. Counts <= H*W < 2^24, so the
    # f32 accumulation is exact.
    nq = -(-nbins // 16)
    qf = ((k >> 4)[..., None] == jnp.arange(nq, dtype=jnp.int32)) \
        & use[..., None, None]                               # (H, W, A, nq)
    rf = (k & 15)[..., None] == jnp.arange(16, dtype=jnp.int32)
    # int8 indicator operands with int32 accumulation: exact (0/1 products,
    # counts <= H*W < 2^24) and 4x less HBM traffic than f32 operands for
    # the (pixels, A, nq) tensor — the detect stage's dominant bytes
    # (PERF.md §3; stage_bytes: detect ~9.5 GB/step @256 before this)
    counts = jnp.einsum("hwaq,hwar->aqr", qf.astype(jnp.int8),
                        rf.astype(jnp.int8),
                        preferred_element_type=jnp.int32)
    counts = counts.reshape(numangle, nq * 16)[:, :nbins]

    # Reference argmax scans r-major/angle-minor with strict > — first max
    # in that order wins. Encode as lexicographic (count, -scan_key) via
    # count*K - key; K > max key and counts <= H*W keep it within int32.
    key_scale = numrho * numangle
    assert h * w * key_scale < 2**31
    r_of_bin = (jnp.asarray(r_min.astype(np.int32))[:, None]
                + jnp.arange(nbins, dtype=jnp.int32)[None, :])
    scan_key = (r_of_bin * numangle
                + jnp.arange(numangle, dtype=jnp.int32)[:, None])
    # pad bins beyond an angle's true span can never win: their count is 0
    # and keys are valid; ties at count 0 are below threshold anyway.
    score = counts * key_scale - scan_key
    best = jnp.argmax(score.reshape(-1))
    max_val = counts.reshape(-1)[best]
    r_best = r_of_bin.reshape(-1)[best]
    n_best = best // nbins  # angle index

    is_null = max_val <= threshold
    line_rho = (r_best.astype(jnp.float32) - (numrho - 1) * 0.5) * rho
    line_angle = n_best.astype(jnp.float32) * theta + theta_min
    return is_null, jnp.where(is_null, 0.0, line_rho), \
        jnp.where(is_null, 0.0, line_angle)
