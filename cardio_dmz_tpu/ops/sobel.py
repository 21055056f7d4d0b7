"""Sobel / Scharr derivative kernels (cv/sobel.cpp equivalents).

The 7x7 Sobel is separable: edge kernel {-1,-4,-5,0,5,4,1} x smooth kernel
{1,6,15,20,15,6,1} (cv/sobel.cpp:484-485), with replicate borders (the NEON
path folds out-of-bounds taps into boundary kernels, cv/sobel.cpp:400-414 —
exactly replicate padding of 3 on each side).

Computation runs in int32 (the reference's int16 buffers can overflow in
theory; int32 matches the mathematically-intended result and is the natural
TPU width), with results saturated to the int16 range for bit-compat with
downstream consumers.
"""

import jax.numpy as jnp
import numpy as np

EDGE_KERNEL_7 = np.array([-1, -4, -5, 0, 5, 4, 1], np.int32)
SMOOTH_KERNEL_7 = np.array([1, 6, 15, 20, 15, 6, 1], np.int32)


def _sat16(x):
    return jnp.clip(x, -32768, 32767)


def _pad_rep(x, axis, before, after):
    pads = [(0, 0)] * x.ndim
    pads[axis] = (before, after)
    return jnp.pad(x, pads, mode="edge")


def _correlate_axis(x, kernel, axis):
    """1-D correlation along `axis` with replicate padding (kernel length 7,
    anchor 3). Unrolled shift-multiply-add: 7 fused VPU ops, no gather."""
    k = len(kernel)
    anchor = k // 2
    xp = _pad_rep(x, axis, anchor, k - 1 - anchor)
    n = x.shape[axis]
    out = None
    for i, w in enumerate(kernel):
        if w == 0:
            continue
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(i, i + n)
        term = xp[tuple(sl)] * int(w)
        out = term if out is None else out + term
    return out


def sobel7(x, dx, dy):
    """7x7 Sobel derivative, llcv_sobel7 (cv/sobel.cpp:483-530).

    x: (..., H, W) uint8; exactly one of dx/dy true.
    Returns (..., H, W) int32 (int16-saturated values).
    """
    assert bool(dx) != bool(dy)
    xi = x.astype(jnp.int32)
    if dx:
        t = _correlate_axis(xi, EDGE_KERNEL_7, axis=-1)
        out = _correlate_axis(t, SMOOTH_KERNEL_7, axis=-2)
    else:
        t = _correlate_axis(xi, SMOOTH_KERNEL_7, axis=-1)
        out = _correlate_axis(t, EDGE_KERNEL_7, axis=-2)
    return _sat16(out)


def sobel3_dx_dy(x):
    """Combined second-cross-derivative 3x3 Sobel (focus metric).

    Kernel [[1,0,-1],[0,0,0],[-1,0,1]] with replicate-clamped borders,
    llcv_sobel3_dx_dy_c_neon (cv/sobel.cpp:556-...):
    out = tl - tr - bl + br of the clamped 8-neighborhood.
    x: (..., H, W) uint8 -> (..., H, W) int32.
    """
    xi = x.astype(jnp.int32)
    up = jnp.concatenate([xi[..., :1, :], xi[..., :-1, :]], axis=-2)
    dn = jnp.concatenate([xi[..., 1:, :], xi[..., -1:, :]], axis=-2)

    def shl(a):  # value to the left (clamped)
        return jnp.concatenate([a[..., :, :1], a[..., :, :-1]], axis=-1)

    def shr(a):  # value to the right (clamped)
        return jnp.concatenate([a[..., :, 1:], a[..., :, -1:]], axis=-1)

    return shl(up) - shr(up) - shl(dn) + shr(dn)


def scharr3_dx_abs(x):
    """|d/dx| Scharr, llcv_scharr3_dx_abs (cv/sobel.cpp:700-830).

    NOTE the reference quirk: it takes abs of the horizontal central
    difference FIRST, then smooths vertically with (3, 10, 3) — this is
    smooth-of-abs, not abs-of-scharr. Borders clamp.
    x: (..., H, W) uint8 -> (..., H, W) int32.
    """
    xi = x.astype(jnp.int32)
    left = jnp.concatenate([xi[..., :, :1], xi[..., :, :-1]], axis=-1)
    right = jnp.concatenate([xi[..., :, 1:], xi[..., :, -1:]], axis=-1)
    d = jnp.abs(right - left)
    up = jnp.concatenate([d[..., :1, :], d[..., :-1, :]], axis=-2)
    dn = jnp.concatenate([d[..., 1:, :], d[..., -1:, :]], axis=-2)
    return 3 * (up + dn) + 10 * d


def scharr3_dy_abs(x):
    """|d/dy| Scharr, llcv_scharr3_dy_abs (cv/sobel.cpp:838-905): abs of the
    vertical central difference, then horizontal (3, 10, 3) smoothing."""
    xi = x.astype(jnp.int32)
    up = jnp.concatenate([xi[..., :1, :], xi[..., :-1, :]], axis=-2)
    dn = jnp.concatenate([xi[..., 1:, :], xi[..., -1:, :]], axis=-2)
    d = jnp.abs(dn - up)
    left = jnp.concatenate([d[..., :, :1], d[..., :, :-1]], axis=-1)
    right = jnp.concatenate([d[..., :, 1:], d[..., :, -1:]], axis=-1)
    return 3 * (left + right) + 10 * d
