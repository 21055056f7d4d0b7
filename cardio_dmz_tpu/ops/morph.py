"""Morphological gradient kernels.

TPU-native equivalents of the reference's NEON morph kernels (cv/morph.cpp).
Shift-and-reduce formulations: a 3-tap max/min is two jnp.maximum ops on the
VPU and fuses with surrounding elementwise work under jit. Borders replicate
(the reference clamps indices at ROI edges — cv/morph.cpp:79-104, 190-215).

All functions accept arbitrary leading batch dims; the last one or two dims
are the spatial dims.
"""

import jax.numpy as jnp


def morph_grad3_1d_u8(x):
    """1-D horizontal 3-tap morphological gradient (dilate - erode).

    Mirrors llcv_morph_grad3_1d_u8 (cv/morph.cpp:22-106): at borders only
    the in-bounds 2 taps participate (replicate-clamp equivalent).
    x: (..., W) uint8. Returns (..., W) uint8.
    """
    left = jnp.concatenate([x[..., :1], x[..., :-1]], axis=-1)
    right = jnp.concatenate([x[..., 1:], x[..., -1:]], axis=-1)
    mx = jnp.maximum(jnp.maximum(left, x), right)
    mn = jnp.minimum(jnp.minimum(left, x), right)
    return mx - mn


def morph_grad3_2d_cross_u8(x):
    """2-D cross-shaped (N, W, C, E, S) morphological gradient.

    Mirrors llcv_morph_grad3_2d_cross_u8 (cv/morph.cpp:174-255): max5 - min5
    with replicate-clamped borders.
    x: (..., H, W) uint8. Returns same shape uint8.
    """
    w = jnp.concatenate([x[..., :, :1], x[..., :, :-1]], axis=-1)
    e = jnp.concatenate([x[..., :, 1:], x[..., :, -1:]], axis=-1)
    n = jnp.concatenate([x[..., :1, :], x[..., :-1, :]], axis=-2)
    s = jnp.concatenate([x[..., 1:, :], x[..., -1:, :]], axis=-2)
    mx = jnp.maximum(jnp.maximum(jnp.maximum(n, s), jnp.maximum(w, e)), x)
    mn = jnp.minimum(jnp.minimum(jnp.minimum(n, s), jnp.minimum(w, e)), x)
    return mx - mn
