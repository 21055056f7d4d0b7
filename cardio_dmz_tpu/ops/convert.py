"""Channel/format conversion kernels (cv/convert.cpp equivalents)."""

import jax.numpy as jnp


def split_u8(interleaved):
    """Deinterleave a 2-channel image into (even-byte, odd-byte) planes.

    Mirrors llcv_split_u8's NEON path (cv/convert.cpp:19-72, vld2q_u8):
    channel1 = bytes at even positions, channel2 = odd positions.
    interleaved: (..., H, 2*W) uint8 viewed as W 2-byte pixels.
    """
    return interleaved[..., 0::2], interleaved[..., 1::2]


def lineardown2_1d_u8(x):
    """2x horizontal downsample by rounding-halving pair average.

    Mirrors the NEON vrhadd path (cv/convert.cpp:132-193):
    dst[i] = (src[2i] + src[2i+1] + 1) >> 1.
    x: (..., W) uint8, W even. Returns (..., W//2) uint8.
    """
    a = x[..., 0::2].astype(jnp.uint16)
    b = x[..., 1::2].astype(jnp.uint16)
    return ((a + b + 1) >> 1).astype(jnp.uint8)


def norm_convert_minmax(x, axis=-1):
    """Min-max normalize u8 -> f32 in [0, 1] along `axis`.

    Mirrors llcv_norm_convert_1d_u8_to_f32 (cv/convert.cpp:295-378):
    out = (x - min) * m with m = 1/(max-min), or m = 0.5 when max == min
    (all values identical -> all map to 0).
    """
    xf = x.astype(jnp.float32)
    mn = jnp.min(xf, axis=axis, keepdims=True)
    mx = jnp.max(xf, axis=axis, keepdims=True)
    delta = mx - mn
    mult = jnp.where(delta == 0, 0.5, 1.0 / jnp.where(delta == 0, 1.0, delta))
    return (xf - mn) * mult


def ycbcr_to_rgb(y, cb, cr, add_alpha=False):
    """Fixed-point YCbCr -> RGB(A), bit-exact with llcv_YCbCr2RGB_u8_c
    (cv/convert.cpp:449-504): coefficients 29049 / -5636 / -11698 / 22987,
    descale by (x + 2^13) >> 14, saturate to u8.

    y/cb/cr: (..., H, W) uint8. Returns (..., H, W, 3 or 4) uint8.
    """
    yi = y.astype(jnp.int32)
    scb = cb.astype(jnp.int32) - 128
    scr = cr.astype(jnp.int32) - 128

    def descale14(v):
        return (v + (1 << 13)) >> 14

    b = yi + descale14(scb * 29049)
    g = yi + descale14(scb * -5636 + scr * -11698)
    r = yi + descale14(scr * 22987)
    rgb = jnp.stack([r, g, b], axis=-1)
    rgb = jnp.clip(rgb, 0, 255).astype(jnp.uint8)
    if add_alpha:
        alpha = jnp.full(rgb.shape[:-1] + (1,), 255, jnp.uint8)
        rgb = jnp.concatenate([rgb, alpha], axis=-1)
    return rgb


def deinterleave_rgba_to_r(rgba):
    """Extract the R plane from interleaved RGBA bytes
    (dmz_deinterleave_RGBA_to_R, dmz.cpp:66-110).
    rgba: (..., 4*N) uint8 -> (..., N) uint8."""
    return rgba[..., 0::4]
