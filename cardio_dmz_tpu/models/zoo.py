"""The five reference model architectures as pure JAX functions.

These are *re-implementations* of the reference's generated Eigen inference
code (architectures documented in SURVEY.md §2.3), written batch-first so
that vmap/jit map them onto the MXU:

* vseg strip MLP      204 -> 50 tanh -> 3 softmax     (modelm_befe75da.cpp:1770-1786)
* slash MLP           176 -> 80 tanh -> 2 softmax     (modelm_730c4cbd.cpp:2386-2429)
* PAN digit conv (x3) 27x19 -> 8@3x3 (truncated valid 24x15) -> 3x3 maxpool
                      -> +bias, tanh -> 320 -> 32 tanh -> 10 softmax
                                                      (modelc_5c241121.cpp:1824-1938)
* expiry digit conv   16x11 (mean-sub) -> 50@5x5 full -> 2x2 pool -> relu
                      -> 40@5x5 valid (sum over maps) -> 2x3 pool -> relu
                      -> 120 -> 176 relu -> 10 softmax
                                                      (modelc_bf4dd6c8.cpp:12495-13505)

All functions accept a leading batch of arbitrary rank. Matmul/conv
precision is switchable (see set_precision): full-fp32 for golden parity
tests, native bf16-mult/fp32-acc for serving (verified behaviorally
identical on the pipeline).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


# Precision policy. The golden parity tests (1e-5 abs vs the C++
# reference's baked outputs) need full fp32 matmuls, which on TPU lower to
# a multi-pass bf16 emulation ~6x slower than native bf16-mult/fp32-acc.
# The serving pipeline only needs stable argmaxes (the models saturate
# through tanh and ensemble voting), so it uses the fast default. Tests
# flip this to HIGHEST via set_precision().
_PRECISION = [lax.Precision.DEFAULT]


def set_precision(p):
    """p: lax.Precision or "highest"/"default". Returns previous value."""
    prev = _PRECISION[0]
    if isinstance(p, str):
        p = {"highest": lax.Precision.HIGHEST,
             "default": lax.Precision.DEFAULT}[p.lower()]
    _PRECISION[0] = p
    return prev


def _dot(x, w):
    return jnp.matmul(x, w, precision=_PRECISION[0])


def _tanh(x):
    # XLA's builtin tanh is a fast rational approximation with up to ~4e-5
    # absolute error, which breaks 1e-5 golden parity with the reference's
    # libm tanhf. This exp-based form is good to ~2e-6 and still fuses.
    ax = jnp.abs(x)
    t = 1.0 - 2.0 / (jnp.exp(2.0 * ax) + 1.0)
    return jnp.sign(x) * t


def _softmax(logits):
    # reference computes exp/sum without max subtraction
    # (modelm_befe75da.cpp:1782-1785); jax.nn.softmax is the numerically
    # stable equivalent (identical result up to float rounding).
    return jax.nn.softmax(logits, axis=-1)


def apply_mlp(params, x):
    """Shared MLP apply for vseg (204->50->3) and slash (176->80->2).

    x: (..., n_in) float32. Returns (..., n_out) probabilities.
    """
    h = _tanh(_dot(x, params["hidden_w"].T) + params["hidden_b"])
    logits = _dot(h, params["logistic_w"].T) + params["logistic_b"]
    return _softmax(logits)


def apply_pan_conv(params, img):
    """PAN digit classifier. img: (..., 27, 19) float32 in [0, 1].

    Conv is a 3x3 valid correlation *truncated to 24x15* (the generated code
    only computes the top-left 24x15 of the 25x17 valid output —
    modelc_5c241121.cpp convc loop), then 3x3 non-overlapping maxpool to 8x5,
    bias + tanh, flattened kernel-major.
    """
    if img.shape[-2:] != (27, 19):
        raise ValueError(
            f"PAN digit cell must be (..., 27, 19) (H, W); got {img.shape}")
    batch_shape = img.shape[:-2]
    x = img.reshape((-1, 1, 27, 19))
    w = params["conv_w"][:, None, :, :]  # (8, 1, 3, 3) OIHW
    conv = lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=_PRECISION[0],
    )  # (N, 8, 25, 17)
    conv = conv[:, :, :24, :15]
    n = conv.shape[0]
    pooled = conv.reshape(n, 8, 8, 3, 5, 3).max(axis=(3, 5))  # (N, 8k, 8r, 5c)
    act = _tanh(pooled + params["conv_b"][None, :, None, None])
    flat = act.reshape(n, 320)  # kernel-major, then row-major: matches Eigen map
    h = _tanh(_dot(flat, params["hidden_w"].T) + params["hidden_b"])
    logits = _dot(h, params["logistic_w"].T) + params["logistic_b"]
    return _softmax(logits).reshape(batch_shape + (10,))


def pan_digit_scores(params_a, params_b, params_c, img):
    """3-model ensemble combine (scan/n_categorize.cpp:45-72).

    score = (r0 + r1 + r2 - max(r0, r1, r2)) / 2 — rewards 3/3 consensus.
    img: (..., 27, 19) float32. Returns (..., 10) scores.

    Uses the matmul lowering (apply_pan_conv_mm): same math as
    apply_pan_conv, MXU-shaped — XLA's cost model priced the conv form's
    truncation slice + 6-D reshape maxpool at ~3 ms each per model @256
    streams (layout-shattering ops on the tiled conv output).
    """
    r0 = apply_pan_conv_mm(params_a, img)
    r1 = apply_pan_conv_mm(params_b, img)
    r2 = apply_pan_conv_mm(params_c, img)
    rmax = jnp.maximum(jnp.maximum(r0, r1), r2)
    return (r0 + r1 + r2 - rmax) / 2.0


def _pool_perm(out_hw, pool_hw):
    """Column permutation putting each non-overlapping pool window's taps
    in the minor axis: q' = (pr, pc, dr, dc) for q = (pr*ph+dr, pc*pw+dc).
    Pooling a matmul output ordered this way is a lane-local
    reshape(..., ph*pw).max(-1) instead of a layout-shattering 6-D
    strided reduce over the tiled conv output."""
    oh, ow = out_hw
    ph, pw = pool_hw
    pr = np.arange(oh // ph)[:, None, None, None]
    pc = np.arange(ow // pw)[None, :, None, None]
    dr = np.arange(ph)[None, None, :, None]
    dc = np.arange(pw)[None, None, None, :]
    return ((pr * ph + dr) * ow + pc * pw + dc).reshape(-1)


def _pan_conv_matmul(params):
    """(513, 8*8*5*9) dense matrix: 3x3 correlation + pool-window column
    ordering folded into the weights (see apply_pan_conv for semantics)."""
    w = params["conv_w"].reshape(8, 9)
    pan_idx, pan_mask = _pan_tables()
    m = w[:, pan_idx] * pan_mask                   # (8, 513, 360)
    m = m[:, :, _pool_perm((24, 15), (3, 3))]      # windows minor
    return m.transpose(1, 0, 2).reshape(513, 8 * 360)


def apply_pan_conv_mm(params, img):
    """apply_pan_conv with the 3x3 correlation lowered as one dense matmul
    (im2col folded into the weights, like apply_expiry_conv_mm) and the
    output columns pre-permuted so the 3x3 maxpool is a minor-axis
    reshape(..., 9).max(-1). Column permutation + interleaved exact zeros
    only: each output tap set and its summation order match
    apply_pan_conv, so results agree to float-rounding noise."""
    if img.shape[-2:] != (27, 19):
        raise ValueError(
            f"PAN digit cell must be (..., 27, 19) (H, W); got {img.shape}")
    batch_shape = img.shape[:-2]
    x = img.reshape((-1, 513))
    n = x.shape[0]
    c = _dot(x, _pan_conv_matmul(params))          # (N, 8*8*5*9)
    pooled = c.reshape(n, 8, 8, 5, 9).max(-1)      # (N, 8k, 8r, 5c)
    act = _tanh(pooled + params["conv_b"][None, :, None, None])
    flat = act.reshape(n, 320)
    h = _tanh(_dot(flat, params["hidden_w"].T) + params["hidden_b"])
    logits = _dot(h, params["logistic_w"].T) + params["logistic_b"]
    return _softmax(logits).reshape(batch_shape + (10,))


def apply_expiry_conv(params, img, return_intermediates=False):
    """Expiry digit classifier. img: (..., 16, 11) float32 in [0, 1].

    Mean-subtracted input; conv1 is a *full* (zero-padded) 5x5 correlation
    to 20x14 (modelc_bf4dd6c8.cpp:12500-12635), 2x2 pool, bias+relu;
    conv2 a valid 5x5 correlation summed over the 50 input maps to 6x3
    (:12688-12797), 2x3 pool, bias+relu; then 120 -> 176 relu -> 10 softmax.
    """
    if img.shape[-2:] != (16, 11):
        raise ValueError(
            f"expiry digit cell must be (..., 16, 11) (H, W); got {img.shape}")
    batch_shape = img.shape[:-2]
    x = img.reshape((-1, 16, 11))
    x = x - x.mean(axis=(-1, -2), keepdims=True)
    x = x[:, None, :, :]  # (N, 1, 16, 11)

    w1 = params["conv1_w"][:, None, :, :]  # (50, 1, 5, 5)
    c1 = lax.conv_general_dilated(
        x, w1, window_strides=(1, 1), padding=((4, 4), (4, 3)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=_PRECISION[0],
    )  # (N, 50, 20, 14)
    n = c1.shape[0]
    p1 = c1.reshape(n, 50, 10, 2, 7, 2).max(axis=(3, 5))  # (N, 50, 10, 7)
    a1 = jnp.maximum(p1 + params["conv1_b"][None, :, None, None], 0.0)

    w2 = params["conv2_w"]  # (40, 50, 5, 5) OIHW
    c2 = lax.conv_general_dilated(
        a1, w2, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=_PRECISION[0],
    )  # (N, 40, 6, 3)
    p2 = c2.reshape(n, 40, 3, 2, 1, 3).max(axis=(3, 5))  # (N, 40, 3, 1)
    a2 = jnp.maximum(p2.reshape(n, 40, 3) + params["conv2_b"][None, :, None], 0.0)

    flat = a2.reshape(n, 120)  # map-major: matches Eigen 40x3 row-major map
    h = jnp.maximum(_dot(flat, params["hidden_w"].T) + params["hidden_b"], 0.0)
    logits = _dot(h, params["logistic_w"].T) + params["logistic_b"]
    probs = _softmax(logits)
    if return_intermediates:
        return (probs.reshape(batch_shape + (10,)),
                a1.reshape(batch_shape + (50, 10, 7)),
                a2.reshape(batch_shape + (40, 3)),
                h.reshape(batch_shape + (176,)))
    return probs.reshape(batch_shape + (10,))


def _conv_as_matmul_tables(in_hw, out_hw, k, pad):
    """Static (flat_idx, mask) tables mapping a KxK correlation with the
    given (lo-)padding onto one dense matmul: M[p, q] = w_flat[flat_idx[p,q]]
    * mask[p, q], where p indexes input pixels row-major and q output
    positions row-major. Each M column holds the kernel taps that touch
    that output — the conv becomes x_flat @ M."""
    ih, iw = in_hw
    oh, ow = out_hw
    r = np.arange(ih)[:, None, None, None]
    c = np.arange(iw)[None, :, None, None]
    i = np.arange(oh)[None, None, :, None]
    j = np.arange(ow)[None, None, None, :]
    ki = r - i + pad[0]
    kj = c - j + pad[1]
    valid = (ki >= 0) & (ki < k) & (kj >= 0) & (kj < k)
    flat = (np.clip(ki, 0, k - 1) * k + np.clip(kj, 0, k - 1))
    flat = flat.reshape(ih * iw, oh * ow)
    mask = valid.reshape(ih * iw, oh * ow)
    return flat.astype(np.int32), mask.astype(np.float32)


# Tables are built LAZILY and kept as NUMPY (not at module import, not as
# jnp arrays): jnp.asarray initializes a JAX backend — package import
# must stay backend-free so CPU-only tools can still force jax_platforms
# AFTER importing the package (the axon TPU plugin ignores the
# JAX_PLATFORMS env var, and a mere import that touches the tunnel hangs
# when the tunnel is down) — and a cached jnp array created inside a
# traced context would leak tracers across jit traces. Numpy tables fold
# into each graph as constants at the use sites.

@functools.lru_cache(maxsize=None)
def _pan_tables():
    # PAN conv: 27x19 input, 3x3 valid truncated to 24x15 (-> pool to 8x5)
    return _conv_as_matmul_tables((27, 19), (24, 15), 3, (0, 0))


@functools.lru_cache(maxsize=None)
def _exp_c1_tables():
    # expiry conv1: 16x11 input, 5x5 kernel, padding lo (4, 4) -> 20x14 out
    return _conv_as_matmul_tables((16, 11), (20, 14), 5, (4, 4))


@functools.lru_cache(maxsize=None)
def _exp_c2_tables():
    # expiry conv2: 10x7 input (per map), 5x5 valid -> 6x3 out
    return _conv_as_matmul_tables((10, 7), (6, 3), 5, (0, 0))


def apply_expiry_conv_mm(params, img):
    """apply_expiry_conv with both 5x5 convolutions lowered as single dense
    matmuls (im2col folded into the weights). Bitwise-identical math per
    output tap set; summation order differs only by interleaved exact
    zeros, so results match apply_expiry_conv to float-rounding noise
    (<1e-6; the serving path only needs stable argmaxes and the host/golden
    tests keep the conv form).

    Why: 5x5 convs on 16x11 cells tile terribly onto the MXU (measured
    2.2 ms/step @256 streams); as (N,176)@(176,14000) and
    (N,3500)@(3500,720) matmuls the same math is MXU-shaped.
    """
    if img.shape[-2:] != (16, 11):
        raise ValueError(
            f"expiry digit cell must be (..., 16, 11) (H, W); got {img.shape}")
    batch_shape = img.shape[:-2]
    x = img.reshape((-1, 176))
    x = x - x.mean(axis=-1, keepdims=True)
    n = x.shape[0]

    # pool windows pre-permuted into the minor axis (see _pool_perm): the
    # 6-D strided reshape-maxpools over the tiled matmul outputs were
    # layout-shattering (XLA priced the conv1 pool at ~2 ms @256 streams)
    w1 = params["conv1_w"].reshape(50, 25)            # (50, 5*5)
    c1_idx, c1_mask = _exp_c1_tables()
    m1 = w1[:, c1_idx] * c1_mask                      # (50, 176, 280)
    m1 = m1[:, :, _pool_perm((20, 14), (2, 2))]
    m1 = m1.transpose(1, 0, 2).reshape(176, 50 * 280)
    c1 = _dot(x, m1)                                  # (N, 50*10*7*4)
    p1 = c1.reshape(n, 50, 10, 7, 4).max(-1)          # (N, 50, 10, 7)
    a1 = jnp.maximum(p1 + params["conv1_b"][None, :, None, None], 0.0)

    w2 = params["conv2_w"].reshape(40, 50, 25)
    c2_idx, c2_mask = _exp_c2_tables()
    m2 = w2[:, :, c2_idx] * c2_mask                   # (40, 50, 70, 18)
    m2 = m2[:, :, :, _pool_perm((6, 3), (2, 3))]
    m2 = m2.transpose(1, 2, 0, 3).reshape(50 * 70, 40 * 18)
    c2 = _dot(a1.reshape(n, 3500), m2)                # (N, 40*3*6)
    p2 = c2.reshape(n, 40, 3, 6).max(-1)              # (N, 40, 3)
    a2 = jnp.maximum(p2 + params["conv2_b"][None, :, None], 0.0)

    flat = a2.reshape(n, 120)
    h = jnp.maximum(_dot(flat, params["hidden_w"].T) + params["hidden_b"], 0.0)
    logits = _dot(h, params["logistic_w"].T) + params["logistic_b"]
    return _softmax(logits).reshape(batch_shape + (10,))
