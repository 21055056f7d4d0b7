"""Small smoothing filters: 3x3 bilateral (expiry digit prep) and median
blur (digit blurring for display).

The reference calls cvSmooth(CV_BILATERAL, 3, 3, 0.95, 2/3) in expiry digit
preparation (scan/expiry_categorize.cpp:55-60; note its variable names are
swapped vs OpenCV's sigmaColor/sigmaSpace parameter order — the effective
call is bilateralFilter(d=3, sigmaColor=0.95, sigmaSpace=2/3)).
"""

import math

import jax.numpy as jnp
import numpy as np

# effective sigmas of the reference call (expiry_categorize.cpp:56-58)
BILATERAL_SIGMA_COLOR = (3 / 2.0 - 1.0) * 0.3 + 0.8   # 0.95
BILATERAL_SIGMA_SPACE = (3 - 1) / 3.0                  # 0.6667


def bilateral3x3(img, sigma_color=BILATERAL_SIGMA_COLOR,
                 sigma_space=BILATERAL_SIGMA_SPACE):
    """3x3 bilateral filter on u8 images, reflect-101 border.

    img: (..., H, W) uint8 -> same shape uint8. Weights follow OpenCV's
    formulation: w = exp(-0.5 (d/sigma_space)^2) * exp(-0.5 (dI/sigma_color)^2),
    normalized, center included.
    """
    x = img.astype(jnp.float32)
    pad = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(1, 1), (1, 1)], mode="reflect")
    h, w = img.shape[-2], img.shape[-1]

    gauss_space = -0.5 / (sigma_space * sigma_space)
    gauss_color = -0.5 / (sigma_color * sigma_color)

    num = jnp.zeros_like(x)
    den = jnp.zeros_like(x)
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            nb = pad[..., 1 + di:1 + di + h, 1 + dj:1 + dj + w]
            sw = math.exp((di * di + dj * dj) * gauss_space)
            d = nb - x
            cw = jnp.exp(d * d * gauss_color)
            wgt = sw * cw
            num = num + nb * wgt
            den = den + wgt
    out = num / den
    return jnp.round(out).astype(jnp.uint8)


def median_blur(img, ksize=25):
    """Median blur (dmz_blur_card's digit blurring, dmz.cpp:499-515).

    Host-side numpy implementation — blurring digits for display is an
    offline cosmetic op, not part of the jitted scan path. Border replicates.
    img: (H, W[, C]) uint8 numpy array.
    """
    img = np.asarray(img)
    r = ksize // 2
    if img.ndim == 2:
        img3 = img[:, :, None]
    else:
        img3 = img
    padded = np.pad(img3, ((r, r), (r, r), (0, 0)), mode="edge")
    h, w, c = img3.shape
    windows = np.lib.stride_tricks.sliding_window_view(
        padded, (ksize, ksize), axis=(0, 1))  # (h, w, c, k, k)
    out = np.median(windows.reshape(h, w, c, -1), axis=-1).astype(img.dtype)
    return out[:, :, 0] if img.ndim == 2 else out
