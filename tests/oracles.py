"""Independent numpy oracle implementations of the kernel layer.

These mirror the reference's inline A/B oracle testing of NEON kernels
against OpenCV (SURVEY.md §4.2): each jnp kernel is checked pixel-exact (or
within float tolerance) against a straightforward scalar numpy
implementation written directly from the documented algorithm.
"""

import numpy as np


def morph_grad3_1d(x):
    x = np.asarray(x, np.int32)
    out = np.empty_like(x)
    w = x.shape[-1]
    for i in range(w):
        lo = max(i - 1, 0)
        hi = min(i + 2, w)
        win = x[..., lo:hi]
        out[..., i] = win.max(-1) - win.min(-1)
    return out.astype(np.uint8)


def morph_grad3_2d_cross(x):
    x = np.asarray(x, np.int32)
    h, w = x.shape
    out = np.empty_like(x)
    for i in range(h):
        for j in range(w):
            n = x[max(i - 1, 0), j]
            s = x[min(i + 1, h - 1), j]
            wv = x[i, max(j - 1, 0)]
            e = x[i, min(j + 1, w - 1)]
            c = x[i, j]
            vals = (n, s, wv, e, c)
            out[i, j] = max(vals) - min(vals)
    return out.astype(np.uint8)


def lineardown2_1d(x):
    x = np.asarray(x, np.uint16)
    return ((x[..., 0::2] + x[..., 1::2] + 1) >> 1).astype(np.uint8)


def norm_convert(x):
    x = np.asarray(x)
    mn, mx = int(x.min()), int(x.max())
    delta = mx - mn
    mult = 0.5 if delta == 0 else 1.0 / delta
    return ((x.astype(np.float32) - mn) * np.float32(mult)).astype(np.float32)


def ycbcr_to_rgb(y, cb, cr):
    y = np.asarray(y, np.int64)
    scb = np.asarray(cb, np.int64) - 128
    scr = np.asarray(cr, np.int64) - 128

    def descale(v):
        return (v + (1 << 13)) >> 14

    b = y + descale(scb * 29049)
    g = y + descale(scb * -5636 + scr * -11698)
    r = y + descale(scr * 22987)
    return np.clip(np.stack([r, g, b], -1), 0, 255).astype(np.uint8)


def sobel7(x, dx):
    """Separable 7-tap correlation with replicate border."""
    edge = np.array([-1, -4, -5, 0, 5, 4, 1], np.int64)
    smooth = np.array([1, 6, 15, 20, 15, 6, 1], np.int64)
    x = np.asarray(x, np.int64)

    def corr(a, k, axis):
        ap = np.pad(a, [(3, 3) if i == (axis % a.ndim) else (0, 0)
                        for i in range(a.ndim)], mode="edge")
        out = np.zeros_like(a)
        for i, w in enumerate(k):
            sl = [slice(None)] * a.ndim
            sl[axis] = slice(i, i + a.shape[axis])
            out = out + w * ap[tuple(sl)]
        return out

    if dx:
        t = corr(x, edge, -1)
        out = corr(t, smooth, -2)
    else:
        t = corr(x, smooth, -1)
        out = corr(t, edge, -2)
    return np.clip(out, -32768, 32767).astype(np.int32)


def sobel3_dx_dy(x):
    x = np.asarray(x, np.int32)
    h, w = x.shape
    out = np.zeros_like(x)
    for i in range(h):
        iu = max(i - 1, 0)
        idn = min(i + 1, h - 1)
        for j in range(w):
            jl = max(j - 1, 0)
            jr = min(j + 1, w - 1)
            out[i, j] = x[iu, jl] - x[iu, jr] - x[idn, jl] + x[idn, jr]
    return out


def scharr3_dx_abs(x):
    x = np.asarray(x, np.int32)
    h, w = x.shape
    inter = np.zeros_like(x)
    for i in range(h):
        for j in range(w):
            jl = max(j - 1, 0)
            jr = min(j + 1, w - 1)
            inter[i, j] = abs(x[i, jr] - x[i, jl])
    out = np.zeros_like(x)
    for i in range(h):
        iu = max(i - 1, 0)
        idn = min(i + 1, h - 1)
        out[i] = 3 * (inter[iu] + inter[idn]) + 10 * inter[i]
    return out


def scharr3_dy_abs(x):
    x = np.asarray(x, np.int32)
    h, w = x.shape
    inter = np.zeros_like(x)
    for i in range(h):
        iu = max(i - 1, 0)
        idn = min(i + 1, h - 1)
        inter[i] = np.abs(x[idn] - x[iu])
    out = np.zeros_like(x)
    for j in range(w):
        jl = max(j - 1, 0)
        jr = min(j + 1, w - 1)
        out[:, j] = 3 * (inter[:, jl] + inter[:, jr]) + 10 * inter[:, j]
    return out


def equalize_hist(x):
    x = np.asarray(x, np.uint8)
    hist = np.bincount(x.reshape(-1), minlength=256)
    cdf = np.cumsum(hist)
    scale = 255.0 / x.size
    # cvRound = round half to even (rint)
    lut = np.clip(np.rint(cdf * scale), 0, 255).astype(np.uint8)
    lut[0] = 0
    return lut[x]


def stddev_of_abs(x):
    a = np.abs(np.asarray(x, np.float64))
    n = a.size
    mean = a.sum() / n
    return np.float32(np.sqrt((a * a).sum() / n - mean * mean))


def canny_reference(dx, dy, low, high):
    """Scalar port of the reference's NMS + flood semantics
    (cv/canny.cpp:137-335), using an explicit worklist."""
    dx = np.asarray(dx, np.int64)
    dy = np.asarray(dy, np.int64)
    h, w = dx.shape
    m = np.abs(dx) + np.abs(dy)
    TG22 = int(0.4142135623730950488016887242097 * (1 << 15) + 0.5)

    def mag(i, j):
        if 0 <= i < h and 0 <= j < w:
            return m[i, j]
        return 0

    candidate = np.zeros((h, w), bool)
    strong = np.zeros((h, w), bool)
    for i in range(h):
        for j in range(w):
            x = abs(dx[i, j])
            y = abs(dy[i, j]) << 15
            s = -1 if (dx[i, j] ^ dy[i, j]) < 0 else 1
            mm = m[i, j]
            if mm <= low:
                continue
            tg22x = x * TG22
            tg67x = tg22x + ((2 * x) << 15)
            if y < tg22x:
                keep = mm > mag(i, j - 1) and mm >= mag(i, j + 1)
            elif y > tg67x:
                keep = mm > mag(i - 1, j) and mm >= mag(i + 1, j)
            else:
                keep = mm > mag(i - 1, j - s) and mm > mag(i + 1, j + s)
            if keep:
                candidate[i, j] = True
                if mm > high:
                    strong[i, j] = True
    # flood
    edge = np.zeros((h, w), bool)
    stack = list(zip(*np.nonzero(strong)))
    for i, j in stack:
        edge[i, j] = True
    while stack:
        i, j = stack.pop()
        for di in (-1, 0, 1):
            for dj in (-1, 0, 1):
                ii, jj = i + di, j + dj
                if 0 <= ii < h and 0 <= jj < w and candidate[ii, jj] and not edge[ii, jj]:
                    edge[ii, jj] = True
                    stack.append((ii, jj))
    return (edge * np.uint8(255))


def hough_reference(edges, dx, dy, rho, theta, threshold, theta_min,
                    theta_max, vertical, gat):
    """Scalar port of llcv_hough (cv/hough.cpp:52-195)."""
    import math
    edges = np.asarray(edges)
    dx = np.asarray(dx, np.int32)
    dy = np.asarray(dy, np.int32)
    h, w = edges.shape
    numangle = int(round((theta_max - theta_min) / theta))
    numrho = int(round(((w + h) * 2 + 1) / rho))
    irho = 1.0 / rho
    # float32 table construction with accumulated `ang`, like the C++
    # (cv/hough.cpp:113-115): sinf/cosf of a float32-accumulated angle
    tab_sin, tab_cos = [], []
    ang = np.float32(theta_min)
    for n in range(numangle):
        tab_sin.append(int(np.floor(np.float32(1024.0)
                                    * np.sin(ang, dtype=np.float32)
                                    * np.float32(irho))))
        tab_cos.append(int(np.floor(np.float32(1024.0)
                                    * np.cos(ang, dtype=np.float32)
                                    * np.float32(irho))))
        ang = np.float32(ang + np.float32(theta))
    base_deg = 180 if vertical else 90
    # tanf((float)TO_RADIANS(...)): f64 radians, f32 tan (cv/hough.cpp:119-126)
    sa = float(np.tan(np.float32(math.radians(base_deg - gat)), dtype=np.float32))
    sb = float(np.tan(np.float32(math.radians(base_deg + gat)), dtype=np.float32))
    accum = np.zeros((numangle + 2) * (numrho + 2), np.int64)
    for i in range(h):
        for j in range(w):
            if edges[i, j] == 0:
                continue
            ddx, ddy = int(dx[i, j]), int(dy[i, j])
            if ddx != 0:
                slope = np.float32(ddy) / np.float32(ddx)
                if vertical:
                    use = sa <= slope <= sb
                else:
                    use = slope >= sa or slope <= sb
            else:
                use = not vertical
            if use:
                for n in range(numangle):
                    r = (j * tab_cos[n] + i * tab_sin[n]) >> 10
                    r += (numrho - 1) // 2
                    accum[(n + 1) * (numrho + 2) + r + 1] += 1
    max_val, max_base = 0, 0
    for r in range(numrho):
        for n in range(numangle):
            base = (n + 1) * (numrho + 2) + r + 1
            if accum[base] > max_val:
                max_val = accum[base]
                max_base = base
    if max_val > threshold:
        scale = 1.0 / (numrho + 2)
        n = int(np.floor(max_base * scale)) - 1
        r = max_base - (n + 1) * (numrho + 2) - 1
        return False, (r - (numrho - 1) * 0.5) * rho, n * theta + theta_min
    return True, 0.0, 0.0
