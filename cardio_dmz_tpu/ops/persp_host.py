"""Host (numpy) twin of ops/persp.py — the bit-exact reference chain.

Two roles:

* CPU-backend support: XLA:CPU's LLVM codegen contracts mul-feeding-add
  into FMA unconditionally (nothing blocks it — measured: barriers,
  bitcasts, reduce_precision are all seen through), which destroys the
  exact f32 operation sequence the Eigen-QR emulation depends on (errors
  are condition-number-amplified ~1e3 ulp). On non-TPU backends
  ops/persp.eigen_persp_transform therefore calls `persp_transform` here
  via jax.pure_callback. The TPU backend preserves op-for-op f32
  semantics, so the in-graph version runs natively there.

* Test oracle: `warp_coord_maps` / `warp_exact` compute the
  cvWarpPerspective chain in REAL float64 (what the reference itself
  uses), for A/B gates against both the compiled reference and the
  device path.

The QR emulation reproduces Eigen 3.2 HouseholderQR<Matrix8x8f>().solve()
exactly as compiled in the research harness (g++ -O2 x86-64 SSE2):
householder_qr_inplace_unblocked (HouseholderQR.h:225-251) with redux-
order dot products (Redux.h LinearVectorizedTraversal: packet-first with
SSE2 predux (v0+v2)+(v1+v3), serial tail), Householder.h:45-73
makeHouseholder, ascending-H Q^T application (HouseholderSequence.h:
308-317), and the col-major triangular_solve_vector back-substitution.
Validated bit-exact against the compiled reference (llcv_calc_persp_
transform via refbridge) over randomized corner sets.
"""

import numpy as np

f32 = np.float32


def _predux4(v):
    # SSE2 predux: (v0+v2) + (v1+v3)
    return f32(f32(v[0] + v[2]) + f32(v[1] + v[3]))


def _redux_sum(prods):
    """Eigen Redux.h LinearVectorizedTraversal over a packet expression
    (alignedStart=0): one 4-lane packet + predux, then serial tail;
    fully serial below one packet. len(prods) <= 7 here."""
    n = len(prods)
    if n == 0:
        return f32(0)
    if n < 4:
        res = prods[0]
        for i in range(1, n):
            res = f32(res + prods[i])
        return res
    res = _predux4(prods[:4])
    for i in range(4, n):
        res = f32(res + prods[i])
    return res


def _build_system(sp, dp):
    """llcv_calc_persp_transform's a/b layout (cv/warp.cpp:46-67), f32."""
    A = np.zeros((8, 8), f32)
    b = np.zeros(8, f32)
    for i in range(4):
        sx, sy = f32(sp[i][0]), f32(sp[i][1])
        dx, dy = f32(dp[i][0]), f32(dp[i][1])
        A[i] = [sx, sy, 1, 0, 0, 0, f32(-sx * dx), f32(-sy * dx)]
        A[i + 4] = [0, 0, 0, sx, sy, 1, f32(-sx * dy), f32(-sy * dy)]
        b[i] = dx
        b[i + 4] = dy
    return A, b


def _qr_factor(A_in):
    A = np.array(A_in, f32, order="F").copy()
    tau = np.zeros(8, f32)
    for k in range(8):
        col = A[k:, k]
        c0 = col[0]
        tail = col[1:]
        tsq = _redux_sum((tail * tail).astype(f32)) if len(tail) else f32(0)
        if tsq == 0:
            tau[k] = f32(0)
            beta = c0
            ess = tail * 0
        else:
            beta = f32(np.sqrt(f32(f32(c0 * c0) + tsq)))
            if c0 >= 0:
                beta = f32(-beta)
            ess = (tail / f32(c0 - beta)).astype(f32)
            tau[k] = f32(f32(beta - c0) / beta)
        A[k, k] = beta
        A[k + 1:, k] = ess
        if k + 1 < 8 and 8 - k > 1:
            bottom = A[k + 1:, k + 1:]
            tmp = np.array(
                [_redux_sum((ess * bottom[:, j]).astype(f32))
                 for j in range(bottom.shape[1])], f32)
            tmp = (tmp + A[k, k + 1:]).astype(f32)
            A[k, k + 1:] = (A[k, k + 1:]
                            - (tau[k] * tmp).astype(f32)).astype(f32)
            scaled = (tau[k] * ess).astype(f32)
            A[k + 1:, k + 1:] = (bottom
                                 - np.outer(scaled, tmp).astype(f32)).astype(f32)
    return A, tau


def _qr_solve(A, tau, b):
    c = np.array(b, f32).copy()
    for k in range(8):
        if 8 - k == 1:
            c[7] = f32(c[7] * f32(1 - tau[7]))
        else:
            ess = A[k + 1:, k]
            t = _redux_sum((ess * c[k + 1:]).astype(f32))
            t = f32(t + c[k])
            c[k] = f32(c[k] - f32(tau[k] * t))
            scaled = (tau[k] * ess).astype(f32)
            c[k + 1:] = (c[k + 1:] - (scaled * t).astype(f32)).astype(f32)
    # col-major triangular_solve_vector: x[j] = c[j]/R(j,j); c[:j] -= x[j]R[:j,j]
    for j in range(7, -1, -1):
        c[j] = f32(c[j] / A[j, j])
        if j > 0:
            c[:j] = (c[:j] - (c[j] * A[:j, j]).astype(f32)).astype(f32)
    return c


def persp_transform(source_points, dest_points):
    """Bit-exact llcv_calc_persp_transform (cv/warp.cpp:34-125): (4,2)
    corner arrays -> row-major (3,3) f32 src->dst homography, m22=1.
    Degenerate corner sets (e.g. all-zero from not-found frames) produce
    inf/nan exactly like the reference; the warnings are suppressed."""
    sp = np.asarray(source_points, f32)
    dp = np.asarray(dest_points, f32)
    A, b = _build_system(sp, dp)
    with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
        Af, tau = _qr_factor(A)
        x = _qr_solve(Af, tau, b)
    m = np.zeros((3, 3), f32)
    m[0, :] = x[0:3]
    m[1, :] = x[3:6]
    m[2, 0], m[2, 1], m[2, 2] = x[6], x[7], f32(1)
    return m


def warp_coord_maps(m, out_shape):
    """cvWarpPerspective's per-pixel quantized source maps in REAL double:
    M = inv(double(m)); W = 32/den (0 if den==0); X = cvRound(num*W)."""
    M = np.asarray(m, np.float64)
    minv = np.linalg.inv(M)
    out_h, out_w = out_shape
    ys, xs = np.mgrid[0:out_h, 0:out_w].astype(np.float64)
    den = minv[2, 0] * xs + minv[2, 1] * ys + minv[2, 2]
    w = np.where(den != 0, np.divide(32.0, den, where=den != 0), 0.0)
    fx = (minv[0, 0] * xs + minv[0, 1] * ys + minv[0, 2]) * w
    fy = (minv[1, 0] * xs + minv[1, 1] * ys + minv[1, 2]) * w
    big = 2.0**31 - 256
    x_q = np.rint(np.clip(fx, -big, big)).astype(np.int32)
    y_q = np.rint(np.clip(fy, -big, big)).astype(np.int32)
    return x_q, y_q


def warp_exact(image, m, out_shape):
    """Reference-exact warp on host: persp matrix `m` (src->dst f32),
    double coords, OpenCV's 5-bit fixed-point bilinear, zero fill."""
    img = np.asarray(image)
    in_h, in_w = img.shape
    x_q, y_q = warp_coord_maps(m, out_shape)
    x0 = x_q >> 5
    ax = (x_q & 31).astype(np.int64)
    y0 = y_q >> 5
    ay = (y_q & 31).astype(np.int64)

    def sample(yy, xx):
        valid = (xx >= 0) & (xx < in_w) & (yy >= 0) & (yy < in_h)
        v = img[np.clip(yy, 0, in_h - 1), np.clip(xx, 0, in_w - 1)]
        return np.where(valid, v, 0).astype(np.int64)

    acc = (sample(y0, x0) * ((32 - ax) * (32 - ay) * 32)
           + sample(y0, x0 + 1) * (ax * (32 - ay) * 32)
           + sample(y0 + 1, x0) * ((32 - ax) * ay * 32)
           + sample(y0 + 1, x0 + 1) * (ax * ay * 32))
    return np.clip((acc + (1 << 14)) >> 15, 0, 255).astype(np.uint8)


def unwarp_card_exact(image, source_points, out_shape):
    """Host oracle for the full exact rectification (llcv_unwarp chain)."""
    out_h, out_w = out_shape
    dest = np.float32([[0, 0], [out_w - 1, 0], [0, out_h - 1],
                       [out_w - 1, out_h - 1]])
    return warp_exact(image, persp_transform(source_points, dest), out_shape)
