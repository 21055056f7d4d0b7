"""Reference-exact perspective math on TPU.

Two precision problems stand between the TPU warp and bit-parity with the
reference chain (llcv_calc_persp_transform -> cvWarpPerspective,
cv/warp.cpp:34-166):

1. The reference solves the 8x8 homography system with Eigen 3.2's f32
   householderQr (cv/warp.cpp:40-82). The system's conditioning amplifies
   any 1-ulp difference in intermediate rounding to ~1e3 ulp on the matrix
   entries, which flips ~0.1-0.2% of the warp's 1/32-px quantized sample
   positions. `eigen_persp_transform` therefore reproduces the exact f32
   operation sequence of Eigen 3.2 as compiled in the research harness
   (householder_qr_inplace_unblocked + householderSequence solve + the
   col-major triangular_solve_vector), validated BIT-EXACT against the
   compiled reference over randomized corner sets
   (tests/test_cpp_parity.py).

2. cvWarpPerspective computes per-pixel source coordinates in double
   (W = 32/den; fX = num*W; X = cvRound(fX)) from the double-promoted f32
   matrix inverted in double. TPU has no fast f64, so `warp_coord_maps`
   emulates it in double-float ("dd") arithmetic built on the TPU's exact
   f32 mul/add (Dekker/Knuth two_sum/two_prod), giving ~2^-46 relative
   error vs double's 2^-52 — a ~3e-10-quantum discrepancy, i.e. bit-equal
   quantized maps in practice.

TPU f32 divide and sqrt are NOT correctly rounded (measured ~65%/57%
exact); `div_cr`/`sqrt_cr` rebuild correctly-rounded versions from exact
mul/add via residual correction (Markstein), verified 100% exact on-device.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_SPLIT = np.float32(4097.0)  # 2^12 + 1 (Dekker split for f32)


# Backend caveat: XLA:CPU's LLVM codegen contracts mul-feeding-add into
# FMA unconditionally (measured: optimization_barrier / bitcast /
# reduce_precision do not block it; only separate executions do). For the
# dd arithmetic below this is HARMLESS -- contraction only changes which
# near-double-accurate value a (hi, lo) pair carries (residual corrections
# become single-rounded, i.e. slightly MORE accurate) -- but it destroys
# the bit-exact Eigen-QR operation sequence, whose 1-ulp rounding choices
# are condition-number-amplified in the output. eigen_persp_transform
# therefore runs natively on TPU (which preserves op-for-op f32 semantics
# -- verified bit-exact on device) and routes through the numpy twin
# (ops/persp_host.py) via pure_callback on other backends.


def _two_sum(a, b):
    """Knuth TwoSum: s + e == a + b exactly."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def _quick_two_sum(a, b):
    """Fast TwoSum, requires |a| >= |b|."""
    s = a + b
    e = b - (s - a)
    return s, e


def _split(x):
    c = _SPLIT * x
    hi = c - (c - x)
    return hi, x - hi


def _two_prod(a, b):
    """Dekker TwoProd: p + e == a * b exactly (no FMA needed)."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def div_cr(a, b):
    """Correctly-rounded f32 division from exact mul/add + approx divide."""
    q0 = a / b
    p, e = _two_prod(q0, b)
    r = (a - p) - e
    return q0 + r / b


def sqrt_cr(x):
    """Correctly-rounded f32 sqrt via residual correction."""
    s0 = jnp.sqrt(x)
    p, e = _two_prod(s0, s0)
    r = (x - p) - e
    s = s0 + r / (s0 + s0)
    return jnp.where(x == 0, jnp.float32(0), s)


# ---------------------------------------------------------------------------
# double-float ("dd") arithmetic: value = hi + lo, |lo| <= ulp(hi)/2
# ---------------------------------------------------------------------------

def dd(hi, lo=None):
    hi = jnp.asarray(hi, jnp.float32)
    return (hi, jnp.zeros_like(hi) if lo is None else jnp.asarray(lo, jnp.float32))


def dd_add(a, b):
    s, e = _two_sum(a[0], b[0])
    e = e + (a[1] + b[1])
    return _quick_two_sum(s, e)


def dd_neg(a):
    return (-a[0], -a[1])


def dd_mul(a, b):
    p, e = _two_prod(a[0], b[0])
    e = e + (a[0] * b[1] + a[1] * b[0])
    return _quick_two_sum(p, e)


def dd_mul_f32(a, x):
    """dd * exact-f32 scalar/array."""
    p, e = _two_prod(a[0], x)
    e = e + a[1] * x
    return _quick_two_sum(p, e)


def dd_div(a, b):
    q0 = a[0] / b[0]
    r = dd_add(a, dd_neg(dd_mul_f32(b, q0)))
    q1 = r[0] / b[0]
    r2 = dd_add(r, dd_neg(dd_mul_f32(b, q1)))
    q2 = r2[0] / b[0]
    s, e = _quick_two_sum(q0, q1)
    return _quick_two_sum(s, e + q2)


# ---------------------------------------------------------------------------
# Eigen 3.2 f32 householderQr emulation (bit-exact vs the compiled reference)
# ---------------------------------------------------------------------------

def _predux4(v):
    """SSE2 predux order: (v0+v2) + (v1+v3)."""
    return (v[0] + v[2]) + (v[1] + v[3])


def _redux_sum(prods):
    """Eigen Redux.h LinearVectorizedTraversal over a packet expression
    (alignedStart=0): 4-lane packet accumulation, predux, serial tail;
    fully serial below one packet. prods: static length <= 7."""
    n = prods.shape[0]
    if n == 0:
        return jnp.float32(0)
    if n < 4:
        res = prods[0]
        for i in range(1, n):
            res = res + prods[i]
        return res
    res = _predux4(prods[:4])
    for i in range(4, n):
        res = res + prods[i]
    return res


def _build_system(sp, dp):
    """llcv_calc_persp_transform's a/b (cv/warp.cpp:46-67), f32."""
    sx, sy = sp[:, 0], sp[:, 1]
    dx, dy = dp[:, 0], dp[:, 1]
    zeros = jnp.zeros((4,), jnp.float32)
    ones = jnp.ones((4,), jnp.float32)
    top = jnp.stack([sx, sy, ones, zeros, zeros, zeros,
                     (-sx) * dx, (-sy) * dx], axis=1)
    bot = jnp.stack([zeros, zeros, zeros, sx, sy, ones,
                     (-sx) * dy, (-sy) * dy], axis=1)
    a = jnp.concatenate([top, bot], axis=0)
    b = jnp.concatenate([dx, dy], axis=0)
    return a, b


@jax.custom_batching.custom_vmap
def eigen_persp_transform(source_points, dest_points):
    """Bit-exact emulation of llcv_calc_persp_transform (cv/warp.cpp:34-125):
    Eigen 3.2 HouseholderQR<Matrix8x8f>().solve() exactly as compiled in the
    reference research harness (g++ -O2 x86-64: vectorized redux sums with
    SSE2 predux order, coefficient-order rank-1 updates, ascending-H Q^T
    application, col-major triangular back-substitution).

    source_points/dest_points: (4, 2) f32. Returns the row-major (3, 3)
    src->dst homography with m22 = 1. jit/vmap-safe.

    On non-TPU backends the solve is delegated to the numpy twin
    (ops/persp_host.persp_transform) via pure_callback: XLA:CPU's
    unconditional FMA contraction breaks the exact f32 sequence in-graph
    (see the backend caveat at the top of this module). The 8x8 solve is
    tiny, so the callback costs nothing even in tests.

    Under jax.vmap on TPU (the serving camera step), the solve runs as ONE
    Pallas kernel with the batch on lanes (ops/pallas/persp_qr.py) instead
    of ~300 tiny sequential HLO ops per step — bit-identical results,
    measured 6.2 ms -> ~0.1 ms @256 streams.
    """
    return _eigen_persp_single(source_points, dest_points)


@eigen_persp_transform.def_vmap
def _eigen_persp_vmap(axis_size, in_batched, source_points, dest_points):
    sp_b, dp_b = in_batched
    if not sp_b:
        source_points = jnp.broadcast_to(
            source_points[None], (axis_size,) + source_points.shape)
    if jax.default_backend() == "tpu":
        from .pallas.persp_qr import eigen_persp_transform_batched
        dp = dest_points  # (4, 2) when unbatched, (B, 4, 2) when batched
        return eigen_persp_transform_batched(source_points, dp), True
    if not dp_b:
        dest_points = jnp.broadcast_to(
            dest_points[None], (axis_size,) + dest_points.shape)
    return jax.vmap(_eigen_persp_single)(source_points, dest_points), True


def _eigen_persp_single(source_points, dest_points):
    sp = jnp.asarray(source_points, jnp.float32)
    dp = jnp.asarray(dest_points, jnp.float32)
    if jax.default_backend() != "tpu":
        from . import persp_host

        def _host(sp_, dp_):
            return persp_host.persp_transform(sp_, dp_)

        return jax.pure_callback(
            _host, jax.ShapeDtypeStruct((3, 3), jnp.float32), sp, dp,
            vmap_method="sequential")
    A, b = _build_system(sp, dp)
    taus = []
    for k in range(8):
        col = A[k:, k]
        c0 = col[0]
        tail = col[1:]
        n_tail = 8 - k - 1
        if n_tail:
            tsq = _redux_sum(tail * tail)
        else:
            tsq = jnp.float32(0)
        # makeHouseholder (Householder.h:45-73). tailSqNorm == 0 branch is
        # data-dependent: computed with where (both sides cheap).
        degenerate = tsq == 0
        beta_n = sqrt_cr(c0 * c0 + tsq)
        beta_n = jnp.where(c0 >= 0, -beta_n, beta_n)
        beta = jnp.where(degenerate, c0, beta_n)
        tau = jnp.where(degenerate, jnp.float32(0),
                        div_cr(beta_n - c0, beta_n))
        if n_tail:
            ess = jnp.where(degenerate, jnp.zeros_like(tail),
                            div_cr(tail, c0 - beta_n))
        else:
            ess = tail
        taus.append(tau)
        A = A.at[k, k].set(beta)
        if n_tail:
            A = A.at[k + 1:, k].set(ess)
        # applyHouseholderOnTheLeft on A[k:, k+1:] (Householder.h:95-115)
        if k + 1 < 8:
            if n_tail == 0:
                A = A.at[k, k + 1:].set(A[k, k + 1:] * (1 - tau))
            else:
                bottom = A[k + 1:, k + 1:]
                tmp = jnp.stack([_redux_sum(ess * bottom[:, j])
                                 for j in range(bottom.shape[1])])
                tmp = tmp + A[k, k + 1:]
                A = A.at[k, k + 1:].set(A[k, k + 1:] - tau * tmp)
                scaled = tau * ess
                A = A.at[k + 1:, k + 1:].set(
                    bottom - scaled[:, None] * tmp[None, :])
    # solve: c = Q^T b, H_0..H_7 ascending (HouseholderSequence.h:308-317)
    c = b
    for k in range(8):
        tau = taus[k]
        if 8 - k == 1:
            c = c.at[7].set(c[7] * (1 - tau))
        else:
            ess = A[k + 1:, k]
            t = _redux_sum(ess * c[k + 1:]) + c[k]
            c = c.at[k].set(c[k] - tau * t)
            c = c.at[k + 1:].set(c[k + 1:] - (tau * ess) * t)
    # col-major triangular_solve_vector back-substitution
    for j in range(7, -1, -1):
        xj = div_cr(c[j], A[j, j])
        c = c.at[j].set(xj)
        if j > 0:
            c = c.at[:j].set(c[:j] - xj * A[:j, j])
    m = jnp.stack([c[0:3], c[3:6],
                   jnp.stack([c[6], c[7], jnp.float32(1)])])
    return m


# ---------------------------------------------------------------------------
# cvWarpPerspective coordinate maps (double emulated as dd)
# ---------------------------------------------------------------------------

def _invert3x3_dd(m):
    """Adjugate inverse of an f32 3x3 in dd (cv inverts the promoted double
    matrix; dd's ~2^-46 matches double far below quantization relevance)."""
    e = [[dd(m[r, c]) for c in range(3)] for r in range(3)]

    def det2(a, b, c, d):
        return dd_add(dd_mul(a, d), dd_neg(dd_mul(b, c)))

    # cofactor matrix (transposed -> adjugate)
    adj = [[None] * 3 for _ in range(3)]
    idx = [(1, 2), (0, 2), (0, 1)]
    for r in range(3):
        for c in range(3):
            r1, r2 = idx[c]
            c1, c2 = idx[r]
            a_ = det2(e[r1][c1], e[r1][c2], e[r2][c1], e[r2][c2])
            if (r + c) % 2:
                a_ = dd_neg(a_)
            adj[r][c] = a_
    det = dd_add(dd_add(dd_mul(e[0][0], adj[0][0]),
                        dd_mul(e[0][1], adj[1][0])),
                 dd_mul(e[0][2], adj[2][0]))
    return [[dd_div(adj[r][c], det) for c in range(3)] for r in range(3)], det


def _dd_rint(v):
    """round-to-nearest-even of a dd value (emulates cvRound on double).
    |frac| can reach exactly 0.5 on synthetic integer geometry."""
    hi, lo = v
    r0 = jnp.round(hi)
    s = (hi - r0) + lo  # hi - r0 exact (|diff| <= 0.5)
    r0i = r0.astype(jnp.int32)
    odd = (r0i & 1).astype(jnp.int32)
    up = (s > 0.5).astype(jnp.int32) + jnp.where(s == 0.5, odd, 0)
    dn = (s < -0.5).astype(jnp.int32) + jnp.where(s == -0.5, odd, 0)
    return r0i + up - dn


def warp_coord_maps(m, out_shape):
    """Per-pixel quantized source maps, emulating cvWarpPerspective's double
    math (modules/imgproc warpPerspective invoker): M = inv(double(m));
    den = M6 x + M7 y + M8; W = 32/den (0 if den==0); X = cvRound(numx*W).

    m: (3, 3) f32 src->dst (eigen_persp_transform output).
    Returns (X, Y, minv_hi) — X/Y int32 of shape out_shape, the 1/32-px
    fixed-point source coords (x0 = X>>5, ax = X&31), plus the f32 leading
    part of the inverted matrix (for callers needing an approximate
    dst->src map consistent with the exact one, e.g. gather band bounds).
    """
    out_h, out_w = out_shape
    minv, _ = _invert3x3_dd(jnp.asarray(m, jnp.float32))
    xs = jnp.arange(out_w, dtype=jnp.float32)[None, :]
    ys = jnp.arange(out_h, dtype=jnp.float32)[:, None]
    xs = jnp.broadcast_to(xs, (out_h, out_w))
    ys = jnp.broadcast_to(ys, (out_h, out_w))

    def linform(r):
        # minv[r][0]*x + minv[r][1]*y + minv[r][2], all in dd
        t = dd_add(dd_mul_f32(minv[r][1], ys), minv[r][2])
        return dd_add(dd_mul_f32(minv[r][0], xs), t)

    den = linform(2)
    num_x = linform(0)
    num_y = linform(1)
    w32 = dd_div(dd(jnp.full(den[0].shape, 32.0, jnp.float32)), den)
    zero = den[0] == 0
    fx = dd_mul(num_x, w32)
    fy = dd_mul(num_y, w32)
    big = jnp.float32(2**31 - 256)
    fx = (jnp.clip(fx[0], -big, big), fx[1])
    fy = (jnp.clip(fy[0], -big, big), fy[1])
    X = jnp.where(zero, 0, _dd_rint(fx))
    Y = jnp.where(zero, 0, _dd_rint(fy))
    minv_hi = jnp.stack([jnp.stack([minv[r][c][0] for c in range(3)])
                         for r in range(3)])
    return X, Y, minv_hi
