"""Pallas TPU kernel: batched bit-exact Eigen-QR homography solve.

The serving camera step needs one 8x8 Eigen-f32-QR solve per stream per
frame (ops/persp.eigen_persp_transform — the bit-exact emulation of
llcv_calc_persp_transform, cv/warp.cpp:34-125). Under the stream vmap the
unrolled XLA form is ~300 tiny sequential HLO ops whose fixed per-op cost
dominates (measured 6.2 ms @256 streams — a quarter of the whole warp).

This kernel runs the SAME f32 operation sequence once, with the stream
batch on lanes: every step is one VPU op over (1, S) vectors inside a
single kernel launch (measured ~0.1 ms @256). Numerics are identical:

* mul/add/sub are exact f32 ops on both paths (Mosaic does not contract
  them into FMAs — verified bit-exact vs the XLA form on device);
* div_cr / sqrt_cr produce CORRECTLY-ROUNDED results from any ~1-ulp
  approximate seed (Markstein residual correction), so a different
  hardware divide/sqrt approximation cannot change the output bits;
* _redux_sum's SSE2 predux accumulation order is replicated verbatim.

Exposed as `eigen_persp_transform_batched` and wired into
ops/persp.eigen_persp_transform via jax.custom_batching.custom_vmap, so
`jax.vmap(eigen_persp_transform)` transparently lands here on TPU.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SPLIT = np.float32(4097.0)  # 2^12 + 1 (Dekker split for f32)


def _two_prod(a, b):
    p = a * b
    ca = _SPLIT * a
    ah = ca - (ca - a)
    al = a - ah
    cb = _SPLIT * b
    bh = cb - (cb - b)
    bl = b - bh
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def _div_cr(a, b):
    q0 = a / b
    p, e = _two_prod(q0, b)
    r = (a - p) - e
    return q0 + r / b


def _sqrt_cr(x):
    s0 = jnp.sqrt(x)
    p, e = _two_prod(s0, s0)
    r = (x - p) - e
    s = s0 + r / (s0 + s0)
    return jnp.where(x == 0, jnp.float32(0), s)


def _redux_sum(prods):
    """Eigen Redux.h order over a static list of (1, S) values (SSE2
    predux (v0+v2)+(v1+v3) head, serial tail) — ops/persp._redux_sum on a
    list instead of a stacked array, same op sequence."""
    n = len(prods)
    if n == 0:
        return None
    if n < 4:
        res = prods[0]
        for i in range(1, n):
            res = res + prods[i]
        return res
    res = (prods[0] + prods[2]) + (prods[1] + prods[3])
    for i in range(4, n):
        res = res + prods[i]
    return res


def _qr_solve_lanes(sx, sy, dx, dy):
    """The Eigen 3.2 HouseholderQR solve of ops/persp.eigen_persp_transform,
    transcribed onto per-entry (1, S) lane vectors (A held as a python
    8x8 grid of values — every step is one VPU op, no dynamic indexing).

    sx/sy/dx/dy: lists of 4 (1, S) f32 values (corner coordinates).
    Returns the 8 solution entries as (1, S) values.
    """
    S = sx[0].shape
    zero = jnp.zeros(S, jnp.float32)
    one = jnp.ones(S, jnp.float32)

    # llcv_calc_persp_transform's a/b (cv/warp.cpp:46-67)
    A = [[None] * 8 for _ in range(8)]
    b = [None] * 8
    for p in range(4):
        A[p][0], A[p][1], A[p][2] = sx[p], sy[p], one
        A[p][3] = A[p][4] = A[p][5] = zero
        A[p][6] = (-sx[p]) * dx[p]
        A[p][7] = (-sy[p]) * dx[p]
        q = p + 4
        A[q][0] = A[q][1] = A[q][2] = zero
        A[q][3], A[q][4], A[q][5] = sx[p], sy[p], one
        A[q][6] = (-sx[p]) * dy[p]
        A[q][7] = (-sy[p]) * dy[p]
        b[p] = dx[p]
        b[q] = dy[p]

    taus = []
    for k in range(8):
        c0 = A[k][k]
        tail = [A[i][k] for i in range(k + 1, 8)]
        n_tail = len(tail)
        if n_tail:
            tsq = _redux_sum([t * t for t in tail])
        else:
            tsq = zero
        degenerate = tsq == 0
        beta_n = _sqrt_cr(c0 * c0 + tsq)
        beta_n = jnp.where(c0 >= 0, -beta_n, beta_n)
        beta = jnp.where(degenerate, c0, beta_n)
        tau = jnp.where(degenerate, jnp.float32(0),
                        _div_cr(beta_n - c0, beta_n))
        denom = c0 - beta_n
        ess = [jnp.where(degenerate, zero, _div_cr(t, denom)) for t in tail]
        taus.append(tau)
        A[k][k] = beta
        for i in range(n_tail):
            A[k + 1 + i][k] = ess[i]
        # applyHouseholderOnTheLeft on A[k:, k+1:]
        if k + 1 < 8:
            if n_tail == 0:
                for j in range(k + 1, 8):
                    A[k][j] = A[k][j] * (1 - tau)
            else:
                for j in range(k + 1, 8):
                    tmp = _redux_sum([ess[i] * A[k + 1 + i][j]
                                      for i in range(n_tail)])
                    tmp = tmp + A[k][j]
                    A[k][j] = A[k][j] - tau * tmp
                    for i in range(n_tail):
                        A[k + 1 + i][j] = A[k + 1 + i][j] - \
                            (tau * ess[i]) * tmp

    # c = Q^T b, H_0..H_7 ascending
    c = list(b)
    for k in range(8):
        tau = taus[k]
        if 8 - k == 1:
            c[7] = c[7] * (1 - tau)
        else:
            ess = [A[i][k] for i in range(k + 1, 8)]
            t = _redux_sum([ess[i] * c[k + 1 + i]
                            for i in range(len(ess))]) + c[k]
            c[k] = c[k] - tau * t
            for i in range(len(ess)):
                c[k + 1 + i] = c[k + 1 + i] - (tau * ess[i]) * t

    # col-major triangular back-substitution
    for j in range(7, -1, -1):
        xj = _div_cr(c[j], A[j][j])
        c[j] = xj
        for i in range(j):
            c[i] = c[i] - xj * A[i][j]
    return c


def _qr_kernel(sp_ref, dp_ref, out_ref):
    sx = [sp_ref[2 * p:2 * p + 1, :] for p in range(4)]
    sy = [sp_ref[2 * p + 1:2 * p + 2, :] for p in range(4)]
    dx = [dp_ref[2 * p:2 * p + 1, :] for p in range(4)]
    dy = [dp_ref[2 * p + 1:2 * p + 2, :] for p in range(4)]
    c = _qr_solve_lanes(sx, sy, dx, dy)
    for j in range(8):
        out_ref[j:j + 1, :] = c[j]
    out_ref[8:9, :] = jnp.ones_like(c[0])


def eigen_persp_transform_batched(source_points, dest_points,
                                  interpret=False):
    """Batched bit-exact Eigen-QR homography solve (one Pallas launch).

    source_points: (S, 4, 2) f32; dest_points: (4, 2) or (S, 4, 2) f32.
    Returns (S, 3, 3) f32 — identical bits to vmapping
    ops/persp.eigen_persp_transform.
    """
    sp = jnp.asarray(source_points, jnp.float32)
    dp = jnp.asarray(dest_points, jnp.float32)
    s = sp.shape[0]
    if dp.ndim == 2:
        dp = jnp.broadcast_to(dp[None], (s, 4, 2))
    sl = -(-s // 128) * 128
    spl = jnp.pad(sp.reshape(s, 8).T, ((0, 0), (0, sl - s)))   # (8, SL)
    dpl = jnp.pad(dp.reshape(s, 8).T, ((0, 0), (0, sl - s)))
    out = pl.pallas_call(
        _qr_kernel,
        out_shape=jax.ShapeDtypeStruct((9, sl), jnp.float32),
        interpret=interpret,
    )(spl, dpl)
    return out.T[:s].reshape(s, 3, 3)
