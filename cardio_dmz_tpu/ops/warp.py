"""Perspective rectification (cv/warp.cpp equivalents).

The reference solves an 8x8 system for the homography via Eigen householderQr
(llcv_calc_persp_transform, cv/warp.cpp:34-125) and warps with
cvWarpPerspective bilinear + fill outliers (:158-166), or a GL shader on
device GPUs.

Three TPU formulations:
* warp_perspective_exact — BIT-EXACT vs the reference chain (emulated
  Eigen-f32-QR homography + cv's double coords + 5-bit fixed-point
  bilinear) as gather-free one-hot contractions; the camera serving
  default since round 3.
* warp_perspective_dense — two-pass hat-weight resample with full-float
  interpolation (better-than-reference precision, not bit-parity).
* warp_perspective — per-pixel gather oracle (f32 coords), test-only.
"""

import math

import jax.numpy as jnp
import numpy as np
from jax import lax

from ..constants import CARD_WIDTH, CARD_HEIGHT
from .persp import eigen_persp_transform, warp_coord_maps


def calc_persp_transform(source_points, dest_points):
    """Solve for the 3x3 homography H mapping source -> dest.

    source_points/dest_points: (4, 2) arrays of (x, y).
    Mirrors llcv_calc_persp_transform's a/b setup (cv/warp.cpp:46-67);
    uses jnp.linalg.solve (the 8x8 system is tiny).
    """
    sp = jnp.asarray(source_points, jnp.float32)
    dp = jnp.asarray(dest_points, jnp.float32)
    sx, sy = sp[:, 0], sp[:, 1]
    dx, dy = dp[:, 0], dp[:, 1]
    zeros = jnp.zeros((4,), jnp.float32)
    ones = jnp.ones((4,), jnp.float32)
    top = jnp.stack([sx, sy, ones, zeros, zeros, zeros, -sx * dx, -sy * dx], axis=1)
    bot = jnp.stack([zeros, zeros, zeros, sx, sy, ones, -sx * dy, -sy * dy], axis=1)
    a = jnp.concatenate([top, bot], axis=0)
    b = jnp.concatenate([dx, dy], axis=0)
    x = jnp.linalg.solve(a, b)
    h = jnp.concatenate([x, jnp.ones((1,), jnp.float32)]).reshape(3, 3)
    return h


def warp_perspective(image, h_matrix, out_shape, fill_value=0.0,
                     fixed_point=True):
    """dst(p) = src(H^-1 p) with bilinear sampling, zero fill outside.

    image: (..., H, W) (u8 or float); h_matrix maps src -> dst coords.
    out_shape: (out_h, out_w) static.

    fixed_point=True (u8 images) reproduces cvWarpPerspective's
    INTER_LINEAR scheme: source coords quantized to 1/32 px (INTER_BITS=5,
    round half to even), integer tap weights (32-ax)(32-ay)*32 etc. (the
    BilinearTab entries are exact integers for bilinear), accumulation in
    int, then (acc + 2^14) >> 15 with u8 saturation. With identical
    coordinates this is bit-exact vs OpenCV; residual differences come
    only from 1/32-bin flips where our f32 coordinate math rounds across
    a boundary the reference's double math does not.
    """
    out_h, out_w = out_shape
    hinv = jnp.linalg.inv(h_matrix)
    xs = jnp.arange(out_w, dtype=jnp.float32)
    ys = jnp.arange(out_h, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)  # (out_h, out_w)
    ones = jnp.ones_like(gx)
    src = jnp.einsum("rc,chw->rhw", hinv, jnp.stack([gx, gy, ones]))
    sx = src[0] / src[2]
    sy = src[1] / src[2]

    in_h, in_w = image.shape[-2], image.shape[-1]

    def sample(yi, xi):
        valid = (xi >= 0) & (xi < in_w) & (yi >= 0) & (yi < in_h)
        xi_c = jnp.clip(xi, 0, in_w - 1)
        yi_c = jnp.clip(yi, 0, in_h - 1)
        vals = image[..., yi_c, xi_c].astype(jnp.float32)
        return jnp.where(valid, vals, fill_value)

    if fixed_point and jnp.issubdtype(image.dtype, jnp.integer):
        sxq = jnp.round(sx * 32.0).astype(jnp.int32)   # cvRound(fX*32)
        syq = jnp.round(sy * 32.0).astype(jnp.int32)
        x0i = sxq >> 5
        y0i = syq >> 5
        ax = (sxq & 31).astype(jnp.int32)
        ay = (syq & 31).astype(jnp.int32)
        v00 = sample(y0i, x0i).astype(jnp.int32)
        v01 = sample(y0i, x0i + 1).astype(jnp.int32)
        v10 = sample(y0i + 1, x0i).astype(jnp.int32)
        v11 = sample(y0i + 1, x0i + 1).astype(jnp.int32)
        acc = (v00 * ((32 - ax) * (32 - ay) * 32)
               + v01 * (ax * (32 - ay) * 32)
               + v10 * ((32 - ax) * ay * 32)
               + v11 * (ax * ay * 32))
        out = jnp.clip((acc + (1 << 14)) >> 15, 0, 255)
        return out.astype(image.dtype)

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    v00 = sample(y0i, x0i)
    v01 = sample(y0i, x0i + 1)
    v10 = sample(y0i + 1, x0i)
    v11 = sample(y0i + 1, x0i + 1)
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    out = top * (1 - fy) + bot * fy
    if jnp.issubdtype(image.dtype, jnp.integer):
        out = jnp.round(out).astype(image.dtype)
    return out


def rect_to_quad_map(source_points, out_shape):
    """Closed-form dst-rect -> src-quad homography (no linear solve).

    jnp.linalg.solve/inv on tiny matrices lowers to a serial LU loop on
    TPU; the 4-point square->quad map has the classic closed form
    (Heckbert, "Fundamentals of Texture Mapping"), pure elementwise math
    that vmaps over streams for free.

    source_points: (4, 2) (tl, tr, bl, br) quad corners (x, y).
    out_shape: (out_h, out_w); dst corners are (0,0),(W-1,0),(0,H-1),
    (W-1,H-1) — the reference's dest rect (dmz.cpp:483).
    Returns m (3, 3) with (x, y, w) = m @ (c, r, 1), src = (x/w, y/w).
    """
    sp = jnp.asarray(source_points, jnp.float32)
    x0, y0 = sp[0, 0], sp[0, 1]   # (u,v)=(0,0)
    x1, y1 = sp[1, 0], sp[1, 1]   # (1,0)
    x2, y2 = sp[2, 0], sp[2, 1]   # (0,1)
    x3, y3 = sp[3, 0], sp[3, 1]   # (1,1)
    dx1, dy1 = x1 - x3, y1 - y3
    dx2, dy2 = x2 - x3, y2 - y3
    sx = x0 - x1 - x2 + x3
    sy = y0 - y1 - y2 + y3
    det = dx1 * dy2 - dx2 * dy1
    det = jnp.where(det == 0, 1e-20, det)
    g = (sx * dy2 - dx2 * sy) / det
    h = (dx1 * sy - sx * dy1) / det
    a = x1 - x0 + g * x1
    b = x2 - x0 + h * x2
    d = y1 - y0 + g * y1
    e = y2 - y0 + h * y2
    m_uv = jnp.stack([jnp.stack([a, b, x0]),
                      jnp.stack([d, e, y0]),
                      jnp.stack([g, h, jnp.ones((), jnp.float32)])])
    # compose with (c, r) -> (u, v) = (c/(W-1), r/(H-1))
    out_h, out_w = out_shape
    scale = jnp.asarray([[1.0 / (out_w - 1), 0.0, 0.0],
                         [0.0, 1.0 / (out_h - 1), 0.0],
                         [0.0, 0.0, 1.0]], jnp.float32)
    return m_uv @ scale


def _block_starts(lo0, hi0, lo1, hi1, out_n, in_n, block, win, pad):
    """Static per-block source-window starts: dst index t interpolates the
    corner ranges [lo0,hi0] -> [lo1,hi1]; the needed source span for a dst
    block is the range union over its indices ± pad. Returns (starts, ok)
    where ok=False means `win` cannot cover the span."""
    starts = []
    n_blocks = -(-out_n // block)
    denom = max(out_n - 1, 1)
    for b in range(n_blocks):
        t0, t1 = b * block, min(out_n - 1, b * block + block - 1)
        cands = []
        for t in (t0, t1):
            f = t / denom
            cands.append(lo0 + f * (lo1 - lo0))
            cands.append(hi0 + f * (hi1 - hi0))
        smin = math.floor(min(cands)) - pad - 1
        smax = math.ceil(max(cands)) + pad + 2
        if smax - smin > win:
            return None, False
        starts.append(max(0, min(int(smin), in_n - win)))
    return starts, True


def warp_perspective_dense(image, m_dst_to_src, out_shape, src_bounds=None,
                           row_block=16, row_win=192, col_block=64,
                           col_win=288, tilt=0.095, compute_dtype=None,
                           fixed_point=False):
    """Gather-free perspective warp: classic two-pass (Catmull-Smith)
    resampling where each pass is a dense hat-weight contraction.

    Per-element 2-D gathers lower to serial element loops on TPU (the
    repo-wide "dynamic indexing is poison" lesson); this formulation is
    pure generated-weight multiply-reduce that XLA fuses on the VPU:

      pass 1 (vertical):   V[r, j] = sum_i hat(Yv[r, j] - i) * img[i, j]
      pass 2 (horizontal): out[r, c] = sum_j hat(X[r, c] - j) * V[r, j]

    with hat(t) = max(0, 1 - |t|) (exactly linear interpolation, and taps
    outside the image naturally contribute 0 = cv's BORDER_CONSTANT
    zero-fill). Yv[r, j] is the source row of the point that lands on
    output row r with source column j (closed-form Mobius solve), so the
    two passes compose to the same resample cvWarpPerspective computes, up
    to the standard two-pass approximation: the vertical sample position
    differs from true bilinear by at most |dY/dj| (< tan 5 deg for
    detection-gated card quads; zero for axis-aligned quads).

    image: (H, W) u8/float. m_dst_to_src: (3, 3) mapping (c, r, 1) ->
    homogeneous src coords (rect_to_quad_map output).

    src_bounds: optional STATIC quad-corner bounds
    ((ytl_lo, ytl_hi), (ybl_lo, ybl_hi), (xtl_lo, xtl_hi), (xtr_lo, xtr_hi))
    from the caller's detection geometry. When given, each pass only
    contracts over a static source window per output block (the needed
    source rows/cols per block are bounded by interpolating the corner
    ranges ± the tilt spread), cutting the hat work ~3x. Samples that
    fall outside the promised bounds read as zero (fill), which only
    happens for quads the detector could not have produced.

    compute_dtype: dtype for the hat-weight contractions (coordinates stay
    f32; accumulation stays f32). jnp.bfloat16 is the serving analogue of
    the reference's reduced-precision on-device GL warp
    (dmz_use_gles_warp, cv/warp.cpp:133-148): pixel error <=1-2 gray,
    MXU-rate contractions. None/f32 = the cvWarpPerspective-faithful
    research path (the reference's CYTHON_DMZ configuration).
    """
    out_h, out_w = out_shape
    in_h, in_w = image.shape[-2], image.shape[-1]
    m = m_dst_to_src

    rr = jnp.arange(out_h, dtype=jnp.float32)[:, None]   # (R, 1)
    cc = jnp.arange(out_w, dtype=jnp.float32)[None, :]   # (1, C)
    jj = jnp.arange(in_w, dtype=jnp.float32)[None, :]    # (1, W)

    # pass-2 horizontal coordinates X(r, c)
    den = m[2, 0] * cc + m[2, 1] * rr + m[2, 2]          # (R, C)
    x_rc = (m[0, 0] * cc + m[0, 1] * rr + m[0, 2]) / den

    # pass-1 vertical coordinates Yv(r, j): solve X(c, r) = j for c, then
    # evaluate Y there. c = (j*(m21 r + m22) - (m01 r + m02)) / (m00 - j*m20)
    a_r = m[2, 1] * rr[:, :1] + m[2, 2]                  # (R, 1)
    b_r = m[0, 1] * rr[:, :1] + m[0, 2]
    num_c = jj * a_r - b_r                               # (R, W)
    den_c = m[0, 0] - jj * m[2, 0]                       # (1, W)
    c_rj = num_c / jnp.where(den_c == 0, 1e-20, den_c)
    den_y = m[2, 0] * c_rj + a_r
    y_rj = (m[1, 0] * c_rj + m[1, 1] * rr[:, :1] + m[1, 2]) / den_y  # (R, W)

    cdt = compute_dtype or jnp.float32
    imgf = image.astype(cdt)   # u8 values are exact in bf16 and f32

    def contract(spec, w, operand):
        # explicit broadcast-multiply-reduce instead of einsum: keeps the
        # generated hat-weight tensor inside one elementwise+reduce fusion
        # rather than a dot_general operand (measured a small ~2.5% win on
        # the camera step; the pass is still weight-generation bound)
        if spec == "rji,ij->rj":
            return jnp.sum(w.astype(cdt) * operand.T[None, :, :], axis=-1)
        assert spec == "rcj,rj->rc"
        return jnp.sum(w.astype(cdt) * operand[:, None, :], axis=-1)

    row_starts = col_starts = None
    if src_bounds is not None:
        (ytl, ybl, xtl, xtr) = src_bounds
        pad_r = int(math.ceil(tilt * in_w / 2))
        row_starts, ok_r = _block_starts(ytl[0], ytl[1], ybl[0], ybl[1],
                                         out_h, in_h, row_block, row_win,
                                         pad_r)
        pad_c = int(math.ceil(tilt * in_h / 2))
        col_starts, ok_c = _block_starts(xtl[0], xtl[1], xtr[0], xtr[1],
                                         out_w, in_w, col_block, col_win,
                                         pad_c)
        if not ok_r:
            row_starts = None
        if not ok_c:
            col_starts = None

    # fixed_point=True mirrors cvWarpPerspective's INTER_LINEAR fixed
    # point: sample positions quantized to 1/32 px, integer hat weights in
    # [0, 32] per pass (their per-pixel products are exactly the
    # BilinearTab entries / 32), f32 accumulation of exact integers
    # (< 2^24), and the final (acc*32 + 2^14) >> 15 rounding. It raises
    # measured digit agreement with the compiled reference (97.2 -> 98.9%
    # on the camera sweep) but the 5-bit weights are LOSSIER than full
    # float bilinear, so serving defaults to the float hats — deliberately
    # better-than-reference interpolation.
    fixed = (fixed_point and jnp.issubdtype(image.dtype, jnp.integer)
             and compute_dtype is None)

    def hat1(pos, grid):
        if fixed:
            q = jnp.round(pos * 32.0)
            return jnp.maximum(0.0, 32.0 - jnp.abs(q[:, :, None] - 32.0 * grid))
        return jnp.maximum(0.0, 1.0 - jnp.abs(pos[:, :, None] - grid))

    # pass 1 (vertical): V[r, j] = sum_i hat(Yv - i) * img[i, j]
    if row_starts is None:
        ii = jnp.arange(in_h, dtype=jnp.float32)
        v = contract("rji,ij->rj", hat1(y_rj, ii), imgf)  # (R, W)
    else:
        parts = []
        for b, s in enumerate(row_starts):
            r0 = b * row_block
            rb = min(row_block, out_h - r0)
            win = lax.slice(imgf, (s, 0), (s + row_win, in_w))
            ii = (s + jnp.arange(row_win)).astype(jnp.float32)
            parts.append(contract("rji,ij->rj", hat1(y_rj[r0:r0 + rb], ii),
                                  win))
        v = jnp.concatenate(parts, axis=0)               # (R, W)

    # pass 2 (horizontal): out[r, c] = sum_j hat(X - j) * V[r, j]
    v_op = v.astype(cdt)
    if col_starts is None:
        out = contract("rcj,rj->rc", hat1(x_rc, jj[0]), v_op)  # (R, C)
    else:
        parts = []
        for b, s in enumerate(col_starts):
            c0 = b * col_block
            cb = min(col_block, out_w - c0)
            vw = v_op[:, s:s + col_win]
            jw = (s + jnp.arange(col_win)).astype(jnp.float32)
            parts.append(contract("rcj,rj->rc",
                                  hat1(x_rc[:, c0:c0 + cb], jw), vw))
        out = jnp.concatenate(parts, axis=1)             # (R, C)

    if jnp.issubdtype(image.dtype, jnp.integer):
        if fixed:
            out = jnp.clip(jnp.floor((out * 32.0 + 16384.0) / 32768.0),
                           0, 255)
        else:
            out = jnp.round(out)
        out = out.astype(image.dtype)
    return out


def _band_base(b, rr, jj, slack=12):
    """Row-band base for the exact gather: for output row r and source
    column j, the first of the 3 consecutive source rows guaranteed to
    contain both vertical taps of every pixel in row r whose horizontal
    taps touch column j.

    y_line(r, j) = source y where row r's preimage line crosses column j
    (the same Mobius solve as warp_perspective_dense's pass 1); any pixel
    (r, c) with x0(c) in {j-1, j} has |32*y(r,c) - 32*y_line(r,j)| <=
    32*slope*1.03 + 1 < slack for |dy/dx| <= (slack-1)/32 ~ tan 19 deg —
    far beyond detector-reachable card tilt. b: (3, 3) f32 dst->src map of
    the gather frame; rr/jj broadcastable f32. Returns int32 base rows.
    """
    a_r = b[2, 1] * rr + b[2, 2]
    b_r = b[0, 1] * rr + b[0, 2]
    den_c = b[0, 0] - jj * b[2, 0]
    c_rj = (jj * a_r - b_r) / jnp.where(den_c == 0, 1e-20, den_c)
    den_y = b[2, 0] * c_rj + a_r
    y_rj = (b[1, 0] * c_rj + b[1, 1] * rr + b[1, 2]) / \
        jnp.where(den_y == 0, 1e-20, den_y)
    q = jnp.round(y_rj * 32.0).astype(jnp.int32)
    return (q - slack) >> 5


def warp_perspective_exact(image, m_src_to_dst, out_shape,
                           src_bounds=None, transpose=False,
                           row_block=16, row_win=192,
                           col_block=64, col_win=288, tilt=0.095,
                           use_pallas=None, interpret=False):
    """cvWarpPerspective INTER_LINEAR + FILL_OUTLIERS, reproduced EXACTLY
    (bit-for-bit vs the compiled reference) as dense TPU contractions.

    The reference's per-pixel random access (cv/warp.cpp:165 ->
    cvWarpPerspective) is TPU poison; this reformulates it as three
    gather-free stages, none with data-dependent shapes:

      coords   per-pixel quantized source positions (X, Y) in 1/32 px,
               emulating cv's double math in double-float (ops/persp.py);
      rows     a 3-row source band per (dst row, source column) — enough
               to cover both vertical taps of every pixel touching that
               column (see _band_base) — gathered by one-hot contractions
               over static per-row-block windows (the same corner-bound
               windows as warp_perspective_dense);
      columns  per-pixel horizontal taps x0/x0+1 fetched from the banded
               rows by a two-level factored one-hot over static per-col-
               block windows (MXU matmuls; the one-hots are the only VPU
               work that scales with window size);

    then an integer bilinear combine: weights (32-ax)(32-ay)*32 etc. and
    (acc + 2^14) >> 15 with u8 saturation — OpenCV's exact scheme (the
    BilinearTab entries are these integers, INTER_BITS=5).

    image: (H, W) u8. m_src_to_dst: (3, 3) f32 forward homography
    (eigen_persp_transform). src_bounds/transpose: as in
    warp_perspective_dense. Samples outside the static windows read as 0;
    the windows cover every detector-reachable quad (api.warp_src_bounds).

    use_pallas: route the gather stages through the Mosaic kernel
    (ops/pallas/warp_gather.py) — identical results, real dynamic_gather
    ops instead of one-hot contractions. None = auto (TPU backend and a
    32-row-aligned source). interpret: pallas interpret mode (CPU tests).
    """
    import jax as _jax
    # one-hots and u8 pixel values are exact in bf16 and single-nonzero
    # sums accumulate in f32 -> bf16 contractions are bit-safe; CPU XLA
    # lacks the bf16 dot, so tests fall back to f32 (same results)
    odt = jnp.bfloat16 if _jax.default_backend() == "tpu" else jnp.float32
    out_h, out_w = out_shape
    xq, yq, minv = warp_coord_maps(m_src_to_dst, out_shape)
    if transpose:
        image = jnp.swapaxes(image, -1, -2)
        xq, yq = yq, xq
        minv = minv[jnp.array([1, 0, 2])]
    in_h, in_w = image.shape[-2], image.shape[-1]

    if use_pallas is None:
        use_pallas = (_jax.default_backend() == "tpu" and in_h % 32 == 0
                      and image.ndim == 2)
    if use_pallas:
        from .pallas.warp_gather import warp_gather_exact
        rr = jnp.arange(out_h, dtype=jnp.float32)[:, None]
        jjf = jnp.arange(in_w, dtype=jnp.float32)[None, :]
        yb = _band_base(minv, rr, jjf)                   # (out_h, in_w)
        # narrow to int16 HERE so the clip+cast fuses into the coord/band
        # producer fusions and the int32 planes never reach HBM (X/Y/yb
        # int32 cost ~470 MB/step @256 camera streams, hlo_hogs round 5).
        # Clipping at lim keeps every far-out coordinate far-out (see
        # warp_gather.py: x0 = lim>>5 >= in_w, -lim < 0), so border masks
        # and the band-window minima behave identically.
        lim = 672 * 32
        xq = jnp.clip(xq, -lim, lim).astype(jnp.int16)
        yq = jnp.clip(yq, -lim, lim).astype(jnp.int16)
        yb = jnp.clip(yb, -lim, lim).astype(jnp.int16)
        col_bounds = None
        if src_bounds is not None:
            (_, _, xtl, xtr) = src_bounds
            col_bounds = (xtl, xtr)
        return warp_gather_exact(image, xq, yq, yb, out_shape,
                                 col_bounds=col_bounds, tilt=tilt,
                                 interpret=interpret)

    x0 = xq >> 5
    ax = (xq & 31).astype(jnp.int32)
    y0 = yq >> 5
    ay = (yq & 31).astype(jnp.int32)

    row_starts = col_starts = None
    if src_bounds is not None:
        (ytl, ybl, xtl, xtr) = src_bounds
        pad_r = int(math.ceil(tilt * in_w / 2))
        row_starts, ok_r = _block_starts(ytl[0], ytl[1], ybl[0], ybl[1],
                                         out_h, in_h, row_block, row_win,
                                         pad_r)
        pad_c = int(math.ceil(tilt * in_h / 2))
        col_starts, ok_c = _block_starts(xtl[0], xtl[1], xtr[0], xtr[1],
                                         out_w, in_w, col_block, col_win,
                                         pad_c)
        if not ok_r:
            row_starts = None
        if not ok_c:
            col_starts = None
    if row_starts is None:
        row_win = in_h
        row_starts = [0] * (-(-out_h // row_block))
    if col_starts is None:
        col_win = 1 << (in_w - 1).bit_length()
        col_starts = [0] * (-(-out_w // col_block))

    imgf = image.astype(odt)
    jj = jnp.arange(in_w, dtype=jnp.float32)[None, :]

    # ---- stage "rows": G[r, j, m] = image[band(r, j) + m, j], m in 0..2
    # two-level: a 16-quantized coarse window start per column, then an
    # exact one-hot over the D-row fine window. D covers the band's spread
    # across the row block (row_block * dy/dr <= ~21 for card-scale maps)
    # + the 16-row quantization + the 3-row band; out-of-window taps read 0.
    stride = 16
    D = 48
    n_hi = max((row_win - D) // stride + 1, 1)
    hi_idx = jnp.arange(n_hi, dtype=jnp.int32)
    d_idx = jnp.arange(D, dtype=jnp.int32)
    g_parts = []
    for bidx, s in enumerate(row_starts):
        r0 = bidx * row_block
        rb = min(row_block, out_h - r0)
        rr = jnp.arange(r0, r0 + rb, dtype=jnp.float32)[:, None]
        yb = _band_base(minv, rr, jj)                     # (rb, W) int32
        bb = jnp.min(yb, axis=0)                          # (W,)
        d0q = jnp.clip((bb - s) // stride, 0, n_hi - 1)   # (W,)
        oh_hi = (d0q[:, None] == hi_idx[None, :]).astype(odt)
        win = lax.slice(imgf, (s, 0), (s + row_win, in_w))
        win = jnp.pad(win, ((0, D + 2), (0, 0)))
        # winb[h, d, j] = win[stride*h + d, j]
        winb = jnp.stack(
            [lax.slice(win, (stride * h, 0), (stride * h + D + 2, in_w))
             for h in range(n_hi)])                       # (n_hi, D+2, W)
        w2 = jnp.einsum("jh,hdj->jd", oh_hi, winb,
                        preferred_element_type=jnp.float32)  # (W, D+2)
        rel = yb - (s + d0q * stride)[None, :]            # (rb, W)
        oh_d = (rel[:, :, None] == d_idx[None, None, :]).astype(odt)
        w2s = jnp.stack([w2[:, m:m + D] for m in range(3)], axis=-1)
        w2s = w2s.astype(odt)                             # (W, D, 3)
        g3 = jnp.einsum("rjd,jdm->rjm", oh_d, w2s,
                        preferred_element_type=jnp.float32)
        # 4th channel: the band base itself (window-relative, so it stays
        # bf16-exact <= 256). The assembly MUST see the same base the
        # values were gathered at — recomputing _band_base per pixel is
        # not bit-stable across fusion contexts (FMA contraction), so the
        # base rides the same gather path as the values.
        ybrel = (yb - s).astype(jnp.float32)[..., None]   # (rb, W, 1)
        g_parts.append(jnp.concatenate([g3, ybrel], axis=-1))
    g = jnp.concatenate(g_parts, axis=0)                  # (out_h, W, 4)

    # ---- stage "columns": v[r, c, t, m] = G[r, x0+t, m] + band base rows
    # pair-stack the tap columns, then two-level one-hot per col block
    gp = jnp.concatenate(
        [g, jnp.concatenate([g[:, 1:, :], jnp.zeros_like(g[:, :1, :])],
                            axis=1)], axis=-1)            # (out_h, W, 8)
    if col_win > in_w:
        gp = jnp.pad(gp, ((0, 0), (0, col_win - in_w), (0, 0)))
    gp = gp.astype(odt)
    n_lo = 16
    n_hi_c = col_win // n_lo
    lo_idx = jnp.arange(n_lo, dtype=jnp.int32)
    hi_c = jnp.arange(n_hi_c, dtype=jnp.int32)
    out_parts = []
    for bidx, s in enumerate(col_starts):
        c0 = bidx * col_block
        cb = min(col_block, out_w - c0)
        # pair column: x0, except at the left image border (x0 == -1,
        # where only the x0+1 == 0 tap is in-image; cv still reads it,
        # cv/warp.cpp:165) gather column 0's pair and let the assembly
        # take its FIRST half for the high tap
        idx = jnp.maximum(x0[:, c0:c0 + cb], 0) - s       # (out_h, cb)
        valid = (idx >= 0) & (idx < col_win)
        oh_lo = ((idx & (n_lo - 1))[:, :, None] == lo_idx[None, None, :])
        oh_lo = (oh_lo & valid[:, :, None]).astype(odt)
        oh_hi = ((idx >> 4)[:, :, None] == hi_c[None, None, :]).astype(
            jnp.float32)
        gw = gp[:, s:s + col_win, :].reshape(out_h, n_hi_c, n_lo, 8)
        t1 = jnp.einsum("rcl,rhlv->rchv", oh_lo, gw,
                        preferred_element_type=jnp.float32)
        v = jnp.einsum("rch,rchv->rcv", oh_hi, t1)
        out_parts.append(v)
    v8 = jnp.concatenate(out_parts, axis=1)               # (out_h, out_w, 8)

    # ---- assembly: select band offsets, mask borders, integer bilinear
    vi = jnp.round(v8).astype(jnp.int32)                  # exact ints
    srow = jnp.asarray(np.repeat(np.asarray(row_starts, np.int32),
                                 row_block)[:out_h])[:, None]
    yb0 = vi[..., 3] + srow
    yb1 = vi[..., 7] + srow
    m0 = jnp.clip(y0 - yb0, 0, 1)
    m1 = jnp.clip(y0 - yb1, 0, 1)

    def pick(t, m):
        base = vi[..., 4 * t:4 * t + 3]
        return jnp.where(m[..., None] == jnp.arange(3)[None, None, :],
                         base, 0).sum(-1)

    i00 = pick(0, m0)
    i10 = pick(0, m0 + 1)
    # left-border pixels (x0 == -1) gathered their pair at column 0, so
    # the x0+1 tap lives in the LOW half (whose base yb0 is then column
    # 0's base — the right base for that tap); i00/i10 are border-masked
    edge_l = x0 == -1
    i01 = jnp.where(edge_l, i00, pick(1, m1))
    i11 = jnp.where(edge_l, i10, pick(1, m1 + 1))
    vx0 = (x0 >= 0) & (x0 < in_w)
    vx1 = (x0 + 1 >= 0) & (x0 + 1 < in_w)
    vy0 = (y0 >= 0) & (y0 < in_h)
    vy1 = (y0 + 1 >= 0) & (y0 + 1 < in_h)
    i00 = jnp.where(vx0 & vy0, i00, 0)
    i10 = jnp.where(vx0 & vy1, i10, 0)
    i01 = jnp.where(vx1 & vy0, i01, 0)
    i11 = jnp.where(vx1 & vy1, i11, 0)
    acc = (i00 * ((32 - ax) * (32 - ay) * 32)
           + i01 * (ax * (32 - ay) * 32)
           + i10 * ((32 - ax) * ay * 32)
           + i11 * (ax * ay * 32))
    out = jnp.clip((acc + (1 << 14)) >> 15, 0, 255)
    return out.astype(jnp.uint8)


def unwarp_card(image, source_points, out_shape=(CARD_HEIGHT, CARD_WIDTH),
                method="dense", src_bounds=None, transpose=False,
                compute_dtype=None):
    """llcv_unwarp (cv/warp.cpp:130-169): rectify the quad `source_points`
    (tl, tr, bl, br order per dmz_rect_get_points) to a 428x270 card.

    The destination rect is (0, 0, W-1, H-1) (dmz.cpp:484).
    method="exact" (the camera serving path): bit-exact reproduction of
    the reference chain — Eigen-f32-QR homography + cvWarpPerspective's
    double coords and 5-bit fixed-point bilinear — as dense contractions
    (warp_perspective_exact). method="dense": gather-free two-pass warp
    with a closed-form homography and full-float interpolation (kept for
    float-precision serving and as the fast non-parity path).
    method="gather": per-pixel bilinear gather through an 8x8-solve
    homography — the cvWarpPerspective-closest ORACLE form before round 3
    (f32 coords; ~40x slower on TPU; superseded by "exact" for parity).

    transpose=True: swap the source's axes first. The two-pass dense warp
    decomposes along the image axes, which DEGENERATES when the quad is
    rotated ~90° (portrait orientations: the dst-row direction runs along
    source columns, so the per-pass Mobius solve divides by ~0).
    Transposing the source makes the quad axis-aligned again and is exact:
    img(Y, X) == img.T(X, Y). Callers pass src_bounds already in the
    transposed frame (api.warp_src_bounds handles this)."""
    if method == "dense":
        if transpose:
            image = jnp.swapaxes(image, -1, -2)
            source_points = jnp.asarray(source_points)[:, ::-1]
        m = rect_to_quad_map(source_points, out_shape)
        return warp_perspective_dense(image, m, out_shape,
                                      src_bounds=src_bounds,
                                      compute_dtype=compute_dtype)
    out_h, out_w = out_shape
    dest_points = jnp.asarray(
        [[0.0, 0.0], [out_w - 1.0, 0.0], [0.0, out_h - 1.0],
         [out_w - 1.0, out_h - 1.0]], jnp.float32)
    if method == "exact":
        h_matrix = eigen_persp_transform(source_points, dest_points)
        return warp_perspective_exact(image, h_matrix, out_shape,
                                      src_bounds=src_bounds,
                                      transpose=transpose)
    h_matrix = calc_persp_transform(source_points, dest_points)
    return warp_perspective(image, h_matrix, out_shape)
