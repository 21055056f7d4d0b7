"""Adversarial detector-envelope coverage proof for the warp windows.

The exact warp's static windows (ops/warp._block_starts over
api.warp_src_bounds) LINEARLY interpolate corner ranges across dst
blocks, but a projective map's source coordinate along a dst axis is a
Mobius function, which can bow past the linear interpolation of the
envelope's endpoints (the round-2 advisor finding). Per quad the Mobius
coordinate is MONOTONE along the dst axis, so worst-case coverage over
the detector-reachable quad set is checkable by finite enumeration of
extreme band lines: angle at +-MAX_ANGLE_DEVIATION, a >=vote-threshold
segment placed at the band's extremes, +-2 px slop for hough rho
quantization (incl. the x2 CbCr rho multiplier) and half-plane band
rounding — 12 lines per edge, 20,736 corner combinations.

Checks (every in-image sampled tap, exact f32/int window arithmetic):

  A. XLA exact-warp coarse row windows contain the 3-row band
     (warp_perspective_exact row_starts, row_win=192);
  B. the dynamic fine window keeps rel+2 in [0, D) (stride 16, D=48);
  C. the col windows contain both horizontal taps (col_win=288; 256 was 1 px SHORT
     on the high side for portrait's worst reachable quad);
  D. the Pallas kernel's picked-column 128-row window contains the band
     (ops/pallas/warp_gather.warp_gather_exact's k rule);
  E. y0 - band_base in {0, 1} (the slack-12 band validity);
  F. corners stay inside api.warp_src_bounds' ranges
     (_CORNER_BOUND_PAD: 32 was 1.8 px short; 40 gives >= 4 px margin).

F runs over ALL 20,736 combinations (no grid needed). The per-pixel
grid checks run over a stratified subset — every top x bottom pair
against 3 representative left/right lines and vice versa (~2,600
quads), since the row-window checks are driven by the horizontal lines
and the col checks by the vertical ones; measured margins match the
full product sweep (run once offline: A 29/33, B 0/7, C 7/33, D 0/30).
Low-side 0 for B/D is structural: the window start derives from the
same yb array as the gather indices, and index 0 is valid.

Ref: cv/warp.cpp:158-166 (the windowed gather); dmz.cpp:371-439 (the
detection geometry bounding reachable quads).
"""

import math

import numpy as np
import pytest

from cardio_dmz_tpu import api
from cardio_dmz_tpu.constants import (MAX_ANGLE_DEVIATION,
                                      HOUGH_THRESHOLD_LENGTH_DIVISOR,
                                      ORIENTATION_LANDSCAPE_RIGHT,
                                      ORIENTATION_PORTRAIT,
                                      CARD_HEIGHT, CARD_WIDTH)
from cardio_dmz_tpu.ops.warp import _block_starts
from cardio_dmz_tpu.ops.pallas.warp_gather import (_ROW_BLOCK as P_ROW_BLOCK,
                                                   _COL_CHUNK as P_COL_CHUNK,
                                                   _chunk_qsets)

ROW_BLOCK, ROW_WIN = 16, 192
COL_BLOCK, COL_WIN = 64, 288
TILT = 0.095
OUT_H, OUT_W = CARD_HEIGHT, CARD_WIDTH
# representative line indices for the non-driving edge pair: full-negative
# tilt, zero tilt, full-positive tilt (index = 4*s_idx + 2*a_idx + c_idx)
_REP = (0, 5, 11)


def _edge_lines(boxes, name, vertical):
    """Extreme reachable lines: cross = p + s * (long - a)."""
    x0, y0, w, h = boxes[name]
    if vertical:
        long_lo, long_len, cross_lo, cross_len = y0, h, x0, w
    else:
        long_lo, long_len, cross_lo, cross_len = x0, w, y0, h
    thr = max(w, h) // HOUGH_THRESHOLD_LENGTH_DIVISOR
    smax = math.tan(MAX_ANGLE_DEVIATION)
    slop = 2.0
    out = []
    for s in (-smax, 0.0, smax):
        half = abs(s) * thr / 2.0
        for a0 in (0.0, long_len - thr):
            mid = long_lo + a0 + thr / 2.0
            for c in (cross_lo + half - slop,
                      cross_lo + cross_len - half + slop):
                out.append((c, mid, s))
    return out


def _quad_corners(top, bottom, left, right):
    def isect(hline, vline):
        ph, ah, sh = hline
        pv, av, sv = vline
        denom = 1.0 - sv * sh
        x = (pv + sv * (ph - sh * ah - av)) / denom
        y = ph + sh * (x - ah)
        return (x, y)
    return (isect(top, left), isect(top, right),
            isect(bottom, left), isect(bottom, right))


def _rect_to_quad(sp):
    """Closed-form dst-rect -> src-quad homography (double).
    sp: (4, 2) in (tl, tr, bl, br)-of-dst order."""
    (x0, y0), (x1, y1), (x2, y2), (x3, y3) = sp
    dx1, dy1 = x1 - x3, y1 - y3
    dx2, dy2 = x2 - x3, y2 - y3
    sx = x0 - x1 - x2 + x3
    sy = y0 - y1 - y2 + y3
    det = dx1 * dy2 - dx2 * dy1
    g = (sx * dy2 - dx2 * sy) / det
    h = (dx1 * sy - sx * dy1) / det
    m = np.array([[x1 - x0 + g * x1, x2 - x0 + h * x2, x0],
                  [y1 - y0 + g * y1, y2 - y0 + h * y2, y0],
                  [g, h, 1.0]])
    return m @ np.diag([1.0 / (OUT_W - 1), 1.0 / (OUT_H - 1), 1.0])


def _orient_quads(quads, orientation, frame_shape):
    names = {"tl": 0, "tr": 1, "bl": 2, "br": 3}
    order = [names[k] for k in api._CORNER_ORDER[orientation]]
    sp = quads[:, order, :]
    if api._orientation_transposes(orientation):
        sp = sp[:, :, ::-1]
        in_h, in_w = frame_shape[1], frame_shape[0]
    else:
        in_h, in_w = frame_shape
    return sp, in_h, in_w


def _sweep(orientation, frame_shape=(480, 640)):
    boxes = api.detection_boxes(frame_shape, orientation)
    lines = {n: _edge_lines(boxes, n, v)
             for n, v in (("top", False), ("bottom", False),
                          ("left", True), ("right", True))}

    all_quads = np.array([_quad_corners(t, b, l, r)
                          for t in lines["top"] for b in lines["bottom"]
                          for l in lines["left"] for r in lines["right"]])
    grid_quads = np.array(
        [_quad_corners(t, b, lines["left"][li], lines["right"][ri])
         for t in lines["top"] for b in lines["bottom"]
         for li in _REP for ri in _REP] +
        [_quad_corners(lines["top"][ti], lines["bottom"][bi], l, r)
         for l in lines["left"] for r in lines["right"]
         for ti in _REP for bi in _REP])

    sp_all, in_h, in_w = _orient_quads(all_quads, orientation, frame_shape)
    sp, _, _ = _orient_quads(grid_quads, orientation, frame_shape)

    (ytl, ybl, xtl, xtr) = api.warp_src_bounds(frame_shape, orientation)
    pad_r = int(math.ceil(TILT * in_w / 2))
    pad_c = int(math.ceil(TILT * in_h / 2))
    row_starts, ok_r = _block_starts(ytl[0], ytl[1], ybl[0], ybl[1],
                                     OUT_H, in_h, ROW_BLOCK, ROW_WIN, pad_r)
    col_starts, ok_c = _block_starts(xtl[0], xtl[1], xtr[0], xtr[1],
                                     OUT_W, in_w, COL_BLOCK, COL_WIN, pad_c)
    assert ok_r and ok_c, "static windows no longer fit — geometry drift"
    row_starts = np.asarray(row_starts)
    col_starts = np.asarray(col_starts)

    # F over ALL corner combinations (in the transposed frame for portrait)
    f_m = np.inf
    for ci, (yr, xr) in enumerate([(ytl, xtl), (ytl, xtr),
                                   (ybl, xtl), (ybl, xtr)]):
        x = sp_all[:, ci, 0]
        y = sp_all[:, ci, 1]
        f_m = min(f_m, (x - xr[0]).min(), (xr[1] - x).min(),
                  (y - yr[0]).min(), (yr[1] - y).min())

    rcol = np.arange(OUT_H, dtype=np.float32)[:, None]
    crow = np.arange(OUT_W, dtype=np.float32)[None, :]
    jrow = np.arange(in_w, dtype=np.float32)[None, :]
    s_b = row_starts[np.arange(OUT_H) // ROW_BLOCK][:, None]   # (270, 1)
    s_c = col_starts[np.arange(OUT_W) // COL_BLOCK][None, :]   # (1, 428)
    edges_b = np.arange(0, OUT_H, ROW_BLOCK)
    BIG = np.int64(10 ** 6)

    lo = dict.fromkeys("ABCDG", np.inf)
    hi = dict.fromkeys("ABCDG", np.inf)
    bad_e = 0

    # G: the Pallas kernel's static per-chunk stage-2 gather slices
    wp = -(-in_w // 128) * 128
    qsets = _chunk_qsets((xtl, xtr), OUT_W, in_w, wp, TILT * in_h / 2)
    n_chunks = -(-OUT_W // P_COL_CHUNK)
    q_lo = np.zeros(OUT_W, np.int64)
    q_hi = np.zeros(OUT_W, np.int64)
    for c in range(n_chunks):
        cols = slice(c * P_COL_CHUNK, min((c + 1) * P_COL_CHUNK, OUT_W))
        q_lo[cols] = min(qsets[c]) * 128
        q_hi[cols] = (max(qsets[c]) + 1) * 128 - 1

    for q in sp:
        m = _rect_to_quad(q).astype(np.float32)
        den = m[2, 0] * crow + m[2, 1] * rcol + m[2, 2]
        X = (m[0, 0] * crow + m[0, 1] * rcol + m[0, 2]) / den
        Y = (m[1, 0] * crow + m[1, 1] * rcol + m[1, 2]) / den
        x0 = np.round(X * 32).astype(np.int64) >> 5            # (270, 428)
        y0 = np.round(Y * 32).astype(np.int64) >> 5
        a_r = m[2, 1] * rcol[:, :1] + m[2, 2]                  # (270, 1)
        b_r = m[0, 1] * rcol[:, :1] + m[0, 2]
        t1 = jrow * a_r - b_r                                  # (270, W)
        t2 = m[0, 0] - jrow * m[2, 0]                          # (1, W)
        y_rj = (m[1, 0] * t1 + (m[1, 1] * rcol[:, :1] + m[1, 2]) * t2) \
            / (m[2, 0] * t1 + a_r * t2)
        yb = (np.round(y_rj * 32).astype(np.int64) - 12) >> 5  # (270, W)

        # per-tap contribution masks (FILL_OUTLIERS zeroes taps outside
        # the image, so only contributing taps need window coverage)
        vx0 = (x0 >= 0) & (x0 < in_w)
        vx1 = (x0 + 1 >= 0) & (x0 + 1 < in_w)
        vy0 = (y0 >= 0) & (y0 < in_h)
        vy1 = (y0 + 1 >= 0) & (y0 + 1 < in_h)
        vy = vy0 | vy1
        # pixels whose taps matter; the XLA form gathers the column pair
        # at jc = max(x0, 0) (left-border x0 == -1 pixels take the pair's
        # low half for their x0+1 tap — ops/warp.py edge_l handling)
        pickb = (vx0 | vx1) & vy
        x0e = np.clip(x0, 0, in_w - 1)
        x1e = np.clip(x0 + 1, 0, in_w - 1)
        ybp = np.take_along_axis(yb, x0e, axis=1)              # (270, 428)
        ybp1 = np.take_along_axis(yb, x1e, axis=1)

        def mmin(v, pick):
            return np.where(pick, v, BIG).min()

        # E over both tap columns' band bases (pallas picks m from each)
        bad_e += int((pickb & ((y0 - ybp < 0) | (y0 - ybp > 1))).sum())
        bad_e += int(((vx1 & vy) &
                      ((y0 - ybp1 < 0) | (y0 - ybp1 > 1))).sum())

        lo["A"] = min(lo["A"], mmin(ybp - s_b, pickb))
        hi["A"] = min(hi["A"], mmin(s_b + ROW_WIN - 1 - (ybp + 2), pickb))

        bb = np.minimum.reduceat(yb, edges_b, axis=0)          # (17, W)
        bb_full = np.repeat(bb, ROW_BLOCK, axis=0)[:OUT_H]
        bb_p = np.take_along_axis(bb_full, x0e, axis=1)
        s_bb = s_b + np.clip((bb_p - s_b) // 16, 0,
                             (ROW_WIN - 48) // 16) * 16
        rel = ybp - s_bb
        lo["B"] = min(lo["B"], mmin(rel, pickb))
        hi["B"] = min(hi["B"], mmin(48 - 1 - (rel + 2), pickb))

        lo["C"] = min(lo["C"], mmin(x0e - s_c, pickb))
        hi["C"] = min(hi["C"], mmin(s_c + COL_WIN - 1 - x0e, pickb))

        # G: both tap columns inside the chunk's static gather slices
        lo["G"] = min(lo["G"], mmin(x0e - q_lo[None, :], pickb),
                      mmin(x1e - q_lo[None, :], vx1 & vy))
        hi["G"] = min(hi["G"], mmin(q_hi[None, :] - x0e, pickb),
                      mmin(q_hi[None, :] - x1e, vx1 & vy))

        # D: the Pallas kernel's picked-column window rule (both tap
        # columns' bases must sit in the 128-row window). Modeled at the
        # kernel's OWN row-block size (P_ROW_BLOCK, 32 since round 4 —
        # fewer grid steps), independent of the XLA form's 16-row blocks.
        edges_p = np.arange(0, OUT_H, P_ROW_BLOCK)
        bb_pal = np.minimum.reduceat(yb, edges_p, axis=0)      # (Bp, W)
        jlo = np.minimum.reduceat(x0e.min(axis=1), edges_p)
        jhi = np.clip(np.maximum.reduceat(x0e.max(axis=1), edges_p) + 1,
                      0, in_w - 1)                             # (Bp,)
        jmask = (np.arange(in_w) >= jlo[:, None]) & \
                (np.arange(in_w) <= jhi[:, None])              # (Bp, W)
        kblk = np.where(jmask, bb_pal, BIG).min(axis=1)        # (Bp,)
        k = np.clip(kblk // 32, 0, in_h // 32 - 4)
        kk = np.repeat(k * 32, P_ROW_BLOCK)[:OUT_H][:, None]
        lo["D"] = min(lo["D"], mmin(ybp - kk, pickb),
                      mmin(ybp1 - kk, vx1 & vy))
        hi["D"] = min(hi["D"], mmin(kk + 128 - 1 - (ybp + 2), pickb),
                      mmin(kk + 128 - 1 - (ybp1 + 2), vx1 & vy))

    return lo, hi, bad_e, f_m


@pytest.mark.parametrize("orientation", [ORIENTATION_LANDSCAPE_RIGHT,
                                         ORIENTATION_PORTRAIT])
def test_warp_windows_cover_detector_envelope(orientation):
    lo, hi, bad_e, f_m = _sweep(orientation)
    # floors a few px below measured margins (landscape: A 29/33, B 0/7,
    # C 7/33, D 0/30, F 4.0) so geometry drift fails loudly, not flakily
    assert bad_e == 0
    assert f_m >= 2.0, f"corner range margin {f_m}"
    assert lo["A"] >= 4 and hi["A"] >= 4, (lo["A"], hi["A"])
    assert lo["B"] >= 0 and hi["B"] >= 2, (lo["B"], hi["B"])
    # portrait's col windows clamp to [0, in_w - win], where coverage is
    # structural and the margin is exactly 0 (in-image taps can't exit a
    # window that saturates at the image bounds)
    assert lo["C"] >= 0 and hi["C"] >= 0, (lo["C"], hi["C"])
    assert lo["D"] >= 0 and hi["D"] >= 4, (lo["D"], hi["D"])
    assert lo["G"] >= 0 and hi["G"] >= 0, (lo["G"], hi["G"])
