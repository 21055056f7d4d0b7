"""Public API surface — the dmz.h equivalent (reference dmz.h:7-123).

Everything here operates on jnp arrays with static shapes; orientation and
image geometry are Python-level (static) so each configuration jits once.

Exposed parity surface:
* focus_score / brightness_score          (dmz.cpp:183-195)
* detect_edges -> edges + corner points   (dmz.cpp:371-439)
* transform_card -> rectified 428x270     (dmz.cpp:443-497)
* blur_card                               (dmz.cpp:499-515)
* scan_card_image / scanner_* re-exports  (scan/, session/)
* deinterleave / YCbCr conversions        (ops/convert.py)
"""

import math
import typing

import jax.numpy as jnp
import numpy as np

from .constants import (
    CARD_HEIGHT,
    CARD_WIDTH,
    HORIZONTAL_ANGLE,
    HORIZONTAL_PERCENT_SLOP,
    HOUGH_GRADIENT_ANGLE_THRESHOLD,
    HOUGH_THRESHOLD_LENGTH_DIVISOR,
    HOUGH_THETA_RES,
    LANDSCAPE_HORIZONTAL_PERCENT_INSET,
    LANDSCAPE_SAMPLE_HEIGHT,
    LANDSCAPE_SAMPLE_WIDTH,
    LANDSCAPE_VERTICAL_PERCENT_INSET,
    MAX_ANGLE_DEVIATION,
    ORIENTATION_LANDSCAPE_LEFT,
    ORIENTATION_LANDSCAPE_RIGHT,
    ORIENTATION_PORTRAIT,
    ORIENTATION_PORTRAIT_UPSIDE_DOWN,
    PORTRAIT_HORIZONTAL_PERCENT_INSET,
    PORTRAIT_VERTICAL_PERCENT_INSET,
    VERTICAL_ANGLE,
    VERTICAL_PERCENT_SLOP,
)
from .ops import (
    adaptive_canny7,
    canny7_precomputed_sobel,
    hough_best_line,
    sobel3_dx_dy,
    sobel7,
    stddev_of_abs,
    brightness_mean,
    unwarp_card,
    median_blur,
)
from .utils.geometry import parametric_intersect_jax, line_by_shifting_origin_jax


# ---------------------------------------------------------------------------
# focus / brightness scoring
# ---------------------------------------------------------------------------

def card_rect_for_screen(card_w, card_h, std_w, std_h, actual_w, actual_h):
    """dmz_card_rect_for_screen (dmz.cpp:137-163). Host-side ints."""
    if 0 in (card_w, card_h, std_w, std_h, actual_w, actual_h):
        return (0, 0, 0, 0)
    if (actual_w, actual_h) == (std_w, std_h):
        w, h = card_w, card_h
    else:
        ratio = min(actual_w / std_w, actual_h / std_h)
        w, h = int(card_w * ratio), int(card_h * ratio)
    return ((actual_w - w) // 2, (actual_h - h) // 2, w, h)


def _scoring_roi(shape, use_full_image):
    """dmz_set_roi_for_scoring (dmz.cpp:165-181): center 1/9 of the card."""
    h, w = shape[-2], shape[-1]
    if use_full_image:
        cw, ch = CARD_WIDTH, CARD_HEIGHT
    else:
        cw, ch = CARD_WIDTH // 3, CARD_HEIGHT // 3
    x, y, rw, rh = card_rect_for_screen(
        cw, ch, LANDSCAPE_SAMPLE_WIDTH, LANDSCAPE_SAMPLE_HEIGHT, w, h)
    return x, y, rw, rh


def focus_score(image, use_full_image=False):
    """dmz_focus_score (dmz.cpp:183-188): sobel3 cross-derivative stddev on
    the center ROI. image: (..., H, W) uint8 -> f32 score (higher=sharper)."""
    x, y, rw, rh = _scoring_roi(image.shape, use_full_image)
    roi = image[..., y:y + rh, x:x + rw]
    return stddev_of_abs(sobel3_dx_dy(roi))


def brightness_score(image, use_full_image=False):
    """dmz_brightness_score (dmz.cpp:190-195)."""
    x, y, rw, rh = _scoring_roi(image.shape, use_full_image)
    return brightness_mean(image[..., y:y + rh, x:x + rw])


# ---------------------------------------------------------------------------
# edge detection
# ---------------------------------------------------------------------------

class FoundEdge(typing.NamedTuple):
    found: jnp.ndarray  # bool
    rho: jnp.ndarray    # f32 (full-image coords)
    theta: jnp.ndarray  # f32


class CardEdges(typing.NamedTuple):
    top: FoundEdge
    bottom: FoundEdge
    left: FoundEdge
    right: FoundEdge


class CornerPoints(typing.NamedTuple):
    found_all: jnp.ndarray     # bool
    top_left: jnp.ndarray      # (2,) f32 (x, y)
    top_right: jnp.ndarray
    bottom_left: jnp.ndarray
    bottom_right: jnp.ndarray


def detection_boxes(shape, orientation):
    """detection_boxes_for_sample (dmz.cpp:279-341). Static host math.
    Returns dict edge -> (x, y, w, h)."""
    h, w = shape[-2], shape[-1]
    width = (h * 4) // 3
    left_margin = (w - width) // 2
    w_eff = width

    if orientation in (ORIENTATION_PORTRAIT, ORIENTATION_PORTRAIT_UPSIDE_DOWN):
        inset_vert = int(round(PORTRAIT_HORIZONTAL_PERCENT_INSET * h))
        slop_vert = int(round(HORIZONTAL_PERCENT_SLOP * h))
        inset_horiz = int(round(PORTRAIT_VERTICAL_PERCENT_INSET * w_eff))
        slop_horiz = int(round(VERTICAL_PERCENT_SLOP * w_eff))
    elif orientation in (ORIENTATION_LANDSCAPE_LEFT, ORIENTATION_LANDSCAPE_RIGHT):
        inset_vert = int(round(LANDSCAPE_VERTICAL_PERCENT_INSET * h))
        slop_vert = int(round(HORIZONTAL_PERCENT_SLOP * h))
        inset_horiz = int(round(LANDSCAPE_HORIZONTAL_PERCENT_INSET * w_eff))
        slop_horiz = int(round(VERTICAL_PERCENT_SLOP * w_eff))
    else:
        inset_vert = slop_vert = inset_horiz = slop_horiz = 0

    ix, iy, iw, ih = (left_margin, 0, w_eff - 1, h - 1)

    def inset_rect(x, y, rw, rh, dx, dy):
        return (x + dx, y + dy, rw - 2 * dx, rh - 2 * dy)

    ox, oy, ow, oh = inset_rect(ix, iy, iw, ih,
                                inset_horiz - slop_horiz, inset_vert - slop_vert)
    nx, ny, nw, nh = inset_rect(ix, iy, iw, ih,
                                inset_horiz + slop_horiz, inset_vert + slop_vert)
    return {
        "top": (nx, oy, nw, 2 * slop_vert),
        "bottom": (nx, ny + nh, nw, 2 * slop_vert),
        "left": (ox, ny, 2 * slop_horiz, nh),
        "right": (nx + nw, ny, 2 * slop_horiz, nh),
    }


def _best_line_for_band(band, vertical):
    """best_line_for_sample (dmz.cpp:224-271): sobel7 -> adaptive canny ->
    angle-constrained gradient-gated hough. Returns (is_null, rho, theta)."""
    dx = sobel7(band, dx=True, dy=False)
    dy = sobel7(band, dx=False, dy=True)
    edges, dx, dy = adaptive_canny7(band, dx, dy)
    h, w = band.shape[-2], band.shape[-1]
    threshold = max(w, h) // HOUGH_THRESHOLD_LENGTH_DIVISOR
    base = VERTICAL_ANGLE if vertical else HORIZONTAL_ANGLE
    return hough_best_line(
        edges, dx, dy,
        rho=1.0, theta=HOUGH_THETA_RES, threshold=threshold,
        theta_min=base - MAX_ANGLE_DEVIATION,
        theta_max=base + MAX_ANGLE_DEVIATION,
        vertical=vertical,
        gradient_angle_threshold=HOUGH_GRADIENT_ANGLE_THRESHOLD,
    )


_EDGE_SPECS = (("top", False), ("bottom", False),
               ("left", True), ("right", True))


_BAND_GAP = 2   # zero rows/cols between packed bands; NMS neighbor reads
                # reach 1 px and the dilate step is candidate-masked, so a
                # 2-px non-candidate moat makes bands fully independent


def _band_lines_batched(samples, boxes):
    """All 12 detection-band lines (4 edges x 3 planes) with the canny
    stage batched into TWO packed invocations instead of twelve.

    Per-band sobel first (replicate borders need each band alone,
    ops/sobel.py), then the dx/dy maps are packed into one tight 2-D
    canvas per band orientation — horizontal bands stacked vertically,
    vertical bands side by side — separated by `_BAND_GAP` zero-gradient
    moats, and canny runs ONCE per canvas. Exactness vs the per-band
    form: zero dx/dy outside a band reproduces the reference's zero
    border for NMS neighbor reads (cv/canny.cpp:222-285 reads 0 outside),
    moat pixels can never become candidates (m = 0 fails m > low, low >=
    0), and neither the candidate-masked dilate nor the run floods can
    cross a 2-px non-candidate moat, so each band's edge map equals its
    standalone one (tests/test_api.py asserts this). The hysteresis sweep
    machinery's op count is paid twice per frame instead of twelve times.
    Hough stays per band (band-shaped rho geometry). Returns
    {edge_name: [(is_null, rho, theta, x, y), ...]} in plane order."""
    specs = []   # (plane, name, x, y, w, h, vertical)
    for p, box_set in enumerate(boxes):
        for name, vertical in _EDGE_SPECS:
            x, y, w, h = box_set[name]
            specs.append((p, name, x, y, w, h, vertical))

    grads = {}
    for p, name, x, y, w, h, vertical in specs:
        band = samples[p][y:y + h, x:x + w]
        # int16 carriers: sobel7 values are int16-saturated by contract
        # (ops/sobel.py), so the cast is exact; it halves the packed
        # canvas bytes and fuses into the sobel output fusion
        grads[(p, name)] = (
            sobel7(band, dx=True, dy=False).astype(jnp.int16),
            sobel7(band, dx=False, dy=True).astype(jnp.int16))

    edges_by_band = {}
    for vertical in (False, True):
        group = [s for s in specs if s[6] == vertical]
        # pack along the band's long axis' perpendicular: horizontal bands
        # stack on rows (common width), vertical bands on columns
        cat_axis = -2 if not vertical else -1
        pad_axis = -1 if not vertical else -2
        full = max(s[5] if vertical else s[4] for s in group)

        dxs, dys, offs, lens = [], [], [], []
        pos = 0
        for p, name, x, y, w, h, _ in group:
            dx, dy = grads[(p, name)]
            pad = [(0, 0), (0, 0)]
            pad[pad_axis] = (0, full - (h if vertical else w))
            pad[cat_axis] = (0, _BAND_GAP)
            dxs.append(jnp.pad(dx, pad))
            dys.append(jnp.pad(dy, pad))
            offs.append(pos)
            lens.append(h if not vertical else w)
            pos += lens[-1] + _BAND_GAP

        dxc = jnp.concatenate(dxs, axis=cat_axis)
        dyc = jnp.concatenate(dys, axis=cat_axis)

        # reference adaptive thresholds per band
        # (llcv_adaptive_canny7_precomputed_sobel, cv/canny.cpp:568-580),
        # computed from ONE |dx|+|dy| pass over the packed canvas: pads
        # and moats are zero-gradient, so each band's integer sum is a
        # slice of the per-line sums along the concat axis (the 24
        # separate per-band reductions this replaces re-read every band
        # plane, ~3 ms-est of the camera step, hlo_hogs --cycles).
        # Thresholds then ride as VECTORS along the concat axis
        # (broadcast into canny's compares for free) instead of two full
        # int32 broadcast_to canvases (~370 MB/step @256).
        absc = (jnp.abs(dxc.astype(jnp.int32)) +
                jnp.abs(dyc.astype(jnp.int32)))
        line_sums = jnp.sum(absc, axis=pad_axis)          # (pos,) int32
        lows, highs = [], []
        for (p, name, x, y, w, h, _), off, ln in zip(group, offs, lens):
            band_sum = jnp.sum(line_sums[off:off + ln])
            mean = band_sum.astype(jnp.float32) / (h * w)
            low = jnp.floor(mean).astype(jnp.int32)
            high = jnp.floor(3.0 * mean).astype(jnp.int32)
            lows.append(jnp.broadcast_to(low, (ln + _BAND_GAP,)))
            highs.append(jnp.broadcast_to(high, (ln + _BAND_GAP,)))

        low_v = jnp.concatenate(lows)
        high_v = jnp.concatenate(highs)
        if vertical:
            low_v, high_v = low_v[None, :], high_v[None, :]
        else:
            low_v, high_v = low_v[:, None], high_v[:, None]
        canvas = canny7_precomputed_sobel(dxc, dyc, low_v, high_v)
        for off, (p, name, x, y, w, h, _) in zip(offs, group):
            if vertical:
                edges_by_band[(p, name)] = canvas[:h, off:off + w]
            else:
                edges_by_band[(p, name)] = canvas[off:off + h, :w]

    lines = {name: [] for name, _ in _EDGE_SPECS}
    for p, name, x, y, w, h, vertical in specs:
        dx, dy = grads[(p, name)]
        threshold = max(w, h) // HOUGH_THRESHOLD_LENGTH_DIVISOR
        base = VERTICAL_ANGLE if vertical else HORIZONTAL_ANGLE
        is_null, rho, theta = hough_best_line(
            edges_by_band[(p, name)], dx, dy,
            rho=1.0, theta=HOUGH_THETA_RES, threshold=threshold,
            theta_min=base - MAX_ANGLE_DEVIATION,
            theta_max=base + MAX_ANGLE_DEVIATION,
            vertical=vertical,
            gradient_angle_threshold=HOUGH_GRADIENT_ANGLE_THRESHOLD)
        lines[name].append((is_null, rho, theta, x, y))
    return lines


def _select_edge(plane_lines, rho_multipliers):
    """find_line_in_detection_rects (dmz.cpp:346-369): try Y, Cb, Cr planes;
    first found wins. All three run in parallel on TPU; selection is a
    where-chain in found-priority order."""
    found = jnp.zeros((), bool)
    rho_out = jnp.zeros((), jnp.float32)
    theta_out = jnp.zeros((), jnp.float32)
    for (is_null, rho, theta, x, y), mult in zip(plane_lines,
                                                 rho_multipliers):
        rho, theta = line_by_shifting_origin_jax(rho, theta, x, y)
        rho = rho * mult
        take = ~is_null & ~found
        rho_out = jnp.where(take, rho, rho_out)
        theta_out = jnp.where(take, theta, theta_out)
        found = found | ~is_null
    return FoundEdge(found=found, rho=rho_out, theta=theta_out)


def _find_edge(samples, boxes, edge_name, vertical, rho_multipliers):
    """Per-band (unbatched-canny) reference form of `_select_edge` over
    `_best_line_for_band` — kept as the equivalence oracle for the batched
    path (tests/test_api.py asserts detect_edges == this form)."""
    plane_lines = []
    for sample, box_set in zip(samples, boxes):
        x, y, w, h = box_set[edge_name]
        band = sample[y:y + h, x:x + w]
        is_null, rho, theta = _best_line_for_band(band, vertical)
        plane_lines.append((is_null, rho, theta, x, y))
    return _select_edge(plane_lines, rho_multipliers)


def detect_edges(y_sample, cb_sample, cr_sample,
                 orientation=ORIENTATION_LANDSCAPE_RIGHT):
    """dmz_detect_edges (dmz.cpp:371-439).

    y_sample: (H, W) u8 (e.g. 480x640); cb/cr: (H/2, W/2) u8.
    Returns (CardEdges, CornerPoints); corner coords are in Y-plane scale
    (cb/cr rho values are pre-multiplied by 2, dmz.cpp:383).
    """
    samples = (y_sample, cb_sample, cr_sample)
    boxes = [detection_boxes(s.shape, orientation) for s in samples]
    mults = (1.0, 2.0, 2.0)

    lines = _band_lines_batched(samples, boxes)
    top = _select_edge(lines["top"], mults)
    bottom = _select_edge(lines["bottom"], mults)
    left = _select_edge(lines["left"], mults)
    right = _select_edge(lines["right"], mults)
    edges = CardEdges(top=top, bottom=bottom, left=left, right=right)

    def isect(l1, l2):
        ok, x, y = parametric_intersect_jax(l1.rho, l1.theta, l2.rho, l2.theta)
        return ok, jnp.stack([x, y])

    ok_tl, tl = isect(top, left)
    ok_bl, bl = isect(bottom, left)
    ok_tr, tr = isect(top, right)
    ok_br, br = isect(bottom, right)
    all_found = (top.found & bottom.found & left.found & right.found &
                 ok_tl & ok_bl & ok_tr & ok_br)
    corners = CornerPoints(found_all=all_found, top_left=tl, top_right=tr,
                           bottom_left=bl, bottom_right=br)
    return edges, corners


# ---------------------------------------------------------------------------
# transform
# ---------------------------------------------------------------------------

_CORNER_ORDER = {
    ORIENTATION_PORTRAIT: ("bl", "tl", "br", "tr"),
    ORIENTATION_LANDSCAPE_LEFT: ("br", "bl", "tr", "tl"),
    ORIENTATION_LANDSCAPE_RIGHT: ("tl", "tr", "bl", "br"),
    ORIENTATION_PORTRAIT_UPSIDE_DOWN: ("tr", "br", "tl", "bl"),
}

# extra slop beyond the detection bands for corner-coordinate bounds: lines
# are constrained to the bands at ±5° (and must collect >= threshold votes
# inside the band, bounding how far they extrapolate), so intersections can
# stray only slightly past the band rects. 40 gives >= ~6 px of measured
# margin over the adversarial line envelope incl. hough rho quantization
# and CbCr half-plane scaling (tests/test_warp_envelope.py; 32 was 1.8 px
# SHORT of the worst vote-reachable corner).
_CORNER_BOUND_PAD = 40


def _orientation_transposes(orientation):
    """Portrait quads are ~90°-rotated in the frame; the dense warp
    transposes the source first (ops/warp.unwarp_card)."""
    return orientation in (ORIENTATION_PORTRAIT,
                           ORIENTATION_PORTRAIT_UPSIDE_DOWN)


def warp_src_bounds(shape, orientation, upsample=False):
    """STATIC quad-corner coordinate bounds for the dense warp's windowed
    passes, derived from the detection-band geometry: each corner is the
    intersection of two ±5° lines confined to their bands, so its (x, y)
    lies within the bands' rects (± a small extrapolation pad). Returns
    (y_top, y_bottom, x_left, x_right) ranges in the frame the warp
    actually resamples — transposed for portrait orientations."""
    boxes = detection_boxes(shape, orientation)
    pad = _CORNER_BOUND_PAD

    def xr(edge):
        x, _, w, _ = boxes[edge]
        return (x - pad, x + w + pad)

    def yr(edge):
        _, y, _, h = boxes[edge]
        return (y - pad, y + h + pad)

    ranges = {
        "tl": (xr("left"), yr("top")),
        "tr": (xr("right"), yr("top")),
        "bl": (xr("left"), yr("bottom")),
        "br": (xr("right"), yr("bottom")),
    }
    p0, p1, p2, p3 = [ranges[k] for k in _CORNER_ORDER[orientation]]
    if _orientation_transposes(orientation):
        # swap each corner's (xrange, yrange): the warp sees img.T
        p0, p1, p2, p3 = [(p[1], p[0]) for p in (p0, p1, p2, p3)]

    def union(a, b):
        return (min(a[0], b[0]), max(a[1], b[1]))

    y_top = union(p0[1], p1[1])
    y_bot = union(p2[1], p3[1])
    x_left = union(p0[0], p2[0])
    x_right = union(p1[0], p3[0])
    if upsample:
        y_top, y_bot, x_left, x_right = [
            (lo / 2.0, hi / 2.0) for lo, hi in (y_top, y_bot, x_left, x_right)]
    return (y_top, y_bot, x_left, x_right)


def transform_card(sample, corner_points: CornerPoints,
                   orientation=ORIENTATION_LANDSCAPE_RIGHT, upsample=False,
                   src_bounds=None, warp_dtype=None, method="dense"):
    """dmz_transform_card (dmz.cpp:443-497): orientation-dependent corner
    ordering, then perspective warp to 428x270.

    sample: (H, W) u8 plane. upsample=True for half-size CbCr planes
    (corner coords are halved — dmz.cpp:473-481; there is no GL
    "auto-upsample" path on TPU). src_bounds: optional static corner
    bounds (warp_src_bounds) enabling the warp's windowed fast path."""
    cp = corner_points
    by_name = {"tl": cp.top_left, "tr": cp.top_right,
               "bl": cp.bottom_left, "br": cp.bottom_right}
    order = [by_name[k] for k in _CORNER_ORDER[orientation]]
    src = jnp.stack(order)  # (4, 2) in (x, y); tl,tr,bl,br of the card
    if upsample:
        src = src / 2.0
    return unwarp_card(sample, src, out_shape=(CARD_HEIGHT, CARD_WIDTH),
                       src_bounds=src_bounds, method=method,
                       transpose=_orientation_transposes(orientation),
                       compute_dtype=warp_dtype)


def preprocess_frame(y_sample, cb_sample, cr_sample,
                     orientation=ORIENTATION_LANDSCAPE_RIGHT,
                     warp_dtype=None, method="exact"):
    """Full camera-frame preprocessing as one jittable graph: detect the
    card's edges across the Y/Cb/Cr planes and rectify the luma plane to
    the 428x270 card image (the reference's per-preview-frame host loop,
    SURVEY.md §3.1-3.2).

    method: rectification variant (ops/warp.unwarp_card) — "exact"
    (default; bit-exact vs the reference chain) or "dense" (full-float
    two-pass; optionally bf16 via warp_dtype).

    Returns (found: bool scalar, card (270, 428) u8 — zeros when not
    found). jit/vmap-safe: wrap with jax.jit, vmap over a frame batch.
    """
    _, corners = detect_edges(y_sample, cb_sample, cr_sample, orientation)
    bounds = warp_src_bounds(y_sample.shape, orientation)
    card = transform_card(y_sample, corners, orientation, src_bounds=bounds,
                          warp_dtype=warp_dtype, method=method)
    card = jnp.where(corners.found_all, card, jnp.zeros_like(card))
    return corners.found_all, card


def blur_card(card_rgb, state, unblur_digits=4):
    """dmz_blur_card (dmz.cpp:499-515): median-blur digit cells except the
    last `unblur_digits`. Host-side cosmetic op on numpy images.

    card_rgb: (270, 428[, C]) numpy u8; state: ScannerState (host values).
    """
    if unblur_digits < 0:
        return card_rgb
    img = np.array(card_rgb)
    n = int(state.last_n_offsets)
    blur_count = n - unblur_digits
    offsets = np.asarray(state.last_offsets)
    width = int(round(float(state.last_number_width)))
    y0 = int(state.last_vseg_y)
    from .constants import NUMBER_HEIGHT
    for i in range(min(n, blur_count)):
        x = int(offsets[i]) - 1
        y = y0 - 1
        w = width + 2
        h = NUMBER_HEIGHT + 2
        if i < 4:
            h *= 2  # blur smaller four digits below first bucket (dmz.cpp:508)
        x0c, y0c = max(x, 0), max(y, 0)
        roi = img[y0c:y + h, x0c:x + w]
        if roi.size:
            img[y0c:y + h, x0c:x + w] = median_blur(roi, 25)
    return img
