"""Debug image dumps for the expiry pipeline (DEBUG_EXPIRY_IMAGES analogue).

The reference saves per-stage PNGs during expiry segmentation —
original / sobel / row-sums / stripes / char-rects / groups
(expiry_seg.cpp:15-20, 345-384, 506-526, 871-888 via ios_save_file).
This module renders the same views from the host pipeline's outputs for
algorithm debugging and documentation.

Usage:
    from cardio_dmz_tpu.utils.debug_images import dump_expiry_stages
    paths = dump_expiry_stages(card_y, vseg_y, slash_params, "/tmp/dbg")
"""

import os

import numpy as np


def _save(path, arr):
    from PIL import Image
    a = np.asarray(arr)
    if a.dtype != np.uint8:
        m = a.max()
        a = (a.astype(np.float64) * (255.0 / m if m > 0 else 1)).astype(np.uint8)
    Image.fromarray(a).save(path)
    return path


def _draw_rects(img, rects, value=255):
    """rects: iterable of (top, left, h, w)."""
    out = np.asarray(img).copy()
    hh, ww = out.shape
    for top, left, h, w in rects:
        t, l = max(top, 0), max(left, 0)
        b, r = min(top + h, hh - 1), min(left + w, ww - 1)
        out[t, l:r] = value
        out[b, l:r] = value
        out[t:b, l] = value
        out[t:b, r] = value
    return out


def dump_expiry_stages(card_y, starting_y_offset, slash_params, out_dir,
                       prefix="expiry"):
    """Run the host expiry segmentation and save one PNG per stage.

    Returns the list of written paths (original, sobel, stripes, groups).
    """
    from ..scan import expiry_seg_host as seg

    os.makedirs(out_dir, exist_ok=True)
    card_y = np.asarray(card_y)
    paths = []

    paths.append(_save(os.path.join(out_dir, f"{prefix}-a-original.png"),
                       card_y))

    sobel = seg.scharr_dx_abs_below(card_y, starting_y_offset)
    paths.append(_save(os.path.join(out_dir, f"{prefix}-b-sobel.png"),
                       np.clip(sobel // 16, 0, 255).astype(np.uint8)))

    stripes = seg.select_stripes(sobel, starting_y_offset)
    stripe_img = _draw_rects(
        card_y, [(b, 0, seg.SMALL_CHAR_HEIGHT, card_y.shape[1] - 1)
                 for b, _ in stripes])
    paths.append(_save(os.path.join(out_dir, f"{prefix}-d-stripes.png"),
                       stripe_img))

    groups, _ = seg.best_expiry_seg(card_y, starting_y_offset, slash_params)
    rects = []
    for g in groups:
        rects.append((g.top - 1, g.left - 1, g.height + 2, g.width + 2))
        for r in g.character_rects:
            rects.append((r.top, r.left, seg.TRIMMED_CHAR_HEIGHT,
                          seg.TRIMMED_CHAR_WIDTH))
    paths.append(_save(os.path.join(out_dir, f"{prefix}-h-groups.png"),
                       _draw_rects(card_y, rects)))
    return paths
