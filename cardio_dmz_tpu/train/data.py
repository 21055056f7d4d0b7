"""Synthetic training data for the tiny models.

The reference's models were trained offline on labeled card crops
(docs/expiry_docs/expiry_categorization.md:61-95: ~100k digit/slash images);
no training code ships in-repo. This module provides a synthetic stand-in
generator so the training loop is exercisable end-to-end; swap in a real
labeled corpus for production retraining.
"""

import numpy as np


def _font():
    from PIL import ImageFont
    return ImageFont.truetype(
        "/usr/share/fonts/truetype/dejavu/DejaVuSansMono.ttf", 24)


def synthetic_digit_batch(rng, batch_size, cell_shape=(27, 19), bg=140,
                          noise=6):
    """(cells (B, 27, 19) f32 in [0,1] after the standard digit prep,
    labels (B,) int32). Digits rendered with jitter + noise."""
    from PIL import Image, ImageDraw

    font = _font()
    h, w = cell_shape
    cells = np.zeros((batch_size, h, w), np.uint8)
    labels = rng.randint(0, 10, batch_size).astype(np.int32)
    for i, d in enumerate(labels):
        img = Image.new("L", (w, h), bg)
        draw = ImageDraw.Draw(img)
        s = str(d)
        bbox = draw.textbbox((0, 0), s, font=font)
        gw, gh = bbox[2] - bbox[0], bbox[3] - bbox[1]
        jx, jy = rng.randint(-1, 2), rng.randint(-1, 2)
        x = (w - gw) // 2 - bbox[0] + jx
        y = (h - gh) // 2 - bbox[1] + jy
        fill = int(rng.randint(40, 90))
        draw.text((x, y), s, fill=fill, font=font)
        a = np.asarray(img).astype(int) + rng.randint(-noise, noise + 1, (h, w))
        cells[i] = np.clip(a, 0, 255)
    # standard digit prep (morph grad + equalize + scale) happens in-graph;
    # here we train directly on normalized cells
    return cells.astype(np.float32) / 255.0, labels
