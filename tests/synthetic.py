"""Synthetic card-frame rendering for end-to-end tests.

The reference's conv models were trained on real embossed card digits
(Farrington 7B). DejaVu Sans Mono at 24px dark-on-card renders digits
{0,1,3,4,5,8,9} that the ported ensemble classifies correctly, which is
enough to exercise the full pipeline with Luhn-valid PANs built from that
alphabet (e.g. 4111111111111111).
"""

import numpy as np
from PIL import Image, ImageDraw, ImageFont

from cardio_dmz_tpu.constants import PATTERN_MASKS

FONT_PATH = "/usr/share/fonts/truetype/dejavu/DejaVuSansMono.ttf"
FONT_BOLD_PATH = "/usr/share/fonts/truetype/dejavu/DejaVuSansMono-Bold.ttf"
FONT_SIZE = 24
DIGIT_FILL = 60
CARD_BG = 140

# all digits render reliably: most via DejaVu mono 24; "2" via mono-bold 26;
# "6"/"7" via hand-drawn Farrington-7B-style stroke glyphs (the models were
# trained on the embossed card font, whose 6/7 shapes no system font has)
SAFE_DIGITS = tuple(range(10))

_STROKE_GLYPHS = {
    # (r0, c0, r1, c1) filled rectangles in the 27x19 cell
    6: [(3, 4, 24, 7), (13, 4, 16, 15), (22, 4, 24, 15), (13, 12, 24, 15)],
    7: [(3, 3, 6, 16), (3, 11, 24, 14)],
}


def render_digit_cell(digit, seed=0, fill=DIGIT_FILL, bg=CARD_BG):
    """One 27x19 digit cell (dark digit on card background + mild noise)."""
    r = np.random.RandomState(seed)
    digit = int(digit)
    if digit in _STROKE_GLYPHS:
        a = np.full((27, 19), bg, int)
        for (r0, c0, r1, c1) in _STROKE_GLYPHS[digit]:
            a[r0:r1, c0:c1] = fill
    else:
        img = Image.new("L", (19, 27), bg)
        draw = ImageDraw.Draw(img)
        if digit == 2:
            font = ImageFont.truetype(FONT_BOLD_PATH, 26)
            dx = 1
        else:
            font = ImageFont.truetype(FONT_PATH, FONT_SIZE)
            dx = 0
        s = str(digit)
        bbox = draw.textbbox((0, 0), s, font=font)
        w, h = bbox[2] - bbox[0], bbox[3] - bbox[1]
        x, y = (19 - w) // 2 - bbox[0] + dx, (27 - h) // 2 - bbox[1]
        draw.text((x, y), s, fill=fill, font=font)
        a = np.asarray(img).astype(int)
    a = a + r.randint(-4, 5, (27, 19))
    return np.clip(a, 0, 255).astype(np.uint8)


def render_frame(pan, y0=160, width=18.0, offset=30, seed=0, bg=CARD_BG,
                 noise=4):
    """A full 270x428 rectified card frame with `pan` on the PAN row.

    pan: string of 15 (amex spacing) or 16 (visa spacing) digits.
    """
    r = np.random.RandomState(seed)
    y = np.full((270, 428), bg, np.int32)
    if noise:
        y += r.randint(-noise, noise + 1, y.shape)
    pan = str(pan)
    pattern = PATTERN_MASKS[1] if len(pan) == 16 else PATTERN_MASKS[2]
    digit_idx = 0
    for k, m in enumerate(pattern):
        if not m:
            continue
        x0 = offset + int(round(k * width))
        cell = render_digit_cell(int(pan[digit_idx]), seed=seed * 100 + k, bg=bg)
        region = y[y0:y0 + 27, x0:x0 + 19]
        delta = cell.astype(np.int32) - bg
        y[y0:y0 + 27, x0:x0 + 19] = region + delta
        digit_idx += 1
    return np.clip(y, 0, 255).astype(np.uint8)


def luhn_check_digit(prefix_digits):
    """Check digit making prefix+check Luhn-valid."""
    total = 0
    n = len(prefix_digits) + 1
    for i, d in enumerate(prefix_digits):
        # position from end within full number: n-1-i; doubled if odd
        mult = 2 if (n - 1 - i) % 2 == 1 else 1
        a = d * mult
        total += a % 10 + a // 10
    return (10 - total % 10) % 10


def safe_pan(rng, length=16, prefix=(4,)):
    """Random Luhn-valid PAN using only SAFE_DIGITS (retry on unsafe check)."""
    while True:
        body = [int(rng.choice(SAFE_DIGITS)) for _ in range(length - 1 - len(prefix))]
        digits = list(prefix) + body
        c = luhn_check_digit(digits)
        if c in SAFE_DIGITS:
            return "".join(map(str, digits + [c]))


def render_text_small(y, text, y0, x0, size=15, fill=DIGIT_FILL, spacing=None):
    """Render small text (e.g. an expiry "08/27") onto frame y in place.
    spacing: fixed char advance (None = natural font advance)."""
    from PIL import Image, ImageDraw, ImageFont
    font = ImageFont.truetype(FONT_PATH, size)
    img = Image.fromarray(y)
    draw = ImageDraw.Draw(img)
    if spacing is None:
        draw.text((x0, y0), text, fill=fill, font=font)
    else:
        for i, ch in enumerate(text):
            draw.text((x0 + i * spacing, y0), ch, fill=fill, font=font)
    return np.asarray(img).copy()


def render_frame_with_expiry(pan, expiry_text, y0=150, width=18.0, offset=30,
                             expiry_y=None, expiry_x=120, seed=0, bg=CARD_BG,
                             noise=1, expiry_size=15, expiry_spacing=12):
    """Card frame with a PAN row and an expiry line below it.

    NOTE: real cards print expiry in a monospaced font; DejaVu's uneven
    glyph widths (narrow "1") shift the segmentation regrid for some digit
    combinations, so tests use dates that segment reliably (e.g. 08/27,
    06/29). The date-logic itself is unit-tested across all digits."""
    y = render_frame(pan, y0=y0, width=width, offset=offset, seed=seed,
                     bg=bg, noise=noise)
    if expiry_y is None:
        expiry_y = y0 + 27 + 35
    return render_text_small(y, expiry_text, expiry_y, expiry_x,
                             size=expiry_size, spacing=expiry_spacing)
