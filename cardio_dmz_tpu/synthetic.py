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

# ---------------------------------------------------------------------------
# embossed-style rendering
# ---------------------------------------------------------------------------
# Real card characters are RAISED metal/plastic ridges, not printed ink: the
# models were trained on crops where a stroke reads as a bright highlight
# edge on the lit side and a dark shadow edge on the opposite side, with the
# stroke face near the card background (docs/expiry_docs/
# expiry_categorization.md:61-95; the conv input chain is gradient ->
# equalize -> bilateral, so EDGES carry all the signal). The flat
# dark-on-card DejaVu glyphs have one strong edge polarity everywhere —
# readable, but a different distribution from training, which capped the
# round-3 A/B read rates (52/100 expiry sessions) and confounded
# TRAINING.md's retrained-vs-golden comparison.
#
# style="emboss" renders each glyph from its ink mask M as
#     cell = bg + AV*(M(r-1,c) - M(r+1,c)) + AH*(M(r,c-1) - M(r,c+1))
#            + TINT*M
# i.e. a directional-light relief (top/left edges bright, bottom/right
# edges dark, face slightly tinted). Parameters tuned against the COMPILED
# reference session reader (tools/tune_emboss.py).

EMBOSS_AV = 22        # vertical relief amplitude (top-lit)
EMBOSS_AH = 25        # horizontal relief amplitude (left-lit)
EMBOSS_TINT = -55     # stroke-face tint relative to the card background
# (tools/tune_emboss.py vs the compiled reference: randomized-layout
# expiry sessions read 18/24 and PAN sessions 16/20 at these values,
# vs 6/24 and 12/20 for the flat renderer on the same distribution —
# and embossed glyphs make ALL TEN digits readable, including the 6/0
# shapes the flat DejaVu glyphs could not render reliably.)


def _emboss_delta(mask, av=None, ah=None, tint=None):
    """Relief shading delta (int array, same shape) from an ink mask in
    [0, 1]. Add to the background region."""
    av = EMBOSS_AV if av is None else av
    ah = EMBOSS_AH if ah is None else ah
    tint = EMBOSS_TINT if tint is None else tint
    m = np.asarray(mask, np.float32)
    up = np.zeros_like(m)
    dn = np.zeros_like(m)
    lf = np.zeros_like(m)
    rt = np.zeros_like(m)
    up[1:, :] = m[:-1, :]
    dn[:-1, :] = m[1:, :]
    lf[:, 1:] = m[:, :-1]
    rt[:, :-1] = m[:, 1:]
    d = av * (up - dn) + ah * (lf - rt) + tint * m
    return np.round(d).astype(np.int32)


def _digit_mask(digit):
    """Ink mask in [0, 1] for one 27x19 PAN digit cell."""
    digit = int(digit)
    if digit in _STROKE_GLYPHS:
        m = np.zeros((27, 19), np.float32)
        for (r0, c0, r1, c1) in _STROKE_GLYPHS[digit]:
            m[r0:r1, c0:c1] = 1.0
        return m
    img = Image.new("L", (19, 27), 0)
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
    draw.text((x, y), s, fill=255, font=font)
    return np.asarray(img).astype(np.float32) / 255.0


def render_digit_cell(digit, seed=0, fill=DIGIT_FILL, bg=CARD_BG,
                      style="flat"):
    """One 27x19 digit cell on the card background + mild noise.

    style="flat": dark printed ink (fill on bg). style="emboss":
    directional-light relief of the same glyph (see _emboss_delta)."""
    r = np.random.RandomState(seed)
    m = _digit_mask(digit)
    if style == "emboss":
        a = bg + _emboss_delta(m)
    else:
        a = np.round(bg + (fill - bg) * m).astype(np.int32)
    a = a + r.randint(-4, 5, (27, 19))
    return np.clip(a, 0, 255).astype(np.uint8)


def render_frame(pan, y0=160, width=18.0, offset=30, seed=0, bg=CARD_BG,
                 noise=4, brightness=0, contrast=1.0, shading=0,
                 style="flat"):
    """A full 270x428 rectified card frame with `pan` on the PAN row.

    pan: string of 15 (amex spacing) or 16 (visa spacing) digits.
    brightness/contrast: global photometric perturbation applied last
    (camera exposure sweep). shading: peak amplitude of a smooth random
    illumination gradient across the card (textured/unevenly lit card).
    style: "flat" printed ink or "emboss" relief glyphs (_emboss_delta).
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
        cell = render_digit_cell(int(pan[digit_idx]), seed=seed * 100 + k,
                                 bg=bg, style=style)
        region = y[y0:y0 + 27, x0:x0 + 19]
        delta = cell.astype(np.int32) - bg
        y[y0:y0 + 27, x0:x0 + 19] = region + delta
        digit_idx += 1
    if shading:
        gy, gx = r.uniform(-1, 1, 2)
        rows = np.linspace(-0.5, 0.5, 270)[:, None]
        cols = np.linspace(-0.5, 0.5, 428)[None, :]
        y += np.round(shading * (gy * rows + gx * cols)).astype(np.int32)
    if contrast != 1.0 or brightness:
        y = np.round((y - bg) * contrast + bg + brightness).astype(np.int32)
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



# Expiry glyphs, tuned jointly against the COMPILED reference (refbridge):
# ink must be tall enough (~13-15 rows) for the reference's 15-row stripe
# segmentation (expiry_seg.cpp dim-sub-stripe filters) AND readable by its
# expiry conv model after the prepare_image_for_cat chain.  DejaVu Sans Mono
# Bold 18 on a 13px pitch with the embossed slash stroke is the most reliable
# uniform configuration found; per-digit accuracy still varies (DejaVu != the
# embossed Farrington training font), so expiry tests use dates from
# RELIABLE_EXPIRY_DATES (measured against the reference session).
_EXPIRY_DIGIT_FONTS = {d: (FONT_BOLD_PATH, 18) for d in range(10)}

EXPIRY_SAFE_DIGITS = (0, 1, 2, 3, 4, 5, 7, 8, 9)  # 6's glyph is marginal

# Dates the compiled reference (refbridge session) reads correctly with this
# renderer, measured over 16-frame sessions.  Note the reference's date
# sanity window (expiry_categorize.cpp:334-399): accepted dates must lie in
# [now, now+5y], so tests must also pick in-window dates.  Failures outside
# this list cluster on glyph "6"/"0" trim alignment (DejaVu vs the embossed
# training font), not on pipeline bugs.
RELIABLE_EXPIRY_DATES = (
    "01/27", "02/27", "03/27", "04/27", "05/27", "07/27", "09/27", "11/27",
    "12/27", "01/28", "02/28", "03/28", "04/28", "07/28", "08/28", "09/28",
    "11/28", "12/28",
)


def draw_expiry_slash(y, top, left, w=7, h=15, fill=DIGIT_FILL, thick=3,
                      style="flat"):
    """Diagonal slash stroke (bottom-left -> top-right).

    The reference's slash MLP (modelm_730c4cbd) was trained on real embossed
    card slashes; thin font slashes score ~0.05 while this stroke passes the
    0.7 gate (expiry_seg.cpp:50-54). style="emboss" renders the same stroke
    as a relief instead of flat ink."""
    y = np.asarray(y).copy()
    if style == "emboss":
        m = np.zeros((h + 2, w + thick + 1), np.float32)
        for r in range(h):
            c = int(round((h - 1 - r) * (w - 1) / (h - 1)))
            m[r + 1, c:c + thick] = 1.0
        d = _emboss_delta(m)
        reg = y[top - 1:top - 1 + m.shape[0], left:left + m.shape[1]]
        y[top - 1:top - 1 + m.shape[0], left:left + m.shape[1]] = np.clip(
            reg.astype(np.int32) + d[:reg.shape[0], :reg.shape[1]],
            0, 255).astype(y.dtype)
        return y
    for r in range(h):
        c = left + int(round((h - 1 - r) * (w - 1) / (h - 1)))
        y[top + r, c:c + thick] = fill
    return y


def render_text_small(y, text, y0, x0, size=15, fill=DIGIT_FILL, spacing=None,
                      style="flat"):
    """Render small text (e.g. an expiry "08/27") onto frame y.

    Digits use the per-digit reference-tuned fonts (_EXPIRY_DIGIT_FONTS),
    centered on a `spacing`-pitch grid; '/' uses the embossed slash stroke.
    spacing: fixed char advance (None = 13). style="emboss": relief glyphs
    from the same ink masks (_emboss_delta) instead of flat ink."""
    from PIL import Image, ImageDraw, ImageFont
    if spacing is None:
        spacing = 13
    if style == "emboss":
        base = np.asarray(y)
        mask = Image.new("L", (base.shape[1], base.shape[0]), 0)
        draw = ImageDraw.Draw(mask)
    else:
        img = Image.fromarray(np.asarray(y))
        draw = ImageDraw.Draw(img)
    slash_positions = []
    for i, ch in enumerate(text):
        if ch == "/":
            slash_positions.append(i)
            continue
        if ch.isdigit():
            path, fsize = _EXPIRY_DIGIT_FONTS[int(ch)]
        else:
            path, fsize = FONT_PATH, size
        font = ImageFont.truetype(path, fsize)
        bbox = draw.textbbox((0, 0), ch, font=font)
        w, h = bbox[2] - bbox[0], bbox[3] - bbox[1]
        # center the ink in an 11x16 window on the spacing grid
        x = x0 + i * spacing + (11 - w) // 2 - bbox[0]
        yy = y0 + (16 - h) // 2 - bbox[1]
        draw.text((x, yy), ch, fill=(255 if style == "emboss" else fill),
                  font=font)
    if style == "emboss":
        m = np.asarray(mask).astype(np.float32) / 255.0
        out = np.clip(base.astype(np.int32) + _emboss_delta(m),
                      0, 255).astype(np.uint8)
    else:
        out = np.asarray(img).copy()
    for i in slash_positions:
        out = draw_expiry_slash(out, y0, x0 + i * spacing + 1, fill=fill,
                                style=style)
    return out


def render_frame_with_expiry(pan, expiry_text, y0=150, width=18.0, offset=30,
                             expiry_y=None, expiry_x=120, seed=0, bg=CARD_BG,
                             noise=1, expiry_size=15, expiry_spacing=13,
                             style="flat"):
    """Card frame with a PAN row and an expiry line below it.

    The expiry line uses reference-model-tuned digit glyphs and an
    embossed-style slash, so the compiled reference (refbridge) segments and
    categorizes it — enabling end-to-end expiry A/B. style="emboss": both
    lines as relief glyphs (the training-distribution-shaped renderer)."""
    y = render_frame(pan, y0=y0, width=width, offset=offset, seed=seed,
                     bg=bg, noise=noise, style=style)
    if expiry_y is None:
        expiry_y = y0 + 27 + 35
    return render_text_small(y, expiry_text, expiry_y, expiry_x,
                             size=expiry_size, spacing=expiry_spacing,
                             style=style)
