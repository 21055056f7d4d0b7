"""Shim: the synthetic card renderer lives in the package now (so the
installed console tools — cardio-serve, cardio-parity-ab — can use it);
tests keep importing it as plain `synthetic`."""

from cardio_dmz_tpu.synthetic import *          # noqa: F401,F403
from cardio_dmz_tpu.synthetic import (          # noqa: F401
    CARD_BG, DIGIT_FILL, FONT_BOLD_PATH, FONT_PATH, FONT_SIZE, SAFE_DIGITS)
