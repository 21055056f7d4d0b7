"""Host-side full scanner session: PAN (jitted device pipeline) + expiry
(host pipeline).

This is the complete scanner_add_frame_with_expiry surface
(scan/scan.cpp:41-86) for offline / single-stream use. The PAN path runs the
jitted device graph; the expiry path runs the faithful host implementation.
(The batched in-graph expiry device path lives in scan/expiry_device.py and
is used by the production multi-stream serving shape.)
"""

import time

import jax
import numpy as np

from ..constants import CARD_HEIGHT, MIN_VSEG_SCORE, SMALL_CHARACTER_HEIGHT
from ..scan.expiry_seg_host import best_expiry_seg
from ..scan.expiry_categorize_host import expiry_extract
from .state import (
    EXPIRY_GRACE_FRAMES,
    ScannerResult,
    scanner_reset,
    scanner_step,
)


class HostScanner:
    """Stateful convenience wrapper (the dmz_context + ScannerState role)."""

    def __init__(self, params, scan_expiry=True, now=None,
                 collect_name_groups=False, allow_past_dates=False):
        self.params = params
        self.scan_expiry = scan_expiry
        # flag-gated name super-groups (expiry_seg.cpp:544-548 carries
        # this path disabled; off by default to match the reference)
        self.collect_name_groups = collect_name_groups
        # DMZ_DEBUG/CYTHON_DMZ date-sanity branch (accepts past dates) —
        # matches the compiled-reference harness when True
        self.allow_past_dates = allow_past_dates
        self.now = now or time.localtime()[:2]  # (year, month)
        self.state = scanner_reset()
        self.expiry_groups = []
        self.name_groups = []
        self.expiry_month = 0
        self.expiry_year = 0
        self._step = jax.jit(
            lambda st, y: scanner_step(params, st, y, scan_expiry=False))

    def reset(self):
        self.state = scanner_reset()
        self.expiry_groups = []
        self.name_groups = []
        self.expiry_month = 0
        self.expiry_year = 0

    def add_frame(self, y):
        """One 270x428 u8 frame. Returns (FrameResult, ScannerResult)."""
        y = np.ascontiguousarray(y, np.uint8)
        pre_complete = bool(self.state.number_complete)
        self.state, (frame, _result) = self._step(self.state, y)

        # scan.cpp:57 drops !usable frames, where `usable` is computed
        # with collect_card_number = still-collecting (frame.cpp:49-69):
        # the number-score check gates expiry only UNTIL the number
        # completes; afterwards the vseg-only gate applies.
        if pre_complete:
            session_usable = (float(frame.vseg.score) > MIN_VSEG_SCORE
                              and not bool(frame.upside_down))
        else:
            session_usable = bool(frame.usable)
        need_expiry = self.scan_expiry and (
            self.expiry_month == 0 or self.expiry_year == 0)
        if (need_expiry and not bool(frame.upside_down)
                and session_usable):
            y_off = int(frame.vseg.y_offset)
            if y_off < CARD_HEIGHT - 2 * SMALL_CHARACTER_HEIGHT:
                new_groups, name_groups = best_expiry_seg(
                    y, y_off, self.params["slash_mlp"],
                    collect_name_groups=self.collect_name_groups)
                self.name_groups = name_groups
                self.expiry_month, self.expiry_year = expiry_extract(
                    y, self.expiry_groups, new_groups,
                    self.params["expiry_conv"], now=self.now,
                    best_month=self.expiry_month,
                    best_year=self.expiry_year,
                    allow_past_dates=self.allow_past_dates)
        return frame, self.result()

    def result(self) -> ScannerResult:
        """scanner_result with the host expiry merged (scan.cpp:88-194)."""
        st = self.state
        have_number = bool(st.number_complete)
        if not have_number:
            return ScannerResult(
                complete=False, n_numbers=0,
                predictions=np.zeros(16, np.int32),
                expiry_month=0, expiry_year=0)
        expiry_found = self.expiry_month > 0 and self.expiry_year > 0
        grace_over = int(st.frames_since_complete) > EXPIRY_GRACE_FRAMES
        if self.scan_expiry and not (expiry_found or grace_over):
            complete = False
        else:
            complete = True
        return ScannerResult(
            complete=complete,
            n_numbers=int(st.completed_n),
            predictions=np.asarray(st.completed_digits),
            expiry_month=self.expiry_month if complete else 0,
            expiry_year=self.expiry_year if complete else 0,
        )

    @property
    def card_number(self):
        if not bool(self.state.number_complete):
            return None
        n = int(self.state.completed_n)
        return "".join(map(str, np.asarray(self.state.completed_digits)[:n]))
