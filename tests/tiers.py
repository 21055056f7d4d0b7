"""Test-depth tiers (VERDICT.md round-3 item 6).

The default `pytest tests/ -q` run is the FAST tier: every parity gate
and behavior still exercised, but deep randomized sweeps and
envelope-proof grids run at reduced depth. Measured on this 1-core host
(round 4 review): fast tier ~27 min — dominated by XLA:CPU compiles of
the big serving graphs, which the persistent compile cache (conftest.py)
amortizes only across UNCHANGED graphs — vs ~60 min full-depth in round
3. Set CARDIO_FULL_SWEEPS=1 to run everything at full depth (the
pre-round-4 sizes), e.g. nightly or before cutting a round.

Usage in a test:  from tiers import sweep;  N = sweep(full=100, fast=8)
"""

import os

FULL_SWEEPS = bool(int(os.environ.get("CARDIO_FULL_SWEEPS", "0")))


def sweep(full, fast):
    """Pick a sweep size (or any per-tier value) by tier."""
    return full if FULL_SWEEPS else fast
