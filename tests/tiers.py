"""Test-depth tiers (VERDICT.md round-3 item 6).

The default `pytest tests/ -q` run is the FAST tier: every parity gate
and behavior still exercised, but deep randomized sweeps and
envelope-proof grids run at reduced depth. Measured on this 1-core host:
fast tier ~27-35 min (the high end under a concurrently-loaded host) —
dominated by XLA:CPU compiles of the big serving graphs, which the
persistent compile cache (conftest.py) amortizes only across UNCHANGED
graphs. Full depth (CARDIO_FULL_SWEEPS=1, the pre-round-4 sizes)
measured 37:18 with a warm compile cache at the round-5 HEAD
(184 passed) — run it nightly or before cutting a round.

Usage in a test:  from tiers import sweep;  N = sweep(full=100, fast=8)
"""

import os

FULL_SWEEPS = bool(int(os.environ.get("CARDIO_FULL_SWEEPS", "0")))


def sweep(full, fast):
    """Pick a sweep size (or any per-tier value) by tier."""
    return full if FULL_SWEEPS else fast
