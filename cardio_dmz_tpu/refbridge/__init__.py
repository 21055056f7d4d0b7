"""Compiled-reference A/B bridge (the cython_dmz role, SURVEY §2.5).

Compiles the ACTUAL card.io-dmz C++ (reference checkout, unity build
``dmz_all.cpp`` with ``CYTHON_DMZ=1, SCAN_EXPIRY=1`` — the reference's own
research-harness configuration, cython_dmz/dmz.pyxbld) into a ctypes-loadable
shared object and exposes it as a numpy-friendly oracle.  This is the ground
truth the TPU pipeline's parity numbers are measured against.

Requires the reference checkout (default ``/root/reference``) and a system
OpenCV with the legacy C API; callers should gate on :func:`available`.
"""

from .build import available, build, reference_root
from .oracle import RefOracle

__all__ = ["available", "build", "reference_root", "RefOracle"]
