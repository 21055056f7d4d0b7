"""Debug logging, tracing, and wall timers (dmz_debug.h equivalents).

* dmz_debug_log / dmz_error_log -> python logging (dmz_debug.h:18-42)
* DMZ_TRACE verbose tracing       -> trace_log gated by config/env
* 10-slot microsecond timers      -> Timer slots (dmz_debug.h:51-105)
* device-side profiling           -> jax.profiler trace context + in-graph
                                     step annotations (the TPU-era analogue
                                     of the reference's per-stage timers,
                                     SURVEY.md §5)
"""

import contextlib
import logging
import os
import time

logger = logging.getLogger("cardio_dmz_tpu")

_TRACE = os.environ.get("CARDIO_TRACE", "0").lower() in ("1", "true")


def debug_log(fmt, *args):
    logger.debug(fmt, *args)


def error_log(fmt, *args):
    logger.error(fmt, *args)


def trace_log(fmt, *args):
    if _TRACE:
        logger.info("TRACE: " + fmt, *args)


class Timers:
    """10-slot wall timers mirroring dmz_debug_timer_* (dmz_debug.h:51-105):
    start/lap/stop/print per slot, microsecond resolution."""

    N_SLOTS = 10

    def __init__(self):
        self._start = [0.0] * self.N_SLOTS
        self._lap = [0.0] * self.N_SLOTS

    def start(self, slot=0):
        now = time.perf_counter()
        self._start[slot] = now
        self._lap[slot] = now

    def lap(self, slot=0):
        """Microseconds since the last lap (or start)."""
        now = time.perf_counter()
        elapsed = (now - self._lap[slot]) * 1e6
        self._lap[slot] = now
        return elapsed

    def stop(self, slot=0):
        """Microseconds since start."""
        return (time.perf_counter() - self._start[slot]) * 1e6

    def print_lap(self, message, slot=0):
        us = self.lap(slot)
        debug_log("%10.3f ms to %s", us / 1000.0, message)
        return us


TIMERS = Timers()


@contextlib.contextmanager
def profile_trace(log_dir="/tmp/cardio_trace"):
    """jax.profiler trace context — the XLA-level replacement for the
    reference's per-stage timers; view with TensorBoard or xprof."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name):
    """Named region for device profiles (TraceAnnotation)."""
    import jax
    return jax.profiler.TraceAnnotation(name)
