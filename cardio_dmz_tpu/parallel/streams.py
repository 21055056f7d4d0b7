"""Multi-stream batched scanning — the production serving shape.

256 concurrent 30 fps camera streams per chip in ONE jitted graph
(BASELINE.md north-star): the scanner session is a pure step function, so
the whole fleet is `vmap(scanner_step)` with the stream axis sharded over
the mesh's data axis. No host round-trips: frames in, per-stream results +
carried states out.
"""

import jax

from ..session.state import (
    camera_scanner_step, scanner_reset, scanner_step, scan_frames)
from .mesh import replicated, stream_sharding


def init_stream_states(n_streams):
    """Fresh per-stream ScannerStates, stream-major."""
    return jax.vmap(lambda _: scanner_reset())(jax.numpy.arange(n_streams))


def batched_scanner_step(params, states, frames, scan_expiry=False,
                         config=None):
    """One step for every stream. frames: (S, 270, 428) u8;
    states: stream-major ScannerState pytree. Returns (states, (frame
    results, scanner results)) all stream-major. config: static
    ScanConfig (overrides scan_expiry; e.g. latency_shape)."""
    def step(state, y):
        return scanner_step(params, state, y, scan_expiry, config=config)
    return jax.vmap(step)(states, frames)


def batched_camera_step(params, states, y, cb, cr, scan_expiry=False,
                        orientation=None, config=None):
    """One camera->digits step for every stream — detection, rectification,
    and recognition in ONE graph (the honest end-to-end serving unit).

    y: (S, 480, 640) u8; cb/cr: (S, 240, 320) u8 half-size chroma.
    config: static ScanConfig (e.g. warp_bf16 for the serving-precision
    camera warp). Returns (states, (found, frame results, scanner
    results)).
    """
    def step(state, ys, cbs, crs):
        return camera_scanner_step(params, state, ys, cbs, crs,
                                   scan_expiry=scan_expiry,
                                   orientation=orientation, config=config)
    return jax.vmap(step)(states, y, cb, cr)


def batched_scan_frames(params, frames, scan_expiry=False):
    """Whole sessions for a (S, T, 270, 428) frame tensor: vmap over
    streams, lax.scan over time."""
    return jax.vmap(lambda fr: scan_frames(params, fr, scan_expiry))(frames)


def make_sharded_step(params, mesh, scan_expiry=False):
    """Jit batched_scanner_step with stream-sharded in/out and replicated
    params over `mesh`. Returns (step_fn, place_frames, init_states_fn)."""
    s_sh = stream_sharding(mesh)
    r_sh = replicated(mesh)
    params = jax.device_put(params, r_sh)

    @jax.jit
    def step(states, frames):
        return batched_scanner_step(params, states, frames, scan_expiry)

    def place(x):
        return jax.device_put(x, s_sh)

    def init(n_streams):
        return place(init_stream_states(n_streams))

    return step, place, init
