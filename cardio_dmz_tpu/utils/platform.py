"""Backend/platform capability registry.

The TPU-era analogue of processor_support.h (compile-time + runtime NEON
dispatch, GLES-warp enable/fallback latch — processor_support.cpp:95-102):
detects the active JAX backend once and exposes capability predicates the
kernel layer uses to pick pallas fast paths vs portable jnp paths, plus a
fallback latch mirroring dmz_set_gles_warp(0)-on-error behavior.
"""

import functools


@functools.lru_cache(maxsize=None)
def backend() -> str:
    import jax
    return jax.default_backend()


def is_tpu() -> bool:
    return backend() == "tpu"


def has_pallas_tpu() -> bool:
    """Pallas TPU kernels are usable (compiled, not interpreted)."""
    return is_tpu() and not _pallas_disabled[0]


_pallas_disabled = [False]


def disable_pallas(reason=""):
    """Runtime fallback latch: on a pallas failure, permanently fall back to
    the portable jnp kernels (the GLES-warp error-fallback pattern,
    mz_android.cpp:8-24)."""
    from .debug import error_log
    if not _pallas_disabled[0]:
        _pallas_disabled[0] = True
        error_log("pallas disabled at runtime: %s", reason)


def device_summary():
    import jax
    ds = jax.devices()
    return {
        "backend": backend(),
        "n_devices": len(ds),
        "device_kind": ds[0].device_kind if ds else None,
    }
