"""Python bindings for the native framepump ingest runtime (ctypes).

Builds cardio_dmz_tpu/native/framepump.cpp on first use (g++ -O3
-march=native) and caches the .so next to this module; the source ships as
package data so installed distributions build it too. See framepump.cpp
for the design.
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native", "framepump.cpp")
_SO = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "_framepump.so")
_LOCK = threading.Lock()
_LIB = None


def _build():
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           _SRC, "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)


def _lib():
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        if (not os.path.exists(_SO) or
                os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_SO)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        u64p = ctypes.POINTER(ctypes.c_uint64)
        lib.fp_deinterleave_c2.argtypes = [u8p, u8p, u8p, ctypes.c_int64]
        lib.fp_rgba_to_r.argtypes = [u8p, u8p, ctypes.c_int64]
        lib.fp_ycbcr422_split.argtypes = [u8p, u8p, u8p, u8p,
                                          ctypes.c_int64, ctypes.c_int64]
        lib.fp_create.restype = ctypes.c_void_p
        lib.fp_create.argtypes = [ctypes.c_int64, ctypes.c_int64]
        lib.fp_destroy.argtypes = [ctypes.c_void_p]
        lib.fp_push_frame.restype = ctypes.c_int
        lib.fp_push_frame.argtypes = [ctypes.c_void_p, ctypes.c_int64, u8p,
                                      ctypes.c_uint64]
        lib.fp_acquire_batch.restype = ctypes.c_int64
        lib.fp_acquire_batch.argtypes = [ctypes.c_void_p, u8p, u64p, u64p]
        _LIB = lib
        return lib


def _u8ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def deinterleave_c2(interleaved):
    """Host-side 2-channel deinterleave (even/odd bytes), native SIMD."""
    a = np.ascontiguousarray(interleaved, np.uint8)
    n = a.size // 2
    c1 = np.empty(n, np.uint8)
    c2 = np.empty(n, np.uint8)
    _lib().fp_deinterleave_c2(_u8ptr(a), _u8ptr(c1), _u8ptr(c2), n)
    shape = a.shape[:-1] + (a.shape[-1] // 2,)
    return c1.reshape(shape), c2.reshape(shape)


def rgba_to_r(rgba):
    a = np.ascontiguousarray(rgba, np.uint8)
    n = a.size // 4
    r = np.empty(n, np.uint8)
    _lib().fp_rgba_to_r(_u8ptr(a), _u8ptr(r), n)
    return r.reshape(a.shape[:-1] + (a.shape[-1] // 4,))


def ycbcr422_split(cbycry, width, height):
    """CbYCrY 4:2:2 -> (Y (H,W), Cb (H,W/2), Cr (H,W/2))."""
    a = np.ascontiguousarray(cbycry, np.uint8)
    assert a.size == width * height * 2
    y = np.empty((height, width), np.uint8)
    cb = np.empty((height, width // 2), np.uint8)
    cr = np.empty((height, width // 2), np.uint8)
    _lib().fp_ycbcr422_split(_u8ptr(a), _u8ptr(y), _u8ptr(cb), _u8ptr(cr),
                             width, height)
    return y, cb, cr


class FramePump:
    """Multi-stream latest-frame ring: camera threads push, the serving loop
    acquires contiguous batches for device upload."""

    def __init__(self, n_streams, frame_shape=(270, 428)):
        self.n_streams = n_streams
        self.frame_shape = tuple(frame_shape)
        self.frame_bytes = int(np.prod(frame_shape))
        self._pump = _lib().fp_create(n_streams, self.frame_bytes)
        if not self._pump:
            raise MemoryError("framepump allocation failed")
        self._last_ids = np.zeros(n_streams, np.uint64)

    def push(self, stream, frame, frame_id):
        a = np.ascontiguousarray(frame, np.uint8)
        assert a.shape == self.frame_shape, (a.shape, self.frame_shape)
        rc = _lib().fp_push_frame(self._pump, stream, _u8ptr(a),
                                  int(frame_id))
        if rc != 0:
            raise IndexError(f"bad stream id {stream}")

    def acquire_batch(self):
        """Returns (batch (S, H, W) u8, frame_ids (S,), n_fresh)."""
        batch = np.empty((self.n_streams,) + self.frame_shape, np.uint8)
        ids = np.zeros(self.n_streams, np.uint64)
        fresh = _lib().fp_acquire_batch(
            self._pump, _u8ptr(batch),
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            self._last_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)))
        return batch, ids, int(fresh)

    def close(self):
        if self._pump:
            _lib().fp_destroy(self._pump)
            self._pump = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
