"""Build the reference C++ oracle (_refdmz.so) on demand, with caching.

The build recipe (see native/refshim/*.cpp for the why):

* ``oracle.cpp`` — includes the reference's unity build ``dmz_all.cpp``
  (CYTHON_DMZ=1, SCAN_EXPIRY=1, TEST_GENERATED_MODELS=1) and exposes a flat
  extern "C" surface.  Compiled with ``-Dcv=cv24`` so the vendored OpenCV
  2.4.5 C++ namespace cannot collide with the system OpenCV 4.x.
* ``cv24abi.cpp`` — implements the handful of 2.4-era ``cv::`` C++ symbols the
  reference links against (Mat-from-IplImage, medianBlur, ...).
* ``cvbackend.cpp`` — raw-pointer bridge into the modern system OpenCV.
* Linked against the system ``libopencv_core``/``libopencv_imgproc``, which
  still ship the legacy C API (cvCreateImage, cvSobel, cvMorphologyEx, ...)
  that the reference calls on its non-NEON fallback paths.
"""

from __future__ import annotations

import hashlib
import os
import subprocess
import sysconfig

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SHIM_DIR = os.path.join(_REPO_ROOT, "native", "refshim")
_BUILD_DIR = os.path.join(_SHIM_DIR, "build")
_DEFAULT_REFERENCE = "/root/reference"


def reference_root() -> str:
    return os.environ.get("CARDIO_REFERENCE_ROOT", _DEFAULT_REFERENCE)


def available() -> bool:
    """True if the reference checkout and a usable toolchain are present."""
    root = reference_root()
    if not os.path.isfile(os.path.join(root, "dmz_all.cpp")):
        return False
    try:
        return build() is not None
    except Exception:
        return False


def _source_fingerprint(ref_root: str) -> str:
    h = hashlib.sha256()
    for name in ("oracle.cpp", "cv24abi.cpp", "cvbackend.cpp"):
        with open(os.path.join(_SHIM_DIR, name), "rb") as f:
            h.update(f.read())
    h.update(ref_root.encode())
    return h.hexdigest()[:16]


def _run(cmd: list[str]) -> None:
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        raise RuntimeError(
            f"refshim build failed: {' '.join(cmd)}\n{proc.stdout}\n{proc.stderr}"
        )


def build(force: bool = False) -> str | None:
    """Compile (or reuse) the oracle .so; returns its path."""
    ref_root = reference_root()
    if not os.path.isfile(os.path.join(ref_root, "dmz_all.cpp")):
        return None
    os.makedirs(_BUILD_DIR, exist_ok=True)
    tag = _source_fingerprint(ref_root)
    so_path = os.path.join(_BUILD_DIR, f"_refdmz_{tag}.so")
    if os.path.isfile(so_path) and not force:
        return so_path

    pyinc = sysconfig.get_paths()["include"]
    cxx = os.environ.get("CXX", "g++")
    ref_flags = [
        "-O2", "-fPIC", "-std=gnu++14", "-w",
        "-DCYTHON_DMZ=1", "-DSCAN_EXPIRY=1", "-DTEST_GENERATED_MODELS=1",
        "-Dcv=cv24", f"-I{ref_root}", f"-I{pyinc}",
    ]
    opencv_cflags = subprocess.run(
        ["pkg-config", "--cflags", "opencv4"], capture_output=True, text=True
    ).stdout.split()

    objs = {
        "oracle.o": ref_flags + ["-c", os.path.join(_SHIM_DIR, "oracle.cpp")],
        "cv24abi.o": ["-O2", "-fPIC", "-std=gnu++14", "-w", "-Dcv=cv24",
                      f"-I{ref_root}", "-c", os.path.join(_SHIM_DIR, "cv24abi.cpp")],
        "cvbackend.o": ["-O2", "-fPIC", "-std=gnu++17", "-w"] + opencv_cflags
                       + ["-c", os.path.join(_SHIM_DIR, "cvbackend.cpp")],
    }
    obj_paths = []
    for obj, flags in objs.items():
        out = os.path.join(_BUILD_DIR, obj)
        _run([cxx] + flags + ["-o", out])
        obj_paths.append(out)

    tmp = so_path + ".tmp"
    _run([cxx, "-shared", *obj_paths, "-o", tmp,
          "-lopencv_core", "-lopencv_imgproc"])
    os.replace(tmp, so_path)
    return so_path
