"""Configuration / feature-flag system.

The reference's flag system is entirely preprocessor-based: platform triad
IOS_DMZ/ANDROID_DMZ/CYTHON_DMZ, SCAN_EXPIRY, DMZ_DEBUG, DMZ_TRACE,
per-kernel TEST_*/TIME_* (compile.h:10-26, SURVEY.md §5). Here it is a
frozen dataclass threaded explicitly (static under jit — each distinct
config compiles its own graph, the jit-native analogue of #ifdef).

Tunable algorithm constants keep their reference names/values in
constants.py; this config gates *features*.
"""

import dataclasses
import os


@dataclasses.dataclass(frozen=True)
class ScanConfig:
    # feature gates (compile.h flags)
    scan_expiry: bool = True          # SCAN_EXPIRY
    collect_card_number: bool = True
    scan_forever: bool = False        # SCAN_FOREVER (scan.cpp:13): never
    #                                   complete — steady-state profiling
    debug: bool = False               # DMZ_DEBUG
    trace: bool = False               # DMZ_TRACE
    expiry_allow_past_dates: bool = False  # the DMZ_DEBUG/CYTHON_DMZ
    #                                   date-sanity branch (accepts past
    #                                   dates, expiry_categorize.cpp:382-397)
    #                                   — the compiled-reference harness's
    #                                   configuration; A/B sweeps set True

    # execution
    latency_shape: bool = False       # batch-1-specialized graph: per-lane
    #                                   dynamic slices where the throughput
    #                                   graph uses one-hot contractions.
    #                                   Identical results; the one-hot forms
    #                                   add flat work a single stream cannot
    #                                   amortize, while dynamic_slice is
    #                                   cheap un-vmapped but lowers to
    #                                   serial per-lane slice chains under
    #                                   the stream vmap — pick per shape
    #                                   (bench.py --latency sets it)
    use_pallas: bool = False          # pallas digit-prep kernel (bit-exact;
    #                                   wins for single-frame latency paths,
    #                                   loses under the vmapped stream batch
    #                                   where XLA's fused jnp path is faster)
    interpret_pallas: bool = False    # pallas interpret mode (CPU testing)
    warp_method: str = "exact"        # camera-path rectification:
    #                                   "exact" = bit-exact reference chain
    #                                   (Eigen-f32-QR homography + cv's
    #                                   double coords + 5-bit fixed-point
    #                                   bilinear, ops/warp.py
    #                                   warp_perspective_exact) — serving
    #                                   default since round 3;
    #                                   "dense" = two-pass full-float warp
    #                                   (better-than-reference interp,
    #                                   not bit-parity)
    warp_bf16: bool = False           # bf16 contractions in the "dense"
    #                                   camera warp — the analogue of the
    #                                   reference's reduced-precision GL
    #                                   warp (dmz_use_gles_warp); +-2 gray
    #                                   vs the f32 cv-faithful path.
    #                                   Measured throughput-neutral on v5e
    #                                   (that warp is hat-weight-generation
    #                                   bound), so OFF by default.

    # serving shape
    n_streams: int = 256              # concurrent camera streams per chip

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


DEFAULT_CONFIG = ScanConfig()


def config_from_env(prefix="CARDIO_") -> ScanConfig:
    """Build a config from CARDIO_* environment variables (the deployment
    analogue of compile-time -D flags)."""
    kw = {}
    for f in dataclasses.fields(ScanConfig):
        env = os.environ.get(prefix + f.name.upper())
        if env is None:
            continue
        if f.type is bool or isinstance(f.default, bool):
            kw[f.name] = env.lower() in ("1", "true", "yes", "on")
        elif isinstance(f.default, int):
            kw[f.name] = int(env)
        else:
            kw[f.name] = env
    return ScanConfig(**kw)
