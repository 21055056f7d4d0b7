"""SPMD scaling curve over a virtual device mesh (SURVEY.md §2.6).

Measures per-step wall time of the sharded serving step (and optionally
the fused camera step) at a FIXED global stream batch across mesh sizes
1/2/4/8, and reports t_1 / t_N as the partitioning efficiency.

What this does and does not measure: this environment exposes one real
TPU chip; multi-chip is validated on a VIRTUAL CPU mesh
(xla_force_host_platform_device_count), where all N "devices" share the
host's cores. With fixed global batch the total work is constant, so an
ideal SPMD partitioning keeps the step time FLAT as N grows — the curve
measures the OVERHEAD the sharding introduces (collectives, halo/padding,
per-shard fixed costs), which is exactly the part of multi-chip scaling
this host can falsify. It cannot measure parallel speedup (no extra
hardware exists to speed anything up); on real chips the same shardings
ride ICI with XLA-inserted collectives.

Usage:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python -m cardio_dmz_tpu.tools.scaling_curve [--camera] [--json]
"""

import argparse
import json
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, _REPO_ROOT)

import numpy as np


def measure(step, states, inputs, iters, warmup=2):
    import jax
    for _ in range(warmup):
        states, _ = step(states, *inputs)
    jax.block_until_ready(states)
    t0 = time.perf_counter()
    for _ in range(iters):
        states, _ = step(states, *inputs)
    jax.block_until_ready(states)
    return (time.perf_counter() - t0) / iters


def run(global_batch=32, iters=8, camera=False, sizes=(1, 2, 4, 8)):
    import jax
    from cardio_dmz_tpu.models.weights import load_all_params
    from cardio_dmz_tpu.parallel.mesh import make_mesh, shard_streams
    from cardio_dmz_tpu.parallel.streams import (
        batched_camera_step, init_stream_states, make_sharded_step)

    params = load_all_params()
    devices = jax.devices()
    rng = np.random.RandomState(0)
    frames = rng.randint(0, 256, (global_batch, 270, 428)).astype(np.uint8)

    results = {}
    sizes = [n for n in sizes if n <= len(devices)]
    for n in sizes:
        mesh = make_mesh(devices[:n])
        step, place, init = make_sharded_step(params, mesh,
                                              scan_expiry=True)

        def step2(states, fr):
            return step(states, fr)

        states = init(global_batch)
        t = measure(step2, states, (place(frames),), iters)
        results[n] = {"scan_step_ms": round(t * 1000, 2)}

        if camera:
            from cardio_dmz_tpu.parallel.mesh import replicated
            p_rep = jax.device_put(params, replicated(mesh))

            @jax.jit
            def cam(states, y, cb, cr):
                states, (found, fr, res) = batched_camera_step(
                    p_rep, states, y, cb, cr, scan_expiry=True)
                return states, res.complete

            y = rng.randint(0, 256,
                            (global_batch, 480, 640)).astype(np.uint8)
            cb = rng.randint(0, 256,
                             (global_batch, 240, 320)).astype(np.uint8)
            cr = rng.randint(0, 256,
                             (global_batch, 240, 320)).astype(np.uint8)
            states = init(global_batch)
            tc = measure(cam, states,
                         tuple(shard_streams(mesh, x) for x in (y, cb, cr)),
                         max(iters // 2, 2))
            results[n]["camera_step_ms"] = round(tc * 1000, 2)

    t1 = results[sizes[0]]["scan_step_ms"]
    for n in sizes:
        results[n]["efficiency_vs_1dev"] = round(
            t1 / results[n]["scan_step_ms"], 3)
    if camera:
        tc1 = results[sizes[0]]["camera_step_ms"]
        for n in sizes:
            results[n]["camera_efficiency_vs_1dev"] = round(
                tc1 / results[n]["camera_step_ms"], 3)
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--global-batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--camera", action="store_true")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    # force CPU BEFORE any backend initialization (the axon TPU plugin
    # ignores the JAX_PLATFORMS env var; the config flag must be set
    # before jax touches a device — CLAUDE.md environment note)
    import jax
    jax.config.update("jax_platforms", "cpu")

    results = run(args.global_batch, args.iters, args.camera)
    print(json.dumps(results, indent=None if args.json else 2))


if __name__ == "__main__":
    sys.exit(main() or 0)
