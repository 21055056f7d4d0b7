"""Per-stage profiler for the PAN-only card pipeline (TPU).

Times vseg, hseg, categorize, and the session fold separately, batched
over streams, using state-carrying loops (see CLAUDE.md: never fetch
inside a timed loop on the axon tunnel).

Usage: python -m cardio_dmz_tpu.tools.profile_pan [--streams 64]
"""

import argparse
import os
import sys
import time

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, _REPO_ROOT)


def bench_chain(fn, x0, iters=20, warmup=3):
    """Time a self-feeding chain: x = fn(x) repeated, block once."""
    import jax
    x = x0
    for _ in range(warmup):
        x = fn(x)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = fn(x)
    jax.block_until_ready(x)
    return 1000.0 * (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=64)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from cardio_dmz_tpu.models.weights import load_all_params
    from cardio_dmz_tpu.scan.vseg import best_n_vseg
    from cardio_dmz_tpu.scan.hseg import best_n_hseg, grad_profile
    from cardio_dmz_tpu.scan.categorize import number_scores
    from cardio_dmz_tpu.parallel.streams import (batched_scanner_step,
                                                 init_stream_states)

    S = args.streams
    params = load_all_params()
    rng = np.random.RandomState(0)
    frames = jax.device_put(
        rng.randint(0, 256, (S, 270, 428)).astype(np.uint8))
    strips = jax.device_put(
        rng.randint(0, 256, (S, 27, 428)).astype(np.uint8))

    def report(tag, ms):
        print(f"{tag:28s} {ms:8.2f} ms ({S / ms * 1000:8.0f} fps)")

    # self-feeding chains: mix a tiny function of the previous output into
    # the next input so iterations can't be reordered/elided
    def chain(core):
        @jax.jit
        def f(x):
            out = core(x)
            bump = (out % 2).astype(jnp.uint8)   # (S,)
            # fold one bit of the output back into the input so iterations
            # form a true dependency chain (1-bit perturbation is harmless)
            return x ^ bump[..., None, None]
        return f

    vseg_core = lambda x: jax.vmap(
        lambda y: best_n_vseg(params["vseg_mlp"], y).y_offset)(x)
    report("vseg (270 rows MLP)", bench_chain(chain(vseg_core), frames,
                                              args.iters))

    hseg_core = lambda x: jax.vmap(
        lambda s: best_n_hseg(s, jnp.asarray(1), jnp.asarray(16)).pattern_offset)(x)
    report("hseg (staged search)", bench_chain(chain(hseg_core), strips,
                                            args.iters))

    def cat_core(x):
        offs = jnp.broadcast_to(30 + 19 * jnp.arange(16, dtype=jnp.int32),
                                (S, 16))
        return jax.vmap(lambda s, o: number_scores(
            params, s, o, jnp.asarray(16)).sum().astype(jnp.int32))(x, offs)
    report("categorize (3-conv x16)", bench_chain(chain(cat_core), strips,
                                                  args.iters))

    # full PAN-only step for reference
    states = init_stream_states(S)

    @jax.jit
    def step(st):
        st2, _ = batched_scanner_step(params, st, frames, scan_expiry=False)
        return st2
    report("full PAN-only step", bench_chain(step, states, args.iters))


if __name__ == "__main__":
    main()
