"""Per-stage TPU timing of the expiry device path (perf work scratchpad).

Times each stage of the in-graph expiry pipeline separately at a given
stream batch so optimization work attacks the real bottleneck.
"""

import argparse
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, _REPO_ROOT)
sys.path.insert(0, os.path.join(_REPO_ROOT, "tests"))

import numpy as np


def bench(fn, *args, iters=50, warmup=5):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return 1000.0 * (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax
    from cardio_dmz_tpu.models.weights import load_all_params
    from cardio_dmz_tpu.scan import expiry_device as ed
    from cardio_dmz_tpu.parallel.streams import (batched_scanner_step,
                                                 init_stream_states)

    params = load_all_params()
    S = args.streams
    rng = np.random.RandomState(0)
    frames = jax.device_put(rng.randint(0, 256, (S, 270, 428)).astype(np.uint8))
    vseg_y = jax.device_put(np.full((S,), 150, np.int32))
    en = jax.device_put(np.ones((S,), bool))

    # full steps
    @jax.jit
    def full(states, fr):
        states, (f, r) = batched_scanner_step(params, states, fr,
                                              scan_expiry=True)
        return states, r.complete

    @jax.jit
    def pan_only(states, fr):
        states, (f, r) = batched_scanner_step(params, states, fr,
                                              scan_expiry=False)
        return states, r.complete

    states = init_stream_states(S)
    t_full = bench(lambda fr: full(states, fr), frames)
    t_pan = bench(lambda fr: pan_only(states, fr), frames)

    # expiry stages
    seg = jax.jit(jax.vmap(lambda y, v, e: ed.best_expiry_seg_device(
        params["slash_mlp"], y, v, e)))
    t_seg = bench(seg, frames, vseg_y, en)
    windows = seg(frames, vseg_y, en)

    cat = jax.jit(jax.vmap(lambda y, w: ed.categorize_windows(
        params["expiry_conv"], y, w)))
    t_cat = bench(cat, frames, windows)
    scores = cat(frames, windows)

    agg = jax.jit(jax.vmap(ed.aggregate_windows))
    st = jax.vmap(lambda _: ed.expiry_state_init())(jnp.arange(S))
    t_agg = bench(agg, st, windows, scores)

    # seg sub-stages
    sob = jax.jit(jax.vmap(lambda y, v: ed.scharr_dx_abs_below(
        y, jnp.clip(v + 27, 0, 269))))
    t_sob = bench(sob, frames, vseg_y)
    sobels = sob(frames, vseg_y)

    stripes = jax.jit(jax.vmap(lambda s, v: ed.select_stripes(
        s, jnp.clip(v + 27, 0, 269))))
    t_str = bench(stripes, sobels, vseg_y)

    dev = jax.devices()[0].device_kind
    print(f"# device={dev} streams={S}")
    for name, t in [("full step", t_full), ("pan-only", t_pan),
                    ("expiry seg (all)", t_seg), ("  scharr", t_sob),
                    ("  stripes", t_str), ("categorize", t_cat),
                    ("aggregate", t_agg)]:
        print(f"{name:20s} {t:7.2f} ms  ({1000.0 * S / t:8.0f} fps)")




def fine(streams=64):
    """Finer seg-internal timings (invoked with --fine)."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from cardio_dmz_tpu.models.weights import load_all_params
    from cardio_dmz_tpu.scan import expiry_device as ed

    params = load_all_params()
    S = streams
    rng = np.random.RandomState(0)
    frames = jax.device_put(rng.randint(0, 256, (S, 270, 428)).astype(np.uint8))
    vseg_y = jax.device_put(np.full((S,), 150, np.int32))

    sob = jax.jit(jax.vmap(lambda y, v: ed.scharr_dx_abs_below(
        y, jnp.clip(v + 27, 0, 269))))
    sobels = jax.block_until_ready(sob(frames, vseg_y))
    stripes_fn = jax.jit(jax.vmap(lambda s, v: ed.select_stripes(
        s, jnp.clip(v + 27, 0, 269))))
    bases, sums, ok = jax.block_until_ready(stripes_fn(sobels, vseg_y))

    proc = jax.jit(jax.vmap(lambda s, b, ss, o: jax.vmap(
        lambda bb, sss, oo: ed._process_stripe(s, bb, sss, oo))(b, ss, o)))
    t_proc = bench(proc, sobels, bases, sums, ok)
    r_lefts, g_top, g_cw, alive0 = proc(sobels, bases, sums, ok)

    S_, St_, G_ = r_lefts.shape[0], r_lefts.shape[1], r_lefts.shape[2]

    def trim_all(sobel, r_lefts, g_top, g_cw):
        band_top = jnp.clip(g_top[:, 0] - 2 - ed._SCHARR_BASE, 0,
                            ed._BAND_ROWS - ed.EXPANDED_H)
        bands = jax.vmap(lambda t: lax.dynamic_slice(
            sobel, (t, 0), (ed.EXPANDED_H, 428)))(band_top)
        def stripe_trim(band, lefts_s, tops_s, cw_s):
            n_pos = 428 - ed.EXPANDED_W + 1
            shifted = jnp.stack([band[:, x:x + n_pos]
                                 for x in range(ed.EXPANDED_W)])
            l0 = jnp.clip(lefts_s - 2, 0, n_pos - 1)
            oh = (l0[:, None] == jnp.arange(n_pos)[None, :]).astype(
                jnp.float32)
            crops = jnp.einsum("kc,xrc->krx", oh, shifted)
            return jax.vmap(ed._trim_char)(crops, lefts_s, tops_s, cw_s)
        return jax.vmap(stripe_trim)(
            bands, r_lefts.reshape(St_, G_ * ed.MAX_CHARS),
            jnp.broadcast_to(g_top[:, :, None], (St_, G_, ed.MAX_CHARS)
                             ).reshape(St_, G_ * ed.MAX_CHARS),
            jnp.broadcast_to(g_cw[:, :, None], (St_, G_, ed.MAX_CHARS)
                             ).reshape(St_, G_ * ed.MAX_CHARS))

    trim = jax.jit(jax.vmap(trim_all))
    t_trim = bench(trim, sobels, r_lefts, g_top, g_cw)

    def slash_all(sobel, g_top):
        band_top = jnp.clip(g_top[:, 0] - 2 - ed._SCHARR_BASE, 0,
                            ed._BAND_ROWS - ed.EXPANDED_H)
        bands = jax.vmap(lambda t: lax.dynamic_slice(
            sobel, (t, 0), (ed.EXPANDED_H, 428)))(band_top)
        roffs = jnp.zeros((St_, G_ * (ed.MAX_CHARS - 4)), jnp.int32)
        lefts = jnp.zeros((St_, G_ * (ed.MAX_CHARS - 4)), jnp.int32)
        return ed.slash_probs_conv(params["slash_mlp"], bands, roffs, lefts)

    slash = jax.jit(jax.vmap(slash_all))
    t_slash = bench(slash, sobels, g_top)

    print(f"  process_stripe     {t_proc:7.2f} ms")
    print(f"  trim               {t_trim:7.2f} ms")
    print(f"  slash conv         {t_slash:7.2f} ms")


if __name__ == "__main__":
    if "--fine" in sys.argv:
        fine(int(sys.argv[sys.argv.index("--streams") + 1])
             if "--streams" in sys.argv else 64)
    else:
        main()
