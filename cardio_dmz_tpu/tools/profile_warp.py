"""Stage-level profiling of the exact warp on TPU.

State-carrying loops only (the axon tunnel mis-times independent calls —
CLAUDE.md): each variant feeds its output back into the next iteration's
input image so the device must serialize steps.
"""

import argparse
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=64)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--stage", default="all",
                    help="comma list: coords,qr,rows,full,dense")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from cardio_dmz_tpu import api
    from cardio_dmz_tpu.ops import warp as W
    from cardio_dmz_tpu.ops.persp import eigen_persp_transform, warp_coord_maps

    rng = np.random.RandomState(0)
    S = args.streams
    imgs = rng.randint(0, 256, (S, 480, 640)).astype(np.uint8)
    srcs = (np.float32([[106, 105], [534, 105], [106, 375], [534, 375]])[None]
            + rng.uniform(-10, 10, (S, 4, 2)).astype(np.float32))
    bounds = api.warp_src_bounds((480, 640), 3)
    dest = jnp.asarray([[0.0, 0.0], [427.0, 0.0], [0.0, 269.0],
                        [427.0, 269.0]], jnp.float32)

    def carry(img, out):
        # fold the (270,428) output back into the image: state-carrying
        return lax.dynamic_update_slice(
            img, out.astype(img.dtype), (0, 0))

    def v_qr(img, sp):
        h = eigen_persp_transform(sp, dest)
        out = (img[:270, :428] + h.sum().astype(jnp.uint8))
        return carry(img, out)

    def v_coords(img, sp):
        h = eigen_persp_transform(sp, dest)
        X, Y, _ = warp_coord_maps(h, (270, 428))
        out = (X + Y).astype(jnp.uint8)
        return carry(img, out)

    def v_full(img, sp):
        h = eigen_persp_transform(sp, dest)
        out = W.warp_perspective_exact(img, h, (270, 428),
                                       src_bounds=bounds)
        return carry(img, out)

    def v_dense(img, sp):
        out = W.unwarp_card(img, sp, src_bounds=bounds, method="dense")
        return carry(img, out)

    def v_bands(img, sp):
        # qr + coords + band bases + the kernel's window-start k compute —
        # everything EXCEPT the pallas gather itself
        h = eigen_persp_transform(sp, dest)
        X, Y, minv = warp_coord_maps(h, (270, 428))
        rr = jnp.arange(270, dtype=jnp.float32)[:, None]
        jjf = jnp.arange(640, dtype=jnp.float32)[None, :]
        yb = W._band_base(minv, rr, jjf)
        out = (X + Y + yb[:, :428]).astype(jnp.uint8)
        return carry(img, out)

    def v_kernel(img, sp):
        # pallas gather alone: static coord maps (same for all iters),
        # image is the carried state so steps still serialize
        from cardio_dmz_tpu.ops.pallas.warp_gather import warp_gather_exact
        h = eigen_persp_transform(
            jnp.asarray([[106., 105.], [534., 105.], [106., 375.],
                         [534., 375.]], jnp.float32), dest)
        X, Y, minv = warp_coord_maps(h, (270, 428))
        rr = jnp.arange(270, dtype=jnp.float32)[:, None]
        jjf = jnp.arange(640, dtype=jnp.float32)[None, :]
        yb = W._band_base(minv, rr, jjf)
        out = warp_gather_exact(img, X, Y, yb, (270, 428))
        return carry(img, out + sp.sum().astype(jnp.uint8))

    variants = dict(qr=v_qr, coords=v_coords, bands=v_bands,
                    kernel=v_kernel, full=v_full, dense=v_dense)
    wanted = (list(variants) if args.stage == "all"
              else args.stage.split(","))
    for name in wanted:
        fn = jax.jit(jax.vmap(variants[name]))
        img = jax.device_put(imgs)
        t_c0 = time.perf_counter()
        img = fn(img, srcs)
        jax.block_until_ready(img)
        compile_s = time.perf_counter() - t_c0
        t0 = time.perf_counter()
        for _ in range(args.iters):
            img = fn(img, srcs)
        jax.block_until_ready(img)
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name:8s} step {1000*dt:8.2f} ms @ {S} streams "
              f"(compile {compile_s:.0f}s)", file=sys.stderr)


if __name__ == "__main__":
    main()
