"""Retrain the scan models in-framework (the reference's models came from
offline Theano runs with no training code in-repo — SURVEY.md §2.3).

Demonstrates the full loop on synthetic data: init -> dp(+tp)-sharded
optax training -> eval -> checkpoint, producing a params file loadable by
session/checkpoint.load_params_npz. Swap synthetic_digit_batch for a real
labeled corpus for production.

Usage:
  python tools/train_models.py --model pan_conv --steps 300 \
      --out /tmp/pan_conv_retrained.npz
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", choices=["pan_conv", "vseg_mlp"],
                    default="pan_conv")
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--out", default="/tmp/retrained.npz")
    ap.add_argument("--mesh", action="store_true",
                    help="shard the train step over all local devices")
    args = ap.parse_args()

    import jax
    from cardio_dmz_tpu.train import (
        fit, init_pan_conv_params, init_mlp_params, pan_conv_loss, mlp_loss)
    from cardio_dmz_tpu.train.data import synthetic_digit_batch
    from cardio_dmz_tpu.session.checkpoint import save_params
    from cardio_dmz_tpu.models.zoo import apply_pan_conv, apply_mlp

    rng = np.random.RandomState(0)
    mesh = None
    if args.mesh:
        from cardio_dmz_tpu.parallel.mesh import make_mesh
        mesh = make_mesh()

    if args.model == "pan_conv":
        params = init_pan_conv_params(jax.random.PRNGKey(0))
        loss_fn = pan_conv_loss

        def data():
            while True:
                yield synthetic_digit_batch(rng, args.batch)

        apply_fn = apply_pan_conv
    else:
        params = init_mlp_params(jax.random.PRNGKey(0), 204, 50, 3)
        loss_fn = mlp_loss

        def data():
            while True:
                x = rng.rand(args.batch, 204).astype(np.float32)
                yield x, (x[:, 0] * 3).astype(np.int32) % 3

        apply_fn = apply_mlp

    params, losses = fit(loss_fn, params, data(), steps=args.steps,
                         learning_rate=args.lr, mesh=mesh,
                         log_every=max(args.steps // 10, 1))

    # eval
    if args.model == "pan_conv":
        cells, labels = synthetic_digit_batch(np.random.RandomState(99), 256)
        pred = np.asarray(apply_fn(params, cells)).argmax(-1)
        acc = float((pred == labels).mean())
        print(f"eval accuracy: {acc:.3f}")

    save_params(args.out, {args.model: {k: np.asarray(v)
                                        for k, v in params.items()}})
    print(f"saved: {args.out} (final loss {losses[-1]:.4f})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
