"""Retrain the scan models in-framework (the reference's models came from
offline Theano runs with no training code in-repo — SURVEY.md §2.3).

All five reference architectures train end-to-end on synthetic data that
runs through the SAME preprocessing chains as serving (train/data.py):
init -> dp(+tp)-sharded optax training -> eval -> checkpoint, producing a
params file loadable by session/checkpoint.load_params_npz. Swap the
synthetic generators for a real labeled corpus for production.

Usage:
  python tools/train_models.py --model pan_conv --steps 300 \
      --out /tmp/pan_conv_retrained.npz
  python tools/train_models.py --model all --steps 200
"""

import argparse
import os
import sys

import numpy as np


def _spec(model):
    """(init_fn, loss_fn, apply_fn, data_fn) per architecture."""
    import jax
    from cardio_dmz_tpu.train import (
        expiry_conv_loss, init_expiry_conv_params, init_mlp_params,
        init_pan_conv_params, mlp_loss, pan_conv_loss)
    from cardio_dmz_tpu.train.data import (
        synthetic_digit_batch, synthetic_expiry_digit_batch,
        synthetic_slash_batch, synthetic_vseg_batch)
    from cardio_dmz_tpu.models.zoo import (
        apply_expiry_conv, apply_mlp, apply_pan_conv)

    key = jax.random.PRNGKey(0)
    return {
        # PAN digit conv ensemble member (modelc_* arch)
        "pan_conv": (lambda: init_pan_conv_params(key), pan_conv_loss,
                     apply_pan_conv, synthetic_digit_batch),
        # vseg strip MLP 204->50->3 (modelm_befe75da arch)
        "vseg_mlp": (lambda: init_mlp_params(key, 204, 50, 3), mlp_loss,
                     apply_mlp, synthetic_vseg_batch),
        # slash MLP 176->80->2 (modelm_730c4cbd arch)
        "slash_mlp": (lambda: init_mlp_params(key, 176, 80, 2), mlp_loss,
                      apply_mlp, synthetic_slash_batch),
        # expiry digit conv (modelc_bf4dd6c8 arch)
        "expiry_conv": (lambda: init_expiry_conv_params(key),
                        expiry_conv_loss, apply_expiry_conv,
                        synthetic_expiry_digit_batch),
    }[model]


# the ported golden weights playing each architecture's role
_GOLDEN = {"pan_conv": "pan_conv_a", "vseg_mlp": "vseg_mlp",
           "slash_mlp": "slash_mlp", "expiry_conv": "expiry_conv"}


def train_one(model, steps, batch, lr, mesh, seed=0, compare_golden=False):
    from cardio_dmz_tpu.train import fit

    init_fn, loss_fn, apply_fn, data_fn = _spec(model)
    rng = np.random.RandomState(seed)

    def data():
        while True:
            yield data_fn(rng, batch)

    params = init_fn()
    params, losses = fit(loss_fn, params, data(), steps=steps,
                         learning_rate=lr, mesh=mesh,
                         log_every=max(steps // 10, 1))

    # held-out eval with a fresh generator seed
    inputs, labels = data_fn(np.random.RandomState(seed + 99), 512)
    pred = np.asarray(apply_fn(params, inputs)).argmax(-1)
    acc = float((pred == labels).mean())
    golden_acc = None
    if compare_golden:
        # the ported golden weights on the SAME held-out eval: the
        # falsifiable bar for "retraining reaches the ported models"
        # on this synthetic distribution (the goldens were trained on
        # real embossed crops, so they are a strong but beatable bar
        # on DejaVu-rendered data)
        from cardio_dmz_tpu.models.weights import load_params
        gp = load_params(_GOLDEN[model])
        gpred = np.asarray(apply_fn(gp, inputs)).argmax(-1)
        golden_acc = float((gpred == labels).mean())
    msg = f"[{model}] retrained eval accuracy: {acc:.3f} (final loss {losses[-1]:.4f})"
    if golden_acc is not None:
        msg += f" | golden ported weights on same eval: {golden_acc:.3f}"
    print(msg)
    return params, acc, golden_acc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model",
                    choices=["pan_conv", "vseg_mlp", "slash_mlp",
                             "expiry_conv", "all"],
                    default="pan_conv")
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--out", default="/tmp/retrained.npz")
    ap.add_argument("--mesh", action="store_true",
                    help="shard the train step over all local devices")
    ap.add_argument("--compare-golden", action="store_true",
                    help="also evaluate the ported golden weights on the "
                         "same held-out eval and print a comparison table")
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (set BEFORE jax touches a "
                         "device; the axon TPU plugin ignores JAX_PLATFORMS)")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from cardio_dmz_tpu.session.checkpoint import save_params

    mesh = None
    if args.mesh:
        from cardio_dmz_tpu.parallel.mesh import make_mesh
        mesh = make_mesh()

    models = (["pan_conv", "vseg_mlp", "slash_mlp", "expiry_conv"]
              if args.model == "all" else [args.model])
    out = {}
    table = {}
    for m in models:
        params, acc, gacc = train_one(m, args.steps, args.batch, args.lr,
                                      mesh, compare_golden=args.compare_golden)
        out[m] = {k: np.asarray(v) for k, v in params.items()}
        table[m] = {"retrained_acc": acc, "golden_acc": gacc,
                    "steps": args.steps, "batch": args.batch}

    save_params(args.out, out)
    print(f"saved: {args.out}")
    if args.json:
        import json
        print(json.dumps(table))
    return 0


if __name__ == "__main__":
    sys.exit(main())
