"""Runtime model self-checks (TestGeneratedModels equivalent).

Every reference model ships a baked test input + known-good output and a
pass*() function comparing at 1e-5 (models/TestGeneratedModels.mm:35-70).
self_check() runs the same verification against the ported weights at
runtime — call it at service startup to catch weight corruption or a
numerically broken backend before serving traffic.
"""

import numpy as np

from .weights import MODEL_NAMES, load_params
from . import zoo

TOLERANCE = 1e-5


def self_check(verbose=False):
    """Run every model's golden self-check. Returns dict name -> bool."""
    prev = zoo.set_precision("highest")
    results = {}
    try:
        for name in MODEL_NAMES:
            params = load_params(name, include_test_vectors=True)
            if name in ("vseg_mlp", "slash_mlp"):
                out = zoo.apply_mlp(params, params["test_input"])
            elif name.startswith("pan_conv"):
                out = zoo.apply_pan_conv(params, params["test_input"])
            else:
                out = zoo.apply_expiry_conv(params, params["test_input"])
            err = float(np.abs(np.asarray(out) -
                               np.asarray(params["test_output"])).max())
            results[name] = err <= TOLERANCE
            if verbose:
                print(f"{name}: max abs err {err:.2e} "
                      f"{'OK' if results[name] else 'FAIL'}")
    finally:
        zoo.set_precision(prev)
    return results


def all_models_pass():
    """True iff every ported model reproduces its golden output."""
    return all(self_check().values())
