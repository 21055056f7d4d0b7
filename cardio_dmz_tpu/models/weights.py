"""Loading of the ported model weights.

Weights were extracted from the reference's generated C++ hex blobs by
tools/extract_weights.py (data only; see that tool's docstring) and are
stored as .npz in this package. Loaded as float32 jnp arrays.
"""

import functools
import os

import jax.numpy as jnp
import numpy as np

_PARAM_DIR = os.path.join(os.path.dirname(__file__), "params")

MODEL_NAMES = (
    "vseg_mlp", "slash_mlp", "pan_conv_a", "pan_conv_b", "pan_conv_c",
    "expiry_conv",
)


@functools.lru_cache(maxsize=None)
def _load_np(name):
    path = os.path.join(_PARAM_DIR, f"{name}.npz")
    with np.load(path) as data:
        return {k: np.asarray(v) for k, v in data.items()}


def load_params(name, include_test_vectors=False):
    """Load one model's parameters as a dict of jnp float32 arrays."""
    raw = _load_np(name)
    out = {}
    for k, v in raw.items():
        if not include_test_vectors and k.startswith("test_"):
            continue
        out[k] = jnp.asarray(v, jnp.float32)
    return out


def load_all_params():
    """All model params keyed by model name — the pipeline's `params` pytree."""
    return {name: load_params(name) for name in MODEL_NAMES}
