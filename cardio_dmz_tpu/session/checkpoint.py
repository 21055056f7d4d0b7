"""Checkpoint / resume for scanner sessions and model params.

The reference has no checkpointing (sessions last seconds; SURVEY.md §5) —
its closest analogue is ScannerState as explicit resumable state
(scan.h:33-48). Here ScannerState is already a pytree, so sessions are
trivially persistable: save/restore via orbax (production) or a plain npz
fallback. Useful for migrating live stream sessions between hosts and for
elastic serving restarts.
"""

import os

import jax
import numpy as np

from .state import ScannerState, scanner_reset


def _flatten(state):
    leaves, treedef = jax.tree.flatten(state)
    return leaves, treedef


def save_session_npz(path, state):
    """Persist a ScannerState (or a stream-batched one) as .npz."""
    leaves, _ = _flatten(state)
    np.savez_compressed(path, *[np.asarray(l) for l in leaves])


def load_session_npz(path, like=None):
    """Restore a ScannerState saved by save_session_npz. `like` provides the
    treedef (defaults to a fresh single-session state)."""
    if like is None:
        like = scanner_reset()
    _, treedef = _flatten(like)
    with np.load(path) as data:
        leaves = [data[k] for k in data.files]
    return jax.tree.unflatten(treedef, leaves)


def save_session(path, state):
    """Orbax checkpoint (falls back to npz when orbax is unavailable)."""
    try:
        import orbax.checkpoint as ocp
    except ImportError:
        save_session_npz(path + ".npz", state)
        return path + ".npz"
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.abspath(path), state, force=True)
    return path


def load_session(path, like=None):
    if path.endswith(".npz"):
        return load_session_npz(path, like)
    import orbax.checkpoint as ocp
    if like is None:
        like = scanner_reset()
    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(os.path.abspath(path), item=like)
    return jax.tree.map(jax.numpy.asarray, restored)


def save_params(path, params):
    """Persist a model-params pytree (post-training) as .npz per model."""
    flat = {}
    for model, p in params.items():
        for k, v in p.items():
            flat[f"{model}/{k}"] = np.asarray(v)
    np.savez_compressed(path, **flat)


def load_params_npz(path):
    out = {}
    with np.load(path) as data:
        for key in data.files:
            model, k = key.split("/", 1)
            out.setdefault(model, {})[k] = jax.numpy.asarray(data[key])
    return out
