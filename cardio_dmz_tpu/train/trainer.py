"""Training for the tiny scan models — a capability the reference lacks
in-repo (its models came from offline Theano runs; SURVEY.md §2.3).

TPU-first shape: the train step is jitted over a (data, model) mesh with
the batch sharded on DATA and the wider weight matrices sharded on MODEL
(tensor parallel); XLA's SPMD partitioner inserts the gradient
all-reduces over ICI. For these model sizes a single chip is plenty — the
sharding spec exists so the same code scales and so the multi-chip path is
exercised by the driver's dry run.
"""

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models.zoo import apply_expiry_conv, apply_pan_conv, apply_mlp
from ..parallel.mesh import DATA_AXIS, MODEL_AXIS


def init_pan_conv_params(key):
    """Fresh PAN digit conv params (27x19 -> 8@3x3 -> 320 -> 32 -> 10)."""
    k1, k2, k3 = jax.random.split(key, 3)
    glorot = jax.nn.initializers.glorot_uniform()
    return {
        "conv_w": glorot(k1, (8, 3, 3), jnp.float32) * 3.0,
        "conv_b": jnp.zeros((8,), jnp.float32),
        "hidden_w": glorot(k2, (32, 320), jnp.float32),
        "hidden_b": jnp.zeros((32,), jnp.float32),
        "logistic_w": glorot(k3, (10, 32), jnp.float32),
        "logistic_b": jnp.zeros((10,), jnp.float32),
    }


def init_mlp_params(key, n_in, n_hidden, n_out):
    k1, k2 = jax.random.split(key)
    glorot = jax.nn.initializers.glorot_uniform()
    return {
        "hidden_w": glorot(k1, (n_hidden, n_in), jnp.float32),
        "hidden_b": jnp.zeros((n_hidden,), jnp.float32),
        "logistic_w": glorot(k2, (n_out, n_hidden), jnp.float32),
        "logistic_b": jnp.zeros((n_out,), jnp.float32),
    }


def init_expiry_conv_params(key):
    """Fresh expiry digit conv params — the modelc_bf4dd6c8 architecture
    (16x11 mean-sub -> 50@5x5 + 2x2 pool -> 40@5x5 + 2x3 pool -> 176 ReLU
    -> 10 softmax, expiry_categorization.md:82-88)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    glorot = jax.nn.initializers.glorot_uniform()
    return {
        "conv1_w": glorot(k1, (50, 5, 5), jnp.float32) * 2.0,
        "conv1_b": jnp.zeros((50,), jnp.float32),
        "conv2_w": glorot(k2, (40, 50, 5, 5), jnp.float32),
        "conv2_b": jnp.zeros((40,), jnp.float32),
        "hidden_w": glorot(k3, (176, 120), jnp.float32),
        "hidden_b": jnp.zeros((176,), jnp.float32),
        "logistic_w": glorot(k4, (10, 176), jnp.float32),
        "logistic_b": jnp.zeros((10,), jnp.float32),
    }


def _xent(probs, labels):
    logp = jnp.log(jnp.clip(probs, 1e-12, 1.0))
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1))


def pan_conv_loss(params, cells, labels):
    """cells: (B, 27, 19) f32 [0,1]; labels: (B,) int32."""
    return _xent(apply_pan_conv(params, cells), labels)


def mlp_loss(params, x, labels):
    return _xent(apply_mlp(params, x), labels)


def expiry_conv_loss(params, cells, labels):
    """cells: (B, 16, 11) f32 (prep chain applied); labels: (B,) int32."""
    return _xent(apply_expiry_conv(params, cells), labels)


def param_shardings(params, mesh):
    """Tensor-parallel layout: shard the widest axis of the big matrices
    over MODEL; everything else replicated."""
    def spec(path_key, v):
        name = path_key
        if name == "hidden_w" and v.ndim == 2:
            return P(MODEL_AXIS, None)   # column-parallel hidden layer
        if name == "hidden_b":
            return P(MODEL_AXIS)
        return P()
    return {k: NamedSharding(mesh, spec(k, v)) for k, v in params.items()}


def make_train_step(loss_fn, optimizer, mesh=None, params_template=None):
    """Build a jitted (params, opt_state, batch) -> (params, opt_state,
    loss) step. With a mesh, inputs are expected data-sharded and params
    model-sharded; XLA inserts the collectives."""

    def step(params, opt_state, inputs, labels):
        loss, grads = jax.value_and_grad(loss_fn)(params, inputs, labels)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    if mesh is None:
        return jax.jit(step)

    p_sh = param_shardings(params_template, mesh)
    d_sh = NamedSharding(mesh, P(DATA_AXIS))
    r_sh = NamedSharding(mesh, P())
    return jax.jit(
        step,
        in_shardings=(p_sh, None, d_sh, d_sh),
        out_shardings=(p_sh, None, r_sh),
    )


def fit(loss_fn, params, data_iter, *, steps=100, learning_rate=1e-3,
        mesh=None, log_every=0):
    """Minimal fit loop. data_iter yields (inputs, labels) numpy batches."""
    optimizer = optax.adam(learning_rate)
    opt_state = optimizer.init(params)
    step = make_train_step(loss_fn, optimizer, mesh=mesh,
                           params_template=params)
    if mesh is not None:
        params = jax.device_put(params, param_shardings(params, mesh))
        d_sh = NamedSharding(mesh, P(DATA_AXIS))
    losses = []
    for i in range(steps):
        inputs, labels = next(data_iter)
        if mesh is not None:
            inputs = jax.device_put(jnp.asarray(inputs), d_sh)
            labels = jax.device_put(jnp.asarray(labels), d_sh)
        params, opt_state, loss = step(params, opt_state, inputs, labels)
        losses.append(float(loss))
        if log_every and (i + 1) % log_every == 0:
            print(f"step {i + 1}: loss {losses[-1]:.4f}")
    return params, losses
