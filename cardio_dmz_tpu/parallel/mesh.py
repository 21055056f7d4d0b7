"""Device mesh + sharding utilities.

The reference is single-threaded per frame ("one phone, one frame" —
SURVEY.md §2.6). The TPU-native scale axis is a batch of concurrent camera
streams: shard the stream dimension across chips with a NamedSharding over
a Mesh; XLA inserts any needed collectives over ICI. Parameters are tiny
and replicated; training additionally uses a "model" axis for
tensor-parallel sharding of the wider layers.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(devices=None, model_parallel=1):
    """A (data, model) mesh over the available devices.

    model_parallel=1 gives a pure data-parallel mesh (the right default for
    stream serving: the models are far too small to shard).
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    arr = np.array(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def stream_sharding(mesh):
    """Sharding for a (streams, ...) batch: split streams across DATA."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh):
    return NamedSharding(mesh, P())


def shard_streams(mesh, batch):
    """Device_put a stream-major pytree with the stream axis sharded."""
    return jax.device_put(batch, stream_sharding(mesh))
