"""Device mesh construction.

The framework's one communication backend: a `jax.sharding.Mesh` with a
"data" axis (batch / DP — supersedes the reference's nn.DataParallel,
train.py:42) and a "model" axis (tensor parallel over attention heads and
FFN hidden channels).  XLA inserts the all-reduces over ICI; no hand-written
collectives are needed in the training path.
"""

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(data=None, model=1, devices=None):
    """Create a (data, model) mesh.

    data=None uses all remaining devices for data parallelism.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        assert n % model == 0, (n, model)
        data = n // model
    assert data * model <= n, (data, model, n)
    grid = mesh_utils.create_device_mesh(
        (data, model), devices=np.asarray(devices[: data * model])
    )
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh):
    """Leading-axis batch sharding for input arrays."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh):
    return NamedSharding(mesh, P())
