"""Device mesh & sharding utilities.

The TPU-native replacement for the reference's entire distribution layer
(SURVEY.md §2.6): Lightning DDP-over-NCCL (`TrainCNO_time_L.py:217-221`) and HF
Accelerate (`scOT/train.py:123,169`) become a ``jax.sharding.Mesh`` with
batch-axis ``NamedSharding``; gradient all-reduce is inserted by XLA, metric
reduction is a ``psum``; `broadcast_object_list` ≡
``multihost_utils.broadcast_one_to_all``.

Axis convention:
  - ``data``  — trajectory/batch axis (DP; the only axis the reference had)
  - ``x``/``y`` — optional spatial grid axes for grid-sharded solvers (shard_map)
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: Sequence[int] | None = None,
    axis_names: Sequence[str] = ("data",),
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """Build a Mesh. Default: all devices on one ``data`` axis.

    ``shape`` entries of -1 absorb the remaining device count (like reshape).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        shape = [n] + [1] * (len(axis_names) - 1)
    shape = list(shape)
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1]))
        shape[shape.index(-1)] = n // known
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} != device count {n}")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, tuple(axis_names))


def batch_sharding(mesh: Mesh, ndim: int, batch_axis: int = 0) -> NamedSharding:
    """NamedSharding that shards dim `batch_axis` over the mesh ``data`` axis."""
    spec = [None] * ndim
    spec[batch_axis] = "data"
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(tree, mesh: Mesh, batch_axis: int = 0):
    """Place every array leaf with its batch axis sharded over ``data``."""

    def place(x):
        return jax.device_put(x, batch_sharding(mesh, x.ndim, batch_axis))

    return jax.tree_util.tree_map(place, tree)
