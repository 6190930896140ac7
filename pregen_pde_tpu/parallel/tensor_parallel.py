"""Tensor parallelism — channel-sharded model weights over a 2-D device mesh.

Beyond-reference capability (the reference is data-parallel only,
`TrainCNO_time_L.py:217-221`, SURVEY §2.6): Megatron-style tensor parallelism
expressed the TPU-native way — weights annotated with `NamedSharding` over the
"model" axis of a ``Mesh(("data", "model"))``, activations batch-sharded over
"data", and XLA's SPMD partitioner inserting the all-gather/reduce-scatter
collectives over ICI. No hand-written communication.

Sharding rule (channel TP): every parameter whose last (output-channel) axis
is divisible by the model-axis size is sharded on that axis — FNO spectral
weights ``(c_in, m1, m2, c_out)`` shard on ``c_out``, Dense kernels
``(c_in, c_out)`` on ``c_out``, biases ``(c,)`` on ``c`` — everything else
(e.g. the final projection head with 3 output channels) stays replicated.
Each layer then computes its local output-channel block from gathered
activations: the Megatron column-parallel scheme, derived by the partitioner
instead of written by hand.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_tp_mesh",
    "channel_sharded_params",
    "make_tp_train_step",
    "shard_params",
    "data_sharding",
]


def make_tp_mesh(n_data: int, n_model: int, devices=None) -> Mesh:
    """2-D ``Mesh(("data", "model"))``. Lay the model axis over the
    fastest-varying (innermost) devices so TP collectives — which fire per
    layer — ride the shortest ICI hops; DP gradient reduction, which fires
    once per step, takes the outer axis."""
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= n_data * n_model, (len(devices), n_data, n_model)
    arr = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def channel_sharded_params(params, mesh: Mesh, axis: str = "model"):
    """NamedSharding pytree for channel TP: shard the trailing axis of every
    leaf that the model-axis size divides; replicate the rest."""
    size = mesh.shape[axis]

    def spec(leaf) -> P:
        if leaf.ndim >= 1 and leaf.shape[-1] % size == 0 and leaf.shape[-1] >= size:
            return P(*([None] * (leaf.ndim - 1) + [axis]))
        return P()

    return jax.tree_util.tree_map(
        lambda l: NamedSharding(mesh, spec(l)), params
    )


def shard_params(params, mesh: Mesh, axis: str = "model"):
    """device_put `params` according to `channel_sharded_params`."""
    return jax.device_put(params, channel_sharded_params(params, mesh, axis))


def make_tp_train_step(
    loss_fn: Callable[[Any, dict], jax.Array],
    tx,
    mesh: Mesh,
) -> Callable:
    """jit a full (loss, grad, optimizer-update) step under the 2-D mesh.
    `loss_fn(params, batch) -> scalar`. Params/opt_state keep their (TP)
    shardings; batch arrays are expected data-sharded on axis 0. XLA inserts
    the per-layer TP collectives and the cross-"data" gradient psum."""

    import optax

    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return jax.jit(step, donate_argnums=(0, 1))


def data_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Batch-axis sharding over "data" for an ndim-rank array."""
    return NamedSharding(mesh, P(*(["data"] + [None] * (ndim - 1))))
