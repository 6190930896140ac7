"""FSDP / ZeRO — parameter- and optimizer-state sharding over the data axis.

Beyond-reference capability: SURVEY §2.6 records FSDP/ZeRO as absent upstream
(the reference's only distribution is DDP, `TrainCNO_time_L.py:217-221`; the
SageMaker-MP/bitsandbytes branches in `scOT/trainer.py:79,202-226` are
inherited dead code). TPU-native formulation: FSDP is a *sharding annotation*,
not a wrapper class — each large parameter leaf is sharded on its largest
divisible axis over the SAME mesh axis that shards the batch ("data"), and the
optimizer state inherits the parameter sharding. XLA's SPMD partitioner then
derives exactly the ZeRO schedule — all-gather params for forward/backward,
reduce-scatter gradients, fully sharded optimizer update — over ICI, with no
hand-written collectives.

Stages (`zero_stage`):
  1 — optimizer state sharded, parameters replicated (ZeRO-1): per-device
      memory = P + P/N optimizer moments; cheapest communication.
  3 — parameters AND optimizer state sharded (ZeRO-3 / full FSDP): per-device
      memory = (P + 2P)/N for AdamW; params are all-gathered per use.

Verified bit-comparable to the single-device training step in
`tests/test_fsdp.py` and exercised multi-device in
`__graft_entry__.dryrun_multichip`.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_fsdp_mesh",
    "fsdp_spec",
    "fsdp_sharding",
    "shard_for_fsdp",
    "make_fsdp_train_step",
    "batch_sharding",
]

# Leaves smaller than this stay replicated: sharding tiny tensors buys no
# memory and costs a collective each use.
MIN_SHARD_ELEMS = 1024


def make_fsdp_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D ``Mesh(("data",))`` — FSDP reuses the batch axis (ZeRO is DP with
    sharded state, not a new parallelism dimension)."""
    devices = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), ("data",))


def fsdp_spec(shape, axis_size: int, axis: str = "data",
              min_elems: int = MIN_SHARD_ELEMS) -> P:
    """PartitionSpec sharding the largest divisible axis of `shape`.

    The largest axis gives the best memory split; ties break toward the
    earliest axis (input-channel for Dense kernels — keeps the all-gather of
    a layer's weights contiguous with its use). Leaves with no divisible axis
    or fewer than `min_elems` elements replicate.
    """
    n = int(np.prod(shape)) if shape else 0
    if n < min_elems:
        return P()
    candidates = [i for i, d in enumerate(shape) if d % axis_size == 0 and d >= axis_size]
    if not candidates:
        return P()
    best = max(candidates, key=lambda i: shape[i])
    spec = [None] * len(shape)
    spec[best] = axis
    return P(*spec)


def fsdp_sharding(tree, mesh: Mesh, axis: str = "data",
                  min_elems: int = MIN_SHARD_ELEMS):
    """NamedSharding pytree for `tree` under ZeRO-3 rules."""
    size = mesh.shape[axis]
    return jax.tree_util.tree_map(
        lambda l: NamedSharding(mesh, fsdp_spec(l.shape, size, axis, min_elems)),
        tree,
    )


def replicated_sharding(tree, mesh: Mesh):
    return jax.tree_util.tree_map(lambda _: NamedSharding(mesh, P()), tree)


def batch_sharding(mesh: Mesh, ndim: int, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(*([axis] + [None] * (ndim - 1))))


def shard_for_fsdp(params, opt_state, mesh: Mesh, zero_stage: int = 3,
                   axis: str = "data"):
    """device_put (params, opt_state) under the chosen ZeRO stage; returns
    ((params, opt_state), (param_sharding, opt_sharding)) so the shardings can
    pin the train step's outputs."""
    if zero_stage == 3:
        p_sh = fsdp_sharding(params, mesh, axis)
    elif zero_stage == 1:
        p_sh = replicated_sharding(params, mesh)
    else:
        raise ValueError(f"zero_stage must be 1 or 3, got {zero_stage}")
    o_sh = fsdp_sharding(opt_state, mesh, axis)
    return (
        (jax.device_put(params, p_sh), jax.device_put(opt_state, o_sh)),
        (p_sh, o_sh),
    )


def make_fsdp_train_step(
    loss_fn: Callable[[Any, dict], jax.Array],
    tx,
    param_sharding,
    opt_sharding,
) -> Callable:
    """jit a full (loss, grad, optimizer-update) step with outputs pinned to
    the FSDP shardings — without the pin, XLA may re-replicate updated params
    and silently forfeit the memory savings. `loss_fn(params, batch) ->
    scalar`; batch arrays are expected batch-sharded on axis 0.
    """
    import optax

    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return jax.jit(
        step,
        donate_argnums=(0, 1),
        out_shardings=(param_sharding, opt_sharding, None),
    )
