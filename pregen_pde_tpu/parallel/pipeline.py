"""Pipeline parallelism — GPipe-style microbatch pipeline over a device mesh.

Beyond-reference capability (the reference is data-parallel only, SURVEY
§2.6). TPU-native design: the pipeline is ONE jitted SPMD program —
`shard_map` over a "pp" mesh axis, per-stage parameters held as the leading
axis of a stacked pytree (sharded so each device owns exactly its stage),
activations handed to the next stage with `ppermute` over ICI, and the
schedule expressed as a `lax.scan` over M + P − 1 ticks. Because `ppermute`,
`scan`, and `where` are all differentiable, `jax.grad` of the pipelined loss
IS the pipelined backward pass — no hand-written 1F1B schedule.

Contract: homogeneous stages — `stage_fn(stage_params, x) -> y` with
`y.shape == x.shape` (e.g. the repeated middle blocks of FNO/CNO/scOT) and
`stacked_params` whose leaves have leading dim P (one slice per stage).
Microbatch inputs are replicated across the pipeline group (cheap for PDE
frame batches; shard them over an outer "data" axis for scale).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

__all__ = ["make_pp_mesh", "stack_stage_params", "pipeline_apply"]


def make_pp_mesh(n_stages: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= n_stages
    return Mesh(np.asarray(devices[:n_stages]), ("pp",))


def stack_stage_params(per_stage_params: list):
    """[params_0, ..., params_{P-1}] -> one pytree with leading axis P."""
    return jax.tree_util.tree_map(
        lambda *ls: jnp.stack(ls, axis=0), *per_stage_params
    )


def pipeline_apply(
    stage_fn: Callable,
    mesh: Mesh,
    axis: str = "pp",
) -> Callable:
    """Returns `apply(stacked_params, x_mb) -> y_mb` where
    `x_mb: (M, microbatch, ...)` and `y_mb` has the same shape — the result of
    threading every microbatch through all P stages in pipeline order.
    Differentiable; jit it (or compose into a larger jitted step)."""
    n_stages = mesh.shape[axis]

    def _local(params_blk, x_mb):
        # params_blk: leading dim 1 (this device's stage); x_mb replicated
        params_i = jax.tree_util.tree_map(lambda l: l[0], params_blk)
        m_total = x_mb.shape[0]
        ticks = m_total + n_stages - 1
        i = jax.lax.axis_index(axis)
        fwd_perm = [(j, j + 1) for j in range(n_stages - 1)]

        # initial carries must be typed as device-varying for the scan
        # (their per-tick updates depend on axis_index)
        act0 = jax.lax.pcast(jnp.zeros_like(x_mb[0]), (axis,), to="varying")
        out0 = jax.lax.pcast(jnp.zeros_like(x_mb), (axis,), to="varying")

        def tick(carry, t):
            act, out_buf = carry
            m = t - i  # microbatch index this stage works on at tick t
            # stage 0 ingests a fresh microbatch; others take the carry
            inp = jax.lax.dynamic_index_in_dim(
                x_mb, jnp.clip(t, 0, m_total - 1), keepdims=False
            )
            x_in = jnp.where(i == 0, inp, act)
            y = stage_fn(params_i, x_in)
            valid = (m >= 0) & (m < m_total)
            y = jnp.where(valid, y, jnp.zeros_like(y))
            # last stage banks its finished microbatch
            bank = (i == n_stages - 1) & valid
            out_buf = jax.lax.dynamic_update_index_in_dim(
                out_buf,
                jnp.where(bank, y, jax.lax.dynamic_index_in_dim(
                    out_buf, jnp.clip(m, 0, m_total - 1), keepdims=False)),
                jnp.clip(m, 0, m_total - 1),
                axis=0,
            )
            # hand activations to the next stage over ICI
            act_next = jax.lax.ppermute(y, axis, fwd_perm)
            return (act_next, out_buf), None

        (_, out_buf), _ = jax.lax.scan(
            tick, (act0, out0), jnp.arange(ticks)
        )
        # replicate the last stage's result across the group
        return jax.lax.psum(out_buf, axis) if n_stages > 1 else out_buf

    def apply(stacked_params, x_mb):
        in_specs = (
            jax.tree_util.tree_map(lambda _: P(axis), stacked_params),
            P(),
        )
        fn = shard_map(_local, mesh=mesh, in_specs=in_specs, out_specs=P())
        return fn(stacked_params, x_mb)

    return apply
