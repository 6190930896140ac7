"""Grid-sharded solvers: `shard_map` over spatial tiles with `ppermute` halo
exchange over ICI.

The reference scales only by launching more processes (DP; SURVEY.md §2.6).
This module is the framework's spatial-scaling axis (SURVEY.md §5
'long-context' note: the analogous axis here is sharding the solver grid):
the FD grid's leading axis is sharded over the mesh's `x` axis; each step
exchanges one-row halos with ring neighbors via `jax.lax.ppermute` (pure ICI
traffic, no host involvement), then applies the stencil locally.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


def _ring_perms(n: int, forward: bool):
    if forward:
        return [(i, (i + 1) % n) for i in range(n)]
    return [(i, (i - 1) % n) for i in range(n)]


def make_sharded_heat_step(
    mesh: Mesh,
    axis: str,
    dx: float,
    diffusivity: float,
    dt: float,
    reaction: float = 0.0,
):
    """Returns a jitted Heun step for u_t = D Δu + k u(1−u²) on a periodic
    grid whose ROW axis is sharded over ``mesh[axis]``.

    Each RHS evaluation does one bidirectional halo exchange (top row → next
    device, bottom row → previous device) and a local 5-point stencil — the
    canonical halo pattern that rides ICI neighbor links.
    """
    n_dev = mesh.shape[axis]
    inv_dx2 = 1.0 / (dx * dx)

    def local_rhs(u_local: jax.Array) -> jax.Array:
        # halo exchange: receive the neighbor rows adjacent to our block
        top_halo = jax.lax.ppermute(
            u_local[-1:, :], axis, _ring_perms(n_dev, forward=True)
        )  # previous block's last row → our "above" ghost
        bot_halo = jax.lax.ppermute(
            u_local[:1, :], axis, _ring_perms(n_dev, forward=False)
        )  # next block's first row → our "below" ghost
        padded = jnp.concatenate([top_halo, u_local, bot_halo], axis=0)
        up = padded[:-2, :]
        down = padded[2:, :]
        left = jnp.roll(u_local, 1, axis=1)
        right = jnp.roll(u_local, -1, axis=1)
        lap = (up + down + left + right - 4.0 * u_local) * inv_dx2
        out = diffusivity * lap
        if reaction != 0.0:
            out = out + reaction * u_local * (1.0 - u_local * u_local)
        return out

    @jax.jit
    @partial(shard_map, mesh=mesh, in_specs=P(axis, None),
             out_specs=P(axis, None))
    def step(u_local: jax.Array) -> jax.Array:
        k1 = local_rhs(u_local)
        k2 = local_rhs(u_local + dt * k1)
        return u_local + 0.5 * dt * (k1 + k2)

    return step


def psum_metric(mesh: Mesh, axis: str):
    """Global mean over a grid-sharded field — the metric-reduction collective
    (≡ the reference's `sync_dist=True` all-reduce, `CNO_timeModule_CIN.py:968`)."""

    @jax.jit
    @partial(shard_map, mesh=mesh, in_specs=P(axis, None), out_specs=P())
    def global_mean(u_local):
        s = jnp.sum(u_local)
        n = jnp.asarray(u_local.size, u_local.dtype)
        return jax.lax.psum(s, axis) / jax.lax.psum(n, axis)

    return global_mean
