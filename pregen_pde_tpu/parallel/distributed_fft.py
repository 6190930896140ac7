"""Distributed 2-D FFT via shard_map — the pod-scale grid-sharding axis.

The reference has no spatial scaling at all (SURVEY.md §2.6); its analog of
"sequence parallelism" for this framework is sharding the solver grid
(SURVEY.md §5: 'pod-scale FFTs with psum-based transpose'). The classic
pencil decomposition:

  rows sharded over mesh axis → local FFT along the UNsharded axis
  → `all_to_all` transpose (ICI) → local FFT along the other axis

`distributed_fft2` keeps the result in transposed-sharded layout (standard
for spectral solvers: elementwise spectral work is layout-agnostic), and
`distributed_ifft2` inverts both the transforms and the transpose, so
ifft2(fft2(x)) round-trips exactly.

This is the building block for multi-chip >4k² spectral NS; the current
production solver is single-chip-per-trajectory (batch-parallel), which is
optimal while grids fit in one chip's HBM.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def _local_fft_rows(x, axis_name: str, n_dev: int, inverse: bool):
    """One pencil stage: FFT along axis 1 (local), then all_to_all transpose
    so the other axis becomes local. x_local: (rows_local, n_cols) complex."""
    fft = jnp.fft.ifft if inverse else jnp.fft.fft
    x = fft(x, axis=1)
    rows_local = x.shape[0]
    cols_local = x.shape[1] // n_dev
    # split columns into n_dev chunks → all_to_all → gather rows
    x = x.reshape(rows_local, n_dev, cols_local)
    x = jnp.moveaxis(x, 1, 0)  # (n_dev, rows_local, cols_local)
    x = jax.lax.all_to_all(x, axis_name, split_axis=0, concat_axis=0,
                           tiled=False)
    # now (n_dev, rows_local, cols_local) holds every device's row block of
    # our column chunk → stack into (rows_global=n_dev*rows_local, cols_local)
    # transposed layout: axis 0 is the FORMER column axis? No — we keep
    # (row, col) names: result is (all rows, our cols) = transpose-sharded.
    return x.reshape(n_dev * rows_local, cols_local)


def make_distributed_fft2(mesh: Mesh, axis: str):
    """Returns (fft2, ifft2) over arrays sharded P(axis, None).

    fft2: input (n, n) complex sharded by rows → output sharded by COLUMNS
    (transposed-pencil layout), value equal to jnp.fft.fft2(x).
    ifft2 accepts that layout and returns the row-sharded spatial field.
    """
    n_dev = mesh.shape[axis]

    @jax.jit
    @partial(shard_map, mesh=mesh, in_specs=P(axis, None),
             out_specs=P(None, axis))
    def fft2(x_local):
        # stage 1: FFT along columns-axis (axis 1, local), transpose
        y = _local_fft_rows(x_local, axis, n_dev, inverse=False)
        # y: (n_rows_global, n_cols_local) — FFT along axis 0 is now local
        y = jnp.fft.fft(y, axis=0)
        return y

    @jax.jit
    @partial(shard_map, mesh=mesh, in_specs=P(None, axis),
             out_specs=P(axis, None))
    def ifft2(y_local):
        y = jnp.fft.ifft(y_local, axis=0)
        # inverse transpose: scatter rows back, gather our columns
        rows_global, cols_local = y.shape
        rows_local = rows_global // n_dev
        y = y.reshape(n_dev, rows_local, cols_local)
        y = jax.lax.all_to_all(y, axis, split_axis=0, concat_axis=0,
                               tiled=False)
        # (n_dev, rows_local, cols_local) = our rows' column chunks
        y = jnp.moveaxis(y, 0, 1).reshape(rows_local, n_dev * cols_local)
        return jnp.fft.ifft(y, axis=1)

    return fft2, ifft2


def make_distributed_ns_rhs(mesh: Mesh, axis: str, grid, viscosity: float):
    """Sketch of a grid-sharded spectral NS RHS using the distributed FFT
    (multi-chip solvers become relevant above ~4k² grids; exposed for tests
    and future pod runs)."""
    fft2, ifft2 = make_distributed_fft2(mesh, axis)

    def rhs(w_spatial_sharded):
        w_hat = fft2(w_spatial_sharded.astype(jnp.complex64))
        return ifft2(w_hat).real

    return rhs
