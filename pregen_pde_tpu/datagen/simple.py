"""Dataset factories for the remaining BASELINE.md workloads:

- 1-D viscous Burgers (ν=0.1, 1024-pt spectral, GRF ICs) → (N, T, X);
- 2-D heat/diffusion-reaction FD 128² periodic → (N, T, H, W);
- 2-D steady Darcy, lognormal GRF permeability → (N, 2, H, W) [a, u] pairs.

All vmapped single-program batches (same pattern as the NS factory).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pregen_pde_tpu.core.config import BurgersConfig
from pregen_pde_tpu.core.grid import SpectralGrid1D, SpectralGrid2D
from pregen_pde_tpu.fields.grf import grf_1d, grf_2d, lognormal_grf_2d
from pregen_pde_tpu.solvers.burgers import BurgersSolver
from pregen_pde_tpu.solvers.darcy import DarcyConfig, solve_darcy
from pregen_pde_tpu.solvers.heat import HeatConfig, HeatSolver


def _fetch(arr, storage_dtype: str) -> np.ndarray:
    """Cast to the storage dtype ON DEVICE before the host fetch, so
    float16 datasets move half the bytes over the wire (and f64 test runs
    still emit the declared storage dtype)."""
    if str(arr.dtype) != storage_dtype:
        arr = arr.astype(storage_dtype)
    return np.asarray(jax.device_get(arr))


def generate_burgers_batch(
    key: jax.Array, cfg: BurgersConfig, n_traj: int,
    grf_alpha: float = 2.0, grf_tau: float = 5.0,
    storage_dtype: str = "float32",
) -> np.ndarray:
    solver = BurgersSolver(cfg)
    keys = jax.random.split(key, n_traj)
    u0 = jax.jit(jax.vmap(
        lambda k: grf_1d(k, solver.grid, alpha=grf_alpha, tau=grf_tau)
    ))(keys)
    traj = jax.jit(solver.make_batched_trajectory_fn())
    return _fetch(traj(u0), storage_dtype)


def generate_heat_batch(
    key: jax.Array, cfg: HeatConfig, n_traj: int,
    grf_alpha: float = 2.5, grf_tau: float = 7.0,
    storage_dtype: str = "float32",
) -> np.ndarray:
    solver = HeatSolver(cfg)
    grid = SpectralGrid2D(cfg.resolution, cfg.length)
    keys = jax.random.split(key, n_traj)
    u0 = jax.jit(jax.vmap(
        lambda k: grf_2d(k, grid, alpha=grf_alpha, tau=grf_tau)
    ))(keys)
    traj = jax.jit(solver.make_batched_trajectory_fn())
    return _fetch(traj(u0), storage_dtype)


def generate_darcy_batch(
    key: jax.Array, cfg: DarcyConfig, n_traj: int, lognormal: bool = True,
    storage_dtype: str = "float32",
) -> np.ndarray:
    """→ (N, 2, n, n): channel 0 = permeability a, channel 1 = solution u."""
    grid = SpectralGrid2D(cfg.resolution, cfg.length)
    keys = jax.random.split(key, n_traj)
    if lognormal:
        a = jax.vmap(lambda k: lognormal_grf_2d(k, grid))(keys)
    else:
        from pregen_pde_tpu.fields.grf import piecewise_constant_grf_2d

        a = jax.vmap(lambda k: piecewise_constant_grf_2d(k, grid))(keys)
    u = jax.jit(jax.vmap(lambda ai: solve_darcy(ai, cfg)))(a)
    out = jnp.stack([a, u], axis=1)
    return _fetch(out, storage_dtype)
