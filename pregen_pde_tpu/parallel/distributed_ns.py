"""Grid-sharded pseudo-spectral NS — the pod-scale solver for grids too large
for one chip's HBM (>4k²). Single trajectories shard over the mesh's spatial
axis; everything rides ICI (`all_to_all` pencil transposes inside the
distributed FFT, zero host involvement).

Same math as `solvers.spectral_ns` (packed-FFT CN+Heun IMEX, 2/3 dealiasing);
state lives in the transposed-pencil spectral layout (columns sharded), the
spatial hop for the nonlinear term uses `parallel.distributed_fft`.
Correctness is tested against the single-device solver on the virtual 8-CPU
mesh (`tests/test_grid_shard.py`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pregen_pde_tpu.core.grid import SpectralGrid2D
from pregen_pde_tpu.parallel.distributed_fft import make_distributed_fft2


class DistributedNSVorticitySolver:
    """One trajectory, grid sharded over ``mesh[axis]``.

    API: ``w_hat = to_spectral(w0_rows)`` (row-sharded spatial → sharded
    spectral), ``w_hat = step(w_hat)`` (one CN+Heun step),
    ``w_rows = to_spatial(w_hat)``.
    """

    def __init__(self, mesh: Mesh, axis: str, grid: SpectralGrid2D,
                 viscosity: float, dt: float, forcing: np.ndarray | None = None,
                 dealias: bool = True):
        self.mesh, self.axis, self.grid = mesh, axis, grid
        self.fft2, self.ifft2 = make_distributed_fft2(mesh, axis)
        n = grid.n

        # spectral constants in the transposed-pencil layout: full (n, n)
        # tables column-sharded over the mesh (each device holds its chunk)
        spec_shard = NamedSharding(mesh, P(None, axis))
        put = lambda a: jax.device_put(jnp.asarray(a, jnp.float32), spec_shard)
        self.kx = put(np.broadcast_to(grid.kx_full_deriv, (n, n)))
        self.ky = put(np.broadcast_to(grid.ky_full_deriv, (n, n)))
        self.inv_k2 = put(grid.inv_k2_full)
        self.mask = put(grid.dealias_mask_full if dealias else np.ones((n, n)))
        nu_k2 = viscosity * grid.k2_full
        self.visc_num = put(1.0 - 0.5 * dt * nu_k2)
        self.visc_den = put(1.0 / (1.0 + 0.5 * dt * nu_k2))
        self.dt = dt
        if forcing is not None:
            # transfer REAL and convert on device (complex host→device
            # transfers are unimplemented on tunneled TPU backends)
            f_rows = jax.device_put(
                jnp.asarray(forcing, jnp.float32),
                NamedSharding(mesh, P(axis, None)),
            )
            self.f_hat = self.fft2(f_rows.astype(jnp.complex64))
        else:
            self.f_hat = None

        @jax.jit
        def _rhs(w_hat):
            psi = w_hat * self.inv_k2
            uv = self.ifft2(1j * self.ky * psi + 1j * (-1j * self.kx * psi))
            u, v = jnp.real(uv), jnp.imag(uv)
            wxy = self.ifft2(1j * self.kx * w_hat + 1j * (1j * self.ky * w_hat))
            wx, wy = jnp.real(wxy), jnp.imag(wxy)
            adv_hat = self.fft2((u * wx + v * wy).astype(jnp.complex64))
            out = -adv_hat * self.mask
            if self.f_hat is not None:
                out = out + self.f_hat
            return out

        @jax.jit
        def step(w_hat):
            n1 = _rhs(w_hat)
            pred = (w_hat * self.visc_num + dt * n1) * self.visc_den
            n2 = _rhs(pred)
            return (w_hat * self.visc_num + 0.5 * dt * (n1 + n2)) * self.visc_den

        self.step = step

    def to_spectral(self, w_rows: jax.Array) -> jax.Array:
        return self.fft2(w_rows.astype(jnp.complex64))

    def to_spatial(self, w_hat: jax.Array) -> jax.Array:
        return self.ifft2(w_hat).real
