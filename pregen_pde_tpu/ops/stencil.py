"""Pallas TPU stencil kernels for FD solvers.

The hand-written compute path for the FD steppers (BASELINE.json: 'finite-
difference Darcy/heat/Burgers steppers become Pallas stencil kernels'). The
5-point Laplacian kernel tiles the grid into VMEM rows and computes the
periodic stencil with `pltpu.roll` on-chip, so one HBM read and one HBM write
per element per step (the jnp.roll formulation can re-read neighbors from HBM
when XLA's fusion decides against keeping 5 shifted copies live).

Falls back to interpreter mode automatically off-TPU (CPU tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def _lap_kernel(u_ref, out_ref, *, inv_dx2: float):
    # pltpu.roll requires non-negative shifts: shift by n-1 ≡ -1 (periodic)
    u = u_ref[:]
    n0, n1 = u.shape
    up = pltpu.roll(u, 1, 0)
    down = pltpu.roll(u, n0 - 1, 0)
    left = pltpu.roll(u, 1, 1)
    right = pltpu.roll(u, n1 - 1, 1)
    out_ref[:] = (up + down + left + right - 4.0 * u) * inv_dx2


@functools.partial(jax.jit, static_argnames=("dx",))
def laplacian_pallas(u: jax.Array, dx: float) -> jax.Array:
    """Periodic 5-point Laplacian of a (n, n) float32 field.

    Whole-array VMEM kernel: a 128²-512² float32 grid fits comfortably in the
    ~16 MB of VMEM, so no grid tiling is needed; `pltpu.roll` performs the
    periodic shifts on-chip.
    """
    assert u.ndim == 2
    inv_dx2 = 1.0 / (dx * dx)
    return pl.pallas_call(
        functools.partial(_lap_kernel, inv_dx2=inv_dx2),
        out_shape=jax.ShapeDtypeStruct(u.shape, u.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=not _on_tpu(),
    )(u)


def _heat_step_kernel(u_ref, out_ref, *, inv_dx2: float, diff: float, dt: float,
                      react: float):
    """Fused Heun step for u_t = D Δu + k u(1−u²): both RHS evaluations and
    the update in one VMEM-resident kernel (zero intermediate HBM traffic)."""

    def rhs(u):
        n0, n1 = u.shape
        lap = (
            pltpu.roll(u, 1, 0) + pltpu.roll(u, n0 - 1, 0)
            + pltpu.roll(u, 1, 1) + pltpu.roll(u, n1 - 1, 1) - 4.0 * u
        ) * inv_dx2
        out = diff * lap
        if react != 0.0:
            out = out + react * u * (1.0 - u * u)
        return out

    u = u_ref[:]
    k1 = rhs(u)
    k2 = rhs(u + dt * k1)
    out_ref[:] = u + 0.5 * dt * (k1 + k2)


@functools.partial(jax.jit, static_argnames=("dx", "diffusivity", "dt", "reaction"))
def heat_step_pallas(
    u: jax.Array, dx: float, diffusivity: float, dt: float, reaction: float = 0.0
) -> jax.Array:
    """One fused Heun step of the heat/diffusion-reaction equation."""
    assert u.ndim == 2
    return pl.pallas_call(
        functools.partial(
            _heat_step_kernel,
            inv_dx2=1.0 / (dx * dx),
            diff=diffusivity,
            dt=dt,
            react=reaction,
        ),
        out_shape=jax.ShapeDtypeStruct(u.shape, u.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=not _on_tpu(),
    )(u)
