"""2-D steady Darcy flow:  −∇·(a ∇u) = f  on the unit square, u = 0 on ∂Ω
(BASELINE.md config: '2D Darcy steady 421² lognormal GRF').

Matrix-free preconditioned conjugate gradients, fully jit/vmap-able:
the operator is a 5-point flux stencil with harmonic-free face coefficients
(arithmetic face averages), the preconditioner is Jacobi (inverse diagonal).
CG via `jax.lax.while_loop`/fixed-iteration `fori_loop` keeps everything
compiler-friendly (no data-dependent shapes; convergence is monitored but the
trip count is static — the TPU-idiomatic choice).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DarcyConfig:
    resolution: int = 128  # interior grid (north star: up to 421)
    length: float = 1.0
    source: float = 1.0  # constant f (classic FNO Darcy: f ≡ 1)
    cg_iters: int = 500
    tol: float = 1e-8


def _shift_edge(a: jax.Array, axis: int, direction: int) -> jax.Array:
    if axis == 0:
        if direction > 0:
            return jnp.pad(a, ((0, 1), (0, 0)), mode="edge")[1:, :]
        return jnp.pad(a, ((1, 0), (0, 0)), mode="edge")[:-1, :]
    if direction > 0:
        return jnp.pad(a, ((0, 0), (0, 1)), mode="edge")[:, 1:]
    return jnp.pad(a, ((0, 0), (1, 0)), mode="edge")[:, :-1]


def _face_coeffs(a: jax.Array):
    """Arithmetic face averages; boundary faces replicate the boundary cell's
    coefficient (a periodic roll would couple opposite edges of the domain)."""
    ax_e = 0.5 * (a + _shift_edge(a, 1, +1))  # east faces
    ax_w = 0.5 * (a + _shift_edge(a, 1, -1))  # west
    ay_n = 0.5 * (a + _shift_edge(a, 0, +1))  # north
    ay_s = 0.5 * (a + _shift_edge(a, 0, -1))  # south
    return ax_e, ax_w, ay_n, ay_s


def make_operator(a: jax.Array, dx: float):
    """A(u) = −∇·(a∇u) with homogeneous Dirichlet BCs (ghost value 0)."""
    ax_e, ax_w, ay_n, ay_s = _face_coeffs(a)
    inv_dx2 = 1.0 / (dx * dx)

    def A(u: jax.Array) -> jax.Array:
        u_e = jnp.pad(u, ((0, 0), (0, 1)))[:, 1:]  # east neighbor (0 at bdry)
        u_w = jnp.pad(u, ((0, 0), (1, 0)))[:, :-1]
        u_n = jnp.pad(u, ((0, 1), (0, 0)))[1:, :]
        u_s = jnp.pad(u, ((1, 0), (0, 0)))[:-1, :]
        flux = (
            ax_e * (u_e - u) - ax_w * (u - u_w)
            + ay_n * (u_n - u) - ay_s * (u - u_s)
        )
        return -flux * inv_dx2

    diag = (ax_e + ax_w + ay_n + ay_s) * inv_dx2
    return A, diag


def solve_darcy(a: jax.Array, cfg: DarcyConfig) -> jax.Array:
    """Solve for u given coefficient field a (n, n). vmap over a for batches."""
    n = cfg.resolution
    assert a.shape == (n, n)
    dx = cfg.length / (n + 1)
    A, diag = make_operator(a, dx)
    f = jnp.full((n, n), cfg.source, a.dtype)
    minv = 1.0 / diag

    def body(_, state):
        u, r, z, p, rz = state
        Ap = A(p)
        alpha = rz / (jnp.vdot(p, Ap) + 1e-30)
        u = u + alpha * p
        r = r - alpha * Ap
        z = minv * r
        rz_new = jnp.vdot(r, z)
        beta = rz_new / (rz + 1e-30)
        p = z + beta * p
        return (u, r, z, p, rz_new)

    u0 = jnp.zeros_like(f)
    r0 = f
    z0 = minv * r0
    state = (u0, r0, z0, z0, jnp.vdot(r0, z0))
    u, r, *_ = jax.lax.fori_loop(0, cfg.cg_iters, body, state)
    return u


def residual_norm(a: jax.Array, u: jax.Array, cfg: DarcyConfig) -> jax.Array:
    n = cfg.resolution
    dx = cfg.length / (n + 1)
    A, _ = make_operator(a, dx)
    f = jnp.full((n, n), cfg.source, a.dtype)
    return jnp.linalg.norm(A(u) - f) / jnp.linalg.norm(f)
