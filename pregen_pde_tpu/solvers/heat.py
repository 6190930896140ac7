"""2-D heat / diffusion-reaction transient FD solver, 128² periodic
(BASELINE.md config: '2D heat/diffusion-reaction FD 128² periodic').

    u_t = D Δu + R(u),  R(u) = k·u(1−u²)  (Allen-Cahn-type reaction, matching
    the reference's reaction-diffusion problem family,
    `scOT/problems/reaction_diffusion/allen_cahn.py`)

Two equivalent compute paths:
- XLA: 5-point Laplacian via `jnp.roll` — fuses into one elementwise kernel;
- Pallas: an explicit VMEM-tiled stencil kernel (`pregen_pde_tpu.ops.stencil`)
  — the hand-written path for when the rolled version's HBM traffic shows up
  in profiles.

RK2 (Heun) time stepping; periodic BCs.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class HeatConfig:
    resolution: int = 128
    diffusivity: float = 1e-2
    reaction: float = 0.0  # k in k·u(1−u²); 0 → pure heat
    length: float = 1.0
    dt: float = 1e-4
    t_end: float = 1.0
    n_snapshots: int = 20


def laplacian_roll(u: jax.Array, dx: float) -> jax.Array:
    """5-point periodic Laplacian via rolls (XLA fuses this fully)."""
    return (
        jnp.roll(u, 1, -1) + jnp.roll(u, -1, -1)
        + jnp.roll(u, 1, -2) + jnp.roll(u, -1, -2)
        - 4.0 * u
    ) / (dx * dx)


@dataclasses.dataclass(frozen=True)
class HeatSolver:
    cfg: HeatConfig
    use_pallas: bool = False

    def _lap(self, u: jax.Array) -> jax.Array:
        dx = self.cfg.length / self.cfg.resolution
        if self.use_pallas:
            from pregen_pde_tpu.ops.stencil import laplacian_pallas

            return laplacian_pallas(u, dx)
        return laplacian_roll(u, dx)

    def rhs(self, u: jax.Array) -> jax.Array:
        out = self.cfg.diffusivity * self._lap(u)
        if self.cfg.reaction != 0.0:
            out = out + self.cfg.reaction * u * (1.0 - u * u)
        return out

    def step_heun(self, u: jax.Array, dt) -> jax.Array:
        k1 = self.rhs(u)
        k2 = self.rhs(u + dt * k1)
        return u + 0.5 * dt * (k1 + k2)

    def make_trajectory_fn(self):
        cfg = self.cfg
        total = int(round(cfg.t_end / cfg.dt))
        inner = max(total // cfg.n_snapshots, 1)

        def traj(u0: jax.Array) -> jax.Array:
            dt = jnp.asarray(cfg.dt, u0.dtype)

            def body(u, _):
                u = jax.lax.fori_loop(0, inner, lambda i, v: self.step_heun(v, dt), u)
                return u, u

            _, snaps = jax.lax.scan(body, u0, None, length=cfg.n_snapshots)
            return jnp.concatenate([u0[None], snaps], axis=0)

        return traj

    def make_batched_trajectory_fn(self):
        return jax.vmap(self.make_trajectory_fn())
