"""1-D viscous Burgers, periodic pseudo-spectral (BASELINE.md config:
ν=0.1, 1024-pt spectral, 2048 GRF ICs).

    u_t + u u_x = ν u_xx,  conservative form: u_t = −∂x(u²/2) + ν u_xx

IMEX: Crank-Nicolson diffusion + Heun advection, 2/3 dealiasing — the same
scheme family as the 2-D NS solver so the two share test oracles.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from pregen_pde_tpu.core.config import BurgersConfig
from pregen_pde_tpu.core.grid import SpectralGrid1D


@dataclasses.dataclass(frozen=True)
class BurgersSolver:
    cfg: BurgersConfig

    @property
    def grid(self) -> SpectralGrid1D:
        return SpectralGrid1D(self.cfg.resolution, self.cfg.length)

    def _nonlinear_hat(self, u_hat: jax.Array) -> jax.Array:
        g = self.grid
        n = g.n
        u = jnp.fft.irfft(u_hat, n=n)
        flux_hat = jnp.fft.rfft(0.5 * u * u)
        k = jnp.asarray(g.k_deriv, dtype=u.dtype)
        return -1j * k * (flux_hat * jnp.asarray(g.dealias_mask, dtype=u.dtype))

    def step_cn_heun(self, u_hat, dt, visc_num, visc_den):
        n1 = self._nonlinear_hat(u_hat)
        u_pred = (u_hat * visc_num + dt * n1) * visc_den
        n2 = self._nonlinear_hat(u_pred)
        return (u_hat * visc_num + 0.5 * dt * (n1 + n2)) * visc_den

    def make_trajectory_fn(self):
        cfg = self.cfg
        g = self.grid
        n = g.n
        total_steps = int(round(cfg.t_end / cfg.dt))
        inner = max(total_steps // cfg.n_snapshots, 1)

        def traj(u0: jax.Array) -> jax.Array:
            real_dtype = u0.dtype
            dt = jnp.asarray(cfg.dt, dtype=real_dtype)
            nu_k2 = cfg.viscosity * g.k**2
            visc_num = jnp.asarray(1.0 - 0.5 * cfg.dt * nu_k2, dtype=real_dtype)
            visc_den = jnp.asarray(1.0 / (1.0 + 0.5 * cfg.dt * nu_k2), dtype=real_dtype)
            u_hat0 = jnp.fft.rfft(u0)

            def snapshot_body(u_hat, _):
                def one(i, uh):
                    return self.step_cn_heun(uh, dt, visc_num, visc_den)

                u_hat = jax.lax.fori_loop(0, inner, one, u_hat)
                return u_hat, jnp.fft.irfft(u_hat, n=n)

            _, snaps = jax.lax.scan(snapshot_body, u_hat0, None, length=cfg.n_snapshots)
            return jnp.concatenate([u0[None], snaps], axis=0)

        return traj

    def make_batched_trajectory_fn(self):
        return jax.vmap(self.make_trajectory_fn())
