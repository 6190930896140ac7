"""Masked-geometry incompressible Navier-Stokes on a regular grid —
the TPU-native replacement for the reference's body-fitted OpenFOAM FPO/LDC
pipelines (`dataset_gen/NS_datasets/{FPO_cylinder,LDC}/`).

Where the reference meshes each random geometry with `blockMesh` and runs
`icoFoam` per trajectory (`Hole_Location/main.py:590-876`,
`Regular/main.py:129-151`), here obstacles live on the fixed grid as a
Brinkman volume-penalization mask χ (1 = solid):

    u_t + (u·∇)u = −∇p + ν Δu − (χ/η) u,     ∇·u = 0

Chorin projection each step: explicit advection (first-order upwind — the
regular-grid counterpart of icoFoam's `linearUpwind` divScheme,
`fvSchemes:17-40`) + central diffusion → implicit penalization
u/(1+dt·χ/η) → boundary conditions → pressure Poisson (matrix-free Jacobi-CG,
static trip count) → velocity correction.

Domains (reference BCs):
- "channel" (FPO): parabolic inlet left with Umax = Re·ν/L
  (`Regular/main.py:389-408,491-518`), zero-gradient outflow right, no-slip
  top/bottom walls + holes (`Regular/Design_Point_0/0/U:12-38`);
- "cavity" (LDC): moving lid top (Umax), no-slip elsewhere
  (`LDC/.../0/U:21-36`).

Correctness here is *validated* (divergence, mass conservation, Ghia-style
cavity profiles), not bit-matched to the FVM solver — SURVEY.md §7.3(2).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ProjectionConfig:
    resolution: int = 128
    length: float = 2.0  # reference L = 2 m (`Regular/main.py:981-982`)
    viscosity: float = 1.5e-5  # reference ν (`transportProperties`)
    domain: str = "channel"  # "channel" | "cavity"
    u_max: float = 1.0  # inlet peak / lid speed (set from Re upstream)
    dt: float = 1e-3
    t_end: float = 1.0
    n_snapshots: int = 20
    penalization_eta: float = 1e-3  # Brinkman permeability
    pressure_solver: str = "direct"  # "direct" (DCT eigen-solve) | "cg"
    cg_iters: int = 200
    # advection scheme — the regular-grid counterpart of icoFoam's LIMITED
    # second-order `Gauss linearUpwind` divScheme (`fvSchemes:17-40`):
    # "muscl" (default) = van-Leer-limited MUSCL upwind (2nd order in
    # smooth regions, TVD at extrema); "upwind2" = unlimited Beam-Warming
    # (wiggles at the lid corner singularity — measured bounded limit
    # cycle); "upwind1" = first-order (round ≤3 scheme; its numerical
    # viscosity ~u·dx/2 swamps the physical ν above Re≈250 at 128² and
    # fails the Ghia Re=400 / cylinder-Strouhal validation,
    # tests/test_ns_projection.py).
    advection: str = "muscl"


def parabolic_inlet(n: int, u_max: float) -> np.ndarray:
    """u(y) = 4·Umax·y(H−y)/H² on cell centres (`Regular/main.py:389-408`)."""
    y = (np.arange(n) + 0.5) / n
    return (4.0 * u_max * y * (1.0 - y)).astype(np.float32)


@dataclasses.dataclass(frozen=True)
class ProjectionSolver:
    """State: (u, v) on an (n, n) collocated grid, axis 0 = y, axis 1 = x."""

    cfg: ProjectionConfig

    # -- BCs -----------------------------------------------------------------

    def apply_velocity_bc(self, u: jax.Array, v: jax.Array, u_max=None):
        """Impose BCs; ``u_max`` (traced scalar) overrides cfg.u_max, making
        the inlet/lid speed a per-trajectory vmap axis (physics difficulty)."""
        cfg = self.cfg
        n = cfg.resolution
        if u_max is None:
            u_max = cfg.u_max
        if cfg.domain == "channel":
            inlet = jnp.asarray(parabolic_inlet(n, 1.0), u.dtype) * u_max
            u = u.at[:, 0].set(inlet)  # inlet (left)
            v = v.at[:, 0].set(0.0)
            u = u.at[:, -1].set(u[:, -2])  # outflow: zero gradient
            v = v.at[:, -1].set(v[:, -2])
            u = u.at[0, :].set(0.0)  # bottom wall
            v = v.at[0, :].set(0.0)
            u = u.at[-1, :].set(0.0)  # top wall
            v = v.at[-1, :].set(0.0)
        elif cfg.domain == "cavity":
            u = u.at[0, :].set(0.0)
            v = v.at[0, :].set(0.0)
            u = u.at[:, 0].set(0.0)
            v = v.at[:, 0].set(0.0)
            u = u.at[:, -1].set(0.0)
            v = v.at[:, -1].set(0.0)
            u = u.at[-1, :].set(jnp.broadcast_to(jnp.asarray(u_max, u.dtype), (n,)))  # moving lid
            v = v.at[-1, :].set(0.0)
        else:
            raise ValueError(cfg.domain)
        return u, v

    # -- spatial operators: NON-periodic, edge-padded shifts (a periodic roll
    # would wrap the lid/inlet values to the opposite wall and blow up) -------

    @staticmethod
    def _shift(q: jax.Array, axis: int, direction: int) -> jax.Array:
        """Neighbor value along axis with edge replication at the boundary."""
        if axis == 0:
            if direction > 0:
                return jnp.pad(q, ((0, 1), (0, 0)), mode="edge")[1:, :]
            return jnp.pad(q, ((1, 0), (0, 0)), mode="edge")[:-1, :]
        if direction > 0:
            return jnp.pad(q, ((0, 0), (0, 1)), mode="edge")[:, 1:]
        return jnp.pad(q, ((0, 0), (1, 0)), mode="edge")[:, :-1]

    def _grad_upwind(self, q: jax.Array, vel: jax.Array, axis: int, dx: float):
        """First-order upwind derivative of q along `axis` w.r.t. carrier vel."""
        fwd = (self._shift(q, axis, +1) - q) / dx
        bwd = (q - self._shift(q, axis, -1)) / dx
        return jnp.where(vel > 0, bwd, fwd)

    def _grad_upwind2(self, q: jax.Array, vel: jax.Array, axis: int, dx: float):
        """Second-order upwind (Beam-Warming) derivative, falling back to
        first order on the two cells nearest each boundary (the edge-
        replicated double shift would otherwise corrupt the 3-point stencil
        with a spurious 1.5x factor)."""
        qm1 = self._shift(q, axis, -1)
        qp1 = self._shift(q, axis, +1)
        qm2 = self._shift(qm1, axis, -1)
        qp2 = self._shift(qp1, axis, +1)
        bwd1 = (q - qm1) / dx
        fwd1 = (qp1 - q) / dx
        bwd2 = (3.0 * q - 4.0 * qm1 + qm2) / (2.0 * dx)
        fwd2 = (-3.0 * q + 4.0 * qp1 - qp2) / (2.0 * dx)
        n = q.shape[axis]
        idx = jax.lax.broadcasted_iota(jnp.int32, q.shape, axis)
        bwd = jnp.where(idx >= 2, bwd2, bwd1)
        fwd = jnp.where(idx <= n - 3, fwd2, fwd1)
        return jnp.where(vel > 0, bwd, fwd)

    def _grad_muscl(self, q: jax.Array, vel: jax.Array, axis: int, dx: float):
        """Van-Leer-limited MUSCL upwind derivative: face states are
        reconstructed from limited node slopes, so the scheme is 2nd order
        where the field is smooth and degrades to 1st-order upwind at
        extrema/discontinuities (TVD) — no corner wiggles. Edge-replicated
        shifts make boundary slopes vanish (clean 1st-order fallback)."""
        a = self._shift(q, axis, +1) - q   # forward difference
        b = q - self._shift(q, axis, -1)   # backward difference
        ab = a * b
        slope = jnp.where(ab > 0, 2.0 * ab / jnp.where(ab > 0, a + b, 1.0), 0.0)
        s_m1 = self._shift(slope, axis, -1)
        s_p1 = self._shift(slope, axis, +1)
        # face-state differences: (q^L_{i+1/2} − q^L_{i−1/2})/dx for flow
        # from the left, (q^R_{i+1/2} − q^R_{i−1/2})/dx from the right
        grad_pos = (b + 0.5 * (slope - s_m1)) / dx
        grad_neg = (a - 0.5 * (s_p1 - slope)) / dx
        return jnp.where(vel > 0, grad_pos, grad_neg)

    def _grad_adv(self, q, vel, axis, dx):
        if self.cfg.advection == "muscl":
            return self._grad_muscl(q, vel, axis, dx)
        if self.cfg.advection == "upwind2":
            return self._grad_upwind2(q, vel, axis, dx)
        if self.cfg.advection == "upwind1":
            return self._grad_upwind(q, vel, axis, dx)
        raise ValueError(self.cfg.advection)

    def _laplacian(self, q: jax.Array, dx: float):
        return (
            self._shift(q, 0, +1) + self._shift(q, 0, -1)
            + self._shift(q, 1, +1) + self._shift(q, 1, -1) - 4.0 * q
        ) / (dx * dx)

    def predictor(self, u, v, dx, dt):
        cfg = self.cfg
        adv_u = u * self._grad_adv(u, u, 1, dx) + v * self._grad_adv(u, v, 0, dx)
        adv_v = u * self._grad_adv(v, u, 1, dx) + v * self._grad_adv(v, v, 0, dx)
        u_star = u + dt * (-adv_u + cfg.viscosity * self._laplacian(u, dx))
        v_star = v + dt * (-adv_v + cfg.viscosity * self._laplacian(v, dx))
        return u_star, v_star

    # -- pressure Poisson: adjoint-consistent (D, G) pair ----------------------
    # G = forward difference, D = backward difference. A = −(D∘G) is the exact
    # 5-point Laplacian, so the collocated checkerboard mode is NOT in its
    # null space, and the correction u ← u* − dt·G(p) makes D(u) vanish
    # exactly (up to CG tolerance) — a discrete MAC-like projection.

    def _Gx(self, p: jax.Array, dx: float) -> jax.Array:
        g = (self._shift(p, 1, +1) - p) / dx  # edge pad ⇒ 0 at last col (Neumann)
        if self.cfg.domain == "channel":
            # outlet: p = 0 AT THE FACE (half cell out) → gradient −2p/dx
            g = g.at[:, -1].set(-2.0 * p[:, -1] / dx)
        return g

    def _Gy(self, p: jax.Array, dx: float) -> jax.Array:
        return (self._shift(p, 0, +1) - p) / dx

    @staticmethod
    def _shift_zero(q: jax.Array, axis: int) -> jax.Array:
        """Previous neighbor with a ZERO ghost at the low edge (flux form)."""
        if axis == 0:
            return jnp.pad(q, ((1, 0), (0, 0)))[:-1, :]
        return jnp.pad(q, ((0, 0), (1, 0)))[:, :-1]

    def _Dx(self, u: jax.Array, dx: float) -> jax.Array:
        # zero ghost (boundary face flux = 0), NOT edge replication — edge
        # replication zeroes the boundary row of −D∘G and makes the Poisson
        # system inconsistent (CG then stalls ~300 iters without converging)
        return (u - self._shift_zero(u, 1)) / dx

    def _Dy(self, v: jax.Array, dx: float) -> jax.Array:
        return (v - self._shift_zero(v, 0)) / dx

    def _poisson_A(self, p: jax.Array, dx: float):
        return -(self._Dx(self._Gx(p, dx), dx) + self._Dy(self._Gy(p, dx), dx))

    # -- direct (eigen) pressure solver ----------------------------------------
    # The −D∘G operator is mask-independent and diagonalizes exactly in cosine
    # bases: DCT-II along any Neumann axis, DCT-IV along the channel's mixed
    # Neumann-inlet/Dirichlet-outlet axis (verified in tests against the dense
    # operator). One transform each way = four (n,n)×(n,n) matmuls on the MXU —
    # replaces O(n) Jacobi-CG iterations with an EXACT solve.

    @staticmethod
    @functools.lru_cache(maxsize=8)
    def _eigen_basis(n: int, domain: str):
        j = np.arange(n)
        c2 = np.cos(np.pi * j[:, None] * (j[None, :] + 0.5) / n) * np.sqrt(2.0 / n)
        c2[0] *= np.sqrt(0.5)  # orthonormal DCT-II (rows = eigenvectors)
        lam2 = 2.0 - 2.0 * np.cos(np.pi * j / n)
        if domain == "channel":
            c4 = np.cos(
                np.pi * (j[:, None] + 0.5) * (j[None, :] + 0.5) / n
            ) * np.sqrt(2.0 / n)  # orthonormal symmetric DCT-IV
            lam4 = 2.0 - 2.0 * np.cos(np.pi * (j + 0.5) / n)
            return c2, lam2, c4, lam4  # float64; cast to working dtype at use
        return c2, lam2, c2, lam2

    def solve_pressure_direct(self, rhs: jax.Array, dx: float) -> jax.Array:
        cfg = self.cfg
        n = cfg.resolution
        cy, ly, cx, lx = self._eigen_basis(n, cfg.domain)
        hp = jax.lax.Precision.HIGHEST
        cy_j = jnp.asarray(cy, rhs.dtype)
        cx_j = jnp.asarray(cx, rhs.dtype)
        denom = (
            jnp.asarray(ly, rhs.dtype)[:, None]
            + jnp.asarray(lx, rhs.dtype)[None, :]
        ) / (dx * dx)
        if cfg.domain == "cavity":
            rhs = rhs - jnp.mean(rhs)
            denom = denom.at[0, 0].set(1.0)  # zero mode handled below
        rhs_hat = jnp.matmul(cy_j, jnp.matmul(rhs, cx_j.T, precision=hp),
                             precision=hp)
        p_hat = rhs_hat / denom
        if cfg.domain == "cavity":
            p_hat = p_hat.at[0, 0].set(0.0)
        p = jnp.matmul(cy_j.T, jnp.matmul(p_hat, cx_j, precision=hp),
                       precision=hp)
        return p

    def solve_pressure(self, rhs: jax.Array, dx: float,
                       p_init: jax.Array | None = None) -> jax.Array:
        """Jacobi-preconditioned CG with warm start and tolerance-based exit.

        Warm-starting from the previous step's pressure cuts iterations
        dramatically (consecutive pressure fields are nearly identical); the
        `while_loop` exits once ||r|| ≤ tol·||rhs|| or at cfg.cg_iters. Under
        vmap the loop runs until every batch lane converges — still a large
        saving over a fixed worst-case trip count."""
        cfg = self.cfg
        if cfg.domain == "cavity":
            rhs = rhs - jnp.mean(rhs)  # pure-Neumann compatibility

        def A(p):
            return self._poisson_A(p, dx)

        minv = dx * dx / 4.0
        tol2 = jnp.asarray((1e-4) ** 2, rhs.dtype) * (jnp.vdot(rhs, rhs) + 1e-30)

        p0 = jnp.zeros_like(rhs) if p_init is None else p_init
        r0 = rhs - A(p0)
        z0 = minv * r0

        def cond(state):
            i, p, r, z, d, rz = state
            return (i < cfg.cg_iters) & (jnp.vdot(r, r) > tol2)

        def body(state):
            i, p, r, z, d, rz = state
            Ad = A(d)
            alpha = rz / (jnp.vdot(d, Ad) + 1e-30)
            p = p + alpha * d
            r = r - alpha * Ad
            z = minv * r
            rz_new = jnp.vdot(r, z)
            beta = rz_new / (rz + 1e-30)
            d = z + beta * d
            return (i + 1, p, r, z, d, rz_new)

        _, p, *_ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), p0, r0, z0, z0, jnp.vdot(r0, z0))
        )
        if cfg.domain == "cavity":
            p = p - jnp.mean(p)
        return p

    def divergence(self, u, v, dx):
        """The discrete divergence the projection enforces (D-pair)."""
        return self._Dx(u, dx) + self._Dy(v, dx)

    # -- full step -------------------------------------------------------------

    def step(self, u, v, mask, dx, dt, u_max=None, p_prev=None):
        cfg = self.cfg
        u_star, v_star = self.predictor(u, v, dx, dt)
        # implicit Brinkman penalization
        pen = 1.0 / (1.0 + dt * mask / cfg.penalization_eta)
        u_star = u_star * pen
        v_star = v_star * pen
        u_star, v_star = self.apply_velocity_bc(u_star, v_star, u_max)

        div = self._Dx(u_star, dx) + self._Dy(v_star, dx)
        if cfg.domain == "channel":
            # the inlet face carries the prescribed inflow flux (the flux-form
            # D uses a zero ghost); without this the exact projection forces
            # total outflow to zero and blocks the channel
            um = cfg.u_max if u_max is None else u_max
            inlet = jnp.asarray(parabolic_inlet(cfg.resolution, 1.0),
                                u_star.dtype) * um
            div = div.at[:, 0].add(-inlet / dx)
        rhs = -div / dt
        if cfg.pressure_solver == "direct":
            p = self.solve_pressure_direct(rhs, dx)
        else:
            p = self.solve_pressure(rhs, dx, p_init=p_prev)

        u = u_star - dt * self._Gx(p, dx)
        v = v_star - dt * self._Gy(p, dx)
        u, v = self.apply_velocity_bc(u, v, u_max)
        u = u * pen
        v = v * pen
        return u, v, p

    def make_trajectory_fn(self):
        """traj(mask) → dict of snapshot stacks (u, v, p), each
        (n_snapshots+1, n, n); starts from rest (reference cases start from
        a zero/uniform internal field)."""
        cfg = self.cfg
        n = cfg.resolution
        dx = cfg.length / n
        total = int(round(cfg.t_end / cfg.dt))
        default_inner = max(total // cfg.n_snapshots, 1)

        def traj(mask: jax.Array, u_max=None, inner_steps=None, dt=None):
            # traced ``inner_steps`` and ``dt`` → one compiled program serves
            # every Re-horizon bucket (compile here is minutes-scale on TPU).
            # dt must satisfy the explicit CFL bound — unlike the reference's
            # implicit PISO (icoFoam), Δt=0.2 does NOT transfer; callers pick
            # dt from u_max (see `datagen.masked_ns.cfl_dt`).
            inner = default_inner if inner_steps is None else inner_steps
            dt = jnp.asarray(cfg.dt if dt is None else dt, jnp.float32)
            u = jnp.zeros((n, n), jnp.float32)
            v = jnp.zeros((n, n), jnp.float32)
            u, v = self.apply_velocity_bc(u, v, u_max)
            p = jnp.zeros((n, n), jnp.float32)

            def snap(carry, _):
                u, v, p = carry

                def one(i, s):
                    return self.step(s[0], s[1], mask, dx, dt, u_max, p_prev=s[2])

                u, v, p = jax.lax.fori_loop(0, inner, one, (u, v, p))
                return (u, v, p), jnp.stack([u, v, p], axis=-1)

            init_frame = jnp.stack([u, v, p], axis=-1)
            (_, _, _), frames = jax.lax.scan(
                snap, (u, v, p), None, length=cfg.n_snapshots
            )
            return jnp.concatenate([init_frame[None], frames], axis=0)

        return traj

    def make_batched_trajectory_fn(self):
        return jax.vmap(self.make_trajectory_fn())
