"""Fused Pallas stepper for the masked-geometry projection solver.

Runs the ENTIRE Chorin projection step of `ns_projection.ProjectionSolver`
— upwind predictor, Brinkman penalization, boundary conditions, flux-form
divergence (with the inlet-flux correction), exact DCT eigen pressure
solve, velocity correction — inside one VMEM-resident kernel per
trajectory. At 128² the whole state (u, v, p) is 192 KB; the XLA lowering
is HBM-pass-bound (~30 array passes/step), this kernel makes one HBM write
per snapshot. The DCT transforms are the same matmul-transform-in-VMEM
pattern as `spectral_ns_pallas` (4 (n,n)x(n,n) MXU matmuls per step,
HIGHEST precision — the pressure solve sets the divergence floor).

Boundary handling: edge-replicated / zero-ghost shifts are `pltpu.roll`
plus a one-line `where` on the boundary lane/sublane (a periodic roll alone
would wrap the lid/inlet to the opposite wall).

Semantics match `ProjectionSolver.step` + `make_trajectory_fn` exactly
(same operator order, BC sequencing, inlet flux fix, cavity zero-mode
handling); validated against the jnp path in
`tests/test_ns_projection_pallas.py` (interpreter on CPU, compiled on TPU).

Reference capability: the geometry-difficulty data generators
(`dataset_gen/NS_datasets/{FPO_cylinder,LDC}/` — blockMesh + icoFoam per
trajectory; SURVEY.md §2.2).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pregen_pde_tpu.solvers.ns_projection import (
    ProjectionSolver,
    parabolic_inlet,
)

__all__ = ["build_batched_traj", "supported"]


def supported(solver: ProjectionSolver) -> bool:
    n = solver.cfg.resolution
    return (
        solver.cfg.pressure_solver == "direct"
        and n % 128 == 0
        and 128 <= n <= 256
        # the kernel implements muscl (default) and upwind1; the unlimited
        # upwind2 variant exists only on the jnp path
        and solver.cfg.advection in ("muscl", "upwind1")
    )


def build_batched_traj(solver: ProjectionSolver):
    """``traj(masks:(B,n,n), u_max:(B,), inner_steps scalar, dt scalar) ->
    (B, n_snapshots+1, n, n, 3)`` — same contract as
    ``jax.vmap(solver.make_trajectory_fn(), in_axes=(0, 0, None, None))``.
    """
    cfg = solver.cfg
    if not supported(solver):
        raise ValueError(
            "pallas projection stepper requires the direct pressure solver "
            f"and n in {{128, 256}}, got {cfg.pressure_solver!r}/{cfg.resolution}"
        )
    n = cfg.resolution
    dx = cfg.length / n
    nu = float(cfg.viscosity)
    eta = float(cfg.penalization_eta)
    S = int(cfg.n_snapshots)
    channel = cfg.domain == "channel"
    advection = cfg.advection

    cy, ly, cx, lx = ProjectionSolver._eigen_basis(n, cfg.domain)
    denom = (ly[:, None] + lx[None, :]) / (dx * dx)
    if not channel:
        denom = denom.copy()
        denom[0, 0] = 1.0  # cavity zero mode fixed in-kernel
    f32 = lambda a: np.ascontiguousarray(a, np.float32)
    cy, cyT = f32(cy), f32(cy.T)
    cx, cxT = f32(cx), f32(cx.T)
    denom = f32(denom)
    inlet2d = f32(np.broadcast_to(parabolic_inlet(n, 1.0)[:, None], (n, n)))

    def make_kernel(g):
      def kernel(
        inner_ref, dt_ref, umax_ref,
        pen_ref, inlet_ref, cy_ref, cyT_ref, cx_ref, cxT_ref, den_ref,
        out_ref,
        u_sc, v_sc, p_sc,
      ):
        s = pl.program_id(1)
        # g images stacked along the sublane axis; `row` is the row WITHIN
        # the image, so every boundary mask and per-image fix generalizes
        row = jax.lax.broadcasted_iota(jnp.int32, (g * n, n), 0) % n
        col = jax.lax.broadcasted_iota(jnp.int32, (g * n, n), 1)
        dt = dt_ref[0, 0]
        # per-image inlet/lid speed as a (g*n, 1) column (full (B,1) in SMEM)
        b0 = pl.program_id(0) * g
        uscale = jnp.concatenate(
            [jnp.full((n, 1), umax_ref[b0 + im, 0]) for im in range(g)]
        )
        pen = pen_ref[:].reshape(g * n, n)
        inlet = inlet_ref[:] * uscale
        CY, CYT, CX, CXT, DEN = (
            cy_ref[:], cyT_ref[:], cx_ref[:], cxT_ref[:], den_ref[:],
        )

        def shift(q, axis, direction):
            """Edge-replicated neighbor (≡ ProjectionSolver._shift); rolls
            along axis 0 wrap across stacked images, but those rows are
            exactly the per-image boundary rows the mask overwrites."""
            size = g * n if axis == 0 else n
            idx = row if axis == 0 else col
            if direction > 0:
                r = pltpu.roll(q, size - 1, axis)  # r[i] = q[i+1 mod size]
                return jnp.where(idx == n - 1, q, r)
            r = pltpu.roll(q, 1, axis)  # r[i] = q[i-1 mod size]
            return jnp.where(idx == 0, q, r)

        def shift_zero(q, axis):
            """Previous neighbor with a zero ghost at the low edge."""
            idx = row if axis == 0 else col
            return jnp.where(idx == 0, 0.0, pltpu.roll(q, 1, axis))

        def grad_upwind(q, vel, axis):
            fwd = (shift(q, axis, +1) - q) / dx
            bwd = (q - shift(q, axis, -1)) / dx
            return jnp.where(vel > 0, bwd, fwd)

        def grad_muscl(q, vel, axis):
            """≡ ProjectionSolver._grad_muscl (van-Leer-limited MUSCL):
            same edge-replicated shifts, so the boundary slopes vanish and
            the scheme degrades to 1st order there exactly like the jnp
            path. Pure VPU work (adds ~4 rolls + selects per derivative)."""
            a = shift(q, axis, +1) - q
            b = q - shift(q, axis, -1)
            ab = a * b
            slope = jnp.where(ab > 0, 2.0 * ab / jnp.where(ab > 0, a + b, 1.0),
                              0.0)
            s_m1 = shift(slope, axis, -1)
            s_p1 = shift(slope, axis, +1)
            grad_pos = (b + 0.5 * (slope - s_m1)) / dx
            grad_neg = (a - 0.5 * (s_p1 - slope)) / dx
            return jnp.where(vel > 0, grad_pos, grad_neg)

        grad_adv = grad_muscl if advection == "muscl" else grad_upwind

        def laplacian(q):
            return (
                shift(q, 0, +1) + shift(q, 0, -1)
                + shift(q, 1, +1) + shift(q, 1, -1) - 4.0 * q
            ) / (dx * dx)

        def bc(u, v):
            """≡ apply_velocity_bc: same set-order so corners match."""
            if channel:
                u = jnp.where(col == 0, inlet, u)
                v = jnp.where(col == 0, 0.0, v)
                u = jnp.where(col == n - 1, pltpu.roll(u, 1, 1), u)
                v = jnp.where(col == n - 1, pltpu.roll(v, 1, 1), v)
                u = jnp.where(row == 0, 0.0, u)
                v = jnp.where(row == 0, 0.0, v)
                u = jnp.where(row == n - 1, 0.0, u)
                v = jnp.where(row == n - 1, 0.0, v)
            else:
                u = jnp.where(row == 0, 0.0, u)
                v = jnp.where(row == 0, 0.0, v)
                u = jnp.where(col == 0, 0.0, u)
                v = jnp.where(col == 0, 0.0, v)
                u = jnp.where(col == n - 1, 0.0, u)
                v = jnp.where(col == n - 1, 0.0, v)
                u = jnp.where(row == n - 1, uscale, u)
                v = jnp.where(row == n - 1, 0.0, v)
            return u, v

        def Gx(p):
            g = (shift(p, 1, +1) - p) / dx
            if channel:
                g = jnp.where(col == n - 1, -2.0 * p / dx, g)
            return g

        def Gy(p):
            return (shift(p, 0, +1) - p) / dx

        def Dx(u):
            return (u - shift_zero(u, 1)) / dx

        def Dy(v):
            return (v - shift_zero(v, 0)) / dx

        def mm(a, b):
            # Mosaic default = one bf16 MXU pass. HIGHEST's 6-pass lowering
            # inflates the Mosaic compile 22 s → 320 s (measured), so f32
            # accuracy comes from iterative refinement below instead.
            return jnp.dot(a, b, preferred_element_type=jnp.float32)

        def mm_l(mat, x):
            """Left-multiply per stacked image (the right-multiplies act
            row-wise and stay stacked — 2x wider MXU matmuls)."""
            if g == 1:
                return mm(mat, x)
            return jnp.concatenate(
                [mm(mat, x[im * n : (im + 1) * n]) for im in range(g)]
            )

        def mean_per_image(x):
            m3 = jnp.mean(x.reshape(g, n, n), axis=(1, 2), keepdims=True)
            return jnp.broadcast_to(m3, (g, n, n)).reshape(g * n, n)

        def solve_once(rhs):
            rhs_hat = mm_l(CY, mm(rhs, CXT))
            p_hat = rhs_hat / DEN
            if not channel:
                p_hat = jnp.where((row == 0) & (col == 0), 0.0, p_hat)
            return mm_l(CYT, mm(p_hat, CX))

        def poisson_A(p):
            # exact f32 5-point operator −D∘G (pure VPU stencils)
            return -(Dx(Gx(p)) + Dy(Gy(p)))

        def solve_pressure(rhs):
            """bf16 eigen solve + one mixed-precision refinement step: the
            residual is evaluated with the EXACT f32 stencil operator, so
            the bf16 solver error (~1e-3) squares away to ~1e-6 —
            f32-grade pressure at one extra cheap solve, without HIGHEST's
            compile-time blowup."""
            if not channel:
                rhs = rhs - mean_per_image(rhs)
            p = solve_once(rhs)
            r = rhs - poisson_A(p)
            if not channel:
                r = r - mean_per_image(r)
            return p + solve_once(r)

        def step(u, v):
            adv_u = u * grad_adv(u, u, 1) + v * grad_adv(u, v, 0)
            adv_v = u * grad_adv(v, u, 1) + v * grad_adv(v, v, 0)
            u_star = (u + dt * (-adv_u + nu * laplacian(u))) * pen
            v_star = (v + dt * (-adv_v + nu * laplacian(v))) * pen
            u_star, v_star = bc(u_star, v_star)
            div = Dx(u_star) + Dy(v_star)
            if channel:
                # the inlet face carries the prescribed inflow flux
                div = jnp.where(col == 0, div - inlet / dx, div)
            p = solve_pressure(-div / dt)
            u = u_star - dt * Gx(p)
            v = v_star - dt * Gy(p)
            u, v = bc(u, v)
            return u * pen, v * pen, p

        @pl.when(s == 0)
        def _init():
            z = jnp.zeros((g * n, n), jnp.float32)
            u0, v0 = bc(z, z)
            u_sc[:], v_sc[:], p_sc[:] = u0, v0, z

        def body(i, carry):
            u, v, p = step(u_sc[:], v_sc[:])
            u_sc[:], v_sc[:], p_sc[:] = u, v, p
            return carry

        jax.lax.fori_loop(0, inner_ref[0, 0], body, 0, unroll=False)
        out_ref[:, 0, 0] = u_sc[:].reshape(g, n, n)
        out_ref[:, 0, 1] = v_sc[:].reshape(g, n, n)
        out_ref[:, 0, 2] = p_sc[:].reshape(g, n, n)

      return kernel

    smem = lambda: pl.BlockSpec(
        (1, 1), lambda b, s: (0, 0), memory_space=pltpu.SMEM
    )

    def traj(masks: jax.Array, u_max=None, inner_steps=None, dt=None):
        B = masks.shape[0]
        # image grouping (same rule as the spectral kernel: VMEM bounds
        # g·n² ≤ 2·256²) — widens the stacked right-side DCT matmuls
        g_max = max(1, (2 * 256 * 256) // (n * n))
        g = next((gg for gg in (8, 4, 2, 1) if gg <= g_max and B % gg == 0), 1)
        c2d = lambda: pl.BlockSpec(
            (g * n, n), lambda b, s: (0, 0), memory_space=pltpu.VMEM
        )
        cb = pl.BlockSpec(
            (g, n, n), lambda b, s: (b, 0, 0), memory_space=pltpu.VMEM
        )
        tile = lambda a: jnp.tile(jnp.asarray(a), (g, 1))
        cmat = lambda: pl.BlockSpec(
            (n, n), lambda b, s: (0, 0), memory_space=pltpu.VMEM
        )
        if u_max is None:
            u_max = jnp.full((B,), cfg.u_max, jnp.float32)
        u_max = jnp.asarray(u_max, jnp.float32).reshape(B, 1)
        if dt is None:
            dt = cfg.dt
        dt_v = jnp.asarray(dt, jnp.float32).reshape(1, 1)
        if inner_steps is None:
            total = int(round(cfg.t_end / cfg.dt))
            inner_steps = max(total // S, 1)
        inner_v = jnp.asarray(inner_steps, jnp.int32).reshape(1, 1)
        pen = 1.0 / (1.0 + dt_v[0, 0] * masks.astype(jnp.float32) / eta)

        interpret = jax.default_backend() == "cpu"
        extra = (
            {}
            if interpret
            else {
                "compiler_params": pltpu.CompilerParams(
                    dimension_semantics=("arbitrary", "arbitrary"),
                )
            }
        )
        frames = pl.pallas_call(
            make_kernel(g),
            interpret=interpret,
            grid=(B // g, S),
            in_specs=[
                smem(), smem(),
                pl.BlockSpec((B, 1), lambda b, s: (0, 0),
                             memory_space=pltpu.SMEM),
                cb, c2d(), cmat(), cmat(), cmat(), cmat(), c2d(),
            ],
            out_specs=pl.BlockSpec(
                (g, 1, 3, n, n), lambda b, s: (b, s, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((B, S, 3, n, n), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((g * n, n), jnp.float32) for _ in range(3)
            ],
            **extra,
        )(
            inner_v, dt_v, u_max,
            pen, tile(inlet2d), jnp.asarray(cy), jnp.asarray(cyT),
            jnp.asarray(cx), jnp.asarray(cxT), tile(denom),
        )
        frames = jnp.moveaxis(frames, 2, -1)  # (B, S, n, n, 3)
        # initial frame: rest + BCs (≡ make_trajectory_fn's init_frame)
        z = jnp.zeros((B, n, n), jnp.float32)
        u0, v0 = jax.vmap(solver.apply_velocity_bc)(z, z, u_max[:, 0])
        init = jnp.stack([u0, v0, z], axis=-1)[:, None]
        return jnp.concatenate([init, frames], axis=1)

    return traj
