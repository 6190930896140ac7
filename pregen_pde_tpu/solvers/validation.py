"""Quantitative physical validation of the masked-geometry projection solver
(`solvers/ns_projection.py`) — SURVEY.md §7.3(2): the reference gets its
geometry-difficulty ground truth from body-fitted FVM solves
(`FPO_cylinder/Regular/main.py:129-151`, blockMesh + icoFoam); the regular-
grid Brinkman-penalization replacement must be validated against physics,
not bit-matched. Three classical benchmarks:

1. **Lid-driven cavity vs the Ghia–Ghia–Shin (1982) tables** (Re 100/400):
   steady-state u/v centerline profiles at the 17 tabulated stations.
2. **Circular cylinder vortex shedding**: Strouhal number from the wake
   velocity signal (literature band ≈0.16–0.20 for Re_d 100–200 at small
   blockage) and mean drag coefficient from the Brinkman momentum sink.
3. **Grid-convergence order** on the developing cavity flow (Richardson
   triplet), establishing the scheme's observed spatial order.

`tests/test_ns_projection.py` asserts the tabulated values;
`examples/validate_projection.py` prints the full JSON report (the PERF.md
"projection-solver validation" table).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from pregen_pde_tpu.fields.geometry import disk_mask
from pregen_pde_tpu.solvers.ns_projection import (
    ProjectionConfig,
    ProjectionSolver,
)

# Ghia, Ghia & Shin, J. Comput. Phys. 48 (1982), tables I & II: u along the
# vertical centerline (x=0.5) at stations GHIA_Y, v along the horizontal
# centerline (y=0.5) at stations GHIA_X; lid speed 1, cavity side 1.
GHIA_Y = np.array([0.0000, 0.0547, 0.0625, 0.0703, 0.1016, 0.1719, 0.2813,
                   0.4531, 0.5000, 0.6172, 0.7344, 0.8516, 0.9531, 0.9609,
                   0.9688, 0.9766, 1.0000])
GHIA_U = {
    100: np.array([0.0, -0.03717, -0.04192, -0.04775, -0.06434, -0.10150,
                   -0.15662, -0.21090, -0.20581, -0.13641, 0.00332, 0.23151,
                   0.68717, 0.73722, 0.78871, 0.84123, 1.0]),
    400: np.array([0.0, -0.08186, -0.09266, -0.10338, -0.14612, -0.24299,
                   -0.32726, -0.17119, -0.11477, 0.02135, 0.16256, 0.29093,
                   0.55892, 0.61756, 0.68439, 0.75837, 1.0]),
}
GHIA_X = np.array([0.0000, 0.0625, 0.0703, 0.0781, 0.0938, 0.1563, 0.2266,
                   0.2344, 0.5000, 0.8047, 0.8594, 0.9063, 0.9453, 0.9531,
                   0.9609, 0.9688, 1.0000])
GHIA_V = {
    100: np.array([0.0, 0.09233, 0.10091, 0.10890, 0.12317, 0.16077, 0.17507,
                   0.17527, 0.05454, -0.24533, -0.22445, -0.16914, -0.10313,
                   -0.08864, -0.07391, -0.05906, 0.0]),
    400: np.array([0.0, 0.18360, 0.19713, 0.20920, 0.22965, 0.28124, 0.30203,
                   0.30174, 0.05186, -0.38598, -0.44993, -0.33827, -0.22847,
                   -0.19254, -0.15663, -0.12146, 0.0]),
}


def _cavity_solver(re: float, n: int, advection: str) -> tuple:
    nu = 1.0 / re
    cfg = ProjectionConfig(resolution=n, length=1.0, viscosity=nu,
                           domain="cavity", u_max=1.0,
                           pressure_solver="direct", advection=advection)
    dx = 1.0 / n
    dt = min(0.4 * dx / 2.0, 0.2 * dx * dx / nu)
    return ProjectionSolver(cfg), dx, dt


def run_cavity(re: float, n: int = 128, advection: str = "muscl",
               t_end: float | None = None, steady_tol: float = 1e-6) -> dict:
    """Integrate the lid-driven cavity to steady state; → centerline profiles
    interpolated to the Ghia stations + per-point deviations."""
    sol, dx, dt = _cavity_solver(re, n, advection)
    t_end = t_end or (30.0 if re <= 100 else 50.0)
    steps = int(t_end / dt)
    mask = jnp.zeros((n, n), jnp.float32)

    @jax.jit
    def chunk(u, v, p):
        def one(i, s):
            return sol.step(s[0], s[1], mask, dx, jnp.float32(dt), 1.0,
                            p_prev=s[2])

        return jax.lax.fori_loop(0, 1000, one, (u, v, p))

    u = jnp.zeros((n, n), jnp.float32)
    v = jnp.zeros((n, n), jnp.float32)
    u, v = sol.apply_velocity_bc(u, v, 1.0)
    p = jnp.zeros((n, n), jnp.float32)
    for _ in range(max(steps // 1000, 1)):
        u_old = u
        u, v, p = chunk(u, v, p)
        if float(jnp.max(jnp.abs(u - u_old))) < steady_tol:
            break

    u = np.asarray(u)
    v = np.asarray(v)
    yc = (np.arange(n) + 0.5) / n
    u_c = 0.5 * (u[:, n // 2 - 1] + u[:, n // 2])
    v_c = 0.5 * (v[n // 2 - 1, :] + v[n // 2, :])
    u_i = np.interp(GHIA_Y, np.r_[0, yc, 1], np.r_[0, u_c, 1.0])
    v_i = np.interp(GHIA_X, np.r_[0, yc, 1], np.r_[0, v_c, 0.0])
    gu, gv = GHIA_U[int(re)], GHIA_V[int(re)]
    return {
        "Re": re, "n": n, "advection": advection,
        "u_model": u_i, "v_model": v_i, "u_ghia": gu, "v_ghia": gv,
        "max_abs_dev_u": float(np.max(np.abs(u_i - gu))),
        "max_abs_dev_v": float(np.max(np.abs(v_i - gv))),
        "u_min_model": float(u_c.min()), "u_min_ghia": float(gu.min()),
        "v_min_model": float(v_c.min()), "v_min_ghia": float(gv.min()),
        "v_max_model": float(v_c.max()), "v_max_ghia": float(gv.max()),
    }


def run_cylinder(re_d: float = 150.0, n: int = 128, advection: str = "muscl",
                 t_end: float = 80.0, diameter_cells: int = 12,
                 u_max: float = 1.0) -> dict:
    """Flow past a penalized circular cylinder in the FPO channel: vortex-
    shedding Strouhal number from the wake v-velocity probe and the mean
    drag coefficient from the Brinkman momentum sink.

    Definitions use the INCIDENT velocity: the cylinder sits at the channel
    centerline where the parabolic profile is ≈ u_max (it varies < 1.5%
    over the cylinder height), so Re_d = u_max·d/ν, St = f·d/u_max, and
    Cd = 2·F_x/(u_max²·d) with F_x = Σ χ·u/η·dx² (the implicit
    penalization removes (χ/η)·u_after per unit time — exactly the drag on
    the body). Blockage d/H ≈ 9% raises St/Cd a few % over the unbounded
    values. The cylinder sits one cell off the centerline (the standard
    perturbation that triggers the shedding instability
    deterministically)."""
    length = 2.0
    dx = length / n
    d = diameter_cells * dx
    nu = u_max * d / re_d
    cfg = ProjectionConfig(resolution=n, length=length, viscosity=nu,
                           domain="channel", u_max=u_max,
                           pressure_solver="direct", advection=advection)
    sol = ProjectionSolver(cfg)
    # centre offset by ~1 cell breaks the symmetric (unstable) equilibrium
    mask = disk_mask(n, n / 2.0 + 1.0, n / 4.0, diameter_cells / 2.0)
    dt = 0.3 * dx / (2.0 * u_max)
    steps = int(t_end / dt)
    probe = (n // 2, int(n / 4.0 + 3 * diameter_cells))  # 3 diameters behind
    eta = cfg.penalization_eta

    @jax.jit
    def chunk(u, v, p):
        def one(carry, _):
            u, v, p = carry
            u, v, p = sol.step(u, v, mask, dx, jnp.float32(dt), u_max,
                               p_prev=p)
            drag = jnp.sum(mask * u) / eta * dx * dx
            return (u, v, p), (v[probe], drag)

        return jax.lax.scan(one, (u, v, p), None, length=1000)

    u = jnp.zeros((n, n), jnp.float32)
    v = jnp.zeros((n, n), jnp.float32)
    u, v = sol.apply_velocity_bc(u, v, u_max)
    p = jnp.zeros((n, n), jnp.float32)
    sig, drags = [], []
    for _ in range(steps // 1000):
        (u, v, p), (s, dr) = chunk(u, v, p)
        sig.append(np.asarray(s))
        drags.append(np.asarray(dr))
    sig = np.concatenate(sig)
    drags = np.concatenate(drags)

    # frequency of the established shedding: last 40% of the run
    tail = sig[int(0.6 * len(sig)):]
    tail = tail - tail.mean()
    spec = np.abs(np.fft.rfft(tail))
    freqs = np.fft.rfftfreq(len(tail), d=dt)
    f_shed = float(freqs[1:][np.argmax(spec[1:])])  # skip DC
    cd_tail = drags[int(0.6 * len(drags)):]
    return {
        "re_d": re_d, "n": n, "advection": advection, "diameter": d,
        "strouhal": f_shed * d / u_max,
        "shedding_amplitude": float(tail.std()),
        "cd_mean": float(2.0 * cd_tail.mean() / (u_max**2 * d)),
        "dt": dt, "t_end": t_end,
    }


def convergence_order(re: float = 100.0, t_end: float = 1.0,
                      ns: tuple = (32, 64, 128),
                      advection: str = "muscl") -> dict:
    """Observed spatial order on the developing cavity flow via a Richardson
    triplet: integrate to ``t_end`` at three resolutions with ONE shared
    small dt (time error subdominant), restrict fine → coarse by 2×2 block
    averaging, order = log2(|e_coarse|/|e_fine|)."""
    n0, n1, n2 = ns
    nu = 1.0 / re
    dt = min(0.4 / n2 / 2.0, 0.2 / (n2 * n2) / nu)  # finest grid's bound

    def solve(n):
        cfg = ProjectionConfig(resolution=n, length=1.0, viscosity=nu,
                               domain="cavity", u_max=1.0,
                               pressure_solver="direct", advection=advection)
        sol = ProjectionSolver(cfg)
        dx = 1.0 / n
        steps = int(round(t_end / dt))

        @jax.jit
        def run(u, v, p):
            def one(i, s):
                return sol.step(s[0], s[1], jnp.zeros((n, n), jnp.float32),
                                dx, jnp.float32(dt), 1.0, p_prev=s[2])

            return jax.lax.fori_loop(0, steps, one, (u, v, p))

        u = jnp.zeros((n, n), jnp.float32)
        v = jnp.zeros((n, n), jnp.float32)
        u, v = sol.apply_velocity_bc(u, v, 1.0)
        u, v, p = run(u, v, jnp.zeros((n, n), jnp.float32))
        return np.asarray(u)

    def coarsen(a, factor):
        n = a.shape[0] // factor
        return a.reshape(n, factor, n, factor).mean((1, 3))

    u0, u1, u2 = solve(n0), solve(n1), solve(n2)
    e0 = np.abs(u0 - coarsen(u2, n2 // n0))[1:-1, 1:-1].mean()
    e1 = np.abs(u1 - coarsen(u2, n2 // n1))[1:-1, 1:-1].mean()
    return {"ns": ns, "e_coarse": float(e0), "e_fine": float(e1),
            "order": float(np.log2(e0 / e1)), "advection": advection}
