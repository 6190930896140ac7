"""Validation tests for the masked-geometry projection solver: lid-driven
cavity against the Ghia tables, cylinder vortex-shedding Strouhal/drag,
grid-convergence order, channel mass conservation, and obstacle
penalization (SURVEY.md §7.3(2): validated, not bit-matched; the
quantitative benchmarks replace the reference's body-fitted icoFoam ground
truth, `FPO_cylinder/Regular/main.py:129-151`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pregen_pde_tpu.fields.geometry import disk_mask, no_hole_mask
from pregen_pde_tpu.solvers.ns_projection import (
    ProjectionConfig,
    ProjectionSolver,
    parabolic_inlet,
)


def test_parabolic_inlet_profile():
    prof = parabolic_inlet(64, u_max=2.0)
    assert prof.shape == (64,)
    assert abs(prof.max() - 2.0) < 0.01  # peak at centre
    assert prof[0] < 0.15 and prof[-1] < 0.15  # ~0 at walls
    np.testing.assert_allclose(prof, prof[::-1], atol=1e-6)  # symmetric


def test_cavity_reaches_reasonable_flow():
    """Re = U L / ν = 1·1/0.01 = 100 lid-driven cavity."""
    cfg = ProjectionConfig(
        resolution=64, length=1.0, viscosity=0.01, domain="cavity", u_max=1.0,
        dt=2e-3, t_end=5.0, n_snapshots=5, cg_iters=200,
    )
    solver = ProjectionSolver(cfg)
    frames = solver.make_trajectory_fn()(no_hole_mask(64))
    assert frames.shape == (6, 64, 64, 3)
    u = np.asarray(frames[-1, :, :, 0])
    v = np.asarray(frames[-1, :, :, 1])
    assert np.all(np.isfinite(u)) and np.all(np.isfinite(v))
    # lid row moves with the lid; interior circulates
    np.testing.assert_allclose(u[-1, :], 1.0, atol=1e-6)
    # vertical centerline u-profile: negative backflow near the bottom
    centerline = u[:, 32]
    assert centerline.min() < -0.05  # Ghia Re=100: min ≈ −0.21
    assert centerline.min() > -0.45
    # the projected (D-pair) divergence is small in the interior
    dx = cfg.length / 64
    div = np.asarray(
        solver.divergence(
            jnp.asarray(frames[-1, :, :, 0]), jnp.asarray(frames[-1, :, :, 1]), dx
        )
    )
    assert np.abs(div[2:-2, 2:-2]).max() < 0.5


def test_channel_mass_conservation_and_wake():
    """Channel with a disk obstacle: inflow ≈ outflow, dead fluid in the hole."""
    cfg = ProjectionConfig(
        resolution=64, length=2.0, viscosity=0.005, domain="channel", u_max=1.0,
        dt=1e-3, t_end=1.0, n_snapshots=4, cg_iters=200,
    )
    solver = ProjectionSolver(cfg)
    mask = disk_mask(64, 32.0, 16.0, 6.0)
    frames = solver.make_trajectory_fn()(mask)
    u = np.asarray(frames[-1, :, :, 0])
    v = np.asarray(frames[-1, :, :, 1])
    assert np.all(np.isfinite(u))
    # velocity ~0 inside the obstacle (penalized)
    inside = np.asarray(mask) > 0.5
    assert np.abs(u[inside]).max() < 0.05
    # mass conservation: inflow and outflow fluxes agree within 10%
    inflow = u[:, 0].sum()
    outflow = u[:, -2].sum()
    assert inflow > 0
    np.testing.assert_allclose(outflow, inflow, rtol=0.1)
    # wake: streamwise velocity right behind the obstacle is below free stream
    wake = u[30:34, 26:30].mean()
    free = u[8:12, 26:30].mean()
    assert wake < free


def test_batched_masks():
    cfg = ProjectionConfig(
        resolution=32, length=1.0, viscosity=0.01, domain="channel", u_max=1.0,
        dt=2e-3, t_end=0.05, n_snapshots=2, cg_iters=100,
    )
    solver = ProjectionSolver(cfg)
    masks = jnp.stack([no_hole_mask(32), disk_mask(32, 16.0, 8.0, 3.0)])
    frames = solver.make_batched_trajectory_fn()(masks)
    assert frames.shape == (2, 3, 32, 32, 3)
    assert bool(jnp.all(jnp.isfinite(frames)))


@pytest.mark.parametrize("re,tol_u,tol_v", [(100, 0.05, 0.03),
                                            (400, 0.07, 0.06)])
def test_cavity_ghia_tables(re, tol_u, tol_v):
    """Steady lid-driven cavity at 128² vs the Ghia-Ghia-Shin (1982)
    centerline tables: every tabulated station within tol (in lid-speed
    units; measured muscl devs are 0.028/0.010 at Re=100 and 0.048/0.031
    at Re=400 — comfortably under the VERDICT's ≤10% bar), extrema within
    8% relative. The round-3 first-order scheme fails the Re=400 bar
    (u_min −0.271 vs −0.327, 17% off — measured)."""
    from pregen_pde_tpu.solvers.validation import run_cavity

    r = run_cavity(re, n=128)
    assert r["max_abs_dev_u"] < tol_u, r["max_abs_dev_u"]
    assert r["max_abs_dev_v"] < tol_v, r["max_abs_dev_v"]
    for key in ("u_min", "v_min", "v_max"):
        model, ghia = r[f"{key}_model"], r[f"{key}_ghia"]
        assert abs(model - ghia) <= 0.08 * abs(ghia), (key, model, ghia)


def test_cylinder_strouhal_and_drag():
    """FPO cylinder at Re_d=150 (incident centerline velocity): vortex
    shedding must be established (probe amplitude ≫ noise), the Strouhal
    number must land in the literature band (unbounded ≈0.183; measured
    0.171 at 9% blockage), and the mean drag coefficient near the
    literature ≈1.3 (measured 1.22). The round-3 first-order scheme
    measures St=0.129 / amplitude 0.27 — out of band (PERF.md)."""
    from pregen_pde_tpu.solvers.validation import run_cylinder

    r = run_cylinder(150.0, n=128, t_end=80.0)
    assert r["shedding_amplitude"] > 0.2, r
    assert 0.15 < r["strouhal"] < 0.21, r["strouhal"]
    assert 1.0 < r["cd_mean"] < 1.6, r["cd_mean"]


def test_grid_convergence_order():
    """Richardson triplet on the developing cavity flow: the projection
    scheme's observed spatial order (2nd-order interior advection/diffusion
    with 1st-order boundary/penalization treatment → ~1.5 measured)."""
    from pregen_pde_tpu.solvers.validation import convergence_order

    r = convergence_order(ns=(32, 64, 128))
    assert r["order"] > 1.3, r


def test_direct_pressure_solver_exact():
    """DCT eigen-solver inverts the discrete operator to machine precision
    (f64) for both domains."""
    for domain in ("cavity", "channel"):
        cfg = ProjectionConfig(resolution=32, domain=domain)
        solver = ProjectionSolver(cfg)
        dx = cfg.length / 32
        rhs = jnp.asarray(
            np.random.default_rng(0).normal(size=(32, 32)), jnp.float64
        )
        p = solver.solve_pressure_direct(rhs, dx)
        expected = rhs - (jnp.mean(rhs) if domain == "cavity" else 0.0)
        res = solver._poisson_A(p, dx) - expected
        assert float(jnp.abs(res).max()) < 1e-10, domain


def test_projection_divergence_machine_zero():
    """With the exact solver, the post-projection divergence (inlet-aware)
    vanishes to solver precision."""
    cfg = ProjectionConfig(
        resolution=32, length=1.0, viscosity=0.01, domain="channel", u_max=1.0,
        dt=1e-3, t_end=0.05, n_snapshots=1,
    )
    solver = ProjectionSolver(cfg)
    frames = solver.make_trajectory_fn()(no_hole_mask(32))
    u, v = jnp.asarray(frames[-1, :, :, 0]), jnp.asarray(frames[-1, :, :, 1])
    dx = cfg.length / 32
    div = solver.divergence(u, v, dx)
    inlet = jnp.asarray(parabolic_inlet(32, 1.0))
    div = div.at[:, 0].add(-inlet / dx)
    # exactly zero beyond the 2-ring where BC re-imposition perturbs neighbors
    assert float(jnp.abs(np.asarray(div)[2:-2, 2:-2]).max()) < 1e-4
