import jax
import jax.numpy as jnp
import numpy as np

from pregen_pde_tpu.core.grid import SpectralGrid2D
from pregen_pde_tpu.fields.grf import grf_2d, lognormal_grf_2d
from pregen_pde_tpu.ops.stencil import heat_step_pallas, laplacian_pallas
from pregen_pde_tpu.solvers.darcy import DarcyConfig, residual_norm, solve_darcy
from pregen_pde_tpu.solvers.heat import HeatConfig, HeatSolver, laplacian_roll


def test_laplacian_of_sine_eigenfunction():
    n = 64
    cfg = HeatConfig(resolution=n, length=1.0)
    x = np.arange(n) / n
    X, Y = np.meshgrid(x, x, indexing="ij")
    u = jnp.asarray(np.sin(2 * np.pi * X) * np.cos(2 * np.pi * Y))
    dx = 1.0 / n
    lap = np.asarray(laplacian_roll(u, dx))
    # discrete eigenvalue per dim: −(2/dx²)(1−cos(2πdx)) ≈ −4π²; u is an
    # eigenfunction of both dims → factor 2
    lam_1d = (2.0 / dx**2) * (1 - np.cos(2 * np.pi * dx))
    np.testing.assert_allclose(lap, -2.0 * lam_1d * np.asarray(u), atol=1e-8)


def test_pallas_laplacian_matches_roll():
    n = 32
    u = jnp.asarray(np.random.default_rng(0).normal(size=(n, n)).astype(np.float32))
    dx = 1.0 / n
    np.testing.assert_allclose(
        np.asarray(laplacian_pallas(u, dx)), np.asarray(laplacian_roll(u, dx)),
        rtol=1e-5, atol=1e-3,
    )


def test_pallas_heat_step_matches_solver():
    cfg = HeatConfig(resolution=32, diffusivity=1e-2, reaction=1.0, dt=1e-4)
    solver = HeatSolver(cfg)
    u = jnp.asarray(np.random.default_rng(1).normal(size=(32, 32)).astype(np.float32))
    ref = np.asarray(solver.step_heun(u, jnp.float32(cfg.dt)))
    pal = np.asarray(
        heat_step_pallas(u, 1.0 / 32, cfg.diffusivity, cfg.dt, cfg.reaction)
    )
    np.testing.assert_allclose(pal, ref, rtol=1e-5, atol=1e-5)


def test_heat_decay_to_mean():
    cfg = HeatConfig(resolution=32, diffusivity=0.05, dt=1e-4, t_end=0.05,
                     n_snapshots=5)
    solver = HeatSolver(cfg)
    g = SpectralGrid2D(32)
    u0 = grf_2d(jax.random.key(0), g, dtype=jnp.float64)
    snaps = np.asarray(solver.make_trajectory_fn()(u0))
    var = snaps.var(axis=(1, 2))
    assert np.all(np.diff(var) < 0)  # diffusion shrinks variance
    np.testing.assert_allclose(snaps.mean(axis=(1, 2)), snaps[0].mean(), atol=1e-10)


def test_heat_analytic_mode_decay():
    n = 64
    D = 1e-2
    cfg = HeatConfig(resolution=n, diffusivity=D, dt=1e-4, t_end=0.1, n_snapshots=2)
    solver = HeatSolver(cfg)
    x = np.arange(n) / n
    X, Y = np.meshgrid(x, x, indexing="ij")
    u0 = jnp.asarray(np.sin(2 * np.pi * X) * np.sin(2 * np.pi * Y))
    snaps = np.asarray(solver.make_trajectory_fn()(u0))
    # FD eigenvalue decay (exact for the discrete operator)
    dx = 1.0 / n
    lam = (2.0 / dx**2) * (1 - np.cos(2 * np.pi * dx)) * 2
    expected = np.asarray(u0) * np.exp(-D * lam * 0.1)
    np.testing.assert_allclose(snaps[-1], expected, atol=2e-5)


def test_darcy_constant_coefficient_analytic():
    """a≡1, f≡1: u is the classic Poisson box solution; check center value
    against the series solution u(0.5,0.5) ≈ 0.07367."""
    n = 64
    cfg = DarcyConfig(resolution=n, cg_iters=800)
    a = jnp.ones((n, n), jnp.float64)
    u = solve_darcy(a, cfg)
    assert float(residual_norm(a, u, cfg)) < 1e-6
    center = float(u[n // 2, n // 2])
    np.testing.assert_allclose(center, 0.07367, rtol=2e-2)


def test_darcy_lognormal_and_batch():
    n = 32
    cfg = DarcyConfig(resolution=n, cg_iters=400)
    g = SpectralGrid2D(n)
    keys = jax.random.split(jax.random.key(0), 3)
    a = jax.vmap(lambda k: lognormal_grf_2d(k, g, dtype=jnp.float64))(keys)
    u = jax.vmap(lambda ai: solve_darcy(ai, cfg))(a)
    assert u.shape == (3, n, n)
    for i in range(3):
        assert float(residual_norm(a[i], u[i], cfg)) < 1e-5
    # maximum principle: u > 0 in the interior for f > 0
    assert float(u.min()) >= 0.0
