"""Multi-device tests on the virtual 8-CPU mesh: grid-sharded stepper equals
the single-device stepper, collectives reduce correctly."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from pregen_pde_tpu.parallel.grid_shard import make_sharded_heat_step, psum_metric
from pregen_pde_tpu.parallel.meshes import make_mesh
from pregen_pde_tpu.solvers.heat import HeatConfig, HeatSolver


def test_sharded_heat_matches_single_device():
    mesh = make_mesh(axis_names=("x",))
    assert mesh.shape["x"] == 8
    n, dx, D, dt, react = 64, 1.0 / 64, 1e-2, 1e-4, 1.0
    u0 = np.random.default_rng(0).normal(size=(n, n)).astype(np.float32)

    sharded_step = make_sharded_heat_step(mesh, "x", dx, D, dt, react)
    u_sh = jax.device_put(jnp.asarray(u0), NamedSharding(mesh, P("x", None)))
    for _ in range(5):
        u_sh = sharded_step(u_sh)

    solver = HeatSolver(HeatConfig(resolution=n, diffusivity=D, reaction=react,
                                   dt=dt))
    u_ref = jnp.asarray(u0)
    for _ in range(5):
        u_ref = solver.step_heun(u_ref, jnp.float32(dt))

    np.testing.assert_allclose(np.asarray(u_sh), np.asarray(u_ref),
                               rtol=1e-5, atol=1e-6)
    # result stays sharded over the mesh
    assert "x" in str(u_sh.sharding)


def test_psum_metric():
    mesh = make_mesh(axis_names=("x",))
    u = jnp.arange(64.0 * 8).reshape(64, 8)
    u_sh = jax.device_put(u, NamedSharding(mesh, P("x", None)))
    gm = psum_metric(mesh, "x")(u_sh)
    np.testing.assert_allclose(float(gm), float(u.mean()), rtol=1e-6)


def test_distributed_fft2_matches_dense():
    from pregen_pde_tpu.parallel.distributed_fft import make_distributed_fft2

    mesh = make_mesh(axis_names=("x",))
    n = 64
    x = (np.random.default_rng(0).normal(size=(n, n))
         + 1j * np.random.default_rng(1).normal(size=(n, n))).astype(np.complex64)
    fft2, ifft2 = make_distributed_fft2(mesh, "x")
    x_sh = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("x", None)))
    y = fft2(x_sh)
    np.testing.assert_allclose(np.asarray(y), np.fft.fft2(x), rtol=2e-4, atol=2e-3)
    # output lives column-sharded (transposed pencil layout)
    assert "x" in str(y.sharding)
    # exact round trip
    back = ifft2(y)
    np.testing.assert_allclose(np.asarray(back), x, rtol=1e-5, atol=1e-5)
    assert "x" in str(back.sharding)


def test_distributed_ns_matches_single_device():
    """Grid-sharded spectral NS step == single-device packed stepper."""
    from pregen_pde_tpu.core.config import NSVorticityConfig
    from pregen_pde_tpu.core.grid import SpectralGrid2D
    from pregen_pde_tpu.fields.grf import grf_2d
    from pregen_pde_tpu.parallel.distributed_ns import DistributedNSVorticitySolver
    from pregen_pde_tpu.solvers.spectral_ns import NSVorticitySolver, make_forcing

    n, nu, dt = 64, 1e-3, 5e-4
    mesh = make_mesh(axis_names=("x",))
    grid = SpectralGrid2D(n, 1.0)
    cfg = NSVorticityConfig(resolution=n, viscosity=nu, dt=dt, t_end=dt * 10,
                            n_snapshots=1, forcing="fno",
                            include_initial=False)
    ref_solver = NSVorticitySolver(cfg)
    forcing = make_forcing(cfg, grid)

    w0 = grf_2d(jax.random.key(0), grid, dtype=jnp.float32)
    ref = np.asarray(ref_solver.make_trajectory_fn("cn_heun_packed")(w0))[-1]

    dsolver = DistributedNSVorticitySolver(mesh, "x", grid, nu, dt, forcing)
    w_rows = jax.device_put(w0, NamedSharding(mesh, P("x", None)))
    w_hat = dsolver.to_spectral(w_rows)
    for _ in range(10):
        w_hat = dsolver.step(w_hat)
    out = np.asarray(dsolver.to_spatial(w_hat))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)
