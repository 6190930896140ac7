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
