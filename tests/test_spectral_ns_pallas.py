"""Fused Pallas CN+AB2 stepper vs the jnp packed path.

On CPU the kernel automatically runs through the Pallas interpreter (slow,
so horizons are short) and must reproduce
`_build_traj_packed(scheme="ab2")` to f32 roundoff — the two paths share
scheme, constants, and snapshot cadence; the only difference is the
CT-matmul FFT vs `jnp.fft`. On-chip agreement, throughput, and the fast/
exact precision split are covered by `bench.py` + PERF.md.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pregen_pde_tpu.core.config import NSVorticityConfig
from pregen_pde_tpu.solvers.spectral_ns import NSVorticitySolver
from pregen_pde_tpu.solvers import spectral_ns_pallas as snp


@pytest.mark.parametrize(
    "n,drag,forcing",
    [(128, 0.0, "fno"), (256, 0.1, "none")],
)
def test_pallas_matches_jnp_packed_ab2(n, drag, forcing):
    cfg = NSVorticityConfig(
        resolution=n, viscosity=1e-3, dt=1e-3, t_end=6e-3,
        n_snapshots=3, include_initial=True, forcing=forcing, drag=drag,
    )
    sol = NSVorticitySolver(cfg)
    rng = np.random.default_rng(3)
    # B=4 exercises the image-grouping path (auto g=4 at 128², g=2 at 256²)
    B = 4 if n == 128 else 2
    w0 = jnp.asarray(rng.normal(size=(B, n, n)).astype(np.float32))
    nu = jnp.asarray([1e-3, 2e-3, 3e-3, 4e-3][:B], jnp.float32)
    ref = np.asarray(jax.vmap(sol.make_trajectory_fn_nu("cn_ab2_packed"))(w0, nu))
    got = np.asarray(snp.build_batched_traj(sol)(w0, nu))
    assert got.shape == ref.shape
    err = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
    assert err < 5e-6, err


def test_pallas_traced_inner_steps():
    """One build serves multiple horizon buckets via the SMEM trip count
    (≡ the jnp path's traced inner_steps — the difficulty-schedule
    requirement from `RE_TIME_SCHEDULE`)."""
    n = 128
    cfg = NSVorticityConfig(
        resolution=n, viscosity=1e-3, dt=1e-3, t_end=4e-3,
        n_snapshots=2, include_initial=False, forcing="fno",
    )
    sol = NSVorticitySolver(cfg)
    rng = np.random.default_rng(4)
    w0 = jnp.asarray(rng.normal(size=(1, n, n)).astype(np.float32))
    ref_fn = jax.vmap(sol.make_trajectory_fn_nu("cn_ab2_packed"), in_axes=(0, None, None))
    pal = snp.build_batched_traj(sol)
    for inner in (1, 3):
        ref = np.asarray(ref_fn(w0, 1e-3, jnp.asarray(inner, jnp.int32)))
        got = np.asarray(pal(w0, None, jnp.asarray(inner, jnp.int32)))
        err = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
        assert err < 5e-6, (inner, err)


def test_sharded_traj_on_virtual_mesh():
    """`build_sharded_traj` shards the batch over the mesh `data` axis
    (one kernel instance per device, no collectives) and matches the
    unsharded result."""
    from pregen_pde_tpu.parallel.meshes import make_mesh

    mesh = make_mesh()
    n = 128
    cfg = NSVorticityConfig(
        resolution=n, viscosity=1e-3, dt=1e-3, t_end=2e-3,
        n_snapshots=1, include_initial=True, forcing="fno",
    )
    sol = NSVorticitySolver(cfg)
    rng = np.random.default_rng(5)
    B = len(jax.devices())
    w0 = jnp.asarray(rng.normal(size=(B, n, n)).astype(np.float32))
    nu = jnp.asarray(np.full(B, 1e-3, np.float32))
    ref = np.asarray(snp.build_batched_traj(sol)(w0, nu))
    got = np.asarray(jax.jit(snp.build_sharded_traj(sol, mesh))(w0, nu))
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_supported_and_validation():
    assert snp.supported(256) and snp.supported(128)
    assert not snp.supported(192) and not snp.supported(64) and not snp.supported(512)
    sol = NSVorticitySolver(NSVorticityConfig(resolution=128))
    with pytest.raises(ValueError):
        snp.build_batched_traj(sol, precision="bogus")
    with pytest.raises(ValueError):
        snp.build_batched_traj(NSVorticitySolver(NSVorticityConfig(resolution=96)))


def test_resolve_method_auto_cpu_falls_back():
    from pregen_pde_tpu.datagen.pipeline import resolve_method

    # tests run on CPU → auto must select the jnp path
    assert resolve_method("auto", 256) == "cn_ab2_packed"
    assert resolve_method("cn_heun_packed", 256) == "cn_heun_packed"
