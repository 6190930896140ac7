import jax
import jax.numpy as jnp
import numpy as np

from pregen_pde_tpu.core.config import NSVorticityConfig
from pregen_pde_tpu.datagen.pipeline import (
    GenerationConfig,
    generate_ns_batch,
    generate_ns_dataset,
)
from pregen_pde_tpu.datagen.writer import ShardWriter, load_shards

SMALL = NSVorticityConfig(
    resolution=32, viscosity=1e-3, dt=1e-3, t_end=0.02, n_snapshots=4,
)


def test_contract_shape_and_channels():
    gen = GenerationConfig(solver=SMALL, batch_size=4, vary_difficulty=False)
    arr = generate_ns_batch(jax.random.key(0), gen, 4)
    assert arr.shape == (4, 5, 32, 32, 6)
    assert arr.dtype == np.float32
    # Re channel constant per trajectory and in [0,1]
    re_ch = arr[..., 3]
    assert np.all((re_ch >= 0) & (re_ch <= 1))
    assert np.allclose(re_ch, re_ch[0, 0, 0, 0])
    # no-hole: mask 0, SDF 1
    np.testing.assert_allclose(arr[..., 4], 0.0)
    np.testing.assert_allclose(arr[..., 5], 1.0, atol=1e-6)
    # velocity fields nontrivial and finite
    assert np.all(np.isfinite(arr))
    assert float(np.abs(arr[..., 0]).max()) > 0


def test_difficulty_bucketing():
    # dt=1.0 so schedule horizons (1100..2700) → 275..675 inner steps; tiny GRF
    # amplitude keeps the (deliberately unphysical) big-dt run in the stable
    # linear regime — this test exercises the bucketing machinery, not physics.
    cfg = NSVorticityConfig(
        resolution=16, viscosity=1e-3, dt=1.0, t_end=20.0, n_snapshots=4,
        forcing="none",
    )
    gen = GenerationConfig(
        solver=cfg, batch_size=8, vary_difficulty=True, grf_sigma=1e-4
    )
    arr = generate_ns_batch(jax.random.key(1), gen, 8)
    assert arr.shape == (8, 5, 16, 16, 6)
    assert np.all(np.isfinite(arr))
    # distinct Re values across trajectories
    re_per_traj = arr[:, 0, 0, 0, 3]
    assert len(np.unique(re_per_traj)) > 1


def test_shard_writer_roundtrip(tmp_path):
    gen = GenerationConfig(solver=SMALL, batch_size=3, vary_difficulty=False)
    w = ShardWriter(tmp_path, prefix="test", fmt="npy")
    generate_ns_dataset(jax.random.key(2), gen, 7, writer=w)
    data = load_shards(tmp_path, prefix="test")
    assert data.shape == (7, 5, 32, 32, 6)
    meta = (tmp_path / "test_meta.json").read_text()
    assert '"n_trajectories": 7' in meta


def test_h5_writer(tmp_path):
    import h5py

    w = ShardWriter(tmp_path, prefix="d", fmt="h5")
    w.write_batch(np.zeros((2, 3, 8, 8, 6), np.float32))
    w.write_batch(np.ones((1, 3, 8, 8, 6), np.float32))
    w.close()
    with h5py.File(tmp_path / "d.h5") as f:
        assert f["data"].shape == (3, 3, 8, 8, 6)
        assert float(f["data"][2].mean()) == 1.0


def test_generation_sharded_over_mesh():
    """Batch generation with the batch axis sharded over the 8-device mesh."""
    from pregen_pde_tpu.parallel.meshes import batch_sharding, make_mesh
    from pregen_pde_tpu.datagen.pipeline import _generate_bucket
    from pregen_pde_tpu.solvers.spectral_ns import NSVorticitySolver

    mesh = make_mesh()
    assert mesh.devices.size == 8
    solver = NSVorticitySolver(SMALL)
    keys = jax.random.split(jax.random.key(0), 16)
    nu = jnp.full((16,), 1e-3, jnp.float32)
    re = jnp.full((16,), 0.5, jnp.float32)
    sharding = batch_sharding(mesh, 1)
    keys = jax.device_put(keys, sharding)
    nu = jax.device_put(nu, sharding)
    re = jax.device_put(re, sharding)
    out = _generate_bucket(keys, nu, re, solver, 5)
    assert out.shape == (16, 5, 32, 32, 6)
    # output keeps the batch axis sharded over 'data'
    assert "data" in str(out.sharding)


def test_pod_scale_generation_with_mesh(tmp_path):
    """BASELINE pod config shape: batch-sharded generation over the full mesh
    streamed to shards."""
    from pregen_pde_tpu.parallel.meshes import make_mesh
    from pregen_pde_tpu.datagen.writer import ShardWriter, load_shards
    from pregen_pde_tpu.datagen.pipeline import generate_ns_dataset

    mesh = make_mesh()
    gen = GenerationConfig(solver=SMALL, batch_size=16, vary_difficulty=False)
    w = ShardWriter(tmp_path, prefix="pod")
    generate_ns_dataset(jax.random.key(0), gen, 32, writer=w, mesh=mesh)
    data = load_shards(tmp_path, prefix="pod")
    assert data.shape == (32, 5, 32, 32, 6)
    assert np.isfinite(data).all()
