"""Benchmark-loader machinery tested against synthetic HDF5 fixtures (the
real Poseidon files are not available in this environment)."""

import h5py
import numpy as np
import pytest

from pregen_pde_tpu.training.benchmark_datasets import (
    BENCHMARK_REGISTRY,
    BenchmarkTimeDataset,
    get_dataset,
)


def _make_fixture(tmp_path, filename, n=8, t=21, c=2, res=16):
    path = tmp_path / filename
    path.parent.mkdir(parents=True, exist_ok=True)
    with h5py.File(path, "w") as f:
        rng = np.random.default_rng(0)
        for i in range(n):
            f.create_dataset(
                f"sample_{i}",
                data=rng.normal(size=(t, c, res, res)).astype(np.float32),
            )
    return tmp_path


def test_registry_complete():
    # the reference's benchmark surface: ≥20 named datasets across families
    assert len(BENCHMARK_REGISTRY) >= 20
    for name, spec in BENCHMARK_REGISTRY.items():
        assert len(spec.mean) == spec.channels == len(spec.std), name


def test_time_dependent_loader(tmp_path):
    _make_fixture(tmp_path, "gauss.nc", n=8, t=21, c=2)
    from pregen_pde_tpu.training.datasets import TimePairConfig

    cfg = TimePairConfig(max_num_time_steps=4, allowed_transitions=[1, 2],
                         n_val=2, n_test=2)
    ds = BenchmarkTimeDataset("ns_gauss", tmp_path, "train",
                              num_trajectories=4, cfg=cfg)
    assert ds.resolution == 16
    time, inp, lab = ds[0]
    assert inp.shape == (16, 16, 3)  # 2 channels + time
    assert lab.shape == (16, 16, 2)
    assert ds.in_channels == 3
    # normalization applied
    spec = BENCHMARK_REGISTRY["ns_gauss"]
    raw = h5py.File(tmp_path / "gauss.nc")["sample_0"][0]
    expected = (np.moveaxis(raw, 0, -1) - np.asarray(spec.mean)) / np.asarray(spec.std)
    np.testing.assert_allclose(inp[..., :2], expected, rtol=1e-5)


def test_val_test_splits_use_tail(tmp_path):
    _make_fixture(tmp_path, "kh.nc", n=10, t=21, c=4)
    from pregen_pde_tpu.training.datasets import TimePairConfig

    cfg = TimePairConfig(max_num_time_steps=2, allowed_transitions=[1],
                         n_val=2, n_test=3)
    # registry n_val/n_test exceed the fixture; use a custom cfg
    ds_val = BenchmarkTimeDataset("eul_kh", tmp_path, "val", cfg=cfg)
    # spec n_val=40 > fixture → start computed from file count
    assert ds_val.start + ds_val.n_traj <= 10 or ds_val.n_traj == 40


def test_steady_loader(tmp_path):
    _make_fixture(tmp_path, "elliptic/helmholtz.nc", n=6, t=2, c=1)
    from pregen_pde_tpu.training.datasets import TimePairConfig

    cfg = TimePairConfig(max_num_time_steps=1, n_val=1, n_test=1)
    ds = BenchmarkTimeDataset("helmholtz", tmp_path, "train",
                              num_trajectories=2, cfg=cfg)
    time, inp, lab = ds[0]
    assert time == 1.0
    assert inp.shape == (16, 16, 2)  # 1 channel + time
    assert lab.shape == (16, 16, 1)


def test_get_dataset_dispatcher(tmp_path):
    _make_fixture(tmp_path, "sin.nc", n=8, t=21, c=2)
    from pregen_pde_tpu.training.datasets import TimePairConfig

    cfg = TimePairConfig(max_num_time_steps=2, allowed_transitions=[1],
                         n_val=2, n_test=2)
    ds = get_dataset("ns_sines", str(tmp_path), "train", num_trajectories=2,
                     cfg=cfg)
    assert len(ds) == 2 * 2
    with pytest.raises(KeyError):
        get_dataset("nope", str(tmp_path))
    # ns_custom path
    npy = tmp_path / "own.npy"
    rng = np.random.default_rng(1)
    np.save(npy, rng.normal(size=(8, 5, 8, 8, 6)).astype(np.float32))
    ds2 = get_dataset(
        "ns_custom", str(npy), "train",
        cfg=TimePairConfig(max_num_time_steps=4, n_val=2, n_test=2),
        num_trajectories=4,
    )
    assert len(ds2) > 0


def test_out_and_time_modifiers_and_list_dispatch(tmp_path):
    """`.out` = same file, longer rollout horizon (`problems/base.py:135-137`);
    `.time` accepted for steady problems; list → ConcatDataset."""
    # the `.out` defaults inherit the spec's real split sizes (40/240), so the
    # fixture must clear n_val + n_test + 1
    _make_fixture(tmp_path, "gauss.nc", n=285, t=21, c=2, res=8)

    ds_out = get_dataset("ns_gauss.out", tmp_path, "val")
    # OOD horizon: pairs (0, 2j), j ≤ 10 → lead times reach t=20
    t2s = [t2 for (_, t2) in ds_out.time_indices]
    assert max(t2s) == 20 and ds_out.cfg.time_step_size == 2
    time, inp, lab = ds_out[len(ds_out) - 1]
    assert inp.shape[-1] == 3

    # steady `.time` accepted (constant-time wrapper is built in)
    _make_fixture(tmp_path, "elliptic/helmholtz.nc", n=8, t=2, c=1)
    from pregen_pde_tpu.training.datasets import TimePairConfig

    cfg = TimePairConfig(n_val=2, n_test=2)
    ds_steady = get_dataset("helmholtz.time", tmp_path, "val", cfg=cfg)
    t0, inp0, lab0 = ds_steady[0]
    assert float(t0) == 1.0

    # list → ConcatDataset
    from pregen_pde_tpu.training.datasets import TimePairConfig as TPC

    small = TPC(max_num_time_steps=2, allowed_transitions=[1], n_val=2, n_test=2)
    both = get_dataset(["ns_gauss", "ns_gauss"], tmp_path, "val", cfg=small)
    assert len(both) == 2 * len(get_dataset("ns_gauss", tmp_path, "val", cfg=small))

    with pytest.raises(KeyError):
        get_dataset("nonexistent.out", tmp_path)


def test_ns_custom_out_clamps_to_file_frames(tmp_path):
    """'ns_custom.out' must clamp the OOD horizon to the file's frames."""
    rng = np.random.default_rng(0)
    data = rng.normal(size=(8, 9, 8, 8, 6)).astype(np.float32)  # only 9 frames
    p = tmp_path / "d.npy"
    np.save(p, data)
    ds = get_dataset("ns_custom.out", str(p), "val")
    t2s = [t2 for (_, t2) in ds.time_indices]
    assert max(t2s) <= 8, t2s  # never indexes past frame 8
    for i in range(len(ds)):
        ds[i]  # no IndexError
