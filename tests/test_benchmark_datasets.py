"""Benchmark-loader machinery tested against synthetic fixtures in every
container format the reference uses (h5 `sample_<i>`, netCDF `data`,
netCDF `solution`, multi-file shear, wave solution+c, steady layouts), plus
a table test pinning every registry entry's constants against values
transcribed independently from `CNO_TimeLoaders.py` (cited per row)."""

import h5py
import numpy as np
import pytest

from pregen_pde_tpu.training.benchmark_datasets import (
    BENCHMARK_REGISTRY,
    MASKED_NS_MEAN,
    MASKED_NS_STD,
    BenchmarkTimeDataset,
    get_dataset,
)
from pregen_pde_tpu.training.datasets import TimePairConfig


def _make_h5_sample_fixture(tmp_path, filename, n=8, t=21, c=2, res=16, seed=0):
    path = tmp_path / filename
    path.parent.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    with h5py.File(path, "w") as f:
        for i in range(n):
            f.create_dataset(
                f"sample_{i}",
                data=rng.normal(size=(t, c, res, res)).astype(np.float32),
            )
    return tmp_path


def _make_h5_var_fixture(tmp_path, filename, **arrays):
    path = tmp_path / filename
    path.parent.mkdir(parents=True, exist_ok=True)
    with h5py.File(path, "w") as f:
        for k, v in arrays.items():
            f.create_dataset(k, data=v)
    return tmp_path


def _make_nc3_fixture(tmp_path, filename, **arrays):
    """Classic netCDF-3 file via scipy (exercises the non-HDF5 fallback)."""
    from scipy.io import netcdf_file

    path = tmp_path / filename
    path.parent.mkdir(parents=True, exist_ok=True)
    f = netcdf_file(str(path), "w")
    for name, arr in arrays.items():
        dims = []
        for d, size in enumerate(arr.shape):
            dim = f"{name}_d{d}"
            f.createDimension(dim, size)
            dims.append(dim)
        v = f.createVariable(name, "f", tuple(dims))
        v[:] = arr.astype(np.float32)
    f.close()
    return tmp_path


# ---------------------------------------------------------------------------
# Constants pinned against the reference (transcribed independently here)
# ---------------------------------------------------------------------------

# (name, kind, filename, N_max, N_val, N_test, mean, std, time_norm)
REFERENCE_TABLE = [
    # CNO_TimeLoaders.py:255-268 (and siblings): h5 sample_<i>, (0,0)/(0.391,0.356)
    ("ns_brownian", "h5_sample", "bm.nc", 20000, 40, 240, (0.0, 0.0), (0.391, 0.356), 20.0),
    ("ns_vortex", "h5_sample", "vortex_sheet.nc", 20000, 40, 240, (0.0, 0.0), (0.391, 0.356), 20.0),
    ("ns_sines", "h5_sample", "sin.nc", 20000, 40, 240, (0.0, 0.0), (0.391, 0.356), 20.0),
    ("ns_pwc", "h5_sample", "pwc.nc", 20000, 40, 240, (0.0, 0.0), (0.391, 0.356), 20.0),
    ("ns_gauss", "h5_sample", "gauss.nc", 20000, 40, 240, (0.0, 0.0), (0.391, 0.356), 20.0),
    # :625-644 multi-file shear layer
    ("ns_shear", "shear", "data_ns", 40000, 40, 240, (0.0, 0.0), (0.391, 0.356), 20.0),
    # :1694-1720 pwc tracer
    ("ns_pwc_tracer", "h5_sample", "pwc_tracer.nc", 20000, 40, 240,
     (0.0, 0.0, 0.19586183), (0.391, 0.356, 0.37), 20.0),
    # :1615-1640 kolmogorov
    ("kolmogorov", "kolmogorov", "incompressible_fluids/forcing/kolmogorov_pwc.nc",
     20000, 60, 240, (0.0, 0.0), (0.22, 0.22), 20.0),
    # :738-748 KH — nc variable "data"
    ("eul_kh", "nc_data", "kh.nc", 10000, 40, 240, (0.80, 0.0, 0.0, 1.0),
     (0.31, 0.391, 0.356, 0.185), 20.0),
    # :798-805
    ("eul_riemann", "nc_data", "riemann.nc", 10000, 40, 240,
     (0.80, 0.0, 0.0, 0.215), (0.31, 0.391, 0.356, 0.185), 20.0),
    # :858-866
    ("eul_riemann_curved", "nc_data", "riemann_curved.nc", 10000, 40, 240,
     (0.80, 0.0, 0.0, 0.553), (0.31, 0.391, 0.356, 0.185), 20.0),
    # :919-927
    ("eul_gauss", "nc_data", "gauss.nc", 10000, 40, 240,
     (0.80, 0.0, 0.0, 2.513), (0.31, 0.391, 0.356, 0.185), 20.0),
    # :979-987
    ("eul_riemann_kh", "nc_data", "riemann_kh.nc", 10000, 40, 240,
     (0.80, 0.0, 0.0, 1.33), (0.31, 0.391, 0.356, 0.185), 20.0),
    # :1040-1074 RM — nc "solution", exact float constants
    ("richtmyer_meshkov", "nc_solution", "richtmyer_meshkov.nc", 1260, 100, 130,
     (1.1964245, -7.164812e-06, 2.8968952e-06, 1.5648036),
     (0.5543239, 0.24304213, 0.2430597, 0.89639103), 20.0),
    # :1134-1167 RT — 4 physical + g channel, time normalizer 10
    ("rayleigh_taylor", "nc_solution", "rayleigh_taylor.nc", 1260, 100, 130,
     (0.8970493, 4.0316996e-13, -1.3858967e-13, 0.7133829),
     (0.12857835, 0.014896976, 0.014896975, 0.21293919), 10.0),
    # :1258-1272 Allen-Cahn — nc "solution", time normalizer 19
    ("allen_cahn", "nc_solution", "reaction_diffusion/allen_cahn.nc",
     15000, 60, 240, (0.002484262,), (0.65351176,), 19.0),
    # :1467-1491 / :1539-1560 wave
    ("wave_seismic", "wave", "wave_equation/seismic_20step.nc", 10512, 60, 240,
     (0.03467443221585092,), (0.10442421752963911,), 20.0),
    ("wave_gauss", "wave", "wave_equation/gaussians_15step.nc", 10512, 60, 240,
     (0.0334376316,), (0.1171879068,), 15.0),
    # :1320-1367 Poisson — nc "source"/"solution", separate constants
    ("poisson_gauss", "poisson", "poisson_equation/gaussians.nc", 20000, 120, 240,
     (0.014822142414492256,), (4.755138816607612,), 20.0),
    # :1374-1392 Helmholtz — h5 Sample_<i> groups
    ("helmholtz", "helmholtz",
     "helmholtz/HelmotzData_VaryingBC02501_2to8bumbs_w5over2pi_processed.h5",
     19675, 128, 512, (0.11523915668552,), (0.8279975746000605,), 20.0),
    # :1416-1436 Airfoil — h5 "solution"
    ("airfoil", "airfoil", "compressible_flow/steady/airfoil.nc", 10869, 60, 240,
     (0.92984116,), (0.10864315,), 20.0),
]


def test_registry_constants_match_reference_table():
    # 21 CNO-loader entries (pinned below) + the Poseidon scOT-problems
    # layout family (pos_*, pinned by the cross-implementation oracles in
    # test_reference_oracle.py against the actual scOT classes)
    n_pos = sum(1 for k in BENCHMARK_REGISTRY if k.startswith("pos_"))
    assert len(BENCHMARK_REGISTRY) - n_pos == len(REFERENCE_TABLE) == 21
    for name, kind, filename, n_max, n_val, n_test, mean, std, tn in REFERENCE_TABLE:
        spec = BENCHMARK_REGISTRY[name]
        assert spec.kind == kind, name
        assert spec.filename == filename, name
        assert spec.n_max == n_max, name
        assert spec.n_val == n_val, name
        assert spec.n_test == n_test, name
        np.testing.assert_array_equal(np.asarray(spec.mean), np.asarray(mean), name)
        np.testing.assert_array_equal(np.asarray(spec.std), np.asarray(std), name)
        assert spec.time_normalizer == tn, name
    # auxiliary constants
    rt = BENCHMARK_REGISTRY["rayleigh_taylor"]
    assert (rt.aux_mean, rt.aux_std) == (-1.7055787, 0.40131348)  # gravity, :1159-1162
    assert (rt.tracer_mean, rt.tracer_std) == (1.8061695, 0.37115487)  # :1165-1166
    assert rt.max_time == 10  # assert max_num_time_steps*step <= 10, :1137
    rm = BENCHMARK_REGISTRY["richtmyer_meshkov"]
    assert (rm.tracer_mean, rm.tracer_std) == (1.3658239, 0.46400866)  # :1071-1072
    po = BENCHMARK_REGISTRY["poisson_gauss"]
    assert (po.aux_mean, po.aux_std) == (0.0005603458434937093, 0.02401226126952699)
    ws = BENCHMARK_REGISTRY["wave_seismic"]
    assert (ws.aux_mean, ws.aux_std) == (3498.5644380917424, 647.843958567462)
    wg = BENCHMARK_REGISTRY["wave_gauss"]
    assert (wg.aux_mean, wg.aux_std) == (2618.4593933, 601.51658913)
    assert wg.max_time == 15
    assert BENCHMARK_REGISTRY["allen_cahn"].max_time == 19
    # masked-input constants (`:269-271`)
    assert MASKED_NS_MEAN == (0.80, 0.0, 0.0, 0.0)
    assert MASKED_NS_STD == (0.31, 0.391, 0.356, 0.46)


# ---------------------------------------------------------------------------
# Per-format loaders against fixtures
# ---------------------------------------------------------------------------


def test_h5_sample_loader(tmp_path):
    _make_h5_sample_fixture(tmp_path, "gauss.nc", n=8, t=21, c=2)
    cfg = TimePairConfig(max_num_time_steps=4, allowed_transitions=[1, 2],
                         n_val=2, n_test=2)
    ds = BenchmarkTimeDataset("ns_gauss", tmp_path, "train",
                              num_trajectories=4, cfg=cfg)
    assert ds.resolution == 16
    time, inp, lab = ds[0]
    assert inp.shape == (16, 16, 3)  # 2 channels + time
    assert lab.shape == (16, 16, 2)
    assert ds.in_channels == 3
    spec = BENCHMARK_REGISTRY["ns_gauss"]
    raw = h5py.File(tmp_path / "gauss.nc")["sample_0"][0]
    expected = (np.moveaxis(raw, 0, -1) - np.asarray(spec.mean)) / np.asarray(spec.std)
    np.testing.assert_allclose(inp[..., :2], expected, rtol=1e-5)


def test_nc_data_euler_loader_netcdf3(tmp_path):
    """Euler family reads netCDF variable `data` (`:743-744`) — fixture in
    classic netCDF-3 to exercise the scipy fallback path."""
    rng = np.random.default_rng(3)
    data = rng.normal(size=(8, 6, 4, 8, 8)).astype(np.float32)
    _make_nc3_fixture(tmp_path, "kh.nc", data=data)
    cfg = TimePairConfig(max_num_time_steps=3, allowed_transitions=[1],
                         n_val=2, n_test=2)
    ds = BenchmarkTimeDataset("eul_kh", tmp_path, "train",
                              num_trajectories=4, cfg=cfg)
    time, inp, lab = ds[0]
    assert inp.shape == (8, 8, 5) and lab.shape == (8, 8, 4)
    spec = BENCHMARK_REGISTRY["eul_kh"]
    t1, t2 = ds.time_indices[0]
    exp = (np.moveaxis(data[0, t1, :4], 0, -1) - np.asarray(spec.mean)) / np.asarray(spec.std)
    np.testing.assert_allclose(inp[..., :4], exp, rtol=1e-5)
    assert time == (t2 - t1) / 20.0


def test_nc_data_euler_loader_hdf5(tmp_path):
    """Same family with an HDF5-backed (netCDF-4 style) container."""
    rng = np.random.default_rng(4)
    data = rng.normal(size=(8, 6, 4, 8, 8)).astype(np.float32)
    _make_h5_var_fixture(tmp_path, "riemann.nc", data=data)
    cfg = TimePairConfig(max_num_time_steps=3, allowed_transitions=[1],
                         n_val=2, n_test=2)
    ds = BenchmarkTimeDataset("eul_riemann", tmp_path, "val", cfg=cfg)
    time, inp, lab = ds[0]
    # val split starts at n_max - n_val - n_test = 4
    t1, t2 = ds.time_indices[0]
    spec = BENCHMARK_REGISTRY["eul_riemann"]
    exp = (np.moveaxis(data[4, t2, :4], 0, -1) - np.asarray(spec.mean)) / np.asarray(spec.std)
    np.testing.assert_allclose(lab, exp, rtol=1e-5)


def test_richtmyer_meshkov_tracer_unnormalized(tmp_path):
    """RM: nc "solution"[i,t,0:4]; `.tracer` appends channel 4 — which the
    reference does NOT normalize (`:1100-1121`), replicated faithfully."""
    rng = np.random.default_rng(5)
    sol = rng.normal(size=(6, 5, 5, 8, 8)).astype(np.float32)
    _make_h5_var_fixture(tmp_path, "richtmyer_meshkov.nc", solution=sol)
    cfg = TimePairConfig(max_num_time_steps=2, allowed_transitions=[1],
                         n_val=2, n_test=2)
    ds = BenchmarkTimeDataset("richtmyer_meshkov", tmp_path, "train",
                              num_trajectories=2, cfg=cfg, tracer=True)
    time, inp, lab = ds[0]
    assert inp.shape == (8, 8, 6)  # 4 + tracer + time
    assert lab.shape == (8, 8, 5)
    t1, t2 = ds.time_indices[0]
    np.testing.assert_allclose(inp[..., 4], sol[0, t1, 4], rtol=1e-5)  # raw
    ds_nt = BenchmarkTimeDataset("richtmyer_meshkov", tmp_path, "train",
                                 num_trajectories=2, cfg=cfg)
    _, inp_nt, lab_nt = ds_nt[0]
    assert inp_nt.shape == (8, 8, 5) and lab_nt.shape == (8, 8, 4)


def test_rayleigh_taylor_five_channel_and_time10(tmp_path):
    """RT: [ρ,u,v,p] + gravity channel 5 (normalized with its own stats),
    optional normalized tracer ch 4, time normalizer 10 (`:1155-1250`)."""
    rng = np.random.default_rng(6)
    sol = rng.normal(size=(6, 5, 6, 8, 8)).astype(np.float32)
    _make_h5_var_fixture(tmp_path, "rayleigh_taylor.nc", solution=sol)
    cfg = TimePairConfig(max_num_time_steps=2, allowed_transitions=[1, 2],
                         n_val=2, n_test=2)
    ds = BenchmarkTimeDataset("rayleigh_taylor", tmp_path, "train",
                              num_trajectories=2, cfg=cfg)
    spec = BENCHMARK_REGISTRY["rayleigh_taylor"]
    time, inp, lab = ds[0]
    assert ds.out_channels == 5
    assert inp.shape == (8, 8, 6)  # 4 + g + time
    assert lab.shape == (8, 8, 5)
    t1, t2 = ds.time_indices[0]
    assert time == (t2 - t1) / 10.0
    g_exp = (sol[0, t1, 5] - spec.aux_mean) / spec.aux_std
    np.testing.assert_allclose(inp[..., 4], g_exp, rtol=1e-5)
    # with tracer: [4ch, tracer, g]
    ds_tr = BenchmarkTimeDataset("rayleigh_taylor", tmp_path, "train",
                                 num_trajectories=2, cfg=cfg, tracer=True)
    _, inp_tr, lab_tr = ds_tr[0]
    assert ds_tr.out_channels == 6
    assert lab_tr.shape == (8, 8, 6)
    tr_exp = (sol[0, t1, 4] - spec.tracer_mean) / spec.tracer_std
    np.testing.assert_allclose(inp_tr[..., 4], tr_exp, rtol=1e-5)
    np.testing.assert_allclose(inp_tr[..., 5], g_exp, rtol=1e-5)


def test_allen_cahn_layout(tmp_path):
    rng = np.random.default_rng(7)
    sol = rng.normal(size=(6, 20, 8, 8)).astype(np.float32)
    _make_h5_var_fixture(tmp_path, "reaction_diffusion/allen_cahn.nc", solution=sol)
    cfg = TimePairConfig(max_num_time_steps=3, allowed_transitions=[2],
                         n_val=2, n_test=2)
    ds = BenchmarkTimeDataset("allen_cahn", tmp_path, "train",
                              num_trajectories=2, cfg=cfg)
    time, inp, lab = ds[0]
    t1, t2 = ds.time_indices[0]
    assert time == (t2 - t1) / 19.0
    spec = BENCHMARK_REGISTRY["allen_cahn"]
    exp = (sol[0, t2] - spec.mean[0]) / spec.std[0]
    np.testing.assert_allclose(lab[..., 0], exp, rtol=1e-5)


def test_wave_label_includes_c(tmp_path):
    """Wave: input [u, c], label [u(t2), c] — the label carries the (static)
    normalized wave-speed channel (`:1520-1530`)."""
    rng = np.random.default_rng(8)
    sol = rng.normal(size=(6, 21, 8, 8)).astype(np.float32)
    c = rng.normal(3000.0, 500.0, size=(6, 8, 8)).astype(np.float32)
    _make_h5_var_fixture(tmp_path, "wave_equation/seismic_20step.nc",
                         solution=sol, c=c)
    cfg = TimePairConfig(max_num_time_steps=3, allowed_transitions=[1],
                         n_val=2, n_test=2)
    ds = BenchmarkTimeDataset("wave_seismic", tmp_path, "train",
                              num_trajectories=2, cfg=cfg)
    time, inp, lab = ds[0]
    assert ds.out_channels == 2
    assert inp.shape == (8, 8, 3) and lab.shape == (8, 8, 2)
    spec = BENCHMARK_REGISTRY["wave_seismic"]
    c_exp = (c[0] - spec.aux_mean) / spec.aux_std
    np.testing.assert_allclose(inp[..., 1], c_exp, rtol=1e-5)
    np.testing.assert_allclose(lab[..., 1], c_exp, rtol=1e-5)


def test_kolmogorov_forcing_channel(tmp_path):
    """Kolmogorov: velocity + analytic forcing 0.1·sin(2π(x+y))/0.0707 in
    input AND label (`:1642-1650,1676-1681`)."""
    rng = np.random.default_rng(9)
    sol = rng.normal(size=(6, 21, 2, 8, 8)).astype(np.float32)
    _make_h5_var_fixture(
        tmp_path, "incompressible_fluids/forcing/kolmogorov_pwc.nc", solution=sol
    )
    cfg = TimePairConfig(max_num_time_steps=3, allowed_transitions=[1],
                         n_val=2, n_test=2)
    ds = BenchmarkTimeDataset("kolmogorov", tmp_path, "train",
                              num_trajectories=2, cfg=cfg)
    time, inp, lab = ds[0]
    assert inp.shape == (8, 8, 4) and lab.shape == (8, 8, 3)
    x = np.linspace(0, 1, 8, dtype=np.float32)
    xx, yy = np.meshgrid(x, x, indexing="ij")
    f_exp = 0.1 * np.sin(2 * np.pi * (xx + yy)) / 0.0707
    np.testing.assert_allclose(inp[..., 2], f_exp, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(lab[..., 2], f_exp, rtol=1e-4, atol=1e-6)


def test_poisson_separate_source_solution_constants(tmp_path):
    """Poisson: input = (source − μ_src)/σ_src, label = (solution − μ_sol)/σ_sol
    (`:1327-1355`); steady, NO time channel."""
    rng = np.random.default_rng(10)
    src = rng.normal(size=(8, 8, 8)).astype(np.float32)
    sol = rng.normal(size=(8, 8, 8)).astype(np.float32)
    _make_nc3_fixture(tmp_path, "poisson_equation/gaussians.nc",
                      source=src, solution=sol)
    cfg = TimePairConfig(max_num_time_steps=1, n_val=2, n_test=2)
    ds = BenchmarkTimeDataset("poisson_gauss", tmp_path, "train",
                              num_trajectories=2, cfg=cfg)
    time, inp, lab = ds[0]
    assert time == 1.0
    assert inp.shape == (8, 8, 1)  # no time channel (reference :1340-1355)
    assert ds.in_channels == 1
    spec = BENCHMARK_REGISTRY["poisson_gauss"]
    np.testing.assert_allclose(
        inp[..., 0], (src[0] - spec.mean[0]) / spec.std[0], rtol=1e-5
    )
    np.testing.assert_allclose(
        lab[..., 0], (sol[0] - spec.aux_mean) / spec.aux_std, rtol=1e-5
    )


def test_helmholtz_group_layout(tmp_path):
    """Helmholtz: h5 groups Sample_<i> with a (shifted by −1), scalar bc
    (broadcast), u (normalized label) (`:1390-1410`)."""
    rng = np.random.default_rng(11)
    path = tmp_path / BENCHMARK_REGISTRY["helmholtz"].filename
    path.parent.mkdir(parents=True, exist_ok=True)
    a = rng.normal(1.0, 0.3, size=(8, 8, 8)).astype(np.float32)
    u = rng.normal(size=(8, 8, 8)).astype(np.float32)
    bcs = rng.normal(size=(8,)).astype(np.float32)
    with h5py.File(path, "w") as f:
        for i in range(8):
            g = f.create_group(f"Sample_{i}")
            g.create_dataset("a", data=a[i])
            g.create_dataset("bc", data=bcs[i])
            g.create_dataset("u", data=u[i])
    cfg = TimePairConfig(max_num_time_steps=1, n_val=2, n_test=2)
    ds = BenchmarkTimeDataset("helmholtz", tmp_path, "train",
                              num_trajectories=2, cfg=cfg)
    time, inp, lab = ds[0]
    assert inp.shape == (8, 8, 2)
    assert ds.in_channels == 2
    np.testing.assert_allclose(inp[..., 0], a[0] - 1.0, rtol=1e-5)
    np.testing.assert_allclose(inp[..., 1], np.full((8, 8), bcs[0]), rtol=1e-5)
    spec = BENCHMARK_REGISTRY["helmholtz"]
    np.testing.assert_allclose(
        lab[..., 0], (u[0] - spec.mean[0]) / spec.std[0], rtol=1e-5
    )


def test_airfoil_input_not_normalized(tmp_path):
    """Airfoil: solution[i,0] → input (raw), solution[i,1] → normalized label;
    steady but the time channel IS appended (`:1444-1459`)."""
    rng = np.random.default_rng(12)
    sol = rng.normal(size=(8, 2, 8, 8)).astype(np.float32)
    _make_h5_var_fixture(tmp_path, "compressible_flow/steady/airfoil.nc",
                         solution=sol)
    cfg = TimePairConfig(max_num_time_steps=1, n_val=2, n_test=2)
    ds = BenchmarkTimeDataset("airfoil", tmp_path, "train",
                              num_trajectories=2, cfg=cfg)
    time, inp, lab = ds[0]
    assert inp.shape == (8, 8, 2)  # raw input + time channel
    np.testing.assert_allclose(inp[..., 0], sol[0, 0], rtol=1e-5)
    np.testing.assert_allclose(inp[..., 1], 1.0)
    spec = BENCHMARK_REGISTRY["airfoil"]
    np.testing.assert_allclose(
        lab[..., 0], (sol[0, 1] - spec.mean[0]) / spec.std[0], rtol=1e-5
    )


def test_shear_multifile_and_transpose(tmp_path):
    """Shear layer: 4 files N{res}_{1..4}.nc; train reads file i//10000,
    val/test the 4th; frames stored transposed (axes (0,2,1))
    (`:634-643,682-719`)."""
    rng = np.random.default_rng(13)
    d = tmp_path / "data_ns"
    d.mkdir()
    raw = {}
    for k in range(1, 5):
        with h5py.File(d / f"N64_{k}.nc", "w") as f:
            for i in range(8):
                key = f"sample_{(k - 1) * 8 + i}" if k == 4 else f"sample_{i}"
                arr = rng.normal(size=(5, 2, 64, 64)).astype(np.float32)
                raw[(k, key)] = arr
                f.create_dataset(key, data=arr)
    cfg = TimePairConfig(max_num_time_steps=2, allowed_transitions=[1],
                         n_val=2, n_test=2)
    ds = BenchmarkTimeDataset("ns_shear", tmp_path, "train",
                              num_trajectories=2, cfg=cfg, resolution=64)
    spec = BENCHMARK_REGISTRY["ns_shear"]
    time, inp, lab = ds[0]
    assert inp.shape == (64, 64, 3)
    t1, t2 = ds.time_indices[0]
    exp = np.transpose(raw[(1, "sample_0")][t1], (0, 2, 1))
    exp = (np.moveaxis(exp, 0, -1) - np.asarray(spec.mean)) / np.asarray(spec.std)
    np.testing.assert_allclose(inp[..., :2], exp, rtol=1e-5)
    # val split reads the 4th file: n_avail = 8*4 = 32, start = 28
    ds_val = BenchmarkTimeDataset("ns_shear", tmp_path, "val", cfg=cfg,
                                  resolution=64)
    _, inp_v, _ = ds_val[0]
    exp_v = np.transpose(raw[(4, "sample_28")][t1], (0, 2, 1))
    exp_v = (np.moveaxis(exp_v, 0, -1) - np.asarray(spec.mean)) / np.asarray(spec.std)
    np.testing.assert_allclose(inp_v[..., :2], exp_v, rtol=1e-5)


def test_masked_input_option(tmp_path):
    """masked_input lifts 2-channel NS to the 4-channel compressible layout
    [ρ≡1, u, v, p≡0] with the compressible constants, and returns the mask
    as a 4th element (`CNO_TimeLoaders.py:48-52,269-271,302-310`)."""
    _make_h5_sample_fixture(tmp_path, "bm.nc", n=8, t=21, c=2)
    cfg = TimePairConfig(max_num_time_steps=2, allowed_transitions=[1],
                         n_val=2, n_test=2)
    mask = [1.0, 1.0, 1.0, 0.0]
    ds = BenchmarkTimeDataset("ns_brownian", tmp_path, "train",
                              num_trajectories=2, cfg=cfg, masked_input=mask)
    out = ds[0]
    assert len(out) == 4
    time, inp, lab, m = out
    np.testing.assert_array_equal(m, np.asarray(mask, np.float32))
    assert inp.shape == (16, 16, 5)  # 4 channels + time
    assert lab.shape == (16, 16, 4)
    assert ds.out_channels == 4
    # ρ channel: (1 − 0.80)/0.31; p channel: (0 − 0)/0.46
    np.testing.assert_allclose(inp[..., 0], (1.0 - 0.80) / 0.31, rtol=1e-5)
    np.testing.assert_allclose(inp[..., 3], 0.0, atol=1e-7)
    raw = h5py.File(tmp_path / "bm.nc")["sample_0"][0]
    exp_u = (raw[0] - 0.0) / 0.391
    np.testing.assert_allclose(inp[..., 1], exp_u, rtol=1e-5)
    # masked_input rejected for non-NS datasets
    with pytest.raises(ValueError):
        rng = np.random.default_rng(1)
        _make_h5_var_fixture(tmp_path, "kh.nc",
                             data=rng.normal(size=(6, 4, 4, 8, 8)).astype(np.float32))
        BenchmarkTimeDataset("eul_kh", tmp_path, "train", num_trajectories=2,
                             cfg=cfg, masked_input=mask)


def test_tracer_modifier_dispatch(tmp_path):
    rng = np.random.default_rng(14)
    sol = rng.normal(size=(6, 5, 5, 8, 8)).astype(np.float32)
    _make_h5_var_fixture(tmp_path, "richtmyer_meshkov.nc", solution=sol)
    cfg = TimePairConfig(max_num_time_steps=2, allowed_transitions=[1],
                         n_val=2, n_test=2)
    ds = get_dataset("richtmyer_meshkov.tracer", str(tmp_path), "train",
                     num_trajectories=2, cfg=cfg)
    assert ds.tracer
    assert ds.out_channels == 5
    with pytest.raises(ValueError):
        get_dataset("ns_gauss.tracer", str(tmp_path), "train", cfg=cfg)


def test_get_dataset_dispatcher(tmp_path):
    _make_h5_sample_fixture(tmp_path, "sin.nc", n=8, t=21, c=2)
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
    _make_h5_sample_fixture(tmp_path, "gauss.nc", n=285, t=21, c=2, res=8)

    ds_out = get_dataset("ns_gauss.out", tmp_path, "val")
    # OOD horizon: pairs (0, 2j), j ≤ 10 → lead times reach t=20
    t2s = [t2 for (_, t2) in ds_out.time_indices]
    assert max(t2s) == 20 and ds_out.cfg.time_step_size == 2
    time, inp, lab = ds_out[len(ds_out) - 1]
    assert inp.shape[-1] == 3

    # steady `.time` accepted (constant-time wrapper is built in)
    rng = np.random.default_rng(2)
    sol = rng.normal(size=(8, 2, 8, 8)).astype(np.float32)
    _make_h5_var_fixture(tmp_path, "compressible_flow/steady/airfoil.nc",
                         solution=sol)
    cfg = TimePairConfig(n_val=2, n_test=2)
    ds_steady = get_dataset("airfoil.time", tmp_path, "val", cfg=cfg)
    t0, inp0, lab0 = ds_steady[0]
    assert float(t0) == 1.0

    # list → ConcatDataset
    small = TimePairConfig(max_num_time_steps=2, allowed_transitions=[1],
                           n_val=2, n_test=2)
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


def test_transitions_grammar_on_benchmark_loader(tmp_path):
    """The reference experiment-config `allowed_time_transitions` grammar
    (`TrainCNO_time_L.py:151-163`, threaded into every loader via
    `load_utils`) reshapes the (t1, t2) pair table: one = 20 adjacent pairs,
    one2all = 21 (0→t) pairs, all = every jump."""
    from pregen_pde_tpu.training.benchmark_datasets import get_dataset

    _make_h5_sample_fixture(tmp_path, "gauss.nc", n=285, t=21, c=2, res=8)
    one = get_dataset("ns_gauss", tmp_path, "train", transitions="one")
    assert one.multiplier == 20
    assert all(t2 - t1 == 1 for t1, t2 in one.time_indices)
    o2a = get_dataset("ns_gauss", tmp_path, "train", transitions="one2all")
    assert o2a.multiplier == 21
    assert all(t1 == 0 for t1, _ in o2a.time_indices)
    alln = get_dataset("ns_gauss", tmp_path, "train", transitions="all")
    assert alln.multiplier == 21 * 22 // 2 - 21  # all pairs minus (t, t)
