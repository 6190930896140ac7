"""External-benchmark dataset loaders (Poseidon benchmark suite).

One registry-driven loader replacing the reference's 21 hand-written classes
(`CNO_Experiments/DataLoaders/CNO_TimeLoaders.py:252-1748`) and the scOT
problem modules (`Poseidon_mixing_Exp/scOT/problems/`): every dataset is an
HDF5(-based netCDF) file with per-trajectory keys ``sample_<i>`` of shape
(T, C, H, W); the per-dataset constants (file name, N_max/N_val/N_test, channel
count, z-score mean/std, time normalizer) live in BENCHMARK_REGISTRY with
values transcribed from the reference classes (cited per entry).

Sample layout matches the unified time-pair scheme (`training.datasets`):
(time, input NHWC [+time channel], label NHWC). Steady problems (Poisson,
Helmholtz, Airfoil) get constant time = 1 (≡ `TimeWrapper`,
`scOT/problems/base.py:395-418`).

These loaders require the benchmark files on disk (not downloadable in this
environment); the machinery itself is tested against synthetic HDF5 fixtures.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np

from pregen_pde_tpu.training.datasets import TimePairConfig, build_time_indices

# family-level z-score constants (reference `CNO_TimeLoaders.py:565-569` for
# incompressible NS, `:741-742` ff. for compressible Euler)
_NS_MEAN, _NS_STD = (0.0, 0.0), (0.391, 0.356)
_EUL_STD = (0.31, 0.391, 0.356, 0.185)


@dataclasses.dataclass(frozen=True)
class BenchmarkSpec:
    filename: str
    n_max: int
    n_val: int
    n_test: int
    channels: int
    mean: Sequence[float]
    std: Sequence[float]
    time_normalizer: float = 20.0
    time_dependent: bool = True
    max_time: int = 20  # frames available per trajectory − 1


# name → spec; reference class + line cited per entry
BENCHMARK_REGISTRY: dict[str, BenchmarkSpec] = {
    # incompressible NS family (`CNO_TimeLoaders.py:252-622`)
    "ns_brownian": BenchmarkSpec("bm.nc", 20000, 40, 240, 2, _NS_MEAN, _NS_STD),
    "ns_vortex": BenchmarkSpec("vortex_sheet.nc", 20000, 40, 240, 2, _NS_MEAN, _NS_STD),
    "ns_sines": BenchmarkSpec("sin.nc", 20000, 40, 240, 2, _NS_MEAN, _NS_STD),
    "ns_pwc": BenchmarkSpec("pwc.nc", 20000, 40, 240, 2, _NS_MEAN, _NS_STD),
    "ns_gauss": BenchmarkSpec("gauss.nc", 20000, 40, 240, 2, _NS_MEAN, _NS_STD),
    "ns_shear": BenchmarkSpec("data_ns/N128_1.nc", 40000, 40, 240, 2, _NS_MEAN, _NS_STD),
    "ns_pwc_tracer": BenchmarkSpec(  # `:1694-1748`
        "pwc_tracer.nc", 20000, 40, 240, 3, (0.0, 0.0, 0.19586183),
        (0.391, 0.356, 0.37),
    ),
    "kolmogorov": BenchmarkSpec(  # `:1615-1694`; scOT `fluids/incompressible.py:293`
        "incompressible_fluids/forcing/kolmogorov_pwc.nc", 20000, 60, 240, 2,
        (0.0, 0.0), (0.22, 0.22),
    ),
    # compressible Euler family (`CNO_TimeLoaders.py:724-1034`)
    "eul_kh": BenchmarkSpec("kh.nc", 10000, 40, 240, 4, (0.80, 0.0, 0.0, 1.0), _EUL_STD),
    "eul_riemann": BenchmarkSpec(
        "riemann.nc", 10000, 40, 240, 4, (0.80, 0.0, 0.0, 0.215), _EUL_STD
    ),
    "eul_riemann_curved": BenchmarkSpec(
        "riemann_curved.nc", 10000, 40, 240, 4, (0.80, 0.0, 0.0, 0.553), _EUL_STD
    ),
    "eul_gauss": BenchmarkSpec(
        "gauss.nc", 10000, 40, 240, 4, (0.80, 0.0, 0.0, 2.513), _EUL_STD
    ),
    "eul_riemann_kh": BenchmarkSpec(
        "riemann_kh.nc", 10000, 40, 240, 4, (0.80, 0.0, 0.0, 1.33), _EUL_STD
    ),
    "richtmyer_meshkov": BenchmarkSpec(  # `:1034-1134`
        "richtmyer_meshkov.nc", 1260, 100, 130, 4, (1.25, 0.0, 0.0, 15.0),
        (6.9, 0.45, 0.45, 9.8),
    ),
    "rayleigh_taylor": BenchmarkSpec(  # `:1134-1255`
        "rayleigh_taylor.nc", 1260, 100, 130, 4, (0.8, 0.0, 0.0, 0.0),
        (0.31, 0.391, 0.356, 0.46), max_time=10,
    ),
    # reaction-diffusion (`:1255-1317`)
    "allen_cahn": BenchmarkSpec(
        "reaction_diffusion/allen_cahn.nc", 15000, 60, 240, 1,
        (0.002484262,), (0.65351176,), max_time=19,
    ),
    # wave (`:1467-1615`)
    "wave_seismic": BenchmarkSpec(
        "wave_equation/seismic_20step.nc", 10512, 60, 240, 1,
        (0.03467443221585092,), (0.10442421752963911,),
    ),
    "wave_gauss": BenchmarkSpec(
        "wave_equation/gaussians_15step.nc", 10512, 60, 240, 1,
        (0.0334376316,), (0.1171879068,), max_time=15,
    ),
    # steady problems (`:1317-1467`)
    "poisson_gauss": BenchmarkSpec(
        "elliptic/poisson_gauss.nc", 20000, 120, 240, 1, (0.0,), (1.0,),
        time_dependent=False,
    ),
    "helmholtz": BenchmarkSpec(
        "elliptic/helmholtz.nc", 19675, 128, 512, 1,
        (0.11523915668552,), (0.8279975746000605,), time_dependent=False,
    ),
    "airfoil": BenchmarkSpec(
        "compressible_flow/steady/airfoil.nc", 10869, 60, 240, 1, (0.92984116,),
        (0.10864315,), time_dependent=False,
    ),
}


class BenchmarkTimeDataset:
    """Generic loader over one registry entry. Interface-compatible with
    `TimePairDataset` (usable with BatchLoader / Trainer / rollout eval)."""

    def __init__(
        self,
        name: str,
        data_path: str,
        which: str = "train",
        num_trajectories: int | None = None,
        cfg: TimePairConfig | None = None,
    ):
        import h5py
        from pathlib import Path

        spec = BENCHMARK_REGISTRY[name]
        self.spec = spec
        self.name = name
        self.cfg = cfg or TimePairConfig(
            max_num_time_steps=spec.max_time if spec.time_dependent else 1,
            time_step_size=1,
            allowed_transitions=None,
            n_val=spec.n_val,
            n_test=spec.n_test,
        )
        self.reader = h5py.File(Path(data_path) / spec.filename, "r")
        first = self.reader["sample_0"][:]
        self.resolution = first.shape[-1]
        self.out_channels = spec.channels
        self.mean = np.asarray(spec.mean, np.float32)
        self.std = np.asarray(spec.std, np.float32)

        if spec.time_dependent:
            self.time_indices = build_time_indices(self.cfg)
            self.multiplier = len(self.time_indices)
        else:
            self.time_indices = [(0, 1)]
            self.multiplier = 1

        n_max = min(spec.n_max, _count_samples(self.reader))
        n_val, n_test = self.cfg.n_val, self.cfg.n_test
        if n_max < n_val + n_test + 1:
            raise ValueError(
                f"{name}: file has {n_max} samples but the split needs "
                f"n_val({n_val}) + n_test({n_test}) + >=1 train"
            )
        if which == "train":
            avail = n_max - n_val - n_test
            n = num_trajectories if num_trajectories is not None else avail
            # reference convention: -1/-2/-8 → all/half/eighth
            # (`scOT/problems/base.py:242-247`)
            if n == -1:
                n = avail
            elif n == -2:
                n = avail // 2
            elif n == -8:
                n = avail // 8
            self.start, self.n_traj = 0, max(n, 1)
        elif which == "val":
            self.start, self.n_traj = n_max - n_val - n_test, n_val
        else:
            self.start, self.n_traj = n_max - n_test, n_test

    @property
    def in_channels(self) -> int:
        return self.spec.channels + int(self.cfg.time_input)

    def __len__(self):
        return self.n_traj * self.multiplier

    def __getitem__(self, idx: int):
        i = idx // self.multiplier
        t1, t2 = self.time_indices[idx % self.multiplier]
        spec = self.spec
        sample = self.reader[f"sample_{i + self.start}"]
        if spec.time_dependent:
            inp = np.asarray(sample[t1], np.float32)
            lab = np.asarray(sample[t2], np.float32)
            time = (t2 - t1) / spec.time_normalizer
        else:
            arr = np.asarray(sample[:], np.float32)
            # steady layout: [coefficient/input, solution]
            inp, lab = arr[0:1], arr[1:2]
            time = 1.0
        inp = inp.reshape(spec.channels, self.resolution, self.resolution)
        lab = lab.reshape(spec.channels, self.resolution, self.resolution)
        # CHW → HWC, z-score
        inp = np.moveaxis(inp, 0, -1)
        lab = np.moveaxis(lab, 0, -1)
        inp = (inp - self.mean) / self.std
        lab = (lab - self.mean) / self.std
        if self.cfg.time_input:
            tch = np.full((self.resolution, self.resolution, 1), time, np.float32)
            inp = np.concatenate([inp, tch], axis=-1)
        return np.float32(time), inp, lab


def _count_samples(reader) -> int:
    n = 0
    while f"sample_{n}" in reader:
        n += 1
    return n


# sample caps per family (`DataLoaders/load_utils.py:13-20`)
FAMILY_SAMPLE_CAPS = {"ns": 19640, "eul": 9640}


# `.out` rollout horizon ≡ `scOT/problems/base.py:135-137,162-165,177-180`:
# same file, evaluated beyond the training horizon (10 jumps of 2 vs 7 of 2)
_OUT_TIME_SETTINGS = dict(max_num_time_steps=10, time_step_size=2)


def get_dataset(name, data_path: str, which: str = "train", **kw):
    """Name → dataset dispatcher ≡ `load_utils._load_dataset :4` and
    `scOT/problems/base.py get_dataset :17-183`. `ns_custom` loads the
    framework's own generated npy contract. Name modifiers follow the
    reference: a trailing ``.out`` selects the longer out-of-distribution
    rollout horizon on the same file; ``.time`` marks a steady problem as
    time-wrapped (built in here — steady specs already emit constant time=1);
    a list of names concatenates datasets."""
    if isinstance(name, (list, tuple)):
        from pregen_pde_tpu.training.datasets import ConcatDataset

        return ConcatDataset([get_dataset(n, data_path, which, **kw) for n in name])

    base = name
    out_mode = False
    for _ in range(2):  # modifiers compose in either order
        if base.endswith(".out"):
            base, out_mode = base[: -len(".out")], True
        if base.endswith(".time"):
            base = base[: -len(".time")]  # TimeWrapper semantics are built in

    def out_cfg(max_t, n_val, n_test):
        step = _OUT_TIME_SETTINGS["time_step_size"]
        n_steps = min(_OUT_TIME_SETTINGS["max_num_time_steps"], max_t // step)
        return TimePairConfig(
            max_num_time_steps=max(n_steps, 1), time_step_size=step,
            allowed_transitions=None, n_val=n_val, n_test=n_test,
        )

    if out_mode and "cfg" not in kw and base in BENCHMARK_REGISTRY:
        spec = BENCHMARK_REGISTRY[base]
        kw["cfg"] = out_cfg(spec.max_time, spec.n_val, spec.n_test)

    if base == "ns_custom":
        from pregen_pde_tpu.training.datasets import TimePairDataset

        data = np.load(data_path, mmap_mode="r")
        cfg = kw.pop("cfg", None)
        if cfg is None and out_mode:  # clamp to the file's actual frames
            cfg = out_cfg(data.shape[1] - 1, 2, 2)
        cfg = cfg or TimePairConfig(
            max_num_time_steps=data.shape[1] - 1, allowed_transitions=None,
        )
        return TimePairDataset(np.asarray(data), cfg, which, **kw)
    if base in BENCHMARK_REGISTRY:
        return BenchmarkTimeDataset(base, data_path, which, **kw)
    raise KeyError(
        f"unknown dataset {name!r}; known: ns_custom, {sorted(BENCHMARK_REGISTRY)}"
    )
