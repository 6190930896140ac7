"""Single typed configuration system.

Replaces the reference's four uncoordinated config mechanisms (dict literals
dumped to CSV, JSON registry, wandb YAML, plain YAML+argparse — see SURVEY.md §5
"Config / flag system"; reference `TrainCNO_time_L.py:23-122`,
`DataLoaders/all_experiments.json`, `configs/mixing.yaml`,
`Autoregressive_Baseline_Scripts/config/config.yaml`).

Everything is a frozen dataclass; round-trips losslessly through JSON.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Sequence


def _asdict(obj: Any) -> Any:
    if dataclasses.is_dataclass(obj):
        return {f.name: _asdict(getattr(obj, f.name)) for f in dataclasses.fields(obj)}
    if isinstance(obj, (list, tuple)):
        return [_asdict(v) for v in obj]
    return obj


class _ConfigBase:
    def to_json(self) -> str:
        return json.dumps(_asdict(self), indent=2)

    @classmethod
    def from_json(cls, s: str):
        return cls(**_filter_fields(cls, json.loads(s)))

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


def _filter_fields(cls, d: dict) -> dict:
    import typing

    # resolve string annotations (`from __future__ import annotations` makes
    # fld.type a str, so is_dataclass(fld.type) would never fire)
    try:
        hints = typing.get_type_hints(cls)
    except Exception:
        hints = {}
    names = {f.name for f in dataclasses.fields(cls)}
    out = {}
    for k, v in d.items():
        if k not in names:
            raise KeyError(f"unknown config field {k!r} for {cls.__name__}")
        ftype = hints.get(k)
        if ftype is not None and dataclasses.is_dataclass(ftype) and isinstance(v, dict):
            v = ftype(**_filter_fields(ftype, v))
        out[k] = v
    return out


@dataclasses.dataclass(frozen=True)
class NSVorticityConfig(_ConfigBase):
    """2-D incompressible NS in vorticity form, pseudo-spectral.

    Defaults match the north-star workload (BASELINE.md): 256², ν=1e-4,
    snapshots thinned to a fixed count like the reference's 20-write
    controlDict patching (`FPO_cylinder/Regular/main.py:1002-1047`).
    """

    resolution: int = 256
    viscosity: float = 1e-4
    length: float = 1.0
    dt: float = 1e-4
    t_end: float = 10.0
    n_snapshots: int = 20
    include_initial: bool = True  # reference keeps frame 0 → 21 frames
    forcing: str = "fno"  # "none" | "fno" | "kolmogorov"
    forcing_amplitude: float = 0.1
    forcing_wavenumber: int = 4  # only for kolmogorov
    drag: float = 0.0
    dealias: bool = True


@dataclasses.dataclass(frozen=True)
class GRFConfig(_ConfigBase):
    """Gaussian random field N(0, sigma^2 (-Δ + tau^2 I)^(-alpha))."""

    alpha: float = 2.5
    tau: float = 7.0
    sigma: float | None = None  # default: tau^(0.5*(2*alpha - d))


@dataclasses.dataclass(frozen=True)
class BurgersConfig(_ConfigBase):
    """1-D viscous Burgers (BASELINE.md: ν=0.1, 1024-pt spectral)."""

    resolution: int = 1024
    viscosity: float = 0.1
    length: float = 1.0
    dt: float = 1e-4
    t_end: float = 1.0
    n_snapshots: int = 20


@dataclasses.dataclass(frozen=True)
class DatasetContract(_ConfigBase):
    """The shared (N, T, H, W, C) tensor contract.

    Channel order [Ux, Uy, p, Re_norm, mask, SDF_norm] and Re normalization
    (Re-100)/(10000-100) mirror the reference producer
    (`FPO_cylinder/Regular/main.py:840-890`) and consumer
    (`Autoregressive_Baseline_Scripts/utils/data_loader.py:24-41`).
    """

    n_frames: int = 21
    height: int = 128
    width: int = 128
    channels: int = 6
    re_min: float = 100.0
    re_max: float = 10000.0


@dataclasses.dataclass(frozen=True)
class MeshConfig(_ConfigBase):
    """Device mesh: data axis for trajectory/batch sharding, model axes spare."""

    data: int = -1  # -1 → all devices
    axis_names: Sequence[str] = ("data",)
