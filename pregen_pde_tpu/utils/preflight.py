"""Dataset preflight checks — the reference's `utils/check_data.py` (34 lines:
standalone scanner of npy files for finiteness, valid fraction, ranges), run
before training.
"""

from __future__ import annotations

import numpy as np


def check_contract(arr: np.ndarray, name: str = "dataset") -> dict:
    """Validate a (N, T, H, W, 6) contract array; returns a report dict and
    raises ValueError on hard violations."""
    report: dict = {"name": name, "shape": tuple(arr.shape)}
    if arr.ndim != 5 or arr.shape[-1] != 6:
        raise ValueError(f"{name}: expected (N,T,H,W,6), got {arr.shape}")
    finite = np.isfinite(arr)
    report["finite_fraction"] = float(finite.mean())
    if report["finite_fraction"] < 1.0:
        per_ch = [float(finite[..., c].mean()) for c in range(6)]
        report["finite_per_channel"] = per_ch
        raise ValueError(f"{name}: non-finite values; per-channel {per_ch}")
    re_ch = arr[..., 3]
    if re_ch.min() < -1e-6 or re_ch.max() > 1.0 + 1e-6:
        raise ValueError(f"{name}: Re channel outside [0,1]: "
                         f"[{re_ch.min()}, {re_ch.max()}]")
    mask = arr[..., 4]
    if not np.all((mask == 0.0) | (mask == 1.0)):
        raise ValueError(f"{name}: mask channel not binary")
    report["hole_fraction"] = float(mask.mean())
    sdf = arr[..., 5]
    if np.abs(sdf).max() > 1.0 + 1e-5:
        raise ValueError(f"{name}: SDF not normalized (max |sdf| = {np.abs(sdf).max()})")
    # Re constant per trajectory
    per_traj = re_ch.reshape(arr.shape[0], -1)
    if not np.allclose(per_traj, per_traj[:, :1], atol=1e-6):
        raise ValueError(f"{name}: Re channel varies within a trajectory")
    for c, label in ((0, "Ux"), (1, "Uy"), (2, "p")):
        report[f"{label}_range"] = (float(arr[..., c].min()), float(arr[..., c].max()))
    report["valid_fraction"] = 1.0 - report["hole_fraction"]
    return report
