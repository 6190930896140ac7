"""Resolution-study utilities — counterpart of `torch_utils/res_utils.py`
(152 lines: Fourier up/downsampling + spectrum/energy for resolution studies).

`fourier_resize` re-exports the model-grade FFT resampler; `radial_spectrum`
and `energy_per_mode` support the spectral diagnostics.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pregen_pde_tpu.models.scot import fft_resize as fourier_resize  # noqa: F401


def energy_spectrum_2d(field: np.ndarray, length: float = 1.0) -> tuple[np.ndarray, np.ndarray]:
    """Isotropic (radially binned) energy spectrum of a square 2-D field.

    Returns (k_bins, E(k)) with E summed over annular shells of |k| (integer
    mode radius). Input (H, W) or (..., H, W); leading axes averaged.
    """
    f = np.asarray(field, np.float64)
    n = f.shape[-1]
    f2 = f.reshape(-1, n, n)
    fhat = np.fft.fft2(f2, norm="forward")
    power = (np.abs(fhat) ** 2).mean(axis=0)
    k = np.fft.fftfreq(n, d=1.0 / n)
    KX, KY = np.meshgrid(k, k, indexing="ij")
    kr = np.sqrt(KX**2 + KY**2)
    k_max = n // 2
    bins = np.arange(k_max + 1)
    e = np.zeros(k_max + 1)
    idx = np.clip(np.round(kr).astype(int), 0, k_max)
    np.add.at(e, idx.ravel(), power.ravel())
    return bins, e


def total_energy(u: np.ndarray, v: np.ndarray) -> float:
    """Kinetic energy 0.5 <u² + v²>."""
    return float(0.5 * (np.asarray(u) ** 2 + np.asarray(v) ** 2).mean())


def enstrophy(w: np.ndarray) -> float:
    return float(0.5 * (np.asarray(w) ** 2).mean())
