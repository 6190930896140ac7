"""Gaussian-random-field samplers as batched spectral filters — all on device.

Replaces the reference's host-side parameter sampling + template-file patching
as the "initial condition generator" (`FPO_cylinder/Regular/main.py:474-518`),
generalized to full GRF initial conditions for the spectral solver workloads
(BASELINE.md configs).

Model: X ~ N(0, sigma^2 (-Δ + tau^2 I)^(-alpha)) on the periodic unit torus
[0, L)^d. Sampled by spectrally filtering white noise:

    X = irfft( rfft(xi) * h(k) ),   h(k) = n^(d/2) * sigma * (|k|^2 + tau^2)^(-alpha/2)

where xi is iid N(0,1) per grid point. With numpy FFT conventions this gives
pointwise variance  sum_k S(k),  S(k) = sigma^2 (|k|^2 + tau^2)^(-alpha) — the
discrete KL truncation of the continuum field. Default sigma = tau^(0.5*(2*alpha-d))
(the common neural-operator convention, e.g. the original FNO datasets).

Determinism: pure functions of a threefry key — reproducible across hosts and
shardings, vmap/jit-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pregen_pde_tpu.core.grid import SpectralGrid1D, SpectralGrid2D


def _default_sigma(tau: float, alpha: float, d: int) -> float:
    return float(tau ** (0.5 * (2.0 * alpha - d)))


def grf_2d(
    key: jax.Array,
    grid: SpectralGrid2D,
    alpha: float = 2.5,
    tau: float = 7.0,
    sigma: float | None = None,
    zero_mean: bool = True,
    dtype=jnp.float32,
) -> jax.Array:
    """One 2-D GRF sample of shape (n, n). vmap over `key` for batches."""
    if sigma is None:
        sigma = _default_sigma(tau, alpha, 2)
    n = grid.n
    sqrt_s = sigma * (grid.k2 + tau**2) ** (-alpha / 2.0)
    h = n * sqrt_s  # n^(d/2) with d=2 → n
    if zero_mean:
        h = h.copy()
        h[0, 0] = 0.0
    h = jnp.asarray(h, dtype=dtype)
    xi = jax.random.normal(key, (n, n), dtype=dtype)
    return jnp.fft.irfft2(jnp.fft.rfft2(xi) * h, s=(n, n)).astype(dtype)


def grf_1d(
    key: jax.Array,
    grid: SpectralGrid1D,
    alpha: float = 2.0,
    tau: float = 5.0,
    sigma: float | None = None,
    zero_mean: bool = True,
    dtype=jnp.float32,
) -> jax.Array:
    """One 1-D GRF sample of shape (n,). vmap over `key` for batches."""
    if sigma is None:
        sigma = _default_sigma(tau, alpha, 1)
    n = grid.n
    sqrt_s = sigma * (grid.k**2 + tau**2) ** (-alpha / 2.0)
    h = np.sqrt(n) * sqrt_s
    if zero_mean:
        h = h.copy()
        h[0] = 0.0
    h = jnp.asarray(h, dtype=dtype)
    xi = jax.random.normal(key, (n,), dtype=dtype)
    return jnp.fft.irfft(jnp.fft.rfft(xi) * h, n=n).astype(dtype)


def lognormal_grf_2d(
    key: jax.Array,
    grid: SpectralGrid2D,
    alpha: float = 2.0,
    tau: float = 3.0,
    sigma: float | None = None,
    dtype=jnp.float32,
) -> jax.Array:
    """Lognormal permeability field exp(GRF) — the Darcy coefficient sampler
    (BASELINE.md: '2D Darcy steady 421² lognormal GRF')."""
    g = grf_2d(key, grid, alpha=alpha, tau=tau, sigma=sigma, dtype=dtype)
    return jnp.exp(g)


def piecewise_constant_grf_2d(
    key: jax.Array,
    grid: SpectralGrid2D,
    hi: float = 12.0,
    lo: float = 3.0,
    alpha: float = 2.0,
    tau: float = 3.0,
    dtype=jnp.float32,
) -> jax.Array:
    """Thresholded GRF → two-valued coefficient field (classic FNO Darcy setup)."""
    g = grf_2d(key, grid, alpha=alpha, tau=tau, dtype=dtype)
    return jnp.where(g >= 0, jnp.asarray(hi, dtype), jnp.asarray(lo, dtype))
