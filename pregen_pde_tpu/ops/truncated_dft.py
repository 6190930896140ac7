"""Truncated DFTs as small matmuls — the FNO/FFNO spectral-conv fast path.

FNO-family layers keep only ~12 Fourier modes per axis, yet the natural
implementation (reference `Autoregressive_Baseline_Scripts/models/FNO.py:
9-45`, `FFNO.py:73-114`) runs FULL rfft/irfft and slices. On TPU the FFT is
the bottleneck (PERF.md: FNO train step is FFT-throughput-bound, and XLA's
FFT runs ~50-100x below MXU matmul rates). Since only m modes survive, the
transform IS a skinny matmul: contract the spatial axis with an (n, m)
cos/sin matrix — exact (same math, no approximation), MXU-shaped, and
differentiated by XLA natively.

Provided (all pure functions of (re, im) pairs; matrices cached per
(n, m)):
- ``rdft(x, axis, m)``        ≡ ``jnp.fft.rfft(x, axis)`` sliced to modes [0, m)
- ``irdft(re, im, axis, n)``  ≡ ``jnp.fft.irfft`` of that one-sided spectrum
                                 zero-padded back to n//2+1 bins
- ``cdft_pm(re, im, axis, m)``  complex DFT evaluated ONLY at rows
                                 {0..m-1} ∪ {n-m..n-1} (the ±m corner rows)
- ``icdft_pm(re, im, axis, n)`` inverse, treating all other rows as zero

Einsums run at ``Precision.HIGH`` (bf16x3): ~1e-6 relative — FFT-grade for
f32 training. Exact equivalence with the jnp.fft path is pinned by
`tests/test_truncated_dft.py` (f64, CPU).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

_PREC = jax.lax.Precision.HIGH
_CACHE: dict = {}


def _rdft_mats(n: int, m: int):
    key = ("rdft", n, m)
    if key not in _CACHE:
        w = np.arange(n)[:, None] * np.arange(m)[None, :]
        ang = -2.0 * np.pi * w / n
        _CACHE[key] = (
            np.cos(ang),
            np.sin(ang),
        )
    return _CACHE[key]


def _irdft_mats(n: int, m: int):
    """y[w] = sum_k alpha_k (Re Z_k cos(2pi wk/n) - Im Z_k sin(2pi wk/n)) / n
    with alpha_k = 2 except DC and (n even) Nyquist — the Hermitian
    completion of the one-sided spectrum, truncated to k < m."""
    key = ("irdft", n, m)
    if key not in _CACHE:
        k = np.arange(m)
        alpha = np.where((k == 0) | ((n % 2 == 0) & (k == n // 2)), 1.0, 2.0)
        ang = 2.0 * np.pi * k[:, None] * np.arange(n)[None, :] / n
        _CACHE[key] = (
            alpha[:, None] * np.cos(ang) / n,
            -alpha[:, None] * np.sin(ang) / n,
        )
    return _CACHE[key]


def _cdft_pm_mats(n: int, m: int):
    """(n, 2m) complex DFT matrix at output rows [0..m) ++ [n-m..n)."""
    key = ("cdft", n, m)
    if key not in _CACHE:
        rows = np.concatenate([np.arange(m), np.arange(n - m, n)])
        ang = -2.0 * np.pi * np.arange(n)[:, None] * rows[None, :] / n
        _CACHE[key] = (
            np.cos(ang),
            np.sin(ang),
        )
    return _CACHE[key]


def _icdft_pm_mats(n: int, m: int):
    """(2m, n) inverse-DFT matrix embedding rows [0..m) ++ [n-m..n)."""
    key = ("icdft", n, m)
    if key not in _CACHE:
        rows = np.concatenate([np.arange(m), np.arange(n - m, n)])
        ang = 2.0 * np.pi * rows[:, None] * np.arange(n)[None, :] / n
        _CACHE[key] = (np.cos(ang) / n, np.sin(ang) / n)
    return _CACHE[key]


def _contract(x, mat, axis):
    """Contract `axis` of (B, H, W, C) with (len_axis, m) matrix."""
    sub = {1: "bhwc,hk->bkwc", 2: "bhwc,wk->bhkc"}[axis]
    return jnp.einsum(sub, x, jnp.asarray(mat, x.dtype), precision=_PREC)


def rdft(x: jax.Array, axis: int, m: int):
    """Real input → (re, im) of rfft modes [0, m) along `axis`."""
    n = x.shape[axis]
    cos, sin = _rdft_mats(n, m)
    return _contract(x, cos, axis), _contract(x, sin, axis)


def irdft(re: jax.Array, im: jax.Array, axis: int, n: int):
    """One-sided truncated spectrum → real signal of length n along `axis`
    (≡ irfft of the zero-padded spectrum)."""
    m = re.shape[axis]
    c, s = _irdft_mats(n, m)
    return _contract(re, c, axis) + _contract(im, s, axis)


def cdft_pm(re: jax.Array, im: jax.Array, axis: int, m: int):
    """Complex input → complex DFT at the ±m corner rows along `axis`
    (output axis length 2m: rows [0..m) then [-m..0))."""
    n = re.shape[axis]
    cos, sin = _cdft_pm_mats(n, m)
    out_re = _contract(re, cos, axis) - _contract(im, sin, axis)
    out_im = _contract(re, sin, axis) + _contract(im, cos, axis)
    return out_re, out_im


def icdft_pm(re: jax.Array, im: jax.Array, axis: int, n: int):
    """Inverse of :func:`cdft_pm`: ±m corner rows (axis length 2m) → full
    length-n complex signal, other rows zero."""
    m = re.shape[axis] // 2
    cos, sin = _icdft_pm_mats(n, m)
    out_re = _contract(re, cos, axis) - _contract(im, sin, axis)
    out_im = _contract(re, sin, axis) + _contract(im, cos, axis)
    return out_re, out_im
