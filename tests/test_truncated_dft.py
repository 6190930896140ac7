"""Truncated-DFT matmuls vs the jnp.fft oracle (f64, CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pregen_pde_tpu.ops import truncated_dft as td


@pytest.mark.parametrize("axis,n", [(1, 40), (2, 33), (2, 32)])
def test_rdft_matches_rfft(axis, n):
    rng = np.random.default_rng(0)
    shape = [2, 9, 11, 3]
    shape[axis] = n
    x = rng.normal(size=shape)
    m = 5
    re, im = td.rdft(jnp.asarray(x), axis, m)
    ref = np.fft.rfft(x, axis=axis)
    ref = np.take(ref, np.arange(m), axis=axis)
    np.testing.assert_allclose(np.asarray(re), ref.real, atol=1e-10)
    np.testing.assert_allclose(np.asarray(im), ref.imag, atol=1e-10)


@pytest.mark.parametrize("n,m", [(32, 5), (32, 17), (33, 5), (33, 17)])
def test_irdft_matches_irfft_zero_padded(n, m):
    """Including the m == n//2+1 (Nyquist-present) boundary cases."""
    m = min(m, n // 2 + 1)
    rng = np.random.default_rng(1)
    z = rng.normal(size=(2, 7, m, 3)) + 1j * rng.normal(size=(2, 7, m, 3))
    full = np.zeros((2, 7, n // 2 + 1, 3), np.complex128)
    full[:, :, :m, :] = z
    ref = np.fft.irfft(full, n=n, axis=2)
    got = td.irdft(jnp.asarray(z.real), jnp.asarray(z.imag), 2, n)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-10)


def test_cdft_pm_matches_fft_corner_rows():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 24, 5, 3)) + 1j * rng.normal(size=(2, 24, 5, 3))
    m = 4
    ref = np.fft.fft(x, axis=1)
    ref = np.concatenate([ref[:, :m], ref[:, -m:]], axis=1)
    re, im = td.cdft_pm(jnp.asarray(x.real), jnp.asarray(x.imag), 1, m)
    np.testing.assert_allclose(np.asarray(re), ref.real, atol=1e-10)
    np.testing.assert_allclose(np.asarray(im), ref.imag, atol=1e-10)


def test_icdft_pm_matches_ifft_of_embedded():
    rng = np.random.default_rng(3)
    n, m = 24, 4
    z = rng.normal(size=(2, 2 * m, 5, 3)) + 1j * rng.normal(size=(2, 2 * m, 5, 3))
    full = np.zeros((2, n, 5, 3), np.complex128)
    full[:, :m] = z[:, :m]
    full[:, -m:] = z[:, m:]
    ref = np.fft.ifft(full, axis=1)
    re, im = td.icdft_pm(jnp.asarray(z.real), jnp.asarray(z.imag), 1, n)
    np.testing.assert_allclose(np.asarray(re), ref.real, atol=1e-10)
    np.testing.assert_allclose(np.asarray(im), ref.imag, atol=1e-10)


def test_full_fno_spectral_path_equivalence():
    """rdft→cdft_pm→(weights)→icdft_pm→irdft ≡ rfft2→slice→pad→irfft2."""
    rng = np.random.default_rng(4)
    B, H, W, C = 2, 20, 24, 3
    m1, m2 = 4, 5
    x = rng.normal(size=(B, H, W, C))
    wts = rng.normal(size=(2 * m1, m2)) + 1j * rng.normal(size=(2 * m1, m2))

    # oracle: numpy fft path
    xh = np.fft.rfft2(x, axes=(1, 2))
    out = np.zeros_like(xh)
    out[:, :m1, :m2] = xh[:, :m1, :m2] * wts[None, :m1, :, None]
    out[:, -m1:, :m2] = xh[:, -m1:, :m2] * wts[None, m1:, :, None]
    ref = np.fft.irfft2(out, s=(H, W), axes=(1, 2))

    # matmul path
    re, im = td.rdft(jnp.asarray(x), 2, m2)
    re, im = td.cdft_pm(re, im, 1, m1)
    wr = jnp.asarray(wts.real)[None, :, :, None]
    wi = jnp.asarray(wts.imag)[None, :, :, None]
    yr = re * wr - im * wi
    yi = re * wi + im * wr
    yr, yi = td.icdft_pm(yr, yi, 1, H)
    got = td.irdft(yr, yi, 2, W)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-9)


def test_spectral_conv2d_impls_agree():
    """FNO's SpectralConv2d: matmul fast path ≡ fft path, same params."""
    import jax
    from pregen_pde_tpu.models.fno import SpectralConv2d

    x = jnp.asarray(
        np.random.default_rng(5).normal(size=(2, 20, 24, 3)), jnp.float32
    )
    mod_f = SpectralConv2d(4, 5, 6, impl="fft")
    params = mod_f.init(jax.random.key(0), x)
    a = mod_f.apply(params, x)
    b = SpectralConv2d(4, 5, 6, impl="matmul").apply(params, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_ffno_spectral_impls_agree():
    import jax
    from pregen_pde_tpu.models.ffno import FactorizedSpectralLayer

    x = jnp.asarray(
        np.random.default_rng(6).normal(size=(2, 20, 24, 3)), jnp.float32
    )
    mod_f = FactorizedSpectralLayer(4, 5, impl="fft")
    params = mod_f.init(jax.random.key(0), x)
    a = mod_f.apply(params, x)
    b = FactorizedSpectralLayer(4, 5, impl="matmul").apply(params, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
