"""Cooley-Tukey matmul FFT (`ops/ct_fft.py`) vs the numpy FFT oracle.

The stored (chunk-permuted) layout + folded twiddles must reproduce
`np.fft.fft2` exactly up to roundoff at every supported radix.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pregen_pde_tpu.ops import ct_fft


@pytest.mark.parametrize("n,m", [(128, 1), (256, 2), (512, 4), (1024, 8)])
def test_fft2_stored_matches_numpy(n, m):
    plan = ct_fft.make_plan(n, m)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, n, n)) + 1j * rng.normal(size=(2, n, n))
    ref = np.fft.fft2(x)[..., plan.perm, :][..., :, plan.perm]
    fr, fi = ct_fft.fft2_stored(jnp.asarray(x.real), jnp.asarray(x.imag), plan)
    got = np.asarray(fr) + 1j * np.asarray(fi)
    scale = np.max(np.abs(ref))
    np.testing.assert_allclose(got, ref, atol=1e-10 * scale)


@pytest.mark.parametrize("n,m", [(256, 2), (512, 4)])
def test_ifft2_stored_roundtrip(n, m):
    plan = ct_fft.make_plan(n, m)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, n, n)) + 1j * rng.normal(size=(1, n, n))
    fr, fi = ct_fft.fft2_stored(jnp.asarray(x.real), jnp.asarray(x.imag), plan)
    br, bi = ct_fft.ifft2_stored(fr, fi, plan)
    got = np.asarray(br) + 1j * np.asarray(bi)
    np.testing.assert_allclose(got, x, atol=1e-11)


def test_perm_is_a_permutation_and_matches_layout():
    for n, m in [(256, 2), (512, 4)]:
        p = ct_fft.perm_indices(n, m)
        assert sorted(p) == list(range(n))
        # stored[c*128 + k1] = X[m*k1 + c]
        for c in range(m):
            for k1 in (0, 1, 127):
                assert p[c * 128 + k1] == m * k1 + c


def test_permute2_permutes_both_axes():
    n, m = 256, 2
    plan = ct_fft.make_plan(n, m)
    a = np.arange(n * n, dtype=np.float64).reshape(n, n)
    got = ct_fft.permute2(a, n, m)
    assert got[3, 5] == a[plan.perm[3], plan.perm[5]]


def test_1d_transforms_along_both_axes():
    n, m = 256, 2
    plan = ct_fft.make_plan(n, m)
    rng = np.random.default_rng(2)
    x = rng.normal(size=(3, n)) + 1j * rng.normal(size=(3, n))
    ref = np.fft.fft(x, axis=-1)[:, plan.perm]
    fr, fi = ct_fft.fft1d_stored(jnp.asarray(x.real), jnp.asarray(x.imag), plan, axis=-1)
    np.testing.assert_allclose(np.asarray(fr) + 1j * np.asarray(fi), ref, atol=1e-10)
    xT = np.ascontiguousarray(x.T)  # (n, 3), transform along axis -2
    ref2 = np.fft.fft(xT, axis=0)[plan.perm, :]
    fr2, fi2 = ct_fft.fft1d_stored(jnp.asarray(xT.real), jnp.asarray(xT.imag), plan, axis=-2)
    np.testing.assert_allclose(np.asarray(fr2) + 1j * np.asarray(fi2), ref2, atol=1e-10)
