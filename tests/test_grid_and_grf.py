import jax
import jax.numpy as jnp
import numpy as np

from pregen_pde_tpu.core.grid import SpectralGrid1D, SpectralGrid2D
from pregen_pde_tpu.fields.grf import grf_1d, grf_2d, lognormal_grf_2d


def test_grid2d_wavenumbers():
    g = SpectralGrid2D(16, length=1.0)
    assert g.kx.shape == (1, 9)
    assert g.ky.shape == (16, 1)
    # k=1 mode is 2*pi/L
    assert np.isclose(g.kx[0, 1], 2 * np.pi)
    assert np.isclose(g.ky[1, 0], 2 * np.pi)
    # negative frequencies on the full axis
    assert g.ky[-1, 0] < 0
    # inv_k2 zeroes the mean mode
    assert g.inv_k2[0, 0] == 0.0
    assert np.isclose(g.inv_k2[0, 1], 1.0 / (2 * np.pi) ** 2)


def test_dealias_mask_two_thirds():
    g = SpectralGrid2D(32)
    kmax = 16 * 2 * np.pi
    inside = np.abs(g.ky) <= (2 / 3) * kmax
    assert np.array_equal(g.dealias_mask[:, 0].astype(bool), inside[:, 0])


def test_grf2d_deterministic_and_shaped():
    g = SpectralGrid2D(64)
    k = jax.random.key(0)
    a = grf_2d(k, g)
    b = grf_2d(k, g)
    assert a.shape == (64, 64)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = grf_2d(jax.random.key(1), g)
    assert not np.allclose(np.asarray(a), np.asarray(c))


def test_grf2d_variance_matches_spectrum():
    """Pointwise variance should approximate sum_k S(k)."""
    g = SpectralGrid2D(32)
    alpha, tau = 2.5, 7.0
    sigma = tau ** (0.5 * (2 * alpha - 2))
    # expected variance from full-fft spectrum (independent numpy computation)
    kx = np.fft.fftfreq(g.n, d=1.0 / g.n) * 2 * np.pi
    KX, KY = np.meshgrid(kx, kx, indexing="ij")
    S = sigma**2 * (KX**2 + KY**2 + tau**2) ** (-alpha)
    S[0, 0] = 0.0  # zero_mean
    expected_var = S.sum()
    keys = jax.random.split(jax.random.key(42), 256)
    samples = jax.vmap(lambda k: grf_2d(k, g, alpha=alpha, tau=tau, dtype=jnp.float64))(
        keys
    )
    var = float(np.var(np.asarray(samples)))
    assert abs(var - expected_var) / expected_var < 0.1


def test_grf2d_zero_mean_mode():
    g = SpectralGrid2D(64)
    x = grf_2d(jax.random.key(3), g, dtype=jnp.float64)
    assert abs(float(jnp.mean(x))) < 1e-10


def test_grf1d_and_lognormal():
    g1 = SpectralGrid1D(128)
    u = grf_1d(jax.random.key(0), g1)
    assert u.shape == (128,)
    g2 = SpectralGrid2D(32)
    perm = lognormal_grf_2d(jax.random.key(0), g2)
    assert float(jnp.min(perm)) > 0.0
