import jax
import jax.numpy as jnp
import numpy as np

from pregen_pde_tpu.core.config import BurgersConfig
from pregen_pde_tpu.fields.grf import grf_1d
from pregen_pde_tpu.solvers import schedules
from pregen_pde_tpu.solvers.burgers import BurgersSolver


def numpy_burgers_oracle(u0, nu, dt, n_steps, length=1.0):
    n = u0.shape[0]
    k = np.fft.fftfreq(n, d=length / n) * 2 * np.pi
    kd = k.copy()
    kd[n // 2] = 0.0  # Nyquist zeroed for odd derivative (matches solver convention)
    kmax = (n // 2) * (2 * np.pi / length)
    dealias = np.abs(k) <= (2 / 3) * kmax
    num = 1.0 - 0.5 * dt * nu * k**2
    den = 1.0 / (1.0 + 0.5 * dt * nu * k**2)

    def expl(u_hat):
        u = np.fft.ifft(u_hat).real
        flux = np.fft.fft(0.5 * u * u)
        flux[~dealias] = 0.0
        return -1j * kd * flux

    u_hat = np.fft.fft(u0)
    for _ in range(n_steps):
        n1 = expl(u_hat)
        pred = (u_hat * num + dt * n1) * den
        n2 = expl(pred)
        u_hat = (u_hat * num + 0.5 * dt * (n1 + n2)) * den
    return np.fft.ifft(u_hat).real


def test_burgers_matches_oracle():
    cfg = BurgersConfig(resolution=128, viscosity=0.1, dt=1e-3, t_end=0.1, n_snapshots=1)
    solver = BurgersSolver(cfg)
    u0 = np.asarray(grf_1d(jax.random.key(0), solver.grid, dtype=jnp.float64))
    snaps = solver.make_trajectory_fn()(jnp.asarray(u0))
    expected = numpy_burgers_oracle(u0, 0.1, 1e-3, 100)
    np.testing.assert_allclose(np.asarray(snaps[-1]), expected, rtol=1e-6, atol=1e-12)


def test_burgers_momentum_conserved_and_decay():
    cfg = BurgersConfig(resolution=256, viscosity=0.05, dt=1e-3, t_end=0.2, n_snapshots=4)
    solver = BurgersSolver(cfg)
    u0 = grf_1d(jax.random.key(1), solver.grid, dtype=jnp.float64)
    snaps = np.asarray(solver.make_trajectory_fn()(u0))
    assert snaps.shape == (5, 256)
    means = snaps.mean(axis=1)
    np.testing.assert_allclose(means, means[0], atol=1e-12)
    energy = (snaps**2).mean(axis=1)
    assert energy[-1] < energy[0]


def test_re_schedule():
    re = jnp.asarray([100.0, 2000.0, 5000.0, 10000.0])
    t = schedules.end_time_from_re(re)
    np.testing.assert_allclose(np.asarray(t), [100.0, 500.0, 1500.0, 2700.0])
    # in-between values round UP to next 100
    t_mid = float(schedules.end_time_from_re(jnp.asarray(3000.0)))
    assert t_mid % 100 == 0
    assert 500.0 < t_mid <= 1600.0
    # monotone
    res = jnp.linspace(100.0, 10000.0, 50)
    ts = np.asarray(schedules.end_time_from_re(res))
    assert np.all(np.diff(ts) >= 0)


def test_re_sampling_and_normalization():
    re = schedules.sample_reynolds(jax.random.key(0), 1000)
    assert float(re.min()) >= 100.0 and float(re.max()) <= 10000.0
    rn = schedules.normalize_re(re)
    assert float(rn.min()) >= 0.0 and float(rn.max()) <= 1.0
    np.testing.assert_allclose(
        np.asarray(schedules.denormalize_re(rn)), np.asarray(re), rtol=1e-12
    )
