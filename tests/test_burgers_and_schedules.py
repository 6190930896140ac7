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


# (Re → endTime) pairs computed from the reference compute_endTime_from_Re
# (`FPO_cylinder/Regular/main.py:969-998`): endTime = ceil(mult·L²/(Re·ν)/100)·100
# with L=2, ν=1.5e-5 (L²/ν = 266666.67), first-match-wins band table, and the
# constant 2700 s for Re ∈ [10, 100).
REFERENCE_PAIRS = [
    (50.0, 2700.0),     # const band
    (100.0, 2700.0),    # mult 1, raw 2666.67
    (150.0, 1800.0),    # raw 1777.78
    (199.0, 1400.0),    # raw 1340.03
    (200.0, 2700.0),    # mult 2 kicks in at the band edge
    (250.0, 2200.0),
    (300.0, 2700.0),    # mult 3
    (350.0, 2300.0),
    (400.0, 2700.0),    # mult 4
    (450.0, 2400.0),
    (500.0, 2700.0),    # mult 5
    (600.0, 2300.0),
    (800.0, 1700.0),
    (1000.0, 2700.0),   # mult 10
    (2000.0, 1400.0),
    (2500.0, 2200.0),   # mult 20
    (3000.0, 1800.0),
    (4000.0, 2000.0),   # mult 30, raw exactly 2000.0
    (5000.0, 2200.0),   # mult 40 (boundary takes the upper band, raw 2133.33)
    (7500.0, 1500.0),
    (10000.0, 1100.0),
]


def test_re_schedule_pinned_reference_pairs():
    res = jnp.asarray([p[0] for p in REFERENCE_PAIRS])
    expected = np.asarray([p[1] for p in REFERENCE_PAIRS])
    np.testing.assert_allclose(np.asarray(schedules.end_time_from_re(res)), expected)
    for re, t in REFERENCE_PAIRS:
        assert schedules.end_time_from_re_py(re) == t


def test_re_schedule_dense_sweep_matches_scalar_oracle():
    res = np.linspace(10.0, 10000.0, 2001)
    expected = np.asarray([schedules.end_time_from_re_py(r) for r in res])
    got = np.asarray(schedules.end_time_from_re(jnp.asarray(res)))
    np.testing.assert_allclose(got, expected)
    # f32 path agrees too (band-edge ceil guard)
    got32 = np.asarray(schedules.end_time_from_re(jnp.asarray(res, dtype=jnp.float32)))
    np.testing.assert_allclose(got32, expected)
    # envelope facts from the reference law: ≤2700 everywhere, 2700 at low-Re
    # band edges, decaying toward 1100 at Re=10⁴ — NOT monotone (sawtooth).
    assert expected.max() == 2700.0
    assert expected[-1] == 1100.0
    assert np.any(np.diff(expected) > 0) and np.any(np.diff(expected) < 0)


def test_re_schedule_step_counts():
    # reference Δt = 0.2 s → 5500..13500 icoFoam steps over the full schedule
    steps = np.asarray(
        schedules.steps_for_horizon(
            schedules.end_time_from_re(jnp.asarray([1000.0, 10000.0])), dt=0.2
        )
    )
    np.testing.assert_array_equal(steps, [13500, 5500])


def test_re_sampling_and_normalization():
    re = schedules.sample_reynolds(jax.random.key(0), 1000)
    assert float(re.min()) >= 100.0 and float(re.max()) <= 10000.0
    rn = schedules.normalize_re(re)
    assert float(rn.min()) >= 0.0 and float(rn.max()) <= 1.0
    np.testing.assert_allclose(
        np.asarray(schedules.denormalize_re(rn)), np.asarray(re), rtol=1e-12
    )
