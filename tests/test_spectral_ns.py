"""Solver convergence tests vs analytic solutions and an independent numpy oracle
(the test strategy the reference lacks — SURVEY.md §4 'Implication')."""

import jax
import jax.numpy as jnp
import numpy as np

from pregen_pde_tpu.core.config import NSVorticityConfig
from pregen_pde_tpu.core.grid import SpectralGrid2D
from pregen_pde_tpu.fields.grf import grf_2d
from pregen_pde_tpu.solvers.spectral_ns import NSVorticitySolver


# ---------------------------------------------------------------------------
# Independent numpy oracle: full complex FFT (not rfft), separate code path.
# ---------------------------------------------------------------------------
def numpy_ns_oracle(w0, nu, dt, n_steps, forcing=None, length=1.0, method="cn_heun"):
    n = w0.shape[0]
    k = np.fft.fftfreq(n, d=length / n) * 2 * np.pi
    KY, KX = np.meshgrid(k, k, indexing="ij")  # axis0 = y (full), axis1 = x
    K2 = KX**2 + KY**2
    kd = k.copy()
    kd[n // 2] = 0.0  # Nyquist zeroed for odd derivatives (matches solver convention)
    KYd, KXd = np.meshgrid(kd, kd, indexing="ij")
    K2_safe = K2.copy()
    K2_safe[0, 0] = 1.0
    kmax = (n // 2) * (2 * np.pi / length)
    dealias = (np.abs(KX) <= (2 / 3) * kmax) & (np.abs(KY) <= (2 / 3) * kmax)

    f_hat = np.fft.fft2(forcing) if forcing is not None else 0.0

    def expl(w_hat):
        psi_hat = w_hat / K2_safe
        psi_hat[0, 0] = 0.0
        u = np.fft.ifft2(1j * KYd * psi_hat).real
        v = np.fft.ifft2(-1j * KXd * psi_hat).real
        wx = np.fft.ifft2(1j * KXd * w_hat).real
        wy = np.fft.ifft2(1j * KYd * w_hat).real
        adv = np.fft.fft2(u * wx + v * wy)
        adv[~dealias] = 0.0
        return -adv + f_hat

    num = 1.0 - 0.5 * dt * nu * K2
    den = 1.0 / (1.0 + 0.5 * dt * nu * K2)
    w_hat = np.fft.fft2(w0)
    n_prev = expl(w_hat) if method == "cn_ab2" else None
    for _ in range(n_steps):
        if method == "cn_euler":
            w_hat = (w_hat * num + dt * expl(w_hat)) * den
        elif method == "cn_ab2":
            n1 = expl(w_hat)
            w_hat = (w_hat * num + dt * (1.5 * n1 - 0.5 * n_prev)) * den
            n_prev = n1
        else:
            n1 = expl(w_hat)
            w_pred = (w_hat * num + dt * n1) * den
            n2 = expl(w_pred)
            w_hat = (w_hat * num + 0.5 * dt * (n1 + n2)) * den
    return np.fft.ifft2(w_hat).real


def test_taylor_green_decay():
    """ω = −2k cos(kx)cos(ky) e^{−2νk²t} is exact (advection vanishes)."""
    n, nu = 64, 1e-2
    cfg = NSVorticityConfig(
        resolution=n, viscosity=nu, length=2 * np.pi, dt=1e-3, t_end=0.5,
        n_snapshots=5, forcing="none", include_initial=False,
    )
    solver = NSVorticitySolver(cfg)
    g = solver.grid
    x, y = g.x[0], g.x[1]
    w0 = jnp.asarray(-2.0 * np.cos(x) * np.cos(y), dtype=jnp.float64)
    snaps = solver.make_trajectory_fn()(w0)
    t = 0.5
    expected = -2.0 * np.cos(x) * np.cos(y) * np.exp(-2.0 * nu * t)
    np.testing.assert_allclose(np.asarray(snaps[-1]), expected, rtol=0, atol=1e-8)


def test_matches_numpy_oracle_forced_grf():
    """Full nonlinear forced run vs the independent oracle at rtol 1e-6 (f64)."""
    n = 32
    cfg = NSVorticityConfig(
        resolution=n, viscosity=1e-3, length=1.0, dt=5e-4, t_end=0.05,
        n_snapshots=1, forcing="fno", include_initial=False,
    )
    solver = NSVorticitySolver(cfg)
    w0 = np.asarray(grf_2d(jax.random.key(0), solver.grid, dtype=jnp.float64))
    from pregen_pde_tpu.solvers.spectral_ns import make_forcing

    forcing = make_forcing(cfg, solver.grid)
    snaps = solver.make_trajectory_fn("cn_heun")(jnp.asarray(w0))
    expected = numpy_ns_oracle(w0, 1e-3, 5e-4, 100, forcing=forcing)
    np.testing.assert_allclose(
        np.asarray(snaps[-1]), expected, rtol=1e-6, atol=1e-10
    )


def test_unforced_enstrophy_decays():
    n = 64
    cfg = NSVorticityConfig(
        resolution=n, viscosity=1e-3, length=1.0, dt=1e-4, t_end=0.02,
        n_snapshots=4, forcing="none", include_initial=True,
    )
    solver = NSVorticitySolver(cfg)
    w0 = grf_2d(jax.random.key(1), solver.grid, dtype=jnp.float64)
    snaps = np.asarray(solver.make_trajectory_fn()(w0))
    enstrophy = (snaps**2).mean(axis=(1, 2))
    assert np.all(np.diff(enstrophy) < 0)


def test_velocity_divergence_free():
    solver = NSVorticitySolver(NSVorticityConfig(resolution=64, length=1.0))
    g = solver.grid
    # band-limit w0: zero the (derivative-ambiguous) Nyquist modes first
    w0_hat = np.array(jnp.fft.rfft2(grf_2d(jax.random.key(2), g, dtype=jnp.float64)))
    w0_hat[g.n // 2, :] = 0.0
    w0_hat[:, -1] = 0.0
    w0 = jnp.asarray(np.fft.irfft2(w0_hat, s=(64, 64)))
    u, v = solver.velocity(jnp.fft.rfft2(w0))
    u_hat, v_hat = jnp.fft.rfft2(u), jnp.fft.rfft2(v)
    div_hat = 1j * g.kx_deriv * u_hat + 1j * g.ky_deriv * v_hat
    assert float(jnp.max(jnp.abs(div_hat))) < 1e-8
    # and the curl of (u,v) recovers the band-limited w0 exactly
    curl_hat = 1j * g.kx_deriv * v_hat - 1j * g.ky_deriv * u_hat
    np.testing.assert_allclose(
        np.asarray(jnp.fft.irfft2(curl_hat, s=(64, 64))), np.asarray(w0), atol=1e-8
    )


def test_batched_vmap_trajectories():
    cfg = NSVorticityConfig(
        resolution=32, viscosity=1e-3, dt=1e-3, t_end=0.01, n_snapshots=2,
    )
    solver = NSVorticitySolver(cfg)
    keys = jax.random.split(jax.random.key(0), 3)
    w0 = jax.vmap(lambda k: grf_2d(k, solver.grid))(keys)
    snaps = solver.make_batched_trajectory_fn()(w0)
    assert snaps.shape == (3, 3, 32, 32)  # include_initial default True → T=3
    # batch elements independent: row 0 equals the single-trajectory run
    single = solver.make_trajectory_fn()(w0[0])
    np.testing.assert_allclose(np.asarray(snaps[0]), np.asarray(single), rtol=1e-6)


def test_packed_path_matches_rfft_path():
    """The production packed-FFT stepper is bit-compatible (f64) with the
    reference rfft2 stepper."""
    cfg = NSVorticityConfig(
        resolution=64, viscosity=1e-3, dt=5e-4, t_end=0.02, n_snapshots=2,
        forcing="fno",
    )
    solver = NSVorticitySolver(cfg)
    w0 = grf_2d(jax.random.key(5), solver.grid, dtype=jnp.float64)
    a = np.asarray(solver.make_trajectory_fn("cn_heun")(w0))
    b = np.asarray(solver.make_trajectory_fn("cn_heun_packed")(w0))
    np.testing.assert_allclose(a, b, atol=1e-13)


def test_ab2_matches_numpy_oracle():
    """CN+AB2 packed stepper vs an independent numpy AB2 mirror (f64,
    rtol 1e-6) — the 1-RHS-eval/step production scheme."""
    n = 32
    cfg = NSVorticityConfig(
        resolution=n, viscosity=1e-3, length=1.0, dt=5e-4, t_end=0.05,
        n_snapshots=1, forcing="fno", include_initial=False,
    )
    solver = NSVorticitySolver(cfg)
    w0 = np.asarray(grf_2d(jax.random.key(7), solver.grid, dtype=jnp.float64))
    from pregen_pde_tpu.solvers.spectral_ns import make_forcing

    forcing = make_forcing(cfg, solver.grid)
    got = solver.make_trajectory_fn("cn_ab2_packed")(jnp.asarray(w0))
    expected = numpy_ns_oracle(w0, 1e-3, 5e-4, 100, forcing=forcing,
                               method="cn_ab2")
    np.testing.assert_allclose(np.asarray(got[-1]), expected,
                               rtol=1e-6, atol=1e-10)


def test_ab2_second_order_and_agrees_with_heun():
    """AB2 and Heun converge to the same solution: ‖AB2(dt) − Heun(dt/4)‖
    shrinks ~O(dt²) under refinement, and at the production-like dt the two
    schemes agree to well under the data's useful precision."""
    n = 32
    base_dt = 1e-3
    t_end = 0.04

    def run(method, dt):
        cfg = NSVorticityConfig(
            resolution=n, viscosity=1e-3, dt=dt, t_end=t_end,
            n_snapshots=1, forcing="fno", include_initial=False,
        )
        solver = NSVorticitySolver(cfg)
        w0 = grf_2d(jax.random.key(9), solver.grid, dtype=jnp.float64)
        return np.asarray(solver.make_trajectory_fn(method)(w0)[-1])

    ref = run("cn_heun_packed", base_dt / 8)
    err_c = np.abs(run("cn_ab2_packed", base_dt) - ref).max()
    err_f = np.abs(run("cn_ab2_packed", base_dt / 2) - ref).max()
    order = np.log2(err_c / err_f)
    assert order > 1.6, f"AB2 convergence order {order:.2f} < 1.6"
    # at equal dt the two 2nd-order schemes agree closely
    diff = np.abs(run("cn_ab2_packed", base_dt / 2) -
                  run("cn_heun_packed", base_dt / 2)).max()
    scale = np.abs(ref).max()
    assert diff / scale < 1e-4, f"AB2 vs Heun rel diff {diff/scale:.2e}"
