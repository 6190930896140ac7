"""Pseudo-spectral 2-D incompressible Navier-Stokes in vorticity form.

The TPU-native replacement for the reference's OpenFOAM `icoFoam` layer
(`dataset_gen/NS_datasets/FPO_cylinder/Regular/main.py:129-151` invokes the
external FVM solver per trajectory on CPU). Here a whole batch of trajectories
integrates in one ``jit``/``vmap`` program: state lives in Fourier space
(complex, (n, n//2+1) rfft2 layout), FFTs hit XLA's native TPU FFT, and every
elementwise stage fuses.

Equations (periodic [0,L)^2):

    dω/dt + u·∇ω = ν Δω + f − μ ω,    u = (∂y ψ, −∂x ψ),   −Δψ = ω

Time stepping: IMEX — Crank-Nicolson for the stiff viscous term, explicit
Heun (RK2) or Euler for advection + forcing, 2/3-rule dealiasing on the
nonlinear term (BASELINE.json north-star scheme).

Numerics discipline: dtype-polymorphic; tests run float64 on CPU against an
independent numpy oracle, production runs float32 (complex64) on TPU.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from pregen_pde_tpu.core.config import NSVorticityConfig
from pregen_pde_tpu.core.grid import SpectralGrid2D

# fused Pallas stepper variants -> matmul precision (`spectral_ns_pallas`)
PALLAS_METHODS = {
    "cn_ab2_pallas": "fast",
    "cn_ab2_pallas_high": "high",
    "cn_ab2_pallas_exact": "exact",
}


def fno_forcing(grid: SpectralGrid2D, amplitude: float = 0.1) -> np.ndarray:
    """f(x,y) = A (sin(2π(x+y)) + cos(2π(x+y))) — the classic FNO-dataset
    forcing (symmetric in x and y, so axis labels are immaterial here)."""
    a, b = grid.x[0], grid.x[1]
    s = 2.0 * np.pi * (a + b) / grid.length
    return amplitude * (np.sin(s) + np.cos(s))


def kolmogorov_forcing(
    grid: SpectralGrid2D, wavenumber: int = 4, amplitude: float = 1.0
) -> np.ndarray:
    """Vorticity-form Kolmogorov forcing: curl of A sin(k y) x̂ → −A k cos(k y).

    Solver convention: axis 0 is y (the ky/full-FFT axis) — grid.x[0] varies
    along axis 0."""
    y = grid.x[0]
    k = 2.0 * np.pi * wavenumber / grid.length
    return -amplitude * k * np.cos(k * y)


def _real_dtype(x: jax.Array):
    """float dtype matching a complex (or real) array's precision."""
    return jnp.finfo(x.dtype).dtype if jnp.issubdtype(x.dtype, jnp.floating) else (
        jnp.float32 if x.dtype == jnp.complex64 else jnp.float64
    )


def make_forcing(cfg: NSVorticityConfig, grid: SpectralGrid2D) -> np.ndarray | None:
    if cfg.forcing == "none":
        return None
    if cfg.forcing == "fno":
        return fno_forcing(grid, cfg.forcing_amplitude)
    if cfg.forcing == "kolmogorov":
        return kolmogorov_forcing(grid, cfg.forcing_wavenumber, cfg.forcing_amplitude)
    raise ValueError(f"unknown forcing {cfg.forcing!r}")


@dataclasses.dataclass(frozen=True)
class NSVorticitySolver:
    """Functional solver: all methods are pure, jit/vmap-safe.

    State convention: ``w_hat`` complex array, shape ``grid.rfft_shape``.
    """

    cfg: NSVorticityConfig

    @property
    def grid(self) -> SpectralGrid2D:
        return SpectralGrid2D(self.cfg.resolution, self.cfg.length)

    # -- spectral operators --------------------------------------------------

    def _consts(self, real_dtype):
        """Grid constants cast to the working precision (keeps complex64 state
        complex64 — numpy f64 constants would silently promote to complex128)."""
        g = self.grid
        c = lambda a: jnp.asarray(a, dtype=real_dtype)
        return c(g.kx_deriv), c(g.ky_deriv), c(g.inv_k2), c(g.dealias_mask)

    def velocity_hat(self, w_hat: jax.Array) -> tuple[jax.Array, jax.Array]:
        """(û, v̂) from vorticity via streamfunction: ψ̂ = ŵ/|k|²,
        u = ∂y ψ, v = −∂x ψ."""
        kx, ky, inv_k2, _ = self._consts(_real_dtype(w_hat))
        psi_hat = w_hat * inv_k2
        u_hat = 1j * ky * psi_hat
        v_hat = -1j * kx * psi_hat
        return u_hat, v_hat

    def velocity(self, w_hat: jax.Array) -> tuple[jax.Array, jax.Array]:
        n = self.grid.n
        u_hat, v_hat = self.velocity_hat(w_hat)
        return jnp.fft.irfft2(u_hat, s=(n, n)), jnp.fft.irfft2(v_hat, s=(n, n))

    def pressure(self, w_hat: jax.Array) -> jax.Array:
        """Pressure from the Poisson equation Δp = −∇·(u·∇u) = 2(u_x v_y − u_y v_x).

        The reference's OpenFOAM output includes p as a channel
        (`Regular/main.py:883-890`); here p is diagnosed spectrally."""
        g = self.grid
        n = g.n
        u_hat, v_hat = self.velocity_hat(w_hat)
        ux = jnp.fft.irfft2(1j * g.kx_deriv * u_hat, s=(n, n))
        uy = jnp.fft.irfft2(1j * g.ky_deriv * u_hat, s=(n, n))
        vx = jnp.fft.irfft2(1j * g.kx_deriv * v_hat, s=(n, n))
        vy = jnp.fft.irfft2(1j * g.ky_deriv * v_hat, s=(n, n))
        rhs = 2.0 * (ux * vy - uy * vx)
        rhs_hat = jnp.fft.rfft2(rhs)
        # Δp = rhs → (−|k|²) p̂ = rhŝ → p̂ = −rhŝ/|k|²
        p_hat = -rhs_hat * g.inv_k2
        return jnp.fft.irfft2(p_hat, s=(n, n))

    def _nonlinear_hat(self, w_hat: jax.Array) -> jax.Array:
        """Dealiased −(u·∇ω)^ in Fourier space."""
        g = self.grid
        n = g.n
        kx, ky, _, dealias = self._consts(_real_dtype(w_hat))
        u_hat, v_hat = self.velocity_hat(w_hat)
        u = jnp.fft.irfft2(u_hat, s=(n, n))
        v = jnp.fft.irfft2(v_hat, s=(n, n))
        wx = jnp.fft.irfft2(1j * kx * w_hat, s=(n, n))
        wy = jnp.fft.irfft2(1j * ky * w_hat, s=(n, n))
        adv_hat = jnp.fft.rfft2(u * wx + v * wy)
        if self.cfg.dealias:
            adv_hat = adv_hat * dealias
        return -adv_hat

    def rhs_explicit(self, w_hat: jax.Array, f_hat: jax.Array | None) -> jax.Array:
        """Everything except viscosity: advection + forcing − drag."""
        out = self._nonlinear_hat(w_hat)
        if f_hat is not None:
            out = out + f_hat
        if self.cfg.drag != 0.0:
            out = out - self.cfg.drag * w_hat
        return out

    # -- time steppers ---------------------------------------------------------

    def step_cn_euler(self, w_hat, dt, f_hat, visc_num, visc_den):
        """CN diffusion + forward-Euler advection (1st order, oracle-simple)."""
        return (w_hat * visc_num + dt * self.rhs_explicit(w_hat, f_hat)) * visc_den

    def step_cn_heun(self, w_hat, dt, f_hat, visc_num, visc_den):
        """CN diffusion + Heun (RK2) advection — default production stepper."""
        n1 = self.rhs_explicit(w_hat, f_hat)
        w_pred = (w_hat * visc_num + dt * n1) * visc_den
        n2 = self.rhs_explicit(w_pred, f_hat)
        return (w_hat * visc_num + 0.5 * dt * (n1 + n2)) * visc_den

    def _visc_factors(self, dt: float, real_dtype) -> tuple[jax.Array, jax.Array]:
        nu_k2 = self.cfg.viscosity * self.grid.k2
        num = jnp.asarray(1.0 - 0.5 * dt * nu_k2, dtype=real_dtype)
        den = jnp.asarray(1.0 / (1.0 + 0.5 * dt * nu_k2), dtype=real_dtype)
        return num, den

    # -- trajectory API ----------------------------------------------------------

    # -- packed-FFT production path -------------------------------------------
    # State in FULL complex fft2 layout; each explicit-RHS evaluation packs two
    # real inverse transforms into one complex ifft2 (ifft2(A + iB) = a + ib
    # for Hermitian A, B): (u,v) in one, (w_x,w_y) in another, + one forward
    # fft2 of the advection product → 3 complex FFTs/eval instead of the
    # rfft2 path's 5. ~40% fewer FFT flops on the HBM-bandwidth-bound hot loop.

    def _consts_full(self, real_dtype):
        g = self.grid
        c = lambda a: jnp.asarray(a, dtype=real_dtype)
        return (
            c(g.kx_full_deriv),
            c(g.ky_full_deriv),
            c(g.inv_k2_full),
            c(g.dealias_mask_full),
        )

    def _rhs_explicit_full(self, w_hat, f_hat, kx, ky, inv_k2, dealias):
        psi = w_hat * inv_k2
        uv = jnp.fft.ifft2(1j * ky * psi + 1j * (-1j * kx * psi))
        u, v = jnp.real(uv), jnp.imag(uv)
        wxy = jnp.fft.ifft2(1j * kx * w_hat + 1j * (1j * ky * w_hat))
        wx, wy = jnp.real(wxy), jnp.imag(wxy)
        adv_hat = jnp.fft.fft2(u * wx + v * wy)
        if self.cfg.dealias:
            adv_hat = adv_hat * dealias
        out = -adv_hat
        if f_hat is not None:
            out = out + f_hat
        if self.cfg.drag != 0.0:
            out = out - self.cfg.drag * w_hat
        return out

    def _build_traj_packed(self, inner_steps=None, scheme: str = "heun"):
        """``inner_steps`` may be a Python int (baked in) OR a traced int32
        scalar passed at call time (`traj(w0, nu, inner_steps)`) — the traced
        form lets ONE compiled program serve every difficulty-horizon bucket
        (the reference's Re-dependent `RE_TIME_SCHEDULE` would otherwise force
        a recompile per horizon).

        ``scheme``:
          - "heun" — CN + Heun (RK2): 2 RHS evals/step (6 complex FFTs).
          - "ab2"  — CN + Adams-Bashforth-2: 1 RHS eval/step (3 complex
            FFTs) — the scheme of the canonical FNO dataset generator.
            Bootstraps with one forward-Euler step (nprev := rhs(w0) makes
            step 0 exactly Euler); a single O(dt²)-local-error step keeps the
            global order at 2. ~1.8x throughput on the FFT-bound north star.
        """
        cfg = self.cfg
        grid = self.grid
        n = grid.n
        default_inner = inner_steps
        if default_inner is None:
            total_steps = int(round(cfg.t_end / cfg.dt))
            default_inner = max(total_steps // cfg.n_snapshots, 1)

        def traj(w0: jax.Array, nu=None, inner_steps=None) -> jax.Array:
            inner_steps = default_inner if inner_steps is None else inner_steps
            real_dtype = w0.dtype
            dt = jnp.asarray(cfg.dt, dtype=real_dtype)
            kx, ky, inv_k2, dealias = self._consts_full(real_dtype)
            # CN diffusion uses the TRUE |k|² (incl. Nyquist), not the
            # derivative-zeroed kx/ky
            k2 = jnp.asarray(grid.k2_full, dtype=real_dtype)
            nu_v = jnp.asarray(cfg.viscosity if nu is None else nu, dtype=real_dtype)
            nu_k2 = nu_v * k2
            visc_num = 1.0 - 0.5 * dt * nu_k2
            visc_den = 1.0 / (1.0 + 0.5 * dt * nu_k2)
            forcing = make_forcing(cfg, grid)
            f_hat = (
                None
                if forcing is None
                else jnp.fft.fft2(jnp.asarray(forcing, dtype=real_dtype))
            )
            w_hat0 = jnp.fft.fft2(w0.astype(real_dtype))

            def rhs(wh):
                return self._rhs_explicit_full(wh, f_hat, kx, ky, inv_k2, dealias)

            if scheme == "heun":

                def one(i, wh):
                    n1 = rhs(wh)
                    pred = (wh * visc_num + dt * n1) * visc_den
                    n2 = rhs(pred)
                    return (wh * visc_num + 0.5 * dt * (n1 + n2)) * visc_den

                def snapshot_body(w_hat, _):
                    w_hat = jax.lax.fori_loop(0, inner_steps, one, w_hat)
                    return w_hat, jnp.real(jnp.fft.ifft2(w_hat))

                _, snaps = jax.lax.scan(
                    snapshot_body, w_hat0, None, length=cfg.n_snapshots
                )
            elif scheme == "ab2":

                def one_ab2(i, carry):
                    wh, nprev = carry
                    n1 = rhs(wh)
                    wh2 = (wh * visc_num + dt * (1.5 * n1 - 0.5 * nprev)) * visc_den
                    return (wh2, n1)

                def snapshot_body(carry, _):
                    carry = jax.lax.fori_loop(0, inner_steps, one_ab2, carry)
                    return carry, jnp.real(jnp.fft.ifft2(carry[0]))

                _, snaps = jax.lax.scan(
                    snapshot_body, (w_hat0, rhs(w_hat0)), None,
                    length=cfg.n_snapshots,
                )
            else:
                raise ValueError(f"unknown packed scheme {scheme!r}")
            if cfg.include_initial:
                snaps = jnp.concatenate([w0[None], snaps], axis=0)
            return snaps

        return traj

    def _build_traj(self, method: str, traced_nu: bool, inner_steps: int | None = None):
        cfg = self.cfg
        grid = self.grid
        n = grid.n
        if inner_steps is None:
            total_steps = int(round(cfg.t_end / cfg.dt))
            inner_steps = max(total_steps // cfg.n_snapshots, 1)
        stepper = {"cn_heun": self.step_cn_heun, "cn_euler": self.step_cn_euler}[method]

        def traj(w0: jax.Array, nu=None) -> jax.Array:
            real_dtype = w0.dtype
            dt = jnp.asarray(cfg.dt, dtype=real_dtype)
            if traced_nu:
                k2 = jnp.asarray(grid.k2, dtype=real_dtype)
                nu_k2 = jnp.asarray(nu, dtype=real_dtype) * k2
                visc_num = 1.0 - 0.5 * dt * nu_k2
                visc_den = 1.0 / (1.0 + 0.5 * dt * nu_k2)
            else:
                visc_num, visc_den = self._visc_factors(cfg.dt, real_dtype)
            forcing = make_forcing(cfg, grid)
            f_hat = (
                None
                if forcing is None
                else jnp.fft.rfft2(jnp.asarray(forcing, dtype=real_dtype))
            )
            w_hat0 = jnp.fft.rfft2(w0)

            def snapshot_body(w_hat, _):
                def one(i, wh):
                    return stepper(wh, dt, f_hat, visc_num, visc_den)

                w_hat = jax.lax.fori_loop(0, inner_steps, one, w_hat)
                return w_hat, jnp.fft.irfft2(w_hat, s=(n, n))

            _, snaps = jax.lax.scan(snapshot_body, w_hat0, None, length=cfg.n_snapshots)
            if cfg.include_initial:
                snaps = jnp.concatenate([w0[None], snaps], axis=0)
            return snaps

        return traj

    def make_trajectory_fn(self, method: str = "cn_heun", inner_steps: int | None = None):
        """Returns jit-able ``traj(w0) -> w_snapshots`` of shape
        (n_snapshots[+1], n, n) in physical space.

        Snapshot thinning ≡ the reference's controlDict rewrite to exactly 20
        writes (`Regular/main.py:1002-1047`), expressed as `lax.scan` over
        snapshot intervals with an inner `fori_loop` of solver steps.
        """
        if method in PALLAS_METHODS:
            batched = self.make_batched_trajectory_fn_nu(method, inner_steps)
            return lambda w0: batched(w0[None])[0]
        if method == "cn_heun_packed":
            base = self._build_traj_packed(inner_steps)
            return lambda w0: base(w0)
        if method == "cn_ab2_packed":
            base = self._build_traj_packed(inner_steps, scheme="ab2")
            return lambda w0: base(w0)
        base = self._build_traj(method, traced_nu=False, inner_steps=inner_steps)
        return lambda w0: base(w0)

    def make_trajectory_fn_nu(self, method: str = "cn_heun", inner_steps: int | None = None):
        """Like ``make_trajectory_fn`` but viscosity is a traced per-call scalar:
        ``traj(w0, nu)`` — the physics-difficulty axis, vmap-able over a batch
        of Reynolds numbers (reference difficulty: `Regular/main.py:474-518`)."""
        if method == "cn_heun_packed":
            return self._build_traj_packed(inner_steps)
        if method == "cn_ab2_packed":
            return self._build_traj_packed(inner_steps, scheme="ab2")
        return self._build_traj(method, traced_nu=True, inner_steps=inner_steps)

    def make_batched_trajectory_fn(self, method: str = "cn_heun"):
        """vmap over a leading batch of initial vorticities: (B,n,n) → (B,T,n,n)."""
        if method in PALLAS_METHODS:
            return self.make_batched_trajectory_fn_nu(method)
        return jax.vmap(self.make_trajectory_fn(method))

    def make_batched_trajectory_fn_nu(self, method: str = "cn_heun", inner_steps: int | None = None):
        """vmap over (B,n,n) ICs and (B,) viscosities → (B,T,n,n).

        ``method="cn_ab2_pallas"`` (TPU only) runs the whole CN+AB2 loop as
        one fused VMEM-resident Mosaic kernel — ~10x the XLA-FFT path on the
        north star (PERF.md); ``_high`` = 3-pass split-bf16 matmuls
        (rtol-1e-6 grade); ``_exact`` = f32-exact HIGHEST matmuls.
        Signature gains an optional traced ``inner_steps`` third arg, same
        as the packed jnp path.
        """
        if method in PALLAS_METHODS:
            from pregen_pde_tpu.solvers.spectral_ns_pallas import build_batched_traj

            return build_batched_traj(
                self, inner_steps, precision=PALLAS_METHODS[method]
            )
        return jax.vmap(self.make_trajectory_fn_nu(method, inner_steps))

    # -- diagnostics -------------------------------------------------------------

    def fields_from_vorticity(self, w: jax.Array) -> dict[str, jax.Array]:
        """Physical-space (u, v, p) from physical vorticity — the contract channels."""
        w_hat = jnp.fft.rfft2(w)
        u, v = self.velocity(w_hat)
        p = self.pressure(w_hat)
        return {"u": u, "v": v, "p": p, "w": w}


def cfl_dt(solver: NSVorticitySolver, w0: jax.Array, safety: float = 0.5) -> float:
    """Advisory CFL bound (host-side helper; not used inside jit)."""
    u, v = solver.velocity(jnp.fft.rfft2(w0))
    umax = float(jnp.max(jnp.sqrt(u**2 + v**2)))
    dx = solver.cfg.length / solver.cfg.resolution
    return safety * dx / max(umax, 1e-12)
