"""Per-snapshot relative error of the Pallas precision tiers vs the
independent f64 numpy oracle — ON CHIP (VERDICT r2 item 3; BASELINE.md's
"reference-trajectory agreement at rtol 1e-6 at every saved snapshot" bar).

Runs the north-star workload (256², ν=1e-4, 2500 CN+AB2 steps, 50 snapshots —
the bench.py config) through each stepper tier on the TPU, then integrates
the SAME initial conditions with the f64 full-complex-FFT numpy oracle (an
independent code path, mirrored from `tests/test_spectral_ns.py::
numpy_ns_oracle`, snapshot-capturing variant) and reports the relative L2
error at every snapshot.

Prints ONE JSON line:
  {"tiers": {tier: {"max_rel": .., "final_rel": .., "per_snapshot": [..]}},
   "n_snapshots": 50, "batch": B}

Usage: python examples/measure_tier_error.py [batch]
(On CPU the `high`/`exact` tiers run through the Pallas interpreter with
faithful arithmetic — real bf16-split operands, f32 accumulation — so their
errors are a valid measurement; `fast` needs the chip, see the tier list.)
"""

from __future__ import annotations

import json
import sys

import numpy as np


def oracle_snapshots(w0, nu, dt, inner_steps, n_snapshots, forcing=None,
                     length=1.0):
    """f64 CN+AB2 pseudo-spectral integrator (full complex FFT — an
    independent discretization code path from the solver's packed rfft and
    the Pallas CT-FFT), returning vorticity at every snapshot."""
    w0 = np.asarray(w0, np.float64)
    n = w0.shape[0]
    k = np.fft.fftfreq(n, d=length / n) * 2 * np.pi
    KY, KX = np.meshgrid(k, k, indexing="ij")
    K2 = KX**2 + KY**2
    kd = k.copy()
    kd[n // 2] = 0.0  # Nyquist zeroed for odd derivatives (solver convention)
    KYd, KXd = np.meshgrid(kd, kd, indexing="ij")
    K2_safe = K2.copy()
    K2_safe[0, 0] = 1.0
    kmax = (n // 2) * (2 * np.pi / length)
    dealias = (np.abs(KX) <= (2 / 3) * kmax) & (np.abs(KY) <= (2 / 3) * kmax)
    f_hat = np.fft.fft2(np.asarray(forcing, np.float64)) \
        if forcing is not None else 0.0

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
    n_prev = expl(w_hat)
    snaps = [w0]
    for _ in range(n_snapshots):
        for _ in range(inner_steps):
            n1 = expl(w_hat)
            w_hat = (w_hat * num + dt * (1.5 * n1 - 0.5 * n_prev)) * den
            n_prev = n1
        snaps.append(np.fft.ifft2(w_hat).real)
    return np.stack(snaps)


def main():
    import jax

    from pregen_pde_tpu.utils.misc import use_best_backend

    use_best_backend()  # tolerate the tunnel's shifting platform name

    from pregen_pde_tpu.core.config import NSVorticityConfig
    from pregen_pde_tpu.fields.grf import grf_2d
    from pregen_pde_tpu.solvers.spectral_ns import (
        NSVorticitySolver,
        make_forcing,
    )
    from pregen_pde_tpu.utils.compcache import enable_persistent_cache

    enable_persistent_cache()
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("batch", nargs="?", type=int, default=2)
    # toy-size knobs so CI can smoke-test the script (tests/test_examples.py);
    # defaults are the full north-star config
    ap.add_argument("--resolution", type=int, default=256)
    ap.add_argument("--t-end", type=float, default=0.25)
    ap.add_argument("--snapshots", type=int, default=50)
    args = ap.parse_args()
    batch = args.batch
    cfg = NSVorticityConfig(
        resolution=args.resolution, viscosity=1e-4, dt=1e-4,
        t_end=args.t_end, n_snapshots=args.snapshots, forcing="fno",
        include_initial=True,
    )
    solver = NSVorticitySolver(cfg)
    keys = jax.random.split(jax.random.key(0), batch)
    w0 = jax.device_get(
        jax.jit(jax.vmap(lambda k: grf_2d(k, solver.grid)))(keys)
    ).astype(np.float32)

    inner = round(cfg.t_end / cfg.dt / cfg.n_snapshots)
    forcing = make_forcing(cfg, solver.grid)
    print(f"# oracle: {batch}x {cfg.n_snapshots}x{inner} f64 steps...",
          file=sys.stderr, flush=True)
    ref = np.stack([
        oracle_snapshots(w0[b], cfg.viscosity, cfg.dt, inner,
                         cfg.n_snapshots, forcing=forcing)
        for b in range(batch)
    ])  # (B, T+1, n, n)
    ref_norm = np.linalg.norm(ref, axis=(2, 3))  # (B, T+1)

    on_tpu = jax.default_backend() != "cpu"
    # On CPU the Pallas kernels run through the interpreter with REAL bf16
    # arithmetic for the `high` tier (its inputs/matrices are explicitly
    # bf16-split, so CPU dots see the same bf16-rounded operands and f32
    # accumulation the MXU does — only accumulation ORDER differs) and
    # f32-exact arithmetic for `exact` (≈ HIGHEST's 6-pass result). The
    # `fast` tier is only meaningful ON CHIP: its default-precision f32
    # dots are lowered to one bf16 MXU pass by Mosaic but stay full-f32 on
    # CPU, so a CPU run would spuriously report near-exact error.
    tiers = (
        ["cn_ab2_pallas", "cn_ab2_pallas_high", "cn_ab2_pallas_exact",
         "cn_ab2_packed"]
        if on_tpu else ["cn_ab2_pallas_high", "cn_ab2_pallas_exact",
                        "cn_ab2_packed"]
    )
    out = {}
    for tier in tiers:
        traj = jax.jit(solver.make_batched_trajectory_fn(tier))
        got = np.asarray(jax.device_get(traj(jax.numpy.asarray(w0))),
                         np.float64)  # (B, T+1, n, n)
        rel = np.linalg.norm(got - ref, axis=(2, 3)) / ref_norm  # (B, T+1)
        per_snap = rel[:, 1:].max(axis=0)  # worst over batch, per snapshot
        out[tier] = {
            "max_rel": float(per_snap.max()),
            "final_rel": float(rel[:, -1].max()),
            "per_snapshot": [float(f"{v:.3e}") for v in per_snap],
        }
        print(f"# {tier}: max_rel={per_snap.max():.3e} "
              f"final={rel[:, -1].max():.3e}", file=sys.stderr, flush=True)
    print(json.dumps({"tiers": {k: {kk: vv for kk, vv in v.items()
                                    if kk != "per_snapshot"}
                                for k, v in out.items()},
                      "per_snapshot": {k: v["per_snapshot"]
                                       for k, v in out.items()},
                      "n_snapshots": cfg.n_snapshots, "batch": batch,
                      "backend": jax.default_backend(),
                      "emulated": not on_tpu}),
          flush=True)


if __name__ == "__main__":
    main()
