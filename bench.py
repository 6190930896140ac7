"""North-star benchmark: 2-D NS 256² vorticity trajectory generation throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Workload (BASELINE.md): pseudo-spectral 2-D NS vorticity, ν=1e-4, 256² grid,
50 snapshots × 50 inner steps = 2500 IMEX steps per trajectory — comparable
work to the reference's median icoFoam run (5,500-13,500 PISO steps on a 128²
FVM mesh, `FPO_cylinder/Regular/main.py:969-998` + `controlDict:25-31`).

Beyond the headline `value` (the fused Pallas "fast" stepper), the line
carries the full precision/throughput matrix:
  - "high_traj_per_sec"  — 3-pass split-bf16 matmuls (~2⁻¹⁷/op): the
    rtol-1e-6-grade path (BASELINE.md's exactness bar);
  - "exact_traj_per_sec" — HIGHEST (f32-exact) matmuls;
  - "end_to_end_traj_per_sec" — solve + fused in-kernel (u,v,p) contract
    diagnosis + full (B,T,256,256,6) device→host fetch: what the dataset
    pipeline actually sustains per chip.

Baseline: the reference publishes no timing tables (BASELINE.md). We use a
deliberately *favorable-to-the-reference* estimate of its single-core icoFoam
cost: 2,500 transient PISO steps on 16k cells ≈ 60 s/trajectory ⇒
1/60 traj/s/core. `vs_baseline` = our traj/s/chip ÷ that.
"""

import json
import time

import jax
import jax.numpy as jnp

from pregen_pde_tpu.core.config import NSVorticityConfig
from pregen_pde_tpu.fields.grf import grf_2d
from pregen_pde_tpu.solvers.spectral_ns import NSVorticitySolver

BASELINE_TRAJ_PER_SEC = 1.0 / 60.0  # reference icoFoam estimate (see docstring)

BATCH = 32
CFG = NSVorticityConfig(
    resolution=256,
    viscosity=1e-4,
    dt=1e-4,
    t_end=0.25,  # 2500 steps
    n_snapshots=50,
    forcing="fno",
    include_initial=True,
)


def _time_traj(traj, w0, n_rep=2, probe=lambda out: out[:, -1, 0, 0]):
    def run_sync():
        # device_get of a tiny slice forces real completion; block_until_ready
        # is a no-op on tunneled backends, so never trust it for timing here.
        return jax.device_get(probe(traj(w0)))

    run_sync()  # warmup / compile
    t0 = time.perf_counter()
    for _ in range(n_rep):
        run_sync()
    elapsed = (time.perf_counter() - t0) / n_rep
    return BATCH / elapsed


def main():
    solver = NSVorticitySolver(CFG)
    keys = jax.random.split(jax.random.key(0), BATCH)
    w0 = jax.jit(jax.vmap(lambda k: grf_2d(k, solver.grid)))(keys)
    w0.block_until_ready()
    on_tpu = jax.default_backend() != "cpu"

    extras = {}
    if on_tpu:
        # CN + Adams-Bashforth-2 (the canonical FNO-dataset scheme) as ONE
        # fused Pallas kernel: VMEM-resident state, FFTs as CT radix-(128,2)
        # MXU matmuls — ~10x the XLA-FFT packed stepper (which remains
        # available as method="cn_ab2_packed"; agreement + spectrum
        # validation in tests/test_spectral_ns_pallas.py and PERF.md).
        traj_fast = jax.jit(solver.make_batched_trajectory_fn("cn_ab2_pallas"))
        traj_per_sec = _time_traj(traj_fast, w0, n_rep=3)

        traj_high = jax.jit(
            solver.make_batched_trajectory_fn("cn_ab2_pallas_high")
        )
        extras["high_traj_per_sec"] = round(_time_traj(traj_high, w0, n_rep=2), 2)

        traj_exact = jax.jit(
            solver.make_batched_trajectory_fn("cn_ab2_pallas_exact")
        )
        extras["exact_traj_per_sec"] = round(_time_traj(traj_exact, w0, n_rep=1), 2)

        # end-to-end on device: fused in-kernel (u,v,p) diagnosis (the
        # dataset pipeline's solve+pack, completion forced via a probe
        # slice); the FULL host fetch is timed separately because in THIS
        # dev environment device→host goes through the axon tunnel
        # (~15 MB/s measured — the tunnel, not the design, bounds it;
        # see PERF.md "end-to-end" notes)
        from pregen_pde_tpu.solvers.spectral_ns_pallas import build_batched_traj

        traj_e2e = jax.jit(build_batched_traj(solver, output="fields"))
        extras["fields_traj_per_sec"] = round(
            _time_traj(traj_e2e, w0, n_rep=2,
                       probe=lambda out: out[:, -1, 0, 0, :]), 2
        )
        out = traj_e2e(w0)  # (B, 51, 256, 256, 3)
        t0 = time.perf_counter()
        host = jax.device_get(out)
        fetch_s = time.perf_counter() - t0
        extras["host_fetch_MB_per_sec"] = round(host.nbytes / 1e6 / fetch_s, 1)
    else:
        traj = jax.jit(solver.make_batched_trajectory_fn("cn_ab2_packed"))
        traj_per_sec = _time_traj(traj, w0, n_rep=2)

    print(
        json.dumps(
            {
                "metric": "trajectories/sec/chip (2D NS 256^2 vorticity, 2500 IMEX steps, 50 snapshots, fused Pallas CN+AB2, VMEM-resident CT-FFT)",
                "value": round(traj_per_sec, 4),
                "unit": "traj/s/chip",
                "vs_baseline": round(traj_per_sec / BASELINE_TRAJ_PER_SEC, 2),
                **extras,
            }
        )
    )


if __name__ == "__main__":
    main()
