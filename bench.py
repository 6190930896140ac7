"""North-star benchmark: 2-D NS 256² vorticity trajectory generation throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...} and
exits 0 — regardless of the TPU tunnel's mood.

Workload (BASELINE.md): pseudo-spectral 2-D NS vorticity, ν=1e-4, 256² grid,
50 snapshots × 50 inner steps = 2500 IMEX steps per trajectory — comparable
work to the reference's median icoFoam run (5,500-13,500 PISO steps on a 128²
FVM mesh, `FPO_cylinder/Regular/main.py:969-998` + `controlDict:25-31`).

Beyond the headline `value` (the fused Pallas "fast" stepper), the line
carries the full precision/throughput matrix:
  - "high_traj_per_sec"  — 3-pass split-bf16 matmuls (~2⁻¹⁷/op): the
    rtol-1e-6-grade path (BASELINE.md's exactness bar);
  - "exact_traj_per_sec" — HIGHEST (f32-exact) matmuls;
  - "fields_traj_per_sec" — solve + fused in-kernel (u,v,p) contract
    diagnosis: what the dataset pipeline actually sustains per chip.

Baseline: the reference publishes no timing tables (BASELINE.md). We use a
deliberately *favorable-to-the-reference* estimate of its single-core icoFoam
cost: 2,500 transient PISO steps on 16k cells ≈ 60 s/trajectory ⇒
1/60 traj/s/core. `vs_baseline` = our traj/s/chip ÷ that.

Wedge-proofing (the TPU here is reached through the `axon` tunnel, which can
wedge so hard that even `jax.devices()` hangs — it ate the round-2 capture):
this file is an ORCHESTRATOR that never touches jax itself. It
  1. probes the backend in a subprocess under a hard timeout, retrying with
     backoff for a bounded window (BENCH_PROBE_TIMEOUT / BENCH_PROBE_RETRIES /
     BENCH_PROBE_BACKOFF envs);
  2. on success runs `python bench.py --worker tpu` under BENCH_RUN_TIMEOUT;
  3. on persistent probe failure — or a mid-run wedge — falls back to
     `python bench.py --worker cpu` (jax_platforms forced to cpu *after*
     import; the env var alone is rewritten by sitecustomize) and emits the
     CPU number with `"degraded": true` + the reason,
so the driver's BENCH_r*.json is never an empty rc=1.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

BASELINE_TRAJ_PER_SEC = 1.0 / 60.0  # reference icoFoam estimate (see docstring)

PROBE_TIMEOUT = int(os.environ.get("BENCH_PROBE_TIMEOUT", "120"))
PROBE_RETRIES = int(os.environ.get("BENCH_PROBE_RETRIES", "3"))
PROBE_BACKOFF = int(os.environ.get("BENCH_PROBE_BACKOFF", "30"))
RUN_TIMEOUT = int(os.environ.get("BENCH_RUN_TIMEOUT", "3600"))
CPU_RUN_TIMEOUT = int(os.environ.get("BENCH_CPU_RUN_TIMEOUT", "1800"))

_PROBE_SRC = (
    # Un-pin jax_platforms first: the tunnel's plugin has registered under
    # different names across server-side updates ("axon"/"tpu"), and a stale
    # sitecustomize pin makes every dispatch raise. Auto-choose instead.
    "import jax, jax.numpy as jnp\n"
    "try:\n"
    "    jax.config.update('jax_platforms', '')\n"
    "except Exception:\n"
    "    pass\n"
    "x = jnp.ones((128, 128))\n"
    "print('BACKEND=' + jax.default_backend(), float(x.sum()))\n"
)


# --------------------------------------------------------------------------
# orchestrator (no jax imports on this path)
# --------------------------------------------------------------------------

def _probe_tpu() -> bool:
    """One real device round-trip in a subprocess under a hard timeout."""
    try:
        r = subprocess.run(
            [sys.executable, "-c", _PROBE_SRC],
            capture_output=True, text=True, timeout=PROBE_TIMEOUT,
        )
    except subprocess.TimeoutExpired:
        return False
    # The tunnel has registered under different platform names across
    # server-side updates ("axon", then "tpu") — accept any non-cpu backend.
    return (r.returncode == 0 and "BACKEND=" in r.stdout
            and "BACKEND=cpu" not in r.stdout)


def _probe_with_retries() -> bool:
    for attempt in range(PROBE_RETRIES):
        if _probe_tpu():
            return True
        if attempt < PROBE_RETRIES - 1:
            delay = PROBE_BACKOFF * (attempt + 1)
            print(f"# bench: TPU probe failed (attempt {attempt + 1}/"
                  f"{PROBE_RETRIES}); retrying in {delay}s", file=sys.stderr)
            time.sleep(delay)
    return False


def _run_worker(platform: str, timeout: int):
    """Run `bench.py --worker <platform>`; return the parsed JSON line or
    (None, reason)."""
    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker", platform],
            capture_output=True, text=True, timeout=timeout,
        )
    except subprocess.TimeoutExpired:
        return None, f"{platform} worker timed out after {timeout}s"
    if r.returncode != 0:
        tail = (r.stderr or r.stdout or "").strip().splitlines()[-3:]
        return None, f"{platform} worker rc={r.returncode}: {' | '.join(tail)}"
    for line in reversed(r.stdout.strip().splitlines()):
        try:
            rec = json.loads(line)
            if isinstance(rec, dict) and "value" in rec:
                return rec, None
        except json.JSONDecodeError:
            continue
    return None, f"{platform} worker produced no JSON line"


def orchestrate() -> None:
    reasons = []
    if _probe_with_retries():
        rec, err = _run_worker("tpu", RUN_TIMEOUT)
        if rec is not None:
            print(json.dumps(rec), flush=True)
            return
        reasons.append(err)
    else:
        reasons.append(
            f"TPU (axon tunnel) unavailable after {PROBE_RETRIES} probes of "
            f"{PROBE_TIMEOUT}s"
        )
    print(f"# bench: degrading to CPU ({reasons[-1]})", file=sys.stderr)
    rec, err = _run_worker("cpu", CPU_RUN_TIMEOUT)
    if rec is not None:
        rec["degraded"] = True
        rec["degraded_reason"] = "; ".join(reasons)
        print(json.dumps(rec), flush=True)
        return
    reasons.append(err)
    # last resort: still ONE json line, rc 0
    print(json.dumps({
        "metric": "trajectories/sec/chip (2D NS 256^2 vorticity, 2500 IMEX "
                  "steps, 50 snapshots)",
        "value": 0.0,
        "unit": "traj/s/chip",
        "vs_baseline": 0.0,
        "degraded": True,
        "degraded_reason": "; ".join(reasons),
    }), flush=True)


# --------------------------------------------------------------------------
# worker (the actual benchmark; jax imported only here)
# --------------------------------------------------------------------------

def _time_traj(traj, w0, batch, n_rep=2, probe=lambda out: out[:, -1, 0, 0]):
    import jax

    def run_sync():
        # device_get of a tiny slice forces real completion; block_until_ready
        # is a no-op on tunneled backends, so never trust it for timing here.
        return jax.device_get(probe(traj(w0)))

    run_sync()  # warmup / compile
    t0 = time.perf_counter()
    for _ in range(n_rep):
        run_sync()
    elapsed = (time.perf_counter() - t0) / n_rep
    return batch / elapsed


def worker(platform: str) -> None:
    import jax

    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    else:
        from pregen_pde_tpu.utils.misc import use_best_backend

        use_best_backend()
    from pregen_pde_tpu.utils.compcache import enable_persistent_cache

    enable_persistent_cache()
    import jax.numpy as jnp  # noqa: F401  (backend init below)

    from pregen_pde_tpu.core.config import NSVorticityConfig
    from pregen_pde_tpu.fields.grf import grf_2d
    from pregen_pde_tpu.solvers.spectral_ns import NSVorticitySolver

    on_tpu = jax.default_backend() != "cpu"
    batch = 32 if on_tpu else 4  # CPU fallback: same workload, bounded wall
    cfg = NSVorticityConfig(
        resolution=256,
        viscosity=1e-4,
        dt=1e-4,
        t_end=0.25,  # 2500 steps
        n_snapshots=50,
        forcing="fno",
        include_initial=True,
    )
    solver = NSVorticitySolver(cfg)
    keys = jax.random.split(jax.random.key(0), batch)
    w0 = jax.jit(jax.vmap(lambda k: grf_2d(k, solver.grid)))(keys)
    jax.device_get(w0[:, 0, 0])

    extras = {"platform": jax.default_backend(), "batch": batch}
    if on_tpu:
        # CN + Adams-Bashforth-2 (the canonical FNO-dataset scheme) as ONE
        # fused Pallas kernel: VMEM-resident state, FFTs as CT radix-(128,2)
        # MXU matmuls — ~10x the XLA-FFT packed stepper (which remains
        # available as method="cn_ab2_packed"; agreement + spectrum
        # validation in tests/test_spectral_ns_pallas.py and PERF.md).
        traj_fast = jax.jit(solver.make_batched_trajectory_fn("cn_ab2_pallas"))
        traj_per_sec = _time_traj(traj_fast, w0, batch, n_rep=3)

        traj_high = jax.jit(
            solver.make_batched_trajectory_fn("cn_ab2_pallas_high")
        )
        extras["high_traj_per_sec"] = round(
            _time_traj(traj_high, w0, batch, n_rep=2), 2)

        traj_exact = jax.jit(
            solver.make_batched_trajectory_fn("cn_ab2_pallas_exact")
        )
        extras["exact_traj_per_sec"] = round(
            _time_traj(traj_exact, w0, batch, n_rep=1), 2)

        from pregen_pde_tpu.solvers.spectral_ns_pallas import build_batched_traj

        # production-horizon sibling of the north star: the reference's
        # actual dataset horizons are 5.5k-13.5k solver steps per
        # trajectory (`Regular/main.py:969-998` Re->endTime band law at
        # --time-scale 5e-4); 10k steps here, run in bounded-program
        # chunked mode (the dev tunnel kills single programs running
        # ≳1 min; chunked is bit-identical — tests/test_onchip.py)
        cfg_prod = NSVorticityConfig(
            resolution=256, viscosity=1e-4, dt=1e-4, t_end=1.0,
            n_snapshots=50, forcing="fno", include_initial=True,
        )
        traj_prod = jax.jit(build_batched_traj(NSVorticitySolver(cfg_prod),
                                               chunk_steps=5000))
        extras["production_10k_step_traj_per_sec"] = round(
            _time_traj(traj_prod, w0, batch, n_rep=2), 2)

        # end-to-end on device: fused in-kernel (u,v,p) diagnosis (the
        # dataset pipeline's solve+pack, completion forced via a probe
        # slice); the FULL host fetch is timed separately because in THIS
        # dev environment device→host goes through the axon tunnel
        # (~15 MB/s measured — the tunnel, not the design, bounds it;
        # see PERF.md "end-to-end" notes)
        traj_e2e = jax.jit(build_batched_traj(solver, output="fields"))
        extras["fields_traj_per_sec"] = round(
            _time_traj(traj_e2e, w0, batch, n_rep=2,
                       probe=lambda out: out[:, -1, 0, 0, :]), 2
        )
        out = traj_e2e(w0)  # (B, 51, 256, 256, 3)
        t0 = time.perf_counter()
        host = jax.device_get(out)
        fetch_s = time.perf_counter() - t0
        extras["host_fetch_MB_per_sec"] = round(host.nbytes / 1e6 / fetch_s, 1)
    else:
        traj = jax.jit(solver.make_batched_trajectory_fn("cn_ab2_packed"))
        traj_per_sec = _time_traj(traj, w0, batch, n_rep=2)

    print(
        json.dumps(
            {
                "metric": "trajectories/sec/chip (2D NS 256^2 vorticity, 2500 IMEX steps, 50 snapshots, fused Pallas CN+AB2, VMEM-resident CT-FFT)",
                "value": round(traj_per_sec, 4),
                "unit": "traj/s/chip",
                "vs_baseline": round(traj_per_sec / BASELINE_TRAJ_PER_SEC, 2),
                **extras,
            }
        ),
        flush=True,
    )


def main():
    if len(sys.argv) >= 3 and sys.argv[1] == "--worker":
        worker(sys.argv[2])
    else:
        orchestrate()


if __name__ == "__main__":
    main()
