"""Masked-geometry NS dataset pipelines — the four reference generators:

| pipeline          | reference                                            | difficulty axis |
|-------------------|------------------------------------------------------|-----------------|
| `fpo_regular`     | `NS_datasets/FPO_cylinder/Regular/main.py`           | physics (Re)    |
| `fpo_hole`        | `NS_datasets/FPO_cylinder/Hole_Location/main.py`     | geometry (1 hole placement) |
| `fpo_multi_hole`  | `NS_datasets/FPO_cylinder/Multiple_Hole/main.py`     | geometry (2-10 holes) |
| `ldc_regular`     | `NS_datasets/LDC/Regular/main.py`                    | physics (Re)    |

Per trajectory (mirroring the reference driver loop, `Regular/main.py:1048-1124`):
Re ~ clip(N(5000, 2000²)) → Umax = Re·ν/L (`:491-518`) → horizon from
`RE_TIME_SCHEDULE` (`:969-998`, bucketed for jit) → masked projection solve →
pack the (N, T, H, W, 6) contract with mask + SDF channels (`:811-892`).

Instead of 128 sequential OpenFOAM subprocesses, each horizon bucket runs as
one `vmap`-batched jitted program over (mask, u_max) pairs.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from pregen_pde_tpu.fields.geometry import (
    disk_mask,
    no_hole_mask,
    sample_multi_holes,
    sample_multi_holes_overlap,
    sample_single_hole,
    sdf_from_mask,
)
from pregen_pde_tpu.solvers import schedules
from pregen_pde_tpu.solvers.ns_projection import ProjectionConfig, ProjectionSolver


def cfl_dt(cfg: "MaskedNSConfig", u_max: float, safety: float = 0.5,
           speedup: float | None = None) -> float:
    """Explicit-CFL time step: dt ≤ safety·dx/(speedup·u_max); `speedup`
    budgets local acceleration around obstacles (channel constriction).

    Default margin (cfg.cfl_speedup = 3.5) is the measured stability
    envelope of the default muscl advection on multi-hole geometries at
    128²: constrictions accelerate the flow ~3× over u_inlet, and the
    limited 2nd-order scheme (less dissipative than round ≤3's upwind1,
    which was stable at 2.0) blew up on 91/320 production trajectories at
    margin 2.0 — all stable at 3.5 (plus the per-bucket dt/2 retry in
    `generate_masked_ns_batch` for outlier geometries)."""
    dx = cfg.length / cfg.resolution
    if speedup is None:
        speedup = cfg.cfl_speedup
    return min(cfg.dt, safety * dx / max(speedup * u_max, 1e-9))


@dataclasses.dataclass(frozen=True)
class MaskedNSConfig:
    pipeline: str = "fpo_regular"  # fpo_regular | fpo_hole | fpo_multi_hole | ldc_regular
    resolution: int = 128
    length: float = 2.0
    viscosity: float = 1.5e-5  # reference ν (`transportProperties`)
    dt: float = 0.2  # reference deltaT (`controlDict:25-31`)
    n_snapshots: int = 20  # reference 20 writes (`update_controlDict`)
    re_mean: float = 5000.0
    re_std: float = 2000.0
    time_scale: float = 1.0  # multiply schedule horizons (tests use << 1)
    penalization_eta: float = 1e-3
    cg_iters: int = 150
    batch_size: int = 128
    # fpo_multi_hole only: force ALL holes to share a central sub-box of side
    # overlap_fraction·hole (reference `randomize_holes(allow_overlap=True)`,
    # `Multiple_Hole/main.py:1080-1139`); False = non-overlapping rejection
    hole_overlap: bool = False
    overlap_fraction: float = 0.3
    # CFL local-acceleration margin (see `cfl_dt`) and the number of
    # halve-dt retries for trajectories that still go non-finite (outlier
    # constriction geometries) — the fail-soft story the reference handles
    # by skip-and-continue (`Regular/main.py:1083-1116`); retrying keeps
    # the trajectory COUNT exact, which difficulty-mixing splits rely on
    cfl_speedup: float = 3.5
    nonfinite_retries: int = 2
    # False = round-≤4 behavior (one dt per horizon bucket from the bucket's
    # fastest inlet). Kept so existing datasets can be regenerated
    # bit-identically (cached experiment state dirs pin their training
    # results to the exact trajectories); new datasets should use the
    # per-trajectory default — see the sub-bucketing comment in
    # `generate_masked_ns_batch`.
    per_traj_dt: bool = True


def sample_masks(key: jax.Array, cfg: MaskedNSConfig, n: int) -> jax.Array:
    """(n, res, res) geometry masks for the pipeline."""
    res = cfg.resolution
    if cfg.pipeline == "fpo_regular":
        # fixed central cylinder (the reference's body-fitted cylinder becomes
        # a penalized disk of diameter res/8 at x=res/4)
        m = disk_mask(res, res / 2.0, res / 4.0, res / 16.0)
        return jnp.broadcast_to(m[None], (n, res, res))
    if cfg.pipeline == "fpo_hole":
        keys = jax.random.split(key, n)
        return jax.vmap(lambda k: sample_single_hole(k, res))(keys)
    if cfg.pipeline == "fpo_multi_hole":
        # reference holes are 16 cells at 128² (= res/8); scale for other grids
        hole_cells = max(res // 8, 4)
        keys = jax.random.split(key, n)
        if cfg.hole_overlap:
            return jax.vmap(
                lambda k: sample_multi_holes_overlap(
                    k, res, hole_cells=hole_cells,
                    overlap_fraction=cfg.overlap_fraction,
                )[0]
            )(keys)
        return jax.vmap(
            lambda k: sample_multi_holes(k, res, hole_cells=hole_cells)[0]
        )(keys)
    if cfg.pipeline == "ldc_regular":
        return jnp.broadcast_to(no_hole_mask(res)[None], (n, res, res))
    raise ValueError(cfg.pipeline)


def _solver_for(cfg: MaskedNSConfig, u_max: float, t_end: float) -> ProjectionSolver:
    domain = "cavity" if cfg.pipeline == "ldc_regular" else "channel"
    return ProjectionSolver(
        ProjectionConfig(
            resolution=cfg.resolution,
            length=cfg.length,
            viscosity=cfg.viscosity,
            domain=domain,
            u_max=u_max,
            dt=cfg.dt,
            t_end=t_end,
            n_snapshots=cfg.n_snapshots,
            penalization_eta=cfg.penalization_eta,
            cg_iters=cfg.cg_iters,
        )
    )


@functools.lru_cache(maxsize=16)
def _batched_traj_for_backend(solver: ProjectionSolver, backend: str):
    """One jitted batched trajectory fn per (solver config, backend) —
    ProjectionSolver is a frozen dataclass, so it keys the cache by value;
    the backend is an explicit key so flipping `jax_platforms` mid-process
    (the CPU-switch workflow in CLAUDE.md) re-routes instead of reusing a
    stale path. On TPU the fused Pallas projection stepper
    (`ns_projection_pallas`, ~2x and batch-size-insensitive — PERF.md) takes
    over; the jnp path serves CPU and unsupported configs."""
    from pregen_pde_tpu.solvers import ns_projection_pallas as npp

    if backend != "cpu" and npp.supported(solver):
        return jax.jit(npp.build_batched_traj(solver))
    return jax.jit(
        jax.vmap(solver.make_trajectory_fn(), in_axes=(0, 0, None, None))
    )


def _batched_traj_cached(solver: ProjectionSolver):
    return _batched_traj_for_backend(solver, jax.default_backend())


def generate_masked_ns_batch(
    key: jax.Array, cfg: MaskedNSConfig, n_traj: int | None = None,
    storage_dtype: str = "float32",
) -> np.ndarray:
    """→ float32 (N, n_snapshots+1, res, res, 6) in the data contract."""
    n_traj = n_traj or cfg.batch_size
    k_re, k_geo = jax.random.split(key)
    re = schedules.sample_reynolds(k_re, n_traj, cfg.re_mean, cfg.re_std)
    re_np = np.asarray(re)
    # Umax = Re·ν/L (`Regular/main.py:491-518`)
    u_max_np = re_np * cfg.viscosity / cfg.length
    end_t_np = np.asarray(schedules.end_time_from_re(re)) * cfg.time_scale
    re_norm_np = np.asarray(schedules.normalize_re(re))

    masks = sample_masks(k_geo, cfg, n_traj)
    sdfs = jax.vmap(sdf_from_mask)(masks)
    masks_np = np.asarray(masks)
    sdfs_np = np.asarray(sdfs)

    res = cfg.resolution
    out = np.empty((n_traj, cfg.n_snapshots + 1, res, res, 6),
                   np.dtype(storage_dtype))

    # bucket by quantized horizon; u_max is a traced vmap axis and the bucket
    # step count a traced scalar → ONE compile per batch shape (27 horizon
    # buckets would otherwise each recompile a minutes-long XLA build).
    # t_end is pinned (traj always gets explicit inner/dt) so repeated CALLS
    # hit the cached jit below instead of re-tracing a fresh closure — a
    # per-batch recompile through the tunnel costs minutes.
    solver = _solver_for(cfg, 1.0, 1.0)
    traj = _batched_traj_cached(solver)
    def _run(idx_raw: np.ndarray, horizon: float, dt_b: float) -> np.ndarray:
        # pad the bucket to the next power of two: ≤log2(batch) executables
        # total instead of one minutes-scale compile per bucket size
        n_real = len(idx_raw)
        size = 1 << (n_real - 1).bit_length()
        idx = np.concatenate([idx_raw, np.full(size - n_real, idx_raw[0])])
        total_steps = int(round(float(horizon) / dt_b))
        inner = max(total_steps // cfg.n_snapshots, 1)
        frames = traj(
            jnp.asarray(masks_np[idx]),
            jnp.asarray(u_max_np[idx], jnp.float32),
            jnp.asarray(inner, jnp.int32),
            jnp.asarray(dt_b, jnp.float32),
        )
        if str(frames.dtype) != storage_dtype:
            frames = frames.astype(storage_dtype)  # cast on device pre-fetch
        return np.asarray(jax.device_get(frames))[:n_real]

    def _run_bucket(idx_raw: np.ndarray, horizon: float, dt_b: float):
        frames = _run(idx_raw, horizon, dt_b)
        # fail-soft with exact counts: outlier geometries (severe
        # constrictions) that still blow up retry at dt/2 (same compiled
        # executable — dt and the trip count are traced scalars)
        for attempt in range(cfg.nonfinite_retries):
            finite = np.isfinite(frames).all(axis=tuple(range(1, frames.ndim)))
            if finite.all():
                break
            bad = idx_raw[~finite]
            dt_b /= 2.0
            import logging

            logging.getLogger("pregen_pde_tpu.datagen").warning(
                "masked_ns horizon %s: %d/%d non-finite, retrying at dt=%g "
                "(attempt %d)", horizon, len(bad), len(idx_raw), dt_b,
                attempt + 1)
            if not frames.flags.writeable:  # device_get views are read-only
                frames = np.array(frames)
            frames[~finite] = _run(bad, horizon, dt_b)
        out[idx_raw, :, :, :, 0:3] = frames
        out[idx_raw, :, :, :, 3] = re_norm_np[idx_raw, None, None, None]
        out[idx_raw, :, :, :, 4] = masks_np[idx_raw, None, :, :]
        out[idx_raw, :, :, :, 5] = sdfs_np[idx_raw, None, :, :]

    for horizon in np.unique(end_t_np):
        idx_h = np.nonzero(end_t_np == horizon)[0]
        if not cfg.per_traj_dt:  # legacy round-≤4 bucket-max dt
            _run_bucket(idx_h, float(horizon),
                        cfl_dt(cfg, float(u_max_np[idx_h].max())))
            continue
        # PER-TRAJECTORY CFL dt: each trajectory's own u_max sets its step.
        # Trajectories are sub-bucketed by the power-of-two refinement level
        # k = ceil(log2(cfg.dt / cfl_dt_i)) (≤ log2 levels bound the launch
        # count; dt stays a traced scalar so every sub-bucket reuses the
        # same executable) and each sub-bucket runs at the SMALLEST exact
        # CFL dt of its members — so one fast inlet taxes only its own
        # sub-bucket, never the whole horizon bucket (round ≤4 used the
        # bucket-max u_max, which made the medium tier cost MORE than hard:
        # PERF.md 3-tier table), and dt/2 retries re-run only offenders.
        dt_i = np.array([cfl_dt(cfg, float(u)) for u in u_max_np[idx_h]])
        lvl = np.ceil(np.log2(cfg.dt / dt_i)).clip(min=0).astype(int)
        for k in np.unique(lvl):
            sub = lvl == k
            _run_bucket(idx_h[sub], float(horizon), float(dt_i[sub].min()))
    return out

