"""Trajectory factory: the TPU-native replacement for the reference's
per-process OpenFOAM batch drivers (`dataset_gen/NS_datasets/*/main.py`).

Where the reference copies a case template 128×, patches text files, and runs
one `icoFoam` subprocess per trajectory on one CPU core each
(`Regular/main.py:1048-1124`), here a whole batch integrates as ONE jitted XLA
program: `vmap` over trajectories, batch axis sharded over the mesh `data`
axis (`shard_map`-equivalent via NamedSharding + jit), device→host transfer
only at snapshot boundaries.

Output contract (identical to reference `reshape_trajectory_data`,
`Regular/main.py:811-892`): float32 (N, T, H, W, 6), channels
[Ux, Uy, p, Re_norm, mask, SDF_norm], Re_norm = (Re-100)/9900, mask 1=hole.

Physics-difficulty handling: the reference integrates harder (higher-Re)
trajectories longer (`RE_TIME_SCHEDULE`, `Regular/main.py:969-998`). Dynamic
trip counts don't jit, so trajectories are bucketed by their quantized horizon
(the schedule already rounds to multiples of 100 → ≤27 buckets) and each
bucket runs as one fixed-shape program; compiled executables are cached per
step count.
"""

from __future__ import annotations

import dataclasses
import os
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from pregen_pde_tpu.core.config import NSVorticityConfig
from pregen_pde_tpu.fields.geometry import no_hole_mask, sdf_from_mask
from pregen_pde_tpu.fields.grf import grf_2d
from pregen_pde_tpu.parallel.meshes import batch_sharding, make_mesh
from pregen_pde_tpu.utils.misc import is_tunnel_backend
from pregen_pde_tpu.solvers import schedules
from pregen_pde_tpu.solvers.spectral_ns import NSVorticitySolver


@dataclasses.dataclass(frozen=True)
class GenerationConfig:
    """Difficulty-aware dataset generation settings."""

    solver: NSVorticityConfig = NSVorticityConfig()
    batch_size: int = 128  # reference batch granularity (`Regular/main.py:1054`)
    re_mean: float = 5000.0
    re_std: float = 2000.0
    vary_difficulty: bool = True  # sample Re & horizons; False → cfg.viscosity/t_end
    grf_alpha: float = 2.5
    grf_tau: float = 7.0
    grf_sigma: float | None = None
    # multiplies the Re→horizon schedule (in "schedule seconds",
    # `Regular/main.py:969-998`) before mapping onto solver steps via dt.
    # 1.0 integrates horizons in solver time units (1M-27M steps at
    # dt=1e-4 — far beyond the reference workload); 5e-4 reproduces the
    # reference's own step counts (dt 0.2 → 5,500-13,500 steps; horizons 1100-2700 s).
    time_scale: float = 1.0
    # dataset storage dtype: "float16" halves device→host transfer and shard
    # size (solve stays f32; cast happens on device just before the fetch).
    # float16 covers the contract's dynamic range (|u|,|p| ≲ O(1), SDF/mask/Re
    # normalized) with ~1e-3 relative quantization.
    storage_dtype: str = "float32"
    # time stepper: "auto" resolves to the fused Pallas CN+AB2 kernel
    # ("cn_ab2_pallas", ~10x — PERF.md) on TPU when the grid supports it,
    # else "cn_ab2_packed" (CN + Adams-Bashforth-2 over XLA FFTs, 1 RHS
    # eval/step, the canonical FNO-dataset scheme). "cn_heun_packed" = CN +
    # RK2, 2 evals/step. All 2nd order, oracle-verified
    # (`tests/test_spectral_ns.py`, `tests/test_spectral_ns_pallas.py`).
    method: str = "auto"
    # bound per-device-program step count for ultra-long horizons
    # (time_scale=1.0 → 1M-27M steps/trajectory): the Pallas integrator
    # state rounds through HBM between bounded programs (bit-identical
    # trajectories — `build_batched_traj(chunk_steps=...)`). None = whole
    # trajectory in one program (fastest; the dev tunnel's worker kills
    # programs running ≳1 min, so set this there for huge horizons).
    max_steps_per_program: int | None = None


def resolve_method(method: str, resolution: int, mesh=None) -> str:
    """``"auto"`` → the fused Pallas kernel when it applies (TPU backend,
    supported grid), else the packed XLA-FFT stepper. On a multi-device
    mesh the kernel runs per-device under `shard_map`
    (`build_sharded_traj`); `_generate_bucket` falls back to the jnp path
    for bucket sizes not divisible by the data axis."""
    if method != "auto":
        return method
    from pregen_pde_tpu.solvers.spectral_ns_pallas import supported

    if supported(resolution) and jax.default_backend() != "cpu":
        return "cn_ab2_pallas"
    return "cn_ab2_packed"


def _pack_contract(
    w_snaps: jax.Array,  # (B, T, n, n) vorticity
    solver: NSVorticitySolver,
    re_norm: jax.Array,  # (B,)
    mask: jax.Array,  # (n, n) or (B, n, n)
    sdf: jax.Array,  # same leading shape as mask
) -> jax.Array:
    """(B,T,n,n) vorticity → (B,T,n,n,6) [Ux,Uy,p,Re,mask,SDF] float32."""

    def per_frame(w):
        f = solver.fields_from_vorticity(w)
        return jnp.stack([f["u"], f["v"], f["p"]], axis=-1)

    uvp = jax.vmap(jax.vmap(per_frame))(w_snaps).astype(jnp.float32)
    return _pack_contract_uvp(uvp, re_norm, mask, sdf)


def _pack_contract_uvp(
    uvp: jax.Array,  # (B, T, n, n, 3) — e.g. the Pallas kernel's fused output
    re_norm: jax.Array,
    mask: jax.Array,
    sdf: jax.Array,
) -> jax.Array:
    b, t, n, _, _ = uvp.shape
    re_ch = jnp.broadcast_to(
        re_norm.astype(jnp.float32)[:, None, None, None, None], (b, t, n, n, 1)
    )
    if mask.ndim == 2:
        mask = jnp.broadcast_to(mask[None], (b, n, n))
        sdf = jnp.broadcast_to(sdf[None], (b, n, n))
    mask_ch = jnp.broadcast_to(mask.astype(jnp.float32)[:, None, :, :, None], (b, t, n, n, 1))
    sdf_ch = jnp.broadcast_to(sdf.astype(jnp.float32)[:, None, :, :, None], (b, t, n, n, 1))
    return jnp.concatenate([uvp, re_ch, mask_ch, sdf_ch], axis=-1)


@partial(
    jax.jit,
    static_argnames=("solver", "grf_alpha", "grf_tau", "grf_sigma", "method",
                     "mesh"),
)
def _generate_bucket(
    keys: jax.Array,  # (B,) PRNG keys
    nu: jax.Array,  # (B,)
    re_norm: jax.Array,  # (B,)
    solver: NSVorticitySolver,
    inner_steps,  # traced int32 scalar → one compile per BATCH SHAPE, not per horizon
    grf_alpha: float = 2.5,
    grf_tau: float = 7.0,
    grf_sigma: float | None = None,
    method: str = "cn_ab2_packed",
    mesh=None,
) -> jax.Array:
    from pregen_pde_tpu.solvers.spectral_ns import PALLAS_METHODS

    grid = solver.grid
    n = grid.n
    mask = no_hole_mask(n)
    sdf = sdf_from_mask(mask)
    w0 = jax.vmap(
        lambda k: grf_2d(k, grid, alpha=grf_alpha, tau=grf_tau, sigma=grf_sigma)
    )(keys)
    if method in PALLAS_METHODS:
        # fused path: the kernel emits (u, v, p) per snapshot directly
        # (output="fields") — no separate XLA-FFT contract-packing pass
        from pregen_pde_tpu.solvers.spectral_ns_pallas import (
            build_batched_traj,
            build_sharded_traj,
        )

        prec = PALLAS_METHODS[method]
        n_data = int(mesh.shape.get("data", 1)) if mesh is not None else 1
        if n_data > 1 and keys.shape[0] % n_data == 0:
            traj = build_sharded_traj(solver, mesh, precision=prec,
                                      output="fields")
        else:
            traj = build_batched_traj(solver, precision=prec, output="fields")
        uvp = traj(w0, nu, jnp.asarray(inner_steps, jnp.int32))
        return _pack_contract_uvp(uvp.astype(jnp.float32), re_norm, mask, sdf)
    traj = jax.vmap(
        solver.make_trajectory_fn_nu(method), in_axes=(0, 0, None)
    )
    snaps = traj(w0, nu, jnp.asarray(inner_steps, jnp.int32))
    return _pack_contract(snaps, solver, re_norm, mask, sdf)


@partial(jax.jit, static_argnames=("solver", "grf_alpha", "grf_tau",
                                   "grf_sigma"))
def _grf_batch(keys, solver, grf_alpha, grf_tau, grf_sigma):
    grid = solver.grid
    return jax.vmap(
        lambda k: grf_2d(k, grid, alpha=grf_alpha, tau=grf_tau, sigma=grf_sigma)
    )(keys)


@lru_cache(maxsize=None)
def _chunked_traj_cached(solver, precision: str, chunk_steps: int):
    from pregen_pde_tpu.solvers.spectral_ns_pallas import build_batched_traj

    return build_batched_traj(solver, precision=precision, output="fields",
                              chunk_steps=chunk_steps)


_pack_uvp_jit = jax.jit(_pack_contract_uvp)


def _generate_bucket_chunked(
    keys, nu, re_norm, solver, inner_steps: int,
    grf_alpha, grf_tau, grf_sigma, method: str, chunk_steps: int,
) -> jax.Array:
    """Bounded-program variant of `_generate_bucket` (Pallas methods,
    single-device): the trajectory is driven host-side as many ≤chunk_steps
    programs with the integrator state carried through HBM — bit-identical
    output (tests/test_spectral_ns_pallas.py), but no device program runs
    longer than the tunnel worker's ~1 min kill window even at
    time_scale=1.0 horizons (1M-27M steps/trajectory)."""
    from pregen_pde_tpu.solvers.spectral_ns import PALLAS_METHODS

    n = solver.grid.n
    mask = no_hole_mask(n)
    sdf = sdf_from_mask(mask)
    w0 = _grf_batch(keys, solver, grf_alpha, grf_tau, grf_sigma)
    traj = _chunked_traj_cached(solver, PALLAS_METHODS[method],
                                int(chunk_steps))
    uvp = traj(w0, nu, int(inner_steps))
    return _pack_uvp_jit(uvp.astype(jnp.float32), re_norm,
                         jnp.asarray(mask), jnp.asarray(sdf))


def generate_ns_batch(
    key: jax.Array,
    gen_cfg: GenerationConfig,
    n_traj: int | None = None,
    mesh=None,
) -> np.ndarray:
    """Generate one batch on device, return the packed contract on host.

    With ``vary_difficulty``: Re ~ clip(N(5000, 2000²)), horizon from the
    Re-schedule (bucketed), ν = 1/Re on the unit-torus benchmark.
    """
    cfg = gen_cfg.solver
    n_traj = n_traj or gen_cfg.batch_size
    solver = NSVorticitySolver(cfg)
    method = resolve_method(gen_cfg.method, cfg.resolution, mesh)
    k_re, k_ic = jax.random.split(key)
    keys = jax.random.split(k_ic, n_traj)

    def place(*arrays):
        """Shard the batch axis over the mesh `data` axis (pod-scale path:
        BASELINE.md '10k trajectories shard_mapped over v5e-8'); XLA
        partitions the whole solver program over the batch."""
        if mesh is None:
            return arrays
        n_data = int(mesh.shape.get("data", 1))
        out = []
        for a in arrays:
            if a.shape[0] % n_data == 0:
                out.append(jax.device_put(a, batch_sharding(mesh, a.ndim)))
            else:
                out.append(a)
        return tuple(out)

    from pregen_pde_tpu.solvers.spectral_ns import PALLAS_METHODS

    def _chunking() -> bool:
        # bounded-program mode: Pallas methods, single device only (the
        # sharded path has no chunked variant — its per-shard programs are
        # already B/n_data wide); the jnp steppers take the jit path
        return bool(
            gen_cfg.max_steps_per_program
            and method in PALLAS_METHODS
            and (mesh is None or int(mesh.shape.get("data", 1)) == 1)
        )

    def _bucket(keys_b, nu_b, re_b, inner: int) -> jax.Array:
        if _chunking():
            return _generate_bucket_chunked(
                keys_b, nu_b, re_b, solver, inner,
                gen_cfg.grf_alpha, gen_cfg.grf_tau, gen_cfg.grf_sigma,
                method, gen_cfg.max_steps_per_program,
            )
        return _generate_bucket(
            keys_b, nu_b, re_b, solver, inner,
            gen_cfg.grf_alpha, gen_cfg.grf_tau, gen_cfg.grf_sigma,
            method=method, mesh=mesh,
        )

    if not gen_cfg.vary_difficulty:
        nu = jnp.full((n_traj,), cfg.viscosity, jnp.float32)
        # Re channel: the fixed-ν benchmark's effective Re = U·L/ν with U=L=1
        re_fixed = jnp.clip(1.0 / cfg.viscosity, schedules.RE_MIN, schedules.RE_MAX)
        re_norm = jnp.full((n_traj,), schedules.normalize_re(re_fixed), jnp.float32)
        inner = max(int(round(cfg.t_end / cfg.dt)) // cfg.n_snapshots, 1)
        keys, nu, re_norm = place(keys, nu, re_norm)
        out = _bucket(keys, nu, re_norm, inner)
        return np.asarray(jax.device_get(_to_storage(out, gen_cfg)))

    re = schedules.sample_reynolds(k_re, n_traj, gen_cfg.re_mean, gen_cfg.re_std)
    end_t = schedules.end_time_from_re(re) * gen_cfg.time_scale
    re_norm = schedules.normalize_re(re)
    nu = schedules.viscosity_from_re(re)

    def _pad_pow2(idx: np.ndarray) -> tuple[np.ndarray, int]:
        """Pad a bucket's index set to the next power of two by repeating the
        first element, so every bucket reuses one of ≤log2(batch) compiled
        executables instead of compiling per bucket size (compiles through the
        TPU tunnel are minutes-scale; the padded rows are discarded)."""
        n = len(idx)
        size = 1 << (n - 1).bit_length()
        return np.concatenate([idx, np.full(size - n, idx[0])]), n

    # host-side bucketing by quantized horizon (≤27 distinct values)
    end_t_np = np.asarray(end_t)
    keys_np = np.asarray(jax.random.key_data(keys))
    out = np.empty(
        (n_traj, cfg.n_snapshots + int(cfg.include_initial), cfg.resolution,
         cfg.resolution, 6),
        np.dtype(gen_cfg.storage_dtype),
    )
    # Depth-2 solve/fetch pipeline: dispatch bucket k+1's solve (async) BEFORE
    # blocking on bucket k's device→host fetch, so the device computes the
    # next bucket while the previous one streams out (DMA overlaps compute on
    # real TPU hosts). At most two buckets are device-resident at once.
    # The dev tunnel's worker CRASHES on a host fetch issued while another
    # program executes (reproduced 2026-08-18, fresh workers, with and
    # without copy_to_host_async) — so the overlap defaults OFF there and ON
    # everywhere else; PREGEN_PDE_OVERLAP_FETCH=0/1 forces either way.
    _ov = os.environ.get("PREGEN_PDE_OVERLAP_FETCH", "")
    overlap = (_ov == "1") if _ov else not is_tunnel_backend()
    pending: tuple | None = None  # (idx_raw, n_real, device_array)

    def _drain(p):
        i_raw, n_real, res = p
        out[i_raw] = np.asarray(jax.device_get(res))[:n_real]

    for horizon in np.unique(end_t_np):
        idx_raw = np.nonzero(end_t_np == horizon)[0]
        idx, n_real = _pad_pow2(idx_raw)
        # horizon is in "schedule seconds"; map onto solver time budget:
        # steps = horizon / dt, split across n_snapshots
        total_steps = int(round(float(horizon) / cfg.dt))
        inner = max(total_steps // cfg.n_snapshots, 1)
        sub_keys = jax.random.wrap_key_data(jnp.asarray(keys_np[idx]))
        sub_nu = jnp.asarray(np.asarray(nu)[idx])
        sub_re = jnp.asarray(np.asarray(re_norm)[idx])
        sub_keys, sub_nu, sub_re = place(sub_keys, sub_nu, sub_re)
        res = _bucket(sub_keys, sub_nu, sub_re, inner)
        res = _to_storage(res, gen_cfg)
        if overlap:
            try:  # start the host copy eagerly where the backend supports it
                res.copy_to_host_async()
            except Exception:
                pass
            if pending is not None:
                _drain(pending)
            pending = (idx_raw, n_real, res)
        else:
            _drain((idx_raw, n_real, res))
    if pending is not None:
        _drain(pending)
    return out


def _to_storage(arr: jax.Array, gen_cfg: GenerationConfig) -> jax.Array:
    """Cast to the storage dtype ON DEVICE so the host fetch (and shard) moves
    half the bytes when storage_dtype='float16'."""
    dt = np.dtype(gen_cfg.storage_dtype)
    return arr if dt == np.float32 else arr.astype(dt.name)


def drop_nonfinite_trajectories(arr: np.ndarray, label: str = "batch"):
    """Fail-soft batch filtering ≡ the reference's skip-and-continue on solver
    failure (`Regular/main.py:1083-1116`): non-finite trajectories are dropped
    and logged; the rest of the batch survives."""
    import logging

    finite = np.isfinite(arr).all(axis=tuple(range(1, arr.ndim)))
    n_bad = int((~finite).sum())
    if n_bad:
        logging.getLogger("pregen_pde_tpu.datagen").warning(
            "%s: dropping %d/%d non-finite trajectories", label, n_bad, len(finite)
        )
        arr = arr[finite]
    return arr, n_bad


def generate_ns_dataset(
    key: jax.Array,
    gen_cfg: GenerationConfig,
    n_traj: int,
    writer=None,
    mesh=None,
) -> np.ndarray | None:
    """Generate ``n_traj`` trajectories in reference-sized batches.

    If ``writer`` is given (see `datagen.writer.ShardWriter`), each batch is
    streamed to a shard (≡ the reference's per-batch `np.save`,
    `Regular/main.py:1095-1097`) and None is returned; otherwise the full
    array is assembled in host memory.
    """
    if (
        writer is not None
        and gen_cfg.storage_dtype != "float32"
        and type(writer).__name__ == "NativeShardWriter"
    ):
        raise ValueError(
            "the native shard writer is float32-only; construct "
            f"ShardWriter(..., dtype={gen_cfg.storage_dtype!r}) so the "
            "Python writer is selected (failing now, before any compute)"
        )
    batches = []
    n_done = 0
    batch_keys = jax.random.split(key, -(-n_traj // gen_cfg.batch_size))
    for bk in batch_keys:
        take = min(gen_cfg.batch_size, n_traj - n_done)
        arr = generate_ns_batch(bk, gen_cfg, take, mesh)
        arr, _ = drop_nonfinite_trajectories(arr)
        n_done += take
        if writer is not None:
            writer.write_batch(arr)
        else:
            batches.append(arr)
    if writer is not None:
        writer.close()
        return None
    return np.concatenate(batches, axis=0)
