"""Fused Pallas TPU stepper for the pseudo-spectral NS vorticity solver.

The north-star generation workload (`bench.py`, BASELINE.md) is ~95% FFT
time on chip: XLA's fft2 makes many HBM passes per step, so the CN+AB2
stepper in `spectral_ns.py` runs at HBM speed, not MXU speed. This kernel
keeps the ENTIRE inner loop resident in VMEM — one image's spectral state
(re/im planes), the AB2 history, and all spectral constants — and runs the
FFTs as Cooley-Tukey radix-(128, m) **MXU matmuls** (`ops/ct_fft.py`
defines the math; twiddles are folded into the DFT matrices, the spectrum
lives in a chunk-permuted layout so no reordering is ever executed, and
complex matmuls use the 3-multiply form).

Per AB2 step (N=256, m=2): two packed inverse transforms (velocity pair,
vorticity-gradient pair), one forward transform of the advection product,
plus VPU elementwise algebra — ~34 (256,128)x(128,128) real matmuls, zero
HBM traffic except the per-snapshot write.

Semantics match `NSVorticitySolver._build_traj_packed(scheme="ab2")`
exactly (same CN factors, AB2 bootstrap = one forward-Euler step, same
snapshot cadence); validated against it in `tests/test_spectral_ns_pallas.py`
(interpret mode on CPU) and on-chip by `bench.py`'s cross-check.

Reference capability: the data-generation solver layer
(`dataset_gen/NS_datasets/.../Regular/main.py:129-151` runs OpenFOAM
`icoFoam` per trajectory; here whole batches integrate as one XLA+Mosaic
program).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pregen_pde_tpu.ops import ct_fft

__all__ = ["build_batched_traj", "build_sharded_traj", "supported"]


def supported(n: int) -> bool:
    """Square grids, n a multiple of 128, up to 256: the whole working set
    (state + AB2 history + spectral constants + transform temporaries) must
    fit the ~16 MB VMEM. 512²+ fails Mosaic compile (measured) — it would
    need a block-row tiled FFT with HBM spills; those sizes fall back to
    the XLA-FFT path."""
    return n % 128 == 0 and 128 <= n <= 256


# ---------------------------------------------------------------------------
# host-side constant packs
# ---------------------------------------------------------------------------


def _matrix_pack(plan: ct_fft.CTFFTPlan):
    """(m,128,128) f32 stacks: forward/inverse DFT matrices and transposes
    (lane-axis transforms right-multiply D; sublane-axis transforms
    left-multiply D^T)."""
    f32 = lambda a: np.ascontiguousarray(a, dtype=np.float32)
    fr = f32(np.stack([d.real for d in plan.fwd]))
    fi = f32(np.stack([d.imag for d in plan.fwd]))
    ir = f32(np.stack([d.real for d in plan.inv]))
    ii = f32(np.stack([d.imag for d in plan.inv]))
    t = lambda a: np.ascontiguousarray(np.swapaxes(a, -1, -2))
    return fr, fi, t(fr), t(fi), ir, ii, t(ir), t(ii)


def _spectral_consts(solver, plan):
    """Permuted 2-D spectral constants, f32 numpy (n,n)."""
    g = solver.grid
    n = g.n
    f32 = lambda a: np.ascontiguousarray(a, dtype=np.float32)
    P = lambda a: ct_fft.permute2(np.broadcast_to(a, (n, n)), n, plan.m)
    kx = P(np.asarray(g.kx_full_deriv).reshape(1, n))
    ky = P(np.asarray(g.ky_full_deriv).reshape(n, 1))
    ik2 = P(np.asarray(g.inv_k2_full))
    de = P(np.asarray(g.dealias_mask_full))
    k2 = P(np.asarray(g.k2_full))
    return f32(kx), f32(ky), f32(ik2), f32(de), f32(k2)


def _forcing_stored(solver, plan, n):
    from pregen_pde_tpu.solvers.spectral_ns import make_forcing

    forcing = make_forcing(solver.cfg, solver.grid)
    if forcing is None:
        z = np.zeros((n, n), np.float32)
        return z, z
    F = np.fft.fft2(np.asarray(forcing, np.float64))
    F = F[plan.perm, :][:, plan.perm]
    return (
        np.ascontiguousarray(F.real, np.float32),
        np.ascontiguousarray(F.imag, np.float32),
    )


# ---------------------------------------------------------------------------
# in-kernel CT-FFT (operates on concrete (R, n)/(n, W) f32 value pairs)
# ---------------------------------------------------------------------------


def _bf(m: int):
    """Butterfly coefficient table W_m^(c·j) as python complex (static)."""
    return [
        [complex(np.exp(-2j * np.pi * c * j / m)) for j in range(m)]
        for c in range(m)
    ]


def _combine(chunks, table, conj, scale):
    out = []
    m = len(chunks)
    for c in range(m):
        accr = acci = None
        for j in range(m):
            w = table[c][j].conjugate() if conj else table[c][j]
            wr, wi = w.real * scale, w.imag * scale
            cr, ci = chunks[j]
            if wr == 1.0 and wi == 0.0:
                tr, ti = (cr if scale == 1.0 else cr * wr), (
                    ci if scale == 1.0 else ci * wr
                )
            elif wr == -1.0 and wi == 0.0:
                tr, ti = -cr, -ci
            elif wi == 0.0:
                tr, ti = wr * cr, wr * ci
            elif wr == 0.0:
                tr, ti = -wi * ci, wi * cr
            else:
                tr = wr * cr - wi * ci
                ti = wr * ci + wi * cr
            accr = tr if accr is None else accr + tr
            acci = ti if acci is None else acci + ti
        out.append((accr, acci))
    return out


def _dot(a, b, prec):
    return jnp.dot(a, b, preferred_element_type=jnp.float32, precision=prec)


def _cmm_r(ar, ai, dr, di, prec):
    """(ar+i·ai) @ (dr+i·di) — 3 real MXU matmuls."""
    m0 = _dot(ar, dr - di, prec)
    m1 = _dot(ar - ai, di, prec)
    m2 = _dot(ar + ai, dr, prec)
    return m0 + m1, m2 - m0


def _cmm_r_real(ar, dr, di, prec):
    """real @ complex — 2 matmuls."""
    return _dot(ar, dr, prec), _dot(ar, di, prec)


def _cmm_l(drT, diT, ar, ai, prec):
    """(dr+i·di)^T-form left multiply: out = D @ a given D^T refs."""
    m0 = _dot(drT - diT, ar, prec)
    m1 = _dot(diT, ar - ai, prec)
    m2 = _dot(drT, ar + ai, prec)
    return m0 + m1, m2 - m0


def _cmm_l_real(drT, diT, ar, prec):
    return _dot(drT, ar, prec), _dot(diT, ar, prec)


class _KernelFFT:
    """Stored-layout transforms over (n,n) value pairs inside the kernel.

    Matrix refs: fr/fi (m,128,128) forward, frT/fiT transposes; i* inverse.
    ``prec``: matmul precision for this instance — the hot loop runs the
    Mosaic default (one bf16 MXU pass; spectrum-validated, see PERF.md),
    the per-snapshot output transform always runs HIGHEST.
    """

    def __init__(self, m, table, fr, fi, frT, fiT, ir, ii, irT, iiT,
                 prec=None, g=1, n=None):
        self.m, self.t = m, table
        self.prec = prec
        self.g, self.n = g, n  # g images stacked along the sublane axis
        self.fr, self.fi, self.frT, self.fiT = fr, fi, frT, fiT
        self.ir, self.ii, self.irT, self.iiT = ir, ii, irT, iiT

    def _per_image(self, fn, xr, xi, **kw):
        """Sub-axis transforms act per image; with g stacked images apply the
        transform to each (n, n) row-block and re-stack. Lane-axis transforms
        see the full (g*n, n) block — the point of grouping: 2x wider MXU
        matmuls on that half of the work."""
        if self.g == 1:
            return fn(xr, xi, **kw)
        n = self.n
        outs = [
            fn(
                xr[im * n : (im + 1) * n],
                None if xi is None else xi[im * n : (im + 1) * n],
                **kw,
            )
            for im in range(self.g)
        ]
        return (
            jnp.concatenate([o[0] for o in outs], axis=0),
            jnp.concatenate([o[1] for o in outs], axis=0),
        )

    def _chunks_lane(self, xr, xi):
        return [
            (xr[:, c * 128 : (c + 1) * 128], xi[:, c * 128 : (c + 1) * 128])
            for c in range(self.m)
        ]

    def _chunks_sub(self, xr, xi):
        return [
            (xr[c * 128 : (c + 1) * 128, :], xi[c * 128 : (c + 1) * 128, :])
            for c in range(self.m)
        ]

    def fwd_lane(self, xr, xi):
        combos = _combine(self._chunks_lane(xr, xi), self.t, False, 1.0)
        outs = [
            _cmm_r(sr, si, self.fr[c], self.fi[c], self.prec)
            for c, (sr, si) in enumerate(combos)
        ]
        return (
            jnp.concatenate([o[0] for o in outs], axis=1),
            jnp.concatenate([o[1] for o in outs], axis=1),
        )

    def fwd_sub(self, xr, xi, real_input=False):
        # radix-2 (and trivially radix-1) butterflies of a REAL signal stay
        # real → the per-chunk matmul halves (2 instead of 3); m > 2 mixes
        # in complex roots, so fall back to the general complex path.
        if real_input and self.m <= 2:
            ch = [c for c, _ in self._chunks_sub(xr, xr)]
            combos = [(ch[0] + ch[1]), (ch[0] - ch[1])] if self.m == 2 else [ch[0]]
            outs = [
                _cmm_l_real(self.frT[c], self.fiT[c], sr, self.prec)
                for c, sr in enumerate(combos)
            ]
        else:
            if real_input:
                xi = jnp.zeros_like(xr)
            combos = _combine(self._chunks_sub(xr, xi), self.t, False, 1.0)
            outs = [
                _cmm_l(self.frT[c], self.fiT[c], sr, si, self.prec)
                for c, (sr, si) in enumerate(combos)
            ]
        return (
            jnp.concatenate([o[0] for o in outs], axis=0),
            jnp.concatenate([o[1] for o in outs], axis=0),
        )

    def fft2(self, xr, xi=None, real_input=False):
        if real_input:
            xr, xi = self._per_image(self.fwd_sub, xr, None, real_input=True)
        else:
            xr, xi = self._per_image(self.fwd_sub, xr, xi)
        return self.fwd_lane(xr, xi)

    def inv_lane(self, xr, xi):
        ch = self._chunks_lane(xr, xi)
        ts = [
            _cmm_r(er, ei, self.ir[c], self.ii[c], self.prec)
            for c, (er, ei) in enumerate(ch)
        ]
        outs = _combine(ts, self.t, True, 1.0 / self.m)
        return (
            jnp.concatenate([o[0] for o in outs], axis=1),
            jnp.concatenate([o[1] for o in outs], axis=1),
        )

    def inv_sub(self, xr, xi):
        ch = self._chunks_sub(xr, xi)
        ts = [
            _cmm_l(self.irT[c], self.iiT[c], er, ei, self.prec)
            for c, (er, ei) in enumerate(ch)
        ]
        outs = _combine(ts, self.t, True, 1.0 / self.m)
        return (
            jnp.concatenate([o[0] for o in outs], axis=0),
            jnp.concatenate([o[1] for o in outs], axis=0),
        )

    def ifft2(self, xr, xi):
        xr, xi = self.inv_lane(xr, xi)
        return self._per_image(self.inv_sub, xr, xi)


# ---------------------------------------------------------------------------
# the fused trajectory kernel
# ---------------------------------------------------------------------------


def build_batched_traj(solver, inner_steps: int | None = None,
                       precision: str = "fast", group: int | str = "auto"):
    """Batched trajectory integrator ``traj(w0:(B,n,n), nu:(B,)|None) ->
    (B, T, n, n)`` running the whole CN+AB2 loop in one Pallas kernel.

    Matches ``jax.vmap(solver.make_trajectory_fn_nu("cn_ab2_packed"))``
    output semantics (incl. ``include_initial``).

    ``precision``:
      - "fast" — hot-loop FFT matmuls at the Mosaic default (one bf16 MXU
        pass). Measured 10.7x over the XLA-FFT path at 256² (g=2);
        trajectory-vs-jnp-path deviation is ~1e-4 unbiased noise (energy
        spectrum agrees to ~0.1% in every band — below float16 storage
        quantization; PERF.md). The initial transform and the per-snapshot
        output transform always run HIGHEST.
      - "exact" — every matmul at HIGHEST (f32-exact, 6-pass): trajectory
        matches the jnp path to f32 roundoff (~3e-7), ~2.6x over XLA-FFT.

    ``group``: images per kernel instance ("auto" picks the largest VMEM-fit
    divisor of B — see the rule in `traj`).
    """
    cfg = solver.cfg
    n = cfg.resolution
    if not supported(n):
        raise ValueError(
            f"pallas stepper requires n in {{128, 256}} (VMEM bound), got {n}"
        )
    if precision not in ("fast", "exact"):
        raise ValueError(f"precision must be 'fast' or 'exact', got {precision!r}")
    m = n // 128
    plan = ct_fft.make_plan(n, m)
    table = _bf(m)
    mats = _matrix_pack(plan)
    kx, ky, ik2, de, k2p = _spectral_consts(solver, plan)
    fr_np, fi_np = _forcing_stored(solver, plan, n)
    dt = float(cfg.dt)
    drag = float(cfg.drag)
    dealias = bool(cfg.dealias)
    S = int(cfg.n_snapshots)
    if inner_steps is None:
        total_steps = int(round(cfg.t_end / cfg.dt))
        inner = max(total_steps // S, 1)
    else:
        inner = int(inner_steps)

    def make_kernel(g):
      def kernel(
        inner_ref,
        w0r_ref, w0i_ref, vn_ref, vd_ref,
        kx_ref, ky_ref, ik2_ref, de_ref, fr_ref, fi_ref,
        fr_m, fi_m, frT_m, fiT_m, ir_m, ii_m, irT_m, iiT_m,
        out_ref,
        wr, wi, nr, ni,
      ):
        s = pl.program_id(1)
        loop_prec = (
            jax.lax.Precision.HIGHEST if precision == "exact" else None
        )
        fft = _KernelFFT(
            m, table,
            fr_m, fi_m, frT_m, fiT_m, ir_m, ii_m, irT_m, iiT_m,
            prec=loop_prec, g=g, n=n,
        )
        fft_out = _KernelFFT(
            m, table,
            fr_m, fi_m, frT_m, fiT_m, ir_m, ii_m, irT_m, iiT_m,
            prec=jax.lax.Precision.HIGHEST, g=g, n=n,
        )
        kxv, kyv, ik2v, dev = kx_ref[:], ky_ref[:], ik2_ref[:], de_ref[:]
        fFr, fFi = fr_ref[:], fi_ref[:]
        vn = vn_ref[:].reshape(g * n, n)
        vd = vd_ref[:].reshape(g * n, n)

        def rhs(ar, ai):
            pr, pi = ar * ik2v, ai * ik2v
            # velocity pack: (kx + i·ky)·psi → ifft2 → u + i·v
            c1r = kxv * pr - kyv * pi
            c1i = kxv * pi + kyv * pr
            ur, vr_ = fft.ifft2(c1r, c1i)
            # gradient pack: (−ky + i·kx)·w → ifft2 → w_x + i·w_y
            c2r = -kyv * ar - kxv * ai
            c2i = kxv * ar - kyv * ai
            gr, gi = fft.ifft2(c2r, c2i)
            adv = ur * gr + vr_ * gi
            Ar, Ai = fft.fft2(adv, real_input=True)
            if dealias:
                Ar, Ai = Ar * dev, Ai * dev
            outr = -Ar + fFr
            outi = -Ai + fFi
            if drag != 0.0:
                outr = outr - drag * ar
                outi = outi - drag * ai
            return outr, outi

        @pl.when(s == 0)
        def _init():
            w0r = w0r_ref[:].reshape(g * n, n)
            w0i = w0i_ref[:].reshape(g * n, n)
            wr[:], wi[:] = w0r, w0i
            r0, i0 = rhs(w0r, w0i)
            nr[:], ni[:] = r0, i0

        def body(i, carry):
            ar, ai = wr[:], wi[:]
            r1, i1 = rhs(ar, ai)
            wr[:] = (ar * vn + dt * (1.5 * r1 - 0.5 * nr[:])) * vd
            wi[:] = (ai * vn + dt * (1.5 * i1 - 0.5 * ni[:])) * vd
            nr[:], ni[:] = r1, i1
            return carry

        # dynamic trip count from SMEM — ONE compile serves every
        # difficulty-horizon bucket (≡ the jnp path's traced inner_steps;
        # the reference would recompile per `RE_TIME_SCHEDULE` horizon)
        jax.lax.fori_loop(0, inner_ref[0], body, 0, unroll=False)
        sr, _ = fft_out.ifft2(wr[:], wi[:])
        out_ref[:, 0] = sr.reshape(g, n, n)

      return kernel

    def traj(w0: jax.Array, nu=None, inner_steps=None) -> jax.Array:
        B = w0.shape[0]
        # group g images per kernel instance: the lane-axis FFT matmuls get
        # g-x wider M (better MXU utilization); sub-axis passes stay
        # per-image. VMEM bounds g·n² ≤ 2·256² (measured: g=2 best at 256²
        # [+8%], g=8 at 128² [+77%, 595 traj/s]; one step beyond each OOMs).
        if group == "auto":
            g_max = max(1, (2 * 256 * 256) // (n * n))
            g = next((g for g in (8, 4, 2, 1) if g <= g_max and B % g == 0), 1)
        else:
            g = int(group)
            if B % g:
                raise ValueError(f"batch {B} not divisible by group {g}")
        c2d = lambda: pl.BlockSpec(
            (g * n, n), lambda b, s: (0, 0), memory_space=pltpu.VMEM
        )
        cb = lambda: pl.BlockSpec(
            (g, n, n), lambda b, s: (b, 0, 0), memory_space=pltpu.VMEM
        )
        cm = lambda: pl.BlockSpec(
            (m, 128, 128), lambda b, s: (0, 0, 0), memory_space=pltpu.VMEM
        )
        tile = lambda a: jnp.tile(jnp.asarray(a), (g, 1))
        inner_v = jnp.asarray(
            inner if inner_steps is None else inner_steps, jnp.int32
        ).reshape(1)
        w0f = w0.astype(jnp.float32)
        w0r, w0i = ct_fft.fft2_stored(w0f, jnp.zeros_like(w0f), plan)
        k2j = jnp.asarray(k2p)
        nu_v = jnp.asarray(cfg.viscosity if nu is None else nu, jnp.float32)
        nu_k2 = (
            nu_v[:, None, None] * k2j[None] if nu_v.ndim == 1 else
            jnp.broadcast_to(nu_v * k2j, (B, n, n))
        )
        vn = 1.0 - 0.5 * dt * nu_k2
        vd = 1.0 / (1.0 + 0.5 * dt * nu_k2)
        grid = (B // g, S)
        # CPU (tests, virtual meshes): run through the Pallas interpreter —
        # same semantics, no Mosaic. TPU-specific compiler params only apply
        # to the compiled path.
        interpret = jax.default_backend() == "cpu"
        extra = (
            {}
            if interpret
            else {
                "compiler_params": pltpu.CompilerParams(
                    dimension_semantics=("arbitrary", "arbitrary"),
                )
            }
        )
        snaps = pl.pallas_call(
            make_kernel(g),
            interpret=interpret,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1,), lambda b, s: (0,), memory_space=pltpu.SMEM),
                cb(), cb(), cb(), cb(),  # w0r, w0i, vn, vd
                c2d(), c2d(), c2d(), c2d(), c2d(), c2d(),  # kx ky ik2 de fr fi
                cm(), cm(), cm(), cm(), cm(), cm(), cm(), cm(),
            ],
            out_specs=pl.BlockSpec(
                (g, 1, n, n), lambda b, s: (b, s, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((B, S, n, n), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((g * n, n), jnp.float32) for _ in range(4)
            ],
            **extra,
        )(
            inner_v,
            w0r, w0i, vn, vd,
            tile(kx), tile(ky), tile(ik2),
            tile(de), tile(fr_np), tile(fi_np),
            *[jnp.asarray(a) for a in mats],
        )
        if cfg.include_initial:
            snaps = jnp.concatenate([w0f[:, None], snaps], axis=1)
        return snaps

    return traj


def build_sharded_traj(solver, mesh, inner_steps: int | None = None,
                       precision: str = "fast", axis: str = "data"):
    """Pod-scale variant: the batch axis is sharded over ``mesh[axis]`` and
    each device runs the fused kernel on its local shard (`shard_map`; no
    collectives — trajectories are independent, the reference's
    process-per-batch OpenFOAM scheme collapsed into one SPMD program).

    ``traj(w0:(B,n,n), nu:(B,), inner_steps scalar) -> (B,T,n,n)`` with
    B divisible by the axis size.
    """
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    local = build_batched_traj(solver, inner_steps, precision)

    def _local(w0, nu, inner):
        return local(w0, nu, inner[0])

    sharded = shard_map(
        _local,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P()),
        out_specs=P(axis),
        check_rep=False,
    )

    def traj(w0, nu=None, inner_steps_v=None):
        B = w0.shape[0]
        if nu is None:
            nu = jnp.full((B,), solver.cfg.viscosity, jnp.float32)
        if inner_steps_v is None:
            total = int(round(solver.cfg.t_end / solver.cfg.dt))
            inner_steps_v = max(total // solver.cfg.n_snapshots, 1)
        inner = jnp.asarray(inner_steps_v, jnp.int32).reshape(1)
        return sharded(w0, nu, inner)

    return traj
