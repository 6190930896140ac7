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
    """Square grids, n a multiple of 128, up to 1024: the whole working set
    (state + AB2 history + spectral constants + transform temporaries) must
    fit VMEM under the raised `vmem_limit_bytes`. The separable-constant
    diet (`_spectral_consts_diet`: vector wavenumber/dealias/k² constants,
    in-kernel CN factors, sparse baked forcing) enabled 512²; measured
    on-chip (B from 8 to 4, g=1, fast): 640² 16.4 traj/s (12× XLA-FFT),
    768² 11.0 (13×), 896² 6.6 (~11×, but the radix-7 butterfly costs a
    ~5.5 min one-time Mosaic compile; 640²/768² compile in 30-50 s).
    1024² (m=8) runs the deeper VMEM diet (`diet2`): the CN factors and
    the 1/|k|² plane are rebuilt on the fly from the separable k² vectors
    every step instead of living in scratch/input planes — 12 MB of
    always-live VMEM becomes briefly-live temporaries, which is what lets
    the 25 MB state + transform temporaries fit under the raised limit.
    Measured on chip: 4.86 traj/s at B=2 (6.1× the 0.80 traj/s XLA-FFT
    path; ~5 min one-time Mosaic compile for the radix-8 butterfly)."""
    return n % 128 == 0 and 128 <= n <= 1024


# ---------------------------------------------------------------------------
# host-side constant packs
# ---------------------------------------------------------------------------


def _matrix_pack(plan: ct_fft.CTFFTPlan):
    """(m,128,128) f32 stacks: forward/inverse DFT matrices and transposes
    (lane-axis transforms right-multiply D; sublane-axis transforms
    left-multiply D^T).

    The inverse stacks carry the butterfly's 1/m normalization folded in
    (each of the two inverse stages applies its own 1/m → total 1/m², same
    as before): `_combine` then runs with scale 1.0, whose ±1/±i weights
    lower to VPU adds/negations instead of full-plane scalar multiplies —
    at m=2 that removes ~16 (n,n)-plane multiplies per AB2 step. Exact for
    the power-of-two radices (m ∈ {1,2,4,8}: 1/m is a dyadic scale folded
    into a matrix constant); odd radices differ by ≤1 ulp rounding."""
    f32 = lambda a: np.ascontiguousarray(a, dtype=np.float32)
    inv_m = 1.0 / plan.m
    fr = f32(np.stack([d.real for d in plan.fwd]))
    fi = f32(np.stack([d.imag for d in plan.fwd]))
    ir = f32(np.stack([d.real * inv_m for d in plan.inv]))
    ii = f32(np.stack([d.imag * inv_m for d in plan.inv]))
    t = lambda a: np.ascontiguousarray(np.swapaxes(a, -1, -2))
    return fr, fi, t(fr), t(fi), ir, ii, t(ir), t(ii)


def _matrix_pack_split(plan: ct_fft.CTFFTPlan):
    """Pre-split bf16 matrix packs for the 3-pass f32-grade mode
    (precision="high"): each matmul-side combo M ∈ {D_r−D_i, D_i, D_r}
    (the three matrices `_cmm_r`/`_cmm_l` multiply by) is stored as
    (hi, lo) bf16 halves with M ≈ hi + lo (lo = bf16(M − f32(hi))), giving
    ~16 mantissa bits of the constant. x @ M is then evaluated as
    x_hi@hi + x_hi@lo + x_lo@hi — three ONE-PASS bf16 MXU matmuls
    (≈2⁻¹⁷ relative, vs 2⁻⁹ for a single pass and ~2⁻²⁶ for HIGHEST's six).

    Returns 4 arrays of shape (6m, 128, 128) bf16 — [fwd-right, fwd-left,
    inv-right, inv-left], each laid out chunk-major: index c*6 + t*2 + h
    with t ∈ {0: D_r−D_i, 1: D_i, 2: D_r}, h ∈ {0: hi, 1: lo}.

    Inverse packs carry the 1/m butterfly normalization folded in, matching
    `_matrix_pack` (the combine then runs at scale 1.0 — see there).
    """

    def split(mat):
        hi = mat.astype(np.float32).astype(np.dtype("bfloat16"))
        lo = (mat.astype(np.float32) - hi.astype(np.float32)).astype(
            np.dtype("bfloat16")
        )
        return hi, lo

    def pack(mats_r, mats_i, transpose):
        out = []
        for dr, di in zip(mats_r, mats_i):
            dr = np.asarray(dr, np.float64)
            di = np.asarray(di, np.float64)
            if transpose:
                dr, di = dr.T, di.T
            for combo in (dr - di, di, dr):
                out.extend(split(combo))
        return np.ascontiguousarray(np.stack(out))

    inv_m = 1.0 / plan.m
    fwd_r = [d.real for d in plan.fwd]
    fwd_i = [d.imag for d in plan.fwd]
    inv_r = [d.real * inv_m for d in plan.inv]
    inv_i = [d.imag * inv_m for d in plan.inv]
    return (
        pack(fwd_r, fwd_i, False),
        pack(fwd_r, fwd_i, True),
        pack(inv_r, inv_i, False),
        pack(inv_r, inv_i, True),
    )


def _spectral_consts_diet(solver, plan):
    """Separable spectral constants (VMEM diet, the 512² enabler).

    Of the stepper's spectral constants only 1/|k|² is genuinely 2-D; the
    wavenumber factors and 2/3-rule mask are outer products of 1-D vectors
    (`core/grid.py:142-177`), and k² = kx² + ky² is a broadcast SUM — so
    instead of five g-tiled (g·n, n) arrays the kernel receives tiny lane-
    and sublane-layout vectors (replicated to the (8, ·)/(·, 128) minimum
    tiles) plus ONE (n, n) ik2 plane, and rebuilds everything else as fused
    broadcast expressions. The CN factors (1 ∓ ½·dt·ν·k²) are likewise
    computed in-kernel per image from the k² vectors and a ν SMEM scalar —
    no per-image (n, n) inputs at all.
    """
    g = solver.grid
    n = g.n
    perm = plan.perm
    f32 = lambda a: np.ascontiguousarray(a, dtype=np.float32)
    row = lambda v: f32(np.broadcast_to(np.asarray(v).reshape(1, n)[:, perm], (8, n)))
    col = lambda v: f32(np.broadcast_to(np.asarray(v).reshape(n, 1)[perm], (n, 128)))
    kmax = (n // 2) * (2.0 * np.pi / g.length)
    cutoff = (2.0 / 3.0) * kmax
    de1 = (np.abs(g.k_full) <= cutoff).astype(np.float64)
    ik2 = f32(ct_fft.permute2(np.asarray(g.inv_k2_full), n, plan.m))
    return dict(
        kx_row=row(g.kx_full_deriv),
        ky_col=col(g.ky_full_deriv),
        dx_row=row(de1),
        dy_col=col(de1),
        k2x_row=row(g.k_full**2),
        k2y_col=col(g.k_full**2),
        ik2=ik2,
    )


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


def _sparse_forcing(fr_np, fi_np, k_full, perm, max_terms: int = 16):
    """Physically meaningful forcings (fno, kolmogorov) have a handful of
    nonzero Fourier coefficients; bake them into the kernel as static
    (row, col, re, im, |k|²) deltas — applied as per-element scalar updates
    in the CN/AB2 state update (the constant-F contribution telescopes to
    +dt·F̂·vd per step), so sparse forcings never carry an (n, n) plane
    (2 MB at 512²). Returns a list (possibly empty = no forcing) or None
    (dense fallback: F̂ kept as two (n, n) refs added inside rhs)."""
    mag = np.abs(fr_np).astype(np.float64) + np.abs(fi_np)
    tol = mag.max() * 1e-10 if mag.max() > 0 else 0.0
    idx = np.argwhere(mag > tol)
    if len(idx) > max_terms:
        return None
    k_full = np.asarray(k_full, np.float64)
    return [
        (
            int(i), int(j), float(fr_np[i, j]), float(fi_np[i, j]),
            float(k_full[perm[i]] ** 2 + k_full[perm[j]] ** 2),
        )
        for i, j in idx
    ]


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


# -- 3-pass split-bf16 helpers (precision="high") ---------------------------


def _split_bf16(x):
    """f32 → (hi, lo) bf16 with x ≈ hi + lo (~16 mantissa bits)."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _sdot_r(x, mh, ml):
    """x @ M with M = mh + ml pre-split: 3 one-pass bf16 MXU matmuls."""
    xh, xl = _split_bf16(x)
    return (
        jnp.dot(xh, mh, preferred_element_type=jnp.float32)
        + jnp.dot(xh, ml, preferred_element_type=jnp.float32)
        + jnp.dot(xl, mh, preferred_element_type=jnp.float32)
    )


def _sdot_l(mh, ml, x):
    xh, xl = _split_bf16(x)
    return (
        jnp.dot(mh, xh, preferred_element_type=jnp.float32)
        + jnp.dot(ml, xh, preferred_element_type=jnp.float32)
        + jnp.dot(mh, xl, preferred_element_type=jnp.float32)
    )


def _scmm_r(ar, ai, pack, c):
    """Split-mode complex right-multiply; pack rows c*6+{0..5} =
    {(D_r−D_i), D_i, D_r} × {hi, lo} (see `_matrix_pack_split`)."""
    o = c * 6
    m0 = _sdot_r(ar, pack[o + 0], pack[o + 1])
    m1 = _sdot_r(ar - ai, pack[o + 2], pack[o + 3])
    m2 = _sdot_r(ar + ai, pack[o + 4], pack[o + 5])
    return m0 + m1, m2 - m0


def _scmm_l(pack, c, ar, ai):
    o = c * 6
    m0 = _sdot_l(pack[o + 0], pack[o + 1], ar)
    m1 = _sdot_l(pack[o + 2], pack[o + 3], ar - ai)
    m2 = _sdot_l(pack[o + 4], pack[o + 5], ar + ai)
    return m0 + m1, m2 - m0


def _scmm_r_real(ar, pack, c):
    o = c * 6
    xh, xl = _split_bf16(ar)
    dot = lambda mh, ml: (
        jnp.dot(xh, mh, preferred_element_type=jnp.float32)
        + jnp.dot(xh, ml, preferred_element_type=jnp.float32)
        + jnp.dot(xl, mh, preferred_element_type=jnp.float32)
    )
    return dot(pack[o + 4], pack[o + 5]), dot(pack[o + 2], pack[o + 3])


def _scmm_l_real(pack, c, ar):
    o = c * 6
    xh, xl = _split_bf16(ar)
    dot = lambda mh, ml: (
        jnp.dot(mh, xh, preferred_element_type=jnp.float32)
        + jnp.dot(ml, xh, preferred_element_type=jnp.float32)
        + jnp.dot(mh, xl, preferred_element_type=jnp.float32)
    )
    return dot(pack[o + 4], pack[o + 5]), dot(pack[o + 2], pack[o + 3])


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
    Mosaic default (one bf16 MXU pass; spectrum-validated, see PERF.md);
    the per-snapshot output transform runs split-3-pass (fast, n ≤ 512
    only) or HIGHEST (high/exact, and fast at 640²–1024² where the split
    packs don't earn their VMEM).
    """

    def __init__(self, m, table, fr, fi, frT, fiT, ir, ii, irT, iiT,
                 prec=None, g=1, n=None, split=None):
        self.m, self.t = m, table
        self.prec = prec
        self.g, self.n = g, n  # g images stacked along the sublane axis
        self.fr, self.fi, self.frT, self.fiT = fr, fi, frT, fiT
        self.ir, self.ii, self.irT, self.iiT = ir, ii, irT, iiT
        # precision="high": (fwdR, fwdL, invR, invL) pre-split bf16 packs —
        # every hot-loop matmul becomes 3 one-pass products (see
        # `_matrix_pack_split`); `prec` is ignored on the split path.
        self.split = split

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
        if self.split is not None:
            outs = [
                _scmm_r(sr, si, self.split[0], c)
                for c, (sr, si) in enumerate(combos)
            ]
        else:
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
            if self.split is not None:
                outs = [
                    _scmm_l_real(self.split[1], c, sr)
                    for c, sr in enumerate(combos)
                ]
            else:
                outs = [
                    _cmm_l_real(self.frT[c], self.fiT[c], sr, self.prec)
                    for c, sr in enumerate(combos)
                ]
        else:
            if real_input:
                xi = jnp.zeros_like(xr)
            combos = _combine(self._chunks_sub(xr, xi), self.t, False, 1.0)
            if self.split is not None:
                outs = [
                    _scmm_l(self.split[1], c, sr, si)
                    for c, (sr, si) in enumerate(combos)
                ]
            else:
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
        if self.split is not None:
            ts = [
                _scmm_r(er, ei, self.split[2], c)
                for c, (er, ei) in enumerate(ch)
            ]
        else:
            ts = [
                _cmm_r(er, ei, self.ir[c], self.ii[c], self.prec)
                for c, (er, ei) in enumerate(ch)
            ]
        # 1/m lives in the inverse matrices (`_matrix_pack`): scale-1 combine
        # → ±1/±i butterfly weights lower to adds/negations, not multiplies
        outs = _combine(ts, self.t, True, 1.0)
        return (
            jnp.concatenate([o[0] for o in outs], axis=1),
            jnp.concatenate([o[1] for o in outs], axis=1),
        )

    def inv_sub(self, xr, xi):
        ch = self._chunks_sub(xr, xi)
        if self.split is not None:
            ts = [
                _scmm_l(self.split[3], c, er, ei)
                for c, (er, ei) in enumerate(ch)
            ]
        else:
            ts = [
                _cmm_l(self.irT[c], self.iiT[c], er, ei, self.prec)
                for c, (er, ei) in enumerate(ch)
            ]
        outs = _combine(ts, self.t, True, 1.0)  # 1/m folded into irT/iiT
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
                       precision: str = "fast", group: int | str = "auto",
                       output: str = "vorticity",
                       chunk_steps: int | None = None,
                       _diet2: bool | None = None):
    """Batched trajectory integrator ``traj(w0:(B,n,n), nu:(B,)|None) ->
    (B, T, n, n)`` running the whole CN+AB2 loop in one Pallas kernel.

    Matches ``jax.vmap(solver.make_trajectory_fn_nu("cn_ab2_packed"))``
    output semantics (incl. ``include_initial``).

    ``output="fields"`` fuses the contract-packing diagnosis INTO the
    kernel: each snapshot emits (u, v, p) directly — the per-snapshot
    transforms (velocity pack, two derivative packs, the pressure-Poisson
    forward/inverse; ≡ `fields_from_vorticity`,
    `solvers/spectral_ns.py:387-392`) run VMEM-resident at HIGHEST right
    after the inner loop, instead of as a separate XLA-FFT pass over the
    full (B,T,n,n) vorticity array (`datagen/pipeline.py::_pack_contract`).
    Returns (B, T, n, n, 3) [u, v, p].

    ``precision``:
      - "fast" — hot-loop FFT matmuls at the Mosaic default (one bf16 MXU
        pass). Measured 10.7x over the XLA-FFT path at 256² (g=2);
        trajectory-vs-jnp-path deviation is ~1e-4 unbiased noise (energy
        spectrum agrees to ~0.1% in every band — below float16 storage
        quantization; PERF.md). The initial transform runs HIGHEST (outside
        the kernel); the per-snapshot output transform runs the 3-pass
        split-bf16 scheme (~2⁻¹⁷/op — half of HIGHEST's passes, and far
        below the loop's 1.8e-4 trajectory noise; a 1-pass epilogue stamped
        3-5e-3 per snapshot and stays banned) for n ≤ 512 only — at
        640²–1024² the VMEM-tight layouts keep the epilogue at HIGHEST
        (see the `use_split_out` gate below).
      - "high" — hot-loop matmuls via the 3-pass split-bf16 scheme
        (`_matrix_pack_split`, ~2⁻¹⁷ per-op): the rtol-1e-6-grade path at
        3x the fast pass count instead of HIGHEST's 6x.
      - "exact" — every matmul at HIGHEST (f32-exact, 6-pass): trajectory
        matches the jnp path to f32 roundoff (~3e-7).

    ``group``: images per kernel instance ("auto" picks the largest VMEM-fit
    divisor of B — see the rule in `traj`).

    VMEM diet (`_spectral_consts_diet`): spectral constants enter as 1-D
    lane/sublane vectors + one (n, n) ik2 plane; the CN viscosity factors
    are computed in-kernel from k² vectors and a ν SMEM scalar; sparse
    forcings are baked in as static spectral deltas. This is what lets 512²
    (m=4) fit VMEM — earlier layouts carried five g-tiled (g·n, n) planes
    plus two (g·n, n) CN-factor inputs and failed Mosaic compile at 512².
    """
    cfg = solver.cfg
    n = cfg.resolution
    if not supported(n):
        raise ValueError(
            f"pallas stepper requires n a multiple of 128 in [128, 1024] "
            f"(VMEM bound above), got {n}"
        )
    # VMEM diet v2 (the 1024² enabler): no 1/|k|² input plane and no
    # CN-factor scratch planes — both are rebuilt per use from the
    # separable k² vectors (one VPU divide per plane, negligible next to
    # the m=8 matmul chains) so their 12 MB is live only briefly instead
    # of pinned for the whole kernel.
    diet2 = (n >= 1024) if _diet2 is None else bool(_diet2)
    if precision not in ("fast", "high", "exact"):
        raise ValueError(
            f"precision must be 'fast', 'high' or 'exact', got {precision!r}"
        )
    if output not in ("vorticity", "fields"):
        raise ValueError(f"output must be 'vorticity' or 'fields', got {output!r}")
    use_split = precision == "high"
    fields_out = output == "fields"
    m = n // 128
    plan = ct_fft.make_plan(n, m)
    table = _bf(m)
    mats = _matrix_pack(plan)
    # fast tier: the per-snapshot OUTPUT transform runs the 3-pass split
    # scheme instead of HIGHEST (6-pass) — same epilogue math at half the
    # MXU passes, per-op ~2⁻¹⁷ (vs the fast loop's measured 1.8e-4
    # trajectory deviation, so the snapshot floor is unchanged; the 1-pass
    # epilogue that DID stamp 3-5e-3 per snapshot stays banned — PERF.md).
    # Gated to n ≤ 512 (measured-plentiful VMEM): the split packs add
    # 4×(6m,128,128) bf16 of always-live constants (~1.6 MB at 256²), and
    # the 640²-1024² layouts run VMEM-tight with minutes-long Mosaic
    # compiles — not worth re-qualifying for a ~2% epilogue saving there.
    use_split_out = precision == "fast" and not diet2 and n <= 512
    # Dealias fold: bake the 0/1 dealias mask into the LOOP's forward DFT
    # matrices (masked spectral columns/rows become exact zero columns —
    # bitwise-identical to the explicit post-transform multiply) so `rhs`
    # skips 4 full-plane VPU multiplies per step. The epilogue transform
    # (`fft_out`) keeps the unmasked matrices (the pressure diagnosis must
    # not be dealiased). The split ("high") loop keeps the explicit
    # multiply; same n ≤ 512 VMEM gate as above (adds 4×(m,128,128) f32).
    fold_dealias = bool(cfg.dealias) and not use_split and n <= 512
    split_mats = (
        _matrix_pack_split(plan) if (use_split or use_split_out) else ()
    )
    consts = _spectral_consts_diet(solver, plan)
    if fold_dealias:
        g_ = solver.grid
        kmax_ = (n // 2) * (2.0 * np.pi / g_.length)
        de1_ = (np.abs(np.asarray(g_.k_full)) <= (2.0 / 3.0) * kmax_)
        colmask = de1_[plan.perm].reshape(m, 128).astype(np.float32)
        mk = lambda a: np.ascontiguousarray(a)
        mats_deal = (
            mk(mats[0] * colmask[:, None, :]),  # fr·diag(mask) (columns)
            mk(mats[1] * colmask[:, None, :]),
            mk(mats[2] * colmask[:, :, None]),  # frT: rows = D's columns
            mk(mats[3] * colmask[:, :, None]),
        )
    else:
        mats_deal = ()
    fr_np, fi_np = _forcing_stored(solver, plan, n)
    sparse_f = _sparse_forcing(fr_np, fi_np, solver.grid.k_full, plan.perm)
    dense_forcing = sparse_f is None
    dt = float(cfg.dt)
    drag = float(cfg.drag)
    dealias = bool(cfg.dealias)
    S = int(cfg.n_snapshots)
    if inner_steps is None:
        total_steps = int(round(cfg.t_end / cfg.dt))
        inner = max(total_steps // S, 1)
    else:
        inner = int(inner_steps)

    def make_kernel(g, S_eff=None, carry=False):
      """``carry=True`` is the bounded-program (chunked) variant: the AB2
      history enters as inputs (n0r/n0i; a `boot` SMEM flag selects the
      t=0 forward-Euler bootstrap instead) and the full integrator state
      (ŵ, AB2 history — chunk-permuted spectral layout) is flushed to four
      extra outputs at the last grid step, so a long horizon can round
      through HBM across many short programs (the dev tunnel kills single
      programs running ≳1 min; real hosts get preemption-friendly bounded
      programs). The default path is unchanged."""
      S_last = S if S_eff is None else S_eff

      def kernel(*refs):
        inner_ref = refs[0]
        idx = 1
        if carry:
            boot_ref = refs[idx]
            idx += 1
        w0r_ref, w0i_ref = refs[idx : idx + 2]
        idx += 2
        if carry:
            n0r_ref, n0i_ref = refs[idx : idx + 2]
            idx += 2
        nu_ref = refs[idx]
        idx += 1
        (kxr_ref, kyc_ref, dxr_ref, dyc_ref, k2x_ref, k2y_ref) = refs[
            idx : idx + 6
        ]
        idx += 6
        if not diet2:
            ik2_ref = refs[idx]
            idx += 1
        if dense_forcing:
            fr_ref, fi_ref = refs[idx : idx + 2]
            idx += 2
        (fr_m, fi_m, frT_m, fiT_m, ir_m, ii_m, irT_m, iiT_m) = refs[
            idx : idx + 8
        ]
        idx += 8
        if fold_dealias:
            # dealias-masked forward matrices for the LOOP transform only
            frd_m, fid_m, frdT_m, fidT_m = refs[idx : idx + 4]
            idx += 4
        else:
            frd_m, fid_m, frdT_m, fidT_m = fr_m, fi_m, frT_m, fiT_m
        split_vals = None
        if use_split or use_split_out:
            split_vals = tuple(r[:] for r in refs[idx : idx + 4])
            idx += 4
        if fields_out:
            out_u, out_v, out_p = refs[idx : idx + 3]
            idx += 3
        else:
            out_ref = refs[idx]
            idx += 1
        if carry:
            st_wr, st_wi, st_nr, st_ni = refs[idx : idx + 4]
            idx += 4
        if diet2:
            wr, wi, nr, ni = refs[idx : idx + 4]
        else:
            wr, wi, nr, ni, vnS, vdS = refs[idx : idx + 6]

        s = pl.program_id(1)
        loop_prec = (
            jax.lax.Precision.HIGHEST if precision == "exact" else None
        )
        fft = _KernelFFT(
            m, table,
            frd_m, fid_m, frdT_m, fidT_m, ir_m, ii_m, irT_m, iiT_m,
            prec=loop_prec, g=g, n=n,
            split=split_vals if use_split else None,
        )
        # output-transform instance: HIGHEST for high/exact (the measured
        # "high ≡ exact at every snapshot" claim was pinned with a HIGHEST
        # epilogue); 3-pass split for fast (half the passes, ~2⁻¹⁷/op).
        fft_out = _KernelFFT(
            m, table,
            fr_m, fi_m, frT_m, fiT_m, ir_m, ii_m, irT_m, iiT_m,
            prec=jax.lax.Precision.HIGHEST, g=g, n=n,
            split=split_vals if use_split_out else None,
        )
        # broadcastable spectral constants, fused at use sites — nothing is
        # g-tiled or materialized: row constants broadcast directly against
        # (g·n, n); per-image (n, ·) constants broadcast through a free
        # (g, n, n) reshape (`bimg`)
        kxr = kxr_ref[0:1, :]                        # (1, n)
        kyc1 = kyc_ref[:, 0:1]                       # (n, 1)
        dxr = dxr_ref[0:1, :]
        dyc1 = dyc_ref[:, 0:1]

        def make_ik2():
            """diet2: rebuild permute2(inv_k2_full) from the separable k²
            vectors (zero mode exact: k² sums to 0.0 only there). Called
            INSIDE rhs / the output epilogue so the plane is live only in
            that scope — a top-level value would be loop-invariant and
            pinned in VMEM for the whole kernel."""
            k2 = k2y_ref[:, 0:1] + k2x_ref[0:1, :]
            return jnp.where(k2 > 0.0, 1.0 / k2, 0.0)

        ik2v = None if diet2 else ik2_ref[:]

        # with VMEM headroom (n ≤ 256), materialize the per-image constants
        # g-tiled once — plain full-plane VPU multiplies lower best; at 512²
        # keep the reshape-broadcast form (no (g·n, n) constant planes)
        tile2d = g * n * n <= 2 * 256 * 256
        if tile2d:
            big = lambda c: (
                jnp.broadcast_to(c, (n, n)) if g == 1
                else jnp.concatenate([jnp.broadcast_to(c, (n, n))] * g, 0)
            )
            # diet2 has no ik2 plane to tile — "ik2" falls through to the
            # per-use rebuilt constant in `bimg` (only reachable when diet2
            # is forced at small n for tests; real diet2 is n ≥ 1024 where
            # tile2d is False)
            big_c = {"ky": big(kyc1), "dy": big(dyc1)}
            if not diet2:
                big_c["ik2"] = big(ik2v)

        def bimg(x, c, key):
            """x (g·n, n) × per-image constant c ((n, 1) or (n, n))."""
            if tile2d and key in big_c:
                return x * big_c[key]
            if g == 1:
                return x * c
            return (x.reshape(g, n, n) * c[None]).reshape(g * n, n)

        def rhs(ar, ai):
            """−dealias(u·∇w)^ − drag·ŵ. Forcing is NOT included here: it
            is a constant, so its AB2 contribution telescopes to +dt·F̂·vd
            per step and is applied as per-element scalar updates in `body`
            (sparse forcings never materialize an (n, n) plane)."""
            ik2l = make_ik2() if diet2 else ik2v
            pr, pi = bimg(ar, ik2l, "ik2"), bimg(ai, ik2l, "ik2")
            # velocity pack: (kx + i·ky)·psi → ifft2 → u + i·v
            c1r = kxr * pr - bimg(pi, kyc1, "ky")
            c1i = kxr * pi + bimg(pr, kyc1, "ky")
            ur, vr_ = fft.ifft2(c1r, c1i)
            # gradient pack: (−ky + i·kx)·w → ifft2 → w_x + i·w_y
            c2r = -bimg(ar, kyc1, "ky") - kxr * ai
            c2i = kxr * ar - bimg(ai, kyc1, "ky")
            gr, gi = fft.ifft2(c2r, c2i)
            adv = ur * gr + vr_ * gi
            Ar, Ai = fft.fft2(adv, real_input=True)
            if dealias and not fold_dealias:
                Ar = bimg(Ar * dxr, dyc1, "dy")
                Ai = bimg(Ai * dxr, dyc1, "dy")
            outr, outi = -Ar, -Ai
            if dense_forcing:
                fFr, fFi = fr_ref[:], fi_ref[:]
                outr = outr + (fFr if g == 1 else jnp.concatenate([fFr] * g, 0))
                outi = outi + (fFi if g == 1 else jnp.concatenate([fFi] * g, 0))
            if drag != 0.0:
                outr = outr - drag * ar
                outi = outi - drag * ai
            return outr, outi

        halfdt = 0.5 * dt
        b0 = pl.program_id(0)

        @pl.when(s == 0)
        def _init():
            w0r = w0r_ref[:].reshape(g * n, n)
            w0i = w0i_ref[:].reshape(g * n, n)
            wr[:], wi[:] = w0r, w0i
            if carry:
                # carried AB2 history; boot==1 (t=0 only) replaces it with
                # the forward-Euler bootstrap exactly like the unchunked path
                nr[:] = n0r_ref[:].reshape(g * n, n)
                ni[:] = n0i_ref[:].reshape(g * n, n)

                @pl.when(boot_ref[0] == 1)
                def _boot():
                    r0, i0 = rhs(w0r, w0i)
                    nr[:], ni[:] = r0, i0
            else:
                r0, i0 = rhs(w0r, w0i)
                nr[:], ni[:] = r0, i0
            # CN factors precomputed ONCE into scratch from the separable k²
            # and the per-image ν SMEM scalar (no (n, n) viscosity inputs,
            # no per-step recompute — measured ~16% of step time); nu_ref
            # holds the WHOLE (B,) array (rank-1 SMEM blocks must be
            # whole-array on Mosaic) — instance b covers images b·g+im.
            # diet2 (1024²): no vn/vd scratch at all — `cn_factors` in
            # `body` rebuilds them per step instead.
            if not diet2:
                k2x = k2x_ref[0:1, :]  # (1, n)
                k2y = k2y_ref[:, 0:1]  # (n, 1)
                for im in range(g):
                    sl = slice(im * n, (im + 1) * n)
                    nuk2 = nu_ref[b0 * g + im] * (k2y + k2x)
                    vnS[sl, :] = 1.0 - halfdt * nuk2
                    vdS[sl, :] = 1.0 / (1.0 + halfdt * nuk2)

        def cn_factors():
            """diet2 per-step CN factors from the separable k² vectors and
            the ν SMEM scalar (g == 1 enforced in `traj`): briefly-live
            temporaries instead of 8 MB of pinned scratch."""
            nuk2 = nu_ref[b0] * (k2y_ref[:, 0:1] + k2x_ref[0:1, :])
            return 1.0 - halfdt * nuk2, 1.0 / (1.0 + halfdt * nuk2)

        def body(i, carry):
            ar, ai = wr[:], wi[:]
            r1, i1 = rhs(ar, ai)
            vn, vd = cn_factors() if diet2 else (vnS[:], vdS[:])
            wr[:] = (ar * vn + dt * (1.5 * r1 - 0.5 * nr[:])) * vd
            wi[:] = (ai * vn + dt * (1.5 * i1 - 0.5 * ni[:])) * vd
            # constant forcing: AB2 telescopes to +dt·F̂·vd each step
            # (incl. the Euler bootstrap) — per-element scalar updates,
            # k² at each forced mode is a static host-side constant
            for im in range(g):
                nu_im = None
                for (i0, j0, fr_v, fi_v, k2e) in sparse_f or ():
                    if nu_im is None:
                        nu_im = nu_ref[b0 * g + im]
                    vd_e = dt / (1.0 + halfdt * nu_im * k2e)
                    r_ = im * n + i0
                    if fr_v != 0.0:
                        wr[r_ : r_ + 1, j0 : j0 + 1] = (
                            wr[r_ : r_ + 1, j0 : j0 + 1] + fr_v * vd_e
                        )
                    if fi_v != 0.0:
                        wi[r_ : r_ + 1, j0 : j0 + 1] = (
                            wi[r_ : r_ + 1, j0 : j0 + 1] + fi_v * vd_e
                        )
            nr[:], ni[:] = r1, i1
            return carry

        # dynamic trip count from SMEM — ONE compile serves every
        # difficulty-horizon bucket (≡ the jnp path's traced inner_steps;
        # the reference would recompile per `RE_TIME_SCHEDULE` horizon)
        jax.lax.fori_loop(0, inner_ref[0], body, 0, unroll=False)
        if fields_out:
            # fused contract diagnosis ≡ fields_from_vorticity
            # (`spectral_ns.py:94-124`), all VMEM-resident at HIGHEST:
            ar, ai = wr[:], wi[:]
            ik2o = make_ik2() if diet2 else ik2v
            pr_, pi_ = bimg(ar, ik2o, "ik2"), bimg(ai, ik2o, "ik2")  # ψ̂
            # velocity pack (kx + i·ky)·ψ̂ → u + i·v
            c1r = kxr * pr_ - bimg(pi_, kyc1, "ky")
            c1i = kxr * pi_ + bimg(pr_, kyc1, "ky")
            ur, vr2 = fft_out.ifft2(c1r, c1i)
            # derivative packs: u_x + i·u_y = ifft2(−(kx+i·ky)·ky·ψ̂),
            #                   v_x + i·v_y = ifft2( (kx+i·ky)·kx·ψ̂)
            t3r, t3i = -bimg(pr_, kyc1, "ky"), -bimg(pi_, kyc1, "ky")
            c3r = kxr * t3r - bimg(t3i, kyc1, "ky")
            c3i = kxr * t3i + bimg(t3r, kyc1, "ky")
            uxr, uyr = fft_out.ifft2(c3r, c3i)
            t4r, t4i = kxr * pr_, kxr * pi_
            c4r = kxr * t4r - bimg(t4i, kyc1, "ky")
            c4i = kxr * t4i + bimg(t4r, kyc1, "ky")
            vxr, vyr = fft_out.ifft2(c4r, c4i)
            # Δp = 2(u_x v_y − u_y v_x) → p̂ = −rhŝ/|k|²
            rhs_p = 2.0 * (uxr * vyr - uyr * vxr)
            Rr, Ri = fft_out.fft2(rhs_p, real_input=True)
            # recompute under diet2 rather than carrying ik2o across the
            # three transforms above
            ik2p = make_ik2() if diet2 else ik2v
            pre, _ = fft_out.ifft2(-bimg(Rr, ik2p, "ik2"), -bimg(Ri, ik2p, "ik2"))
            out_u[:, 0] = ur.reshape(g, n, n)
            out_v[:, 0] = vr2.reshape(g, n, n)
            out_p[:, 0] = pre.reshape(g, n, n)
        else:
            sr, _ = fft_out.ifft2(wr[:], wi[:])
            out_ref[:, 0] = sr.reshape(g, n, n)

        if carry:
            # flush the integrator state once, at the last grid step (the
            # state blocks are revisited across s, so only this write lands)
            @pl.when(s == S_last - 1)
            def _flush_state():
                st_wr[:] = wr[:].reshape(g, n, n)
                st_wi[:] = wi[:].reshape(g, n, n)
                st_nr[:] = nr[:].reshape(g, n, n)
                st_ni[:] = ni[:].reshape(g, n, n)

      return kernel

    def _pick_group(B):
        # group g images per kernel instance: the lane-axis FFT matmuls get
        # g-x wider M (better MXU utilization); sub-axis passes stay
        # per-image. VMEM bounds g·n² ≤ 2·256² (measured: g=2 best at 256²
        # [+8%], g=8 at 128² [+77%, 595 traj/s]; one step beyond each OOMs;
        # 512² runs g=1).
        if group == "auto":
            g_max = max(1, (2 * 256 * 256) // (n * n))
            g = next((g for g in (8, 4, 2, 1) if g <= g_max and B % g == 0), 1)
        else:
            g = int(group)
            if B % g:
                raise ValueError(f"batch {B} not divisible by group {g}")
        if diet2 and g != 1:
            raise ValueError(f"n={n} (VMEM diet v2) requires group=1, got {g}")
        return g

    def _make_call(g, B, S_eff, carry, interpret):
        """Build the pallas_call for grid (B/g, S_eff); ``carry`` adds the
        state-io plumbing (chunked mode — see make_kernel)."""
        cb = lambda: pl.BlockSpec(
            (g, n, n), lambda b, s: (b, 0, 0), memory_space=pltpu.VMEM
        )
        crow = lambda: pl.BlockSpec(
            (8, n), lambda b, s: (0, 0), memory_space=pltpu.VMEM
        )
        ccol = lambda: pl.BlockSpec(
            (n, 128), lambda b, s: (0, 0), memory_space=pltpu.VMEM
        )
        cnn = lambda: pl.BlockSpec(
            (n, n), lambda b, s: (0, 0), memory_space=pltpu.VMEM
        )
        cm = lambda: pl.BlockSpec(
            (m, 128, 128), lambda b, s: (0, 0, 0), memory_space=pltpu.VMEM
        )
        cs = lambda: pl.BlockSpec(
            (6 * m, 128, 128), lambda b, s: (0, 0, 0), memory_space=pltpu.VMEM
        )
        smem1 = lambda: pl.BlockSpec(
            (1,), lambda b, s: (0,), memory_space=pltpu.SMEM
        )
        sb = lambda: pl.BlockSpec(  # state in/out: (g, n, n) block, no S axis
            (g, n, n), lambda b, s: (b, 0, 0), memory_space=pltpu.VMEM
        )
        snap_spec = lambda: pl.BlockSpec(
            (g, 1, n, n), lambda b, s: (b, s, 0, 0), memory_space=pltpu.VMEM
        )
        extra = (
            {}
            if interpret
            else {
                "compiler_params": pltpu.CompilerParams(
                    dimension_semantics=("arbitrary", "arbitrary"),
                    # the 16 MB scoped-vmem cap is a compiler default, not
                    # the v5e hardware (128 MB physical VMEM); the working
                    # set at 256² g=2 / 512² g=1 sits at ~20-40 MB
                    # diet2 (1024²) measures 106 MB scoped (state + radix-8
                    # transform temporaries) — still under the 128 MB
                    # physical VMEM, so the cap moves to 120 MB there.
                    vmem_limit_bytes=(120 if diet2 else 100) * 1024 * 1024,
                )
            }
        )
        n_snap_out = 3 if fields_out else 1
        out_specs = [snap_spec() for _ in range(n_snap_out)]
        out_shape = [
            jax.ShapeDtypeStruct((B, S_eff, n, n), jnp.float32)
            for _ in range(n_snap_out)
        ]
        if carry:
            out_specs += [sb() for _ in range(4)]
            out_shape += [
                jax.ShapeDtypeStruct((B, n, n), jnp.float32) for _ in range(4)
            ]
        elif not fields_out:
            out_specs, out_shape = out_specs[0], out_shape[0]
        return pl.pallas_call(
            make_kernel(g, S_eff, carry),
            interpret=interpret,
            grid=(B // g, S_eff),
            in_specs=[
                smem1(),  # inner steps
                *([smem1()] if carry else []),  # bootstrap flag
                cb(), cb(),  # w0r, w0i (carry: the chunk's state in)
                *([cb(), cb()] if carry else []),  # n0r, n0i (AB2 history)
                # whole (B,) ν array per instance (rank-1 SMEM blocks must
                # be whole-array on Mosaic); kernel indexes b·g+im
                pl.BlockSpec((B,), lambda b, s: (0,), memory_space=pltpu.SMEM),
                crow(), ccol(), crow(), ccol(), crow(), ccol(),  # kx ky dx dy k2x k2y
                *([] if diet2 else [cnn()]),  # ik2 (diet2: rebuilt in-kernel)
                *([cnn(), cnn()] if dense_forcing else []),
                cm(), cm(), cm(), cm(), cm(), cm(), cm(), cm(),
                *[cm() for _ in mats_deal],
                *[cs() for _ in split_mats],
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[
                # diet2: no vn/vd CN-factor scratch (rebuilt per step)
                pltpu.VMEM((g * n, n), jnp.float32)
                for _ in range(4 if diet2 else 6)
            ],
            **extra,
        )

    def _const_args():
        return (
            consts["kx_row"], consts["ky_col"],
            consts["dx_row"], consts["dy_col"],
            consts["k2x_row"], consts["k2y_col"],
            *([] if diet2 else [consts["ik2"]]),
            *([jnp.asarray(fr_np), jnp.asarray(fi_np)] if dense_forcing else []),
            *[jnp.asarray(a) for a in mats],
            *[jnp.asarray(a) for a in mats_deal],
            *[jnp.asarray(a) for a in split_mats],
        )

    def _nu_batched(nu, B):
        nu_v = jnp.asarray(cfg.viscosity if nu is None else nu, jnp.float32)
        return (
            nu_v if nu_v.ndim == 1 else jnp.broadcast_to(nu_v, (B,))
        ).astype(jnp.float32)

    def traj(w0: jax.Array, nu=None, inner_steps=None) -> jax.Array:
        B = w0.shape[0]
        g = _pick_group(B)
        inner_v = jnp.asarray(
            inner if inner_steps is None else inner_steps, jnp.int32
        ).reshape(1)
        w0f = w0.astype(jnp.float32)
        w0r, w0i = ct_fft.fft2_stored(w0f, jnp.zeros_like(w0f), plan)
        nu_b = _nu_batched(nu, B)
        # CPU (tests, virtual meshes): run through the Pallas interpreter —
        # same semantics, no Mosaic. TPU-specific compiler params only apply
        # to the compiled path.
        interpret = jax.default_backend() == "cpu"
        snaps = _make_call(g, B, S, False, interpret)(
            inner_v, w0r, w0i, nu_b, *_const_args()
        )
        if fields_out:
            u, v, p = snaps
            snaps = jnp.stack([u, v, p], axis=-1)  # (B, S, n, n, 3)
            if cfg.include_initial:
                def init_fields(w):
                    f = solver.fields_from_vorticity(w)
                    return jnp.stack([f["u"], f["v"], f["p"]], axis=-1)

                f0 = jax.vmap(init_fields)(w0f).astype(jnp.float32)
                snaps = jnp.concatenate([f0[:, None], snaps], axis=1)
            return snaps
        if cfg.include_initial:
            snaps = jnp.concatenate([w0f[:, None], snaps], axis=1)
        return snaps

    _chunk_calls: dict = {}

    def chunked_traj(w0: jax.Array, nu=None, inner_steps=None) -> jax.Array:
        """Same trajectory as ``traj`` (bit-identical: the AB2 history rounds
        through HBM in f32, losslessly) but no single device program runs
        more than ``chunk_steps`` solver steps. Every chunk reuses ONE
        executable (step count and bootstrap flag are SMEM scalars; grid
        S=1). Each program also emits a snapshot of its final state; the
        host keeps the ones on the snapshot cadence and drops mid-interval
        ones (the epilogue is ≲3 steps' worth of work — negligible at
        chunk_steps ≥ 10⁴). ``inner_steps`` must be a host int here: the
        chunk schedule is host-side."""
        B = w0.shape[0]
        g = _pick_group(B)
        inner_i = inner if inner_steps is None else inner_steps
        if isinstance(inner_i, jax.core.Tracer):
            raise TypeError(
                "chunked mode schedules programs host-side; inner_steps "
                "must be a concrete int, not a tracer"
            )
        inner_i = max(int(inner_i), 1)
        cap = max(int(chunk_steps), 1)
        interpret = jax.default_backend() == "cpu"
        # one jitted executable per (g, B): cached across calls/buckets —
        # a fresh jax.jit wrapper every call would recompile every time
        ckey = (g, B, interpret)
        call = _chunk_calls.get(ckey)
        if call is None:
            call = _chunk_calls[ckey] = jax.jit(
                _make_call(g, B, 1, True, interpret)
            )
        # prologue/epilogue run as jitted programs too — EAGER dispatch of
        # the transforms materializes complex64 constants host-side, and
        # the dev tunnel cannot transfer complex buffers host→device
        # (surfaces as a delayed bare UNIMPLEMENTED)
        pkey = ("prep", B, interpret)
        prep = _chunk_calls.get(pkey)
        if prep is None:
            def _prep(w0_):
                w0f_ = w0_.astype(jnp.float32)
                w0r_, w0i_ = ct_fft.fft2_stored(
                    w0f_, jnp.zeros_like(w0f_), plan
                )
                if fields_out and cfg.include_initial:
                    def init_fields(w):
                        f = solver.fields_from_vorticity(w)
                        return jnp.stack([f["u"], f["v"], f["p"]], axis=-1)

                    f0_ = jax.vmap(init_fields)(w0f_).astype(jnp.float32)
                else:
                    f0_ = w0f_
                return w0f_, w0r_, w0i_, f0_

            prep = _chunk_calls[pkey] = jax.jit(_prep)
        w0f, w0r, w0i, f0 = prep(w0)
        nu_b = _nu_batched(nu, B)
        zero = jnp.zeros_like(w0r)
        st = (w0r, w0i, zero, zero)
        boot = jnp.ones((1,), jnp.int32)
        not_boot = jnp.zeros((1,), jnp.int32)
        cargs = _const_args()
        snaps = []
        for _ in range(S):
            rem = inner_i
            while rem > 0:
                take = min(rem, cap)
                rem -= take
                outs = call(
                    jnp.asarray([take], jnp.int32), boot,
                    st[0], st[1], st[2], st[3], nu_b, *cargs,
                )
                boot = not_boot
                st = tuple(outs[-4:])
            snaps.append(
                jnp.stack(outs[:3], axis=-1) if fields_out else outs[0]
            )
        snaps = jnp.concatenate(snaps, axis=1)  # (B, S, n, n[, 3])
        if cfg.include_initial:
            first = f0 if fields_out else w0f
            snaps = jnp.concatenate([first[:, None], snaps], axis=1)
        return snaps

    return chunked_traj if chunk_steps else traj


def build_sharded_traj(solver, mesh, inner_steps: int | None = None,
                       precision: str = "fast", axis: str = "data",
                       output: str = "vorticity"):
    """Pod-scale variant: the batch axis is sharded over ``mesh[axis]`` and
    each device runs the fused kernel on its local shard (`shard_map`; no
    collectives — trajectories are independent, the reference's
    process-per-batch OpenFOAM scheme collapsed into one SPMD program).

    ``traj(w0:(B,n,n), nu:(B,), inner_steps scalar) -> (B,T,n,n)`` with
    B divisible by the axis size.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    local = build_batched_traj(solver, inner_steps, precision, output=output)

    def _local(w0, nu, inner):
        return local(w0, nu, inner[0])

    sharded = shard_map(
        _local,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P()),
        out_specs=P(axis),
        check_vma=False,
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
