"""Cooley-Tukey matmul FFT in a permuted spectral layout (TPU MXU form).

The pseudo-spectral NS stepper (`solvers/spectral_ns.py`) is ~95% FFT-bound
on chip (PERF.md roofline); XLA's native FFT costs many HBM passes. This
module re-expresses the N-point FFT (N = 128·m, m a small radix) so the
heavy stage is a dense 128-contraction matmul — the exact shape the MXU
is built for — and everything else folds away:

- **DIF split**: x is cut into ``m`` contiguous chunks (no de-interleave —
  contiguous slices are free on TPU); an m-point butterfly combines them;
  each combination then goes through one **DFT-128 matmul**.
- **Twiddles fold into the matrices**: the post-butterfly twiddle
  ``W_N^(n1·k2)`` multiplies along the *contracted* axis, so it is absorbed
  into a per-chunk copy of the DFT matrix (``diag(tw)·D`` forward,
  ``M·diag(conj tw)`` inverse). The kernel never sees a twiddle.
- **Permuted output layout**: the transform yields the spectrum in
  chunk-major order ``stored[j·128+k1] = X[m·k1+j]``. We never reorder —
  solvers run entirely in this layout and all spectral constants (k-vectors,
  dealias masks, viscosity factors) are pre-permuted host-side with
  :func:`perm_indices`.
- **3-multiply complex matmuls**: with a constant complex matrix ``D``,
  ``(a+ib)@D`` needs 3 real matmuls (m0 = a@(Dr−Di), m1 = (a−b)@Di,
  m2 = (a+b)@Dr → re = m0+m1, im = m2−m0) instead of 4.

The jnp reference here (`fft1d_stored` / `fft2_stored` / inverses) defines
the exact semantics for the fused Pallas stepper
(`solvers/spectral_ns_pallas.py`) and doubles as an XLA-only fallback.

Capability context: replaces the FFT core of the reference's dataset
generator (OpenFOAM at `dataset_gen/.../Regular/main.py:129-151` is the
reference's "solver kernel"; our spectral stepper is the TPU-native
equivalent — see SURVEY.md §7).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

__all__ = [
    "CTFFTPlan",
    "make_plan",
    "perm_indices",
    "permute2",
    "fft2_stored",
    "ifft2_stored",
    "fft2_stored_ref",
]


def perm_indices(n: int, m: int) -> np.ndarray:
    """stored[j] = X[perm[j]]: chunk-major spectral order for radix (128, m).

    stored index j = c·128 + k1 (c = chunk 0..m-1, k1 = 0..127) holds
    natural-order frequency X[m·k1 + c].
    """
    assert n == 128 * m
    k1 = np.arange(128)
    return np.concatenate([m * k1 + c for c in range(m)]).astype(np.int64)


class CTFFTPlan:
    """Host-built constant matrices for the radix-(128, m) transform.

    Forward (per chunk c): ``S_c = sum_j B[c,j] · x_chunk_j`` (m-point DIF
    butterfly, elementwise), then ``stored_chunk_c = S_c @ Dfwd[c]``.
    Inverse: ``T_c = stored_chunk_c @ Dinv[c]``, then
    ``x_chunk_j = (1/m)·sum_c conj(B)[c,j] · T_c``.

    All matrices are (128, 128) complex128 numpy; consumers slice re/im and
    cast. ``butterfly[c, j] = W_m^(c·j)`` (applied elementwise).
    """

    def __init__(self, n: int, m: int):
        assert n == 128 * m and m >= 1
        self.n, self.m = n, m
        k1 = np.arange(128)
        n1 = np.arange(128)
        # unnormalized DFT-128: D[n1, k1] = W_128^(n1 k1)
        d128 = np.exp(-2j * np.pi * np.outer(n1, k1) / 128.0)
        # chunk twiddle: after the butterfly, chunk c carries W_N^(n1·c)
        self.fwd = []
        self.inv = []
        for c in range(m):
            tw = np.exp(-2j * np.pi * n1 * c / n)
            self.fwd.append(tw[:, None] * d128)  # diag(tw) @ D
            # inverse: IDFT128 then ·conj(tw), folded into columns; the
            # butterfly's 1/m lives in ifft chunk recombination
            self.inv.append((np.conj(d128) / 128.0) * np.conj(tw)[None, :])
        self.butterfly = np.exp(
            -2j * np.pi * np.outer(np.arange(m), np.arange(m)) / m
        )
        self.perm = perm_indices(n, m)


_PLANS: dict = {}


def make_plan(n: int, m: int | None = None) -> CTFFTPlan:
    if m is None:
        m = n // 128
    key = (n, m)
    if key not in _PLANS:
        _PLANS[key] = CTFFTPlan(n, m)
    return _PLANS[key]


def permute2(a: np.ndarray, n: int, m: int | None = None) -> np.ndarray:
    """Permute the last two axes of a natural-order 2-D spectral constant
    into stored order (host-side, numpy)."""
    p = make_plan(n, m).perm
    return np.ascontiguousarray(a[..., p, :][..., :, p])


# ---------------------------------------------------------------------------
# jnp reference (also the XLA fallback path)
# ---------------------------------------------------------------------------


def _consts(plan: CTFFTPlan, dtype):
    """(fwd_r, fwd_i, inv_r, inv_i) lists of jnp (128,128) arrays."""
    f = [(jnp.asarray(d.real, dtype), jnp.asarray(d.imag, dtype)) for d in plan.fwd]
    i = [(jnp.asarray(d.real, dtype), jnp.asarray(d.imag, dtype)) for d in plan.inv]
    return f, i


# One-time transforms (initial condition, constants) must be f32-exact on
# TPU — the default matmul precision is bf16, which would stamp a ~1e-3
# error onto the initial spectrum (measured: constant 4.7e-3 trajectory
# error traced to exactly this).
_PREC = jax.lax.Precision.HIGHEST


def _mm(a, b):
    return jnp.matmul(a, b, precision=_PREC).astype(a.dtype)


def _cmatmul_right(ar, ai, dr, di):
    """(ar + i·ai) @ (dr + i·di), 3-multiply form, f32-accurate."""
    m0 = _mm(ar, dr - di)
    m1 = _mm(ar - ai, di)
    m2 = _mm(ar + ai, dr)
    return m0 + m1, m2 - m0


def _cmatmul_left(dr, di, ar, ai):
    """(dr + i·di) @ (ar + i·ai) — matrices on the left for axis -2."""
    m0 = _mm(dr - di, ar)
    m1 = _mm(di, ar - ai)
    m2 = _mm(dr, ar + ai)
    return m0 + m1, m2 - m0


def _split_chunks(xr, xi, m, axis):
    n1 = xr.shape[axis] // m
    idx = lambda c: tuple(
        slice(c * n1, (c + 1) * n1) if a == axis % xr.ndim else slice(None)
        for a in range(xr.ndim)
    )
    return [(xr[idx(c)], xi[idx(c)]) for c in range(m)]


def _butterfly(chunks, B, conj=False, scale=1.0):
    """out_c = scale·sum_j B[c,j]·chunk_j (complex elementwise)."""
    m = len(chunks)
    out = []
    for c in range(m):
        accr = None
        for j in range(m):
            w = np.conj(B[c, j]) if conj else B[c, j]
            wr, wi = float(w.real) * scale, float(w.imag) * scale
            cr, ci = chunks[j]
            tr = wr * cr - wi * ci
            ti = wr * ci + wi * cr
            accr = (tr, ti) if accr is None else (accr[0] + tr, accr[1] + ti)
        out.append(accr)
    return out


def fft1d_stored(xr, xi, plan: CTFFTPlan, axis: int):
    """Forward stored-layout FFT along `axis` (must be -1 or -2 of a ≥2-D
    array whose that-axis length is plan.n). Returns (re, im)."""
    fwd, _ = _consts(plan, xr.dtype)
    chunks = _split_chunks(xr, xi, plan.m, axis)
    combos = _butterfly(chunks, plan.butterfly)
    outs = []
    for c, (sr, si) in enumerate(combos):
        dr, di = fwd[c]
        if axis in (-1, xr.ndim - 1):
            outs.append(_cmatmul_right(sr, si, dr, di))
        else:
            outs.append(_cmatmul_left(dr.T, di.T, sr, si))
    return (
        jnp.concatenate([o[0] for o in outs], axis=axis),
        jnp.concatenate([o[1] for o in outs], axis=axis),
    )


def ifft1d_stored(xr, xi, plan: CTFFTPlan, axis: int):
    """Inverse of :func:`fft1d_stored` (same stored layout in)."""
    _, inv = _consts(plan, xr.dtype)
    chunks = _split_chunks(xr, xi, plan.m, axis)
    ts = []
    for c, (er, ei) in enumerate(chunks):
        dr, di = inv[c]
        if axis in (-1, xr.ndim - 1):
            ts.append(_cmatmul_right(er, ei, dr, di))
        else:
            ts.append(_cmatmul_left(dr.T, di.T, er, ei))
    outs = _butterfly(ts, plan.butterfly, conj=True, scale=1.0 / plan.m)
    return (
        jnp.concatenate([o[0] for o in outs], axis=axis),
        jnp.concatenate([o[1] for o in outs], axis=axis),
    )


def fft2_stored(xr, xi, plan: CTFFTPlan):
    xr, xi = fft1d_stored(xr, xi, plan, axis=-2)
    return fft1d_stored(xr, xi, plan, axis=-1)


def ifft2_stored(xr, xi, plan: CTFFTPlan):
    xr, xi = ifft1d_stored(xr, xi, plan, axis=-1)
    return ifft1d_stored(xr, xi, plan, axis=-2)


def fft2_stored_ref(x: np.ndarray, n: int, m: int | None = None) -> np.ndarray:
    """numpy oracle: natural fft2 then permute to stored order."""
    plan = make_plan(n, m)
    X = np.fft.fft2(x)
    return X[..., plan.perm, :][..., :, plan.perm]
