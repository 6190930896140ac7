"""Relative-position-bias expansion with an MXU-native adjoint.

Swin-V2's continuous position bias indexes a ((2w-1)^2, h) CPB table with a
static (n^2,)-index map (n = w^2 tokens per window) to build the per-head
(h, n, n) attention bias — the reference does this with a torch gather
(`/root/reference/Poseidon_mixing_Exp/scOT/model.py:270-292`, HF Swin-V2
convention). The forward gather is cheap on TPU, but its autodiff adjoint is
a scatter-add of n^2 contributions into (2w-1)^2 slots — duplicate-index
scatters are a serialized slow path on TPU (no MXU, no lane parallelism),
and scOT runs one per attention layer per backward step.

`relative_position_bias` keeps the fast gather forward and replaces the
backward with the closed-form Toeplitz adjoint: the index map is
rel(p, q) = (row_p - row_q, col_p - col_q), so

    d_table[a, b] = sum_{p,q : row_p-row_q = a-(w-1), col_p-col_q = b-(w-1)}
                    d_bias[p, q]

which factorizes over rows/cols into two tiny dense einsums against a
static (w, w, 2w-1) 0/1 "diagonal extractor" — plain MXU matmuls, no
scatter. Exactly the same math (tested against `jax.grad` of the gather to
f64 exactness in `tests/test_scot.py`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _rel_index(ws: int) -> np.ndarray:
    """Static (n^2,) map token-pair -> flat (2w-1)^2 relative offset
    (row-major), identical to the reference's relative_position_index."""
    ci = np.stack(
        np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"), 0
    ).reshape(2, -1)
    rel = ci[:, :, None] - ci[:, None, :] + (ws - 1)  # (2, n, n)
    return (rel[0] * (2 * ws - 1) + rel[1]).reshape(-1)


def _diag_extractor(ws: int) -> np.ndarray:
    """R[i, j, a] = 1 iff i - j + (w-1) == a; shape (w, w, 2w-1)."""
    i = np.arange(ws)
    d = i[:, None] - i[None, :] + (ws - 1)  # (w, w) in [0, 2w-2]
    out = np.zeros((ws, ws, 2 * ws - 1), np.float32)
    out[i[:, None], i[None, :], d] = 1.0
    return out


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def relative_position_bias(table: jax.Array, ws: int) -> jax.Array:
    """((2w-1)^2, h) CPB table -> (n^2, h) bias rows, n = w^2.

    Same value as ``table[_rel_index(ws)]`` (the caller reshapes/transposes
    to (h, n, n)); the custom VJP swaps the scatter-add adjoint for dense
    einsums.
    """
    return table[jnp.asarray(_rel_index(ws))]


def _fwd(table, ws):
    return relative_position_bias(table, ws), None


def _bwd(ws, _, g):
    # g: (n^2, h) cotangent of the gathered rows
    h = g.shape[-1]
    g5 = g.reshape(ws, ws, ws, ws, h)  # [row_p, col_p, row_q, col_q, h]
    R = jnp.asarray(_diag_extractor(ws), g.dtype)
    # contract the row pair, then the col pair (each a dense matmul)
    t = jnp.einsum("pcqdh,pqa->acdh", g5, R)
    dt = jnp.einsum("acdh,cdb->abh", t, R)
    return (dt.reshape((2 * ws - 1) ** 2, h),)


relative_position_bias.defvjp(_fwd, _bwd)
