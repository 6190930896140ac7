"""Fused Swin-V2 window attention (TPU Pallas, forward + custom VJP).

The XLA lowering of scOT's window attention materializes the
(num_windows·B, heads, n, n) attention tensor in HBM several times per
block (matmul out → bias/softmax fusion → value matmul in; ~3× more in the
backward). At scOT-B 128² stage 0 that is 64·3·256² f32 ≈ 50 MB per pass
per block. Windows are tiny (n = window² ≤ 256), so no online/flash
softmax is needed: one pallas program computes a whole (window, head)
tile — logits, additive bias, softmax, value contraction — entirely in
VMEM. Only q/k/v/out (layout (nb, h, n, hd)) and the small (nw, h, n, n)
bias ever touch HBM.

MEASURED OUTCOME (PERF.md, scOT-B 128² bs16, v5e): this kernel is SLOWER
than the XLA einsum path (80.8 vs 67.8 ms/step f32; 74.9 vs 68.4 bf16) —
at scOT head dims the per-program matmuls are (256, ≤32)-shaped, badly
underfilling the MXU's 128-lane contraction, while XLA's batched einsums
pipeline their HBM traffic behind compute. The model therefore defaults
to "auto" == xla (`ScOTConfig.attention_impl`); the kernel remains for
configurations with larger windows/head dims where the VMEM-residency
trade flips.

Contract (all shapes static):

    out = window_attention(q, k, v, bias)

    q, k : (nb, h, n, hd) — ALREADY cosine-normalized and (q) per-head
                            logit-scaled; the kernel computes plain q·kᵀ
    v    : (nb, h, n, hd)
    bias : (nw, h, n, n) additive logits bias (CPB + shift mask), shared
           across images: window w of image b is row b·nw + w of q/k/v.
           Pass nw=1 when every window shares the bias (no shift mask).

The (nb, h, n, hd) layout exists for Mosaic's tiling rule: a block's last
dim must be a multiple of 128 OR equal to the array's last dim, so per-head
blocks of a heads-folded (nb, n, c) layout (last dim hd, e.g. 32) are
unlowerable, while (1, 1, n, hd) blocks of this layout are legal. The
small-lane (hd < 128) matmuls underfill the MXU, but these contractions
are tiny — the kernel's win is skipping the attention tensor's HBM round
trips, not FLOPs.

The custom VJP recomputes the softmax in the backward kernel (cheap — it
never left VMEM in the forward either) and accumulates dbias over the
image grid dimension in-kernel.

Numerics match the XLA path: same matmul order, same f32 softmax.
Falls back to interpreter mode off-TPU (CPU tests).

Reference capability: the HF `Swinv2Attention` core the reference model
wraps (`Poseidon_mixing_Exp/scOT/model.py:343-531`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = ["window_attention"]


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


_CONTRACT_LAST = (((1,), (1,)), ((), ()))   # a @ b.T
_CONTRACT_FIRST = (((0,), (0,)), ((), ()))  # a.T @ b


def _fwd_kernel(q_ref, k_ref, v_ref, b_ref, o_ref):
    q = q_ref[0, 0]  # (n, hd)
    k = k_ref[0, 0]
    logits = jax.lax.dot_general(q, k, _CONTRACT_LAST,
                                 preferred_element_type=jnp.float32)
    logits = logits + b_ref[0, 0].astype(jnp.float32)
    p = jax.nn.softmax(logits, axis=-1)
    o_ref[0, 0] = jnp.dot(p.astype(v_ref.dtype), v_ref[0, 0],
                          preferred_element_type=jnp.float32
                          ).astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, b_ref, do_ref,
                dq_ref, dk_ref, dv_ref, db_ref):
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0]
    logits = jax.lax.dot_general(q, k, _CONTRACT_LAST,
                                 preferred_element_type=jnp.float32)
    logits = logits + b_ref[0, 0].astype(jnp.float32)
    p = jax.nn.softmax(logits, axis=-1)

    pc = p.astype(v.dtype)
    dv_ref[0, 0] = jax.lax.dot_general(pc, do, _CONTRACT_FIRST,
                                       preferred_element_type=jnp.float32
                                       ).astype(dv_ref.dtype)
    dp = jax.lax.dot_general(do, v, _CONTRACT_LAST,
                             preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))

    b = pl.program_id(2)

    @pl.when(b == 0)
    def _():
        db_ref[0, 0] = ds

    @pl.when(b > 0)
    def _():
        db_ref[0, 0] += ds

    dsc = ds.astype(q.dtype)
    dq_ref[0, 0] = jnp.dot(dsc, k, preferred_element_type=jnp.float32
                           ).astype(dq_ref.dtype)
    dk_ref[0, 0] = jax.lax.dot_general(dsc, q, _CONTRACT_FIRST,
                                       preferred_element_type=jnp.float32
                                       ).astype(dk_ref.dtype)


def _specs(nb, n, hd, h, nw):
    """Common grid/block layout: grid (window, head, image) with the image
    dim innermost so the dbias output block stays resident while it
    accumulates over images."""
    b_img = nb // nw

    def qkv_idx(w, hh, b):
        return (b * nw + w, hh, 0, 0)

    qkv = pl.BlockSpec((1, 1, n, hd), qkv_idx)
    bias = pl.BlockSpec((1, 1, n, n), lambda w, hh, b: (w, hh, 0, 0))
    grid = (nw, h, b_img)
    return grid, qkv, bias


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def window_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                     bias: jax.Array) -> jax.Array:
    return _forward(q, k, v, bias)


def _forward(q, k, v, bias):
    nb, h, n, hd = q.shape
    nw, hb = bias.shape[:2]
    assert nb % nw == 0 and h == hb, (q.shape, bias.shape)
    grid, qkv, bspec = _specs(nb, n, hd, h, nw)
    return pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[qkv, qkv, qkv, bspec],
        out_specs=qkv,
        out_shape=jax.ShapeDtypeStruct((nb, h, n, hd), q.dtype),
        interpret=not _on_tpu(),
    )(q, k, v, bias)


def _vjp_fwd(q, k, v, bias):
    return _forward(q, k, v, bias), (q, k, v, bias)


def _vjp_bwd(res, do):
    q, k, v, bias = res
    nb, h, n, hd = q.shape
    nw = bias.shape[0]
    grid, qkv, bspec = _specs(nb, n, hd, h, nw)
    dq, dk, dv, db = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[qkv, qkv, qkv, bspec, qkv],
        out_specs=[qkv, qkv, qkv, bspec],
        out_shape=[
            jax.ShapeDtypeStruct((nb, h, n, hd), q.dtype),
            jax.ShapeDtypeStruct((nb, h, n, hd), k.dtype),
            jax.ShapeDtypeStruct((nb, h, n, hd), v.dtype),
            jax.ShapeDtypeStruct((nw, h, n, n), jnp.float32),
        ],
        interpret=not _on_tpu(),
    )(q, k, v, bias, do)
    return dq, dk, dv, db.astype(bias.dtype)


window_attention.defvjp(_vjp_fwd, _vjp_bwd)
