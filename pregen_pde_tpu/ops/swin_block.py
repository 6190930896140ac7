"""Whole-Swin-block fusion (TPU Pallas): window attention → CondLN →
residual → MLP → CondLN → residual as ONE kernel per layer.

Why: the scOT train step is op-count/overhead-bound, not FLOP-bound — after
the round-4 CPB-adjoint fix the forward still runs ~12% of MXU roofline and
bf16 moves nothing (PERF.md "scOT train-step profile"). XLA's lowering of
one `SwinLayerV2` is ~50 HLO ops with the attention tensor and both MLP
intermediates round-tripping HBM; windows are tiny (n = window² ≤ 256), so
a whole (sample, window) block — q/k/v projections, cosine attention with
additive CPB bias, head-merge + output projection, post-norm conditional
LayerNorm, residual, MLP, second CondLN, second residual — fits VMEM
entirely. Only x and y touch HBM per layer.

Per-head weight packing avoids the Mosaic lane-slicing trap (a (n, C)
array cannot be sliced at non-128 lane offsets without relayout): q/k/v
kernels enter pre-split as (h, C, hd) so each head's projection is its own
(C, hd) matmul, and the output projection enters row-split as (h, hd, C) so
head results accumulate straight into the (n, C) projection sum — no
channel-axis concat at hd granularity anywhere.

The VJP is a second fused Pallas kernel (`_bwd_kernel`): ALL gradients —
dx, dbias, dscale, every weight/bias, both CondLN affines, the drop-path
projections — in one pass per (sample, window) with grid-ordered
accumulators (weight gradients accumulate across the window grid inside
VMEM scratch; per-leaf parity vs `jax.grad` of the reference block is
pinned in `tests/test_swin_block.py`). Stages with C ≤ MAX_FUSED_BWD_DIM
(192: scOT stages 0-1, where the window count and therefore the op-count
overhead is largest) take the fused backward; larger C recompute via
`jax.vjp` of the jnp reference implementation (`_ref_impl`) — gradients
are mathematically those of the same block function either way.

Gating: C ≤ MAX_FUSED_DIM (384) keeps all weights + intermediates inside
the ~16 MB VMEM window (scOT stage 3 at C = 768 would need ~19 MB for the
MLP weights alone and stays on XLA). Off-TPU the kernel runs in
interpreter mode (CPU tests are arithmetic-exact).

Reference capability: one `ScOTLayer` (`Poseidon_mixing_Exp/scOT/
model.py:343-531`) — Swin-V2 post-norm block with conditional LayerNorms.

MEASURED OUTCOME (round 5, on chip, scOT-B batch 16 at 128²): the fused
block LOSES to XLA — full step 50.2 vs 43.3 ms f32, forward alone 16.5 vs
11.9 — because a per-(sample, window) grid (4096 programs/layer at
stage 0) pays more in program overhead and small-matmul MXU
under-utilization than it saves in HBM traffic; see PERF.md "scOT
train-step profile". Kept as `ScOTConfig.block_impl="fused"`
(`"auto"` keeps the XLA path); a win at this granularity would need
multi-window batching per program.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_swin_block", "MAX_FUSED_DIM", "pack_heads"]

# stage 3 of scOT-B/L (C=768: MLP weights 2·C·4C·4B ≈ 19 MB) stays on XLA
MAX_FUSED_DIM = 384

_CONTRACT_LAST = (((1,), (1,)), ((), ()))  # a @ b.T


def pack_heads(wq, wk, wv, wproj, num_heads: int):
    """(C, C) dense kernels → per-head packs: q/k/v as (h, C, hd) column
    splits, proj as (h, hd, C) row splits (see module docstring)."""
    c = wq.shape[0]
    hd = c // num_heads
    col = lambda w: w.reshape(c, num_heads, hd).transpose(1, 0, 2)
    return col(wq), col(wk), col(wv), wproj.reshape(num_heads, hd, c)


def _fwd_kernel(num_heads, eps, x_ref, bias_ref, scale_ref,
                wq_ref, bq_ref, wk_ref, wv_ref, bv_ref, wp_ref, bp_ref,
                ln1w_ref, ln1b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                ln2w_ref, ln2b_ref, dp_ref, y_ref):
    _, wsh, wsw, c = x_ref.shape
    n = wsh * wsw
    xt = x_ref[0].reshape(n, c).astype(jnp.float32)

    acc = jnp.zeros((n, c), jnp.float32)
    for i in range(num_heads):
        q = jnp.dot(xt, wq_ref[i], preferred_element_type=jnp.float32) \
            + bq_ref[i]
        k = jnp.dot(xt, wk_ref[i], preferred_element_type=jnp.float32)
        v = jnp.dot(xt, wv_ref[i], preferred_element_type=jnp.float32) \
            + bv_ref[i]
        # Swin-V2 cosine attention — same normalization as the XLA path
        qn = q / (jnp.sqrt(jnp.sum(q * q, -1, keepdims=True)) + 1e-6)
        kn = k / (jnp.sqrt(jnp.sum(k * k, -1, keepdims=True)) + 1e-6)
        logits = jax.lax.dot_general(qn, kn, _CONTRACT_LAST,
                                     preferred_element_type=jnp.float32)
        logits = logits * scale_ref[i] + bias_ref[0, i].astype(jnp.float32)
        p = jax.nn.softmax(logits, axis=-1)
        o = jnp.dot(p, v, preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(o, wp_ref[i], preferred_element_type=jnp.float32)
    attn = acc + bp_ref[0]

    # post-norm CondLN 1 + drop-path residual
    mean = jnp.mean(attn, -1, keepdims=True)
    var = jnp.mean(attn * attn, -1, keepdims=True) - mean * mean
    an = (attn - mean) * jax.lax.rsqrt(var + eps)
    an = an * ln1w_ref[0] + ln1b_ref[0]
    x2 = xt + dp_ref[0, 0, 0] * an

    # MLP (flax-default tanh-approximate GELU) + CondLN 2 + residual
    hid = jnp.dot(x2, w1_ref[:, :], preferred_element_type=jnp.float32) \
        + b1_ref[0]
    hid = jax.nn.gelu(hid, approximate=True)
    m = jnp.dot(hid, w2_ref[:, :], preferred_element_type=jnp.float32) \
        + b2_ref[0]
    mean2 = jnp.mean(m, -1, keepdims=True)
    var2 = jnp.mean(m * m, -1, keepdims=True) - mean2 * mean2
    mn = (m - mean2) * jax.lax.rsqrt(var2 + eps)
    mn = mn * ln2w_ref[0] + ln2b_ref[0]
    y = x2 + dp_ref[0, 0, 1] * mn
    y_ref[0] = y.reshape(wsh, wsw, c).astype(y_ref.dtype)


def _ref_impl(x, bias, scale, wq, bq, wk, wv, bv, wp, bp,
              ln1w, ln1b, w1, b1, w2, b2, ln2w, ln2b, dp,
              num_heads: int, window: int, eps: float):
    """jnp twin of the kernel on the full (B, H, W, C) tensor — the VJP
    recompute path and the CPU correctness oracle. Same math, same
    operand packing as `fused_swin_block`."""
    b, hh, ww, c = x.shape
    ws = window
    n = ws * ws
    nwh, nww = hh // ws, ww // ws
    nw = bias.shape[0]

    xw = x.reshape(b, nwh, ws, nww, ws, c).transpose(0, 1, 3, 2, 4, 5)
    xt = xw.reshape(b, nwh * nww, n, c).astype(jnp.float32)

    q = jnp.einsum("bwnc,hcd->bwhnd", xt, wq) + bq[None, :, None, :]
    k = jnp.einsum("bwnc,hcd->bwhnd", xt, wk)
    v = jnp.einsum("bwnc,hcd->bwhnd", xt, wv) + bv[None, :, None, :]
    qn = q / (jnp.sqrt(jnp.sum(q * q, -1, keepdims=True)) + 1e-6)
    kn = k / (jnp.sqrt(jnp.sum(k * k, -1, keepdims=True)) + 1e-6)
    logits = jnp.einsum("bwhnd,bwhmd->bwhnm", qn, kn)
    logits = logits * scale[None, None, :, None, None]
    # bias rows: per-window when nw > 1 (shift mask), shared otherwise
    bias_b = bias[None] if nw > 1 else bias[None, 0][:, None]
    logits = logits + bias_b.astype(jnp.float32)
    p = jax.nn.softmax(logits, axis=-1)
    o = jnp.einsum("bwhnm,bwhmd->bwhnd", p, v)
    attn = jnp.einsum("bwhnd,hdc->bwnc", o, wp) + bp

    def cond_ln(t, w_aff, b_aff):
        mean = jnp.mean(t, -1, keepdims=True)
        var = jnp.mean(t * t, -1, keepdims=True) - mean * mean
        tn = (t - mean) * jax.lax.rsqrt(var + eps)
        return tn * w_aff[:, None, None] + b_aff[:, None, None]

    x2 = xt + dp[:, 0, None, None, None] * cond_ln(attn, ln1w, ln1b)
    hid = jax.nn.gelu(jnp.einsum("bwnc,cf->bwnf", x2, w1) + b1,
                      approximate=True)
    m = jnp.einsum("bwnf,fc->bwnc", hid, w2) + b2
    y = x2 + dp[:, 1, None, None, None] * cond_ln(m, ln2w, ln2b)

    y = y.reshape(b, nwh, nww, ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(b, hh, ww, c).astype(x.dtype)


def _ref_on_args(args, num_heads, window, eps):
    """Adapt the flat packed-operand tuple to `_ref_impl`'s unpacked biases
    (bq/bv enter the kernel as (h, 1, hd) and bp/b1/b2 as (1, ·))."""
    (x, bias, scale, wq, bq, wk, wv, bv, wp, bp,
     ln1w, ln1b, w1, b1, w2, b2, ln2w, ln2b, dp) = args
    return _ref_impl(x, bias, scale, wq, bq[:, 0], wk, wv, bv[:, 0], wp,
                     bp[0], ln1w, ln1b, w1, b1[0], w2, b2[0], ln2w, ln2b,
                     dp, num_heads, window, eps)


def _fused_call(x, bias, scale, wq, bq, wk, wv, bv, wp, bp,
                ln1w, ln1b, w1, b1, w2, b2, ln2w, ln2b, dp,
                num_heads: int, window: int, eps: float, interpret: bool):
    b, hh, ww, c = x.shape
    ws = window
    n = ws * ws
    nwh, nww = hh // ws, ww // ws
    nw = bias.shape[0]

    def w_idx(bi, i, j):
        return (i * nww + j if nw > 1 else 0, 0, 0, 0)

    full = lambda a: pl.BlockSpec(
        a.shape, lambda bi, i, j: (0,) * a.ndim, memory_space=pltpu.VMEM)
    per_b = lambda a, space=pltpu.VMEM: pl.BlockSpec(
        (1,) + a.shape[1:], lambda bi, i, j: (bi,) + (0,) * (a.ndim - 1),
        memory_space=space)
    # CondLN affines enter as (B, 1, C): a (1, C) block of a (B, C) array
    # is Mosaic-illegal (last-two-dims rule: 1 is neither 8-divisible nor
    # equal to B), while (1, 1, C) of (B, 1, C) is legal — the kernel's
    # `ref[0]` then yields (1, C), which broadcasts identically
    ln1w, ln1b, ln2w, ln2b = (a[:, None, :] for a in (ln1w, ln1b,
                                                      ln2w, ln2b))
    dp = dp[:, None, :]  # (B, 1, 2): same rule applies in SMEM

    kernel = functools.partial(_fwd_kernel, num_heads, eps)
    return pl.pallas_call(
        kernel,
        grid=(b, nwh, nww),
        in_specs=[
            pl.BlockSpec((1, ws, ws, c), lambda bi, i, j: (bi, i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, num_heads, n, n), w_idx,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scale (h,)
            full(wq), full(bq), full(wk), full(wv), full(bv),
            full(wp), full(bp),
            per_b(ln1w), per_b(ln1b),
            full(w1), full(b1), full(w2), full(b2),
            per_b(ln2w), per_b(ln2b),
            per_b(dp, pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, ws, ws, c), lambda bi, i, j: (bi, i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x, bias, scale, wq, bq, wk, wv, bv, wp, bp,
      ln1w, ln1b, w1, b1, w2, b2, ln2w, ln2b, dp)


@functools.partial(jax.custom_vjp, nondiff_argnums=(19, 20, 21))
def fused_swin_block(x, bias, scale, wq, bq, wk, wv, bv, wp, bp,
                     ln1w, ln1b, w1, b1, w2, b2, ln2w, ln2b, dp,
                     num_heads: int, window: int, eps: float):
    """One fused Swin-V2 post-norm block on a (B, H, W, C) token grid.

    x        : (B, H, W, C) — ALREADY cyclically shifted when the layer
               shifts (the roll is a cheap layout op outside the kernel)
    bias     : (nw, h, n, n) additive attention logits (16σ(CPB) + shift
               mask); nw = windows per image, or 1 when shared
    scale    : (h,) exp-clamped per-head logit scale
    wq/wk/wv : (h, C, hd) per-head column packs; bq/bv: (h, 1, hd)
    wp       : (h, hd, C) per-head row pack of proj; bp: (1, C)
    w1/b1/w2/b2 : MLP (C, 4C)/(1, 4C)/(4C, C)/(1, C)
    ln1w/ln1b/ln2w/ln2b : (B, C) per-sample CondLN affines
    dp       : (B, 2) drop-path keep multipliers (1, or mask/keep) for the
               two residual adds
    """
    interpret = jax.default_backend() != "tpu"
    return _fused_call(x, bias, scale, wq, bq, wk, wv, bv, wp, bp,
                       ln1w, ln1b, w1, b1, w2, b2, ln2w, ln2b, dp,
                       num_heads, window, eps, interpret)


def _fwd(x, bias, scale, wq, bq, wk, wv, bv, wp, bp,
         ln1w, ln1b, w1, b1, w2, b2, ln2w, ln2b, dp,
         num_heads, window, eps):
    y = fused_swin_block(x, bias, scale, wq, bq, wk, wv, bv, wp, bp,
                         ln1w, ln1b, w1, b1, w2, b2, ln2w, ln2b, dp,
                         num_heads, window, eps)
    res = (x, bias, scale, wq, bq, wk, wv, bv, wp, bp,
           ln1w, ln1b, w1, b1, w2, b2, ln2w, ln2b, dp)
    return y, res


# ---------------------------------------------------------------------------
# fused backward: one kernel recomputes the block per (window, sample) and
# emits every gradient. Grid order (wh, ww, b) — b fastest — so the dbias
# accumulator block (indexed by window) is revisited CONSECUTIVELY across b,
# and the weight-grad accumulators (pinned to block 0 for every program) are
# never flushed; per-(window, sample) LN-affine/drop-path grads are written
# once each and reduced over windows outside (tiny: nw·B·C floats).
# Stages whose operands would overflow VMEM alongside their grad
# accumulators use the recompute-via-jnp VJP instead (MAX_FUSED_BWD_DIM).
# ---------------------------------------------------------------------------

MAX_FUSED_BWD_DIM = 192


def _ln_fwd(t, eps):
    mean = jnp.mean(t, -1, keepdims=True)
    var = jnp.mean(t * t, -1, keepdims=True) - mean * mean
    r = jax.lax.rsqrt(var + eps)
    return (t - mean) * r, r


def _ln_bwd(dxhat, xhat, r):
    """Standard LayerNorm backward (per row, unit affine)."""
    m1 = jnp.mean(dxhat, -1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, -1, keepdims=True)
    return r * (dxhat - m1 - xhat * m2)


def _gelu_tanh_grad(h):
    """d/dh gelu(h) for the tanh approximation (flax default)."""
    c = 0.7978845608028654  # sqrt(2/pi)
    inner = c * (h + 0.044715 * h ** 3)
    t = jnp.tanh(inner)
    dinner = c * (1.0 + 3 * 0.044715 * h * h)
    return 0.5 * (1.0 + t) + 0.5 * h * (1.0 - t * t) * dinner


def _bwd_kernel(num_heads, eps, nw, x_ref, g_ref, bias_ref, scale_ref,
                wq_ref, bq_ref, wk_ref, wv_ref, bv_ref, wp_ref, bp_ref,
                ln1w_ref, ln1b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                ln2w_ref, ln2b_ref, dp_ref,
                dx_ref, dbias_ref, dsc_ref, dwq_ref, dbq_ref, dwk_ref,
                dwv_ref, dbv_ref, dwp_ref, dbp_ref, dw1_ref, db1_ref,
                dw2_ref, db2_ref, dln_ref, ddp_ref):
    _, wsh, wsw, c = x_ref.shape
    n = wsh * wsw
    b_id = pl.program_id(2)
    first_prog = ((pl.program_id(0) == 0) & (pl.program_id(1) == 0)
                  & (b_id == 0))

    xt = x_ref[0].reshape(n, c).astype(jnp.float32)
    dy = g_ref[0].reshape(n, c).astype(jnp.float32)
    ln1w = ln1w_ref[0]
    ln2w = ln2w_ref[0]
    d1 = dp_ref[0, 0, 0]
    d2 = dp_ref[0, 0, 1]

    # ---- recompute forward through the attention + first residual --------
    heads = []
    acc = jnp.zeros((n, c), jnp.float32)
    for i in range(num_heads):
        q = jnp.dot(xt, wq_ref[i], preferred_element_type=jnp.float32) \
            + bq_ref[i]
        k = jnp.dot(xt, wk_ref[i], preferred_element_type=jnp.float32)
        v = jnp.dot(xt, wv_ref[i], preferred_element_type=jnp.float32) \
            + bv_ref[i]
        qnorm = jnp.sqrt(jnp.sum(q * q, -1, keepdims=True))
        knorm = jnp.sqrt(jnp.sum(k * k, -1, keepdims=True))
        qn = q / (qnorm + 1e-6)
        kn = k / (knorm + 1e-6)
        s_pre = jax.lax.dot_general(qn, kn, _CONTRACT_LAST,
                                    preferred_element_type=jnp.float32)
        s = s_pre * scale_ref[i] + bias_ref[0, i].astype(jnp.float32)
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.dot(p, v, preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(o, wp_ref[i], preferred_element_type=jnp.float32)
        heads.append((q, k, v, qnorm, knorm, qn, kn, s_pre, p, o))
    attn = acc + bp_ref[0]
    ahat, r1 = _ln_fwd(attn, eps)
    a_aff = ahat * ln1w + ln1b_ref[0]
    x2 = xt + d1 * a_aff
    h = jnp.dot(x2, w1_ref[:, :], preferred_element_type=jnp.float32) \
        + b1_ref[0]
    gl = jax.nn.gelu(h, approximate=True)
    m = jnp.dot(gl, w2_ref[:, :], preferred_element_type=jnp.float32) \
        + b2_ref[0]
    mhat, r2 = _ln_fwd(m, eps)
    m_aff = mhat * ln2w + ln2b_ref[0]

    # ---- backward --------------------------------------------------------
    _CF = (((0,), (0,)), ((), ()))  # a.T @ b
    _CL = _CONTRACT_LAST            # a @ b.T
    dx2 = dy
    dmm = d2 * dy
    dln2w = jnp.sum(dmm * mhat, axis=0, keepdims=True)   # (1, c)
    dln2b = jnp.sum(dmm, axis=0, keepdims=True)
    dd2 = jnp.sum(dy * m_aff)
    dm = _ln_bwd(dmm * ln2w, mhat, r2)
    dgl = jax.lax.dot_general(dm, w2_ref[:, :], _CL,
                              preferred_element_type=jnp.float32)
    dw2 = jax.lax.dot_general(gl, dm, _CF,
                              preferred_element_type=jnp.float32)
    db2 = jnp.sum(dm, axis=0, keepdims=True)
    dh = dgl * _gelu_tanh_grad(h)
    dx2 = dx2 + jax.lax.dot_general(dh, w1_ref[:, :], _CL,
                                    preferred_element_type=jnp.float32)
    dw1 = jax.lax.dot_general(x2, dh, _CF,
                              preferred_element_type=jnp.float32)
    db1 = jnp.sum(dh, axis=0, keepdims=True)

    dxt = dx2
    da = d1 * dx2
    dd1 = jnp.sum(dx2 * a_aff)
    dln1w = jnp.sum(da * ahat, axis=0, keepdims=True)
    dln1b = jnp.sum(da, axis=0, keepdims=True)
    dattn = _ln_bwd(da * ln1w, ahat, r1)
    dbp = jnp.sum(dattn, axis=0, keepdims=True)

    @pl.when(first_prog)
    def _init_weight_accs():
        dsc_ref[:] = jnp.zeros_like(dsc_ref)
        dwq_ref[:] = jnp.zeros_like(dwq_ref)
        dbq_ref[:] = jnp.zeros_like(dbq_ref)
        dwk_ref[:] = jnp.zeros_like(dwk_ref)
        dwv_ref[:] = jnp.zeros_like(dwv_ref)
        dbv_ref[:] = jnp.zeros_like(dbv_ref)
        dwp_ref[:] = jnp.zeros_like(dwp_ref)
        dbp_ref[:] = jnp.zeros_like(dbp_ref)
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)

    # nw > 1: each window owns a bias block, re-zeroed at its first sample;
    # nw == 1: ALL windows share block 0 — zero it only once, at the very
    # first program, or later windows would wipe earlier accumulation
    @pl.when(b_id == 0 if nw > 1 else first_prog)
    def _init_bias_acc():
        dbias_ref[:] = jnp.zeros_like(dbias_ref)

    dw1_ref[:, :] += dw1
    db1_ref[:, :] += db1
    dw2_ref[:, :] += dw2
    db2_ref[:, :] += db2
    dbp_ref[:, :] += dbp

    dsc_parts = []
    for i in range(num_heads):
        q, k, v, qnorm, knorm, qn, kn, s_pre, p, o = heads[i]
        do = jax.lax.dot_general(dattn, wp_ref[i], _CL,
                                 preferred_element_type=jnp.float32)
        dwp_ref[i] += jax.lax.dot_general(o, dattn, _CF,
                                          preferred_element_type=jnp.float32)
        dpm = jax.lax.dot_general(do, v, _CL,
                                  preferred_element_type=jnp.float32)
        dv = jax.lax.dot_general(p, do, _CF,
                                 preferred_element_type=jnp.float32)
        ds = p * (dpm - jnp.sum(p * dpm, -1, keepdims=True))
        dbias_ref[0, i] += ds
        # scalar VMEM stores are Mosaic-illegal — collect the per-head
        # logit-scale gradients and store them as one (1, h) row below
        dsc_parts.append(jnp.sum(ds * s_pre))
        dqn = jnp.dot(ds, kn, preferred_element_type=jnp.float32) \
            * scale_ref[i]
        dkn = jax.lax.dot_general(ds, qn, _CF,
                                  preferred_element_type=jnp.float32) \
            * scale_ref[i]
        # cosine-normalization backward: y = q/(|q|+e) →
        # dq = dy/(|q|+e) − q·(y·dy)/(|q|·(|q|+e)²)
        qdot = jnp.sum(dqn * q, -1, keepdims=True)
        dq = dqn / (qnorm + 1e-6) \
            - q * (qdot / (jnp.maximum(qnorm, 1e-30) * (qnorm + 1e-6) ** 2))
        kdot = jnp.sum(dkn * k, -1, keepdims=True)
        dk = dkn / (knorm + 1e-6) \
            - k * (kdot / (jnp.maximum(knorm, 1e-30) * (knorm + 1e-6) ** 2))
        dxt = dxt + jax.lax.dot_general(dq, wq_ref[i], _CL,
                                        preferred_element_type=jnp.float32)
        dxt = dxt + jax.lax.dot_general(dk, wk_ref[i], _CL,
                                        preferred_element_type=jnp.float32)
        dxt = dxt + jax.lax.dot_general(dv, wv_ref[i], _CL,
                                        preferred_element_type=jnp.float32)
        dwq_ref[i] += jax.lax.dot_general(xt, dq, _CF,
                                          preferred_element_type=jnp.float32)
        dbq_ref[i] += jnp.sum(dq, axis=0, keepdims=True)
        dwk_ref[i] += jax.lax.dot_general(xt, dk, _CF,
                                          preferred_element_type=jnp.float32)
        dwv_ref[i] += jax.lax.dot_general(xt, dv, _CF,
                                          preferred_element_type=jnp.float32)
        dbv_ref[i] += jnp.sum(dv, axis=0, keepdims=True)

    dsc_ref[:, :] += jnp.stack(dsc_parts)[None, :]
    dx_ref[0] = dxt.reshape(wsh, wsw, c).astype(dx_ref.dtype)
    dln_ref[0, 0] = jnp.concatenate(
        [dln1w, dln1b, dln2w, dln2b], axis=0)     # (4, c)
    ddp_ref[0, 0] = jnp.stack([dd1, dd2])[None, :]


def _fused_bwd_call(res, g, num_heads, window, eps, interpret):
    (x, bias, scale, wq, bq, wk, wv, bv, wp, bp,
     ln1w, ln1b, w1, b1, w2, b2, ln2w, ln2b, dp) = res
    b, hh, ww, c = x.shape
    ws = window
    n = ws * ws
    nwh, nww = hh // ws, ww // ws
    nw = bias.shape[0]
    hd = c // num_heads
    hidden = w1.shape[1]

    def w_idx(i, j, bi):
        return (i * nww + j if nw > 1 else 0, 0, 0, 0)

    full = lambda a: pl.BlockSpec(
        a.shape, lambda i, j, bi: (0,) * a.ndim, memory_space=pltpu.VMEM)
    per_b = lambda a, space=pltpu.VMEM: pl.BlockSpec(
        (1,) + a.shape[1:], lambda i, j, bi: (bi,) + (0,) * (a.ndim - 1),
        memory_space=space)
    acc = lambda shape: pl.BlockSpec(
        shape, lambda i, j, bi: (0,) * len(shape), memory_space=pltpu.VMEM)
    # (B, 1, C) CondLN affines — same Mosaic last-two-dims fix as the
    # forward call (see `_fused_call`)
    ln1w, ln1b, ln2w, ln2b = (a[:, None, :] for a in (ln1w, ln1b,
                                                      ln2w, ln2b))
    dp = dp[:, None, :]  # (B, 1, 2): same rule applies in SMEM

    f32 = jnp.float32
    out_shapes = [
        jax.ShapeDtypeStruct(x.shape, x.dtype),            # dx
        jax.ShapeDtypeStruct(bias.shape, f32),             # dbias (acc b)
        jax.ShapeDtypeStruct((1, num_heads), f32),         # dscale
        jax.ShapeDtypeStruct(wq.shape, f32),               # dwq
        jax.ShapeDtypeStruct(bq.shape, f32),               # dbq
        jax.ShapeDtypeStruct(wk.shape, f32),               # dwk
        jax.ShapeDtypeStruct(wv.shape, f32),               # dwv
        jax.ShapeDtypeStruct(bv.shape, f32),               # dbv
        jax.ShapeDtypeStruct(wp.shape, f32),               # dwp
        jax.ShapeDtypeStruct(bp.shape, f32),               # dbp
        jax.ShapeDtypeStruct(w1.shape, f32),               # dw1
        jax.ShapeDtypeStruct(b1.shape, f32),               # db1
        jax.ShapeDtypeStruct(w2.shape, f32),               # dw2
        jax.ShapeDtypeStruct(b2.shape, f32),               # db2
        jax.ShapeDtypeStruct((nwh * nww, b, 4, c), f32),   # dln per (w, b)
        jax.ShapeDtypeStruct((nwh * nww, b, 1, 2), f32),   # ddp per (w, b)
    ]
    out_specs = [
        pl.BlockSpec((1, ws, ws, c), lambda i, j, bi: (bi, i, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, num_heads, n, n), w_idx, memory_space=pltpu.VMEM),
        acc((1, num_heads)),
        acc(wq.shape), acc(bq.shape), acc(wk.shape), acc(wv.shape),
        acc(bv.shape), acc(wp.shape), acc(bp.shape),
        acc(w1.shape), acc(b1.shape), acc(w2.shape), acc(b2.shape),
        pl.BlockSpec((1, 1, 4, c), lambda i, j, bi: (i * nww + j, bi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, 2), lambda i, j, bi: (i * nww + j, bi, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    kernel = functools.partial(_bwd_kernel, num_heads, eps, nw)
    # the backward's recompute working set (per-head attention tensors +
    # MLP intermediates + the weight-gradient accumulator blocks) measures
    # ~26 MB at C=192/window-16 — over the 16 MB scoped-vmem compiler
    # default but far under the v5e's 128 MB physical VMEM (same situation
    # as `spectral_ns_pallas.py`), so raise the cap for this kernel
    compiler_params = (None if interpret else pltpu.CompilerParams(
        vmem_limit_bytes=48 * 1024 * 1024))
    outs = pl.pallas_call(
        kernel,
        grid=(nwh, nww, b),
        in_specs=[
            pl.BlockSpec((1, ws, ws, c), lambda i, j, bi: (bi, i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ws, ws, c), lambda i, j, bi: (bi, i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, num_heads, n, n), w_idx,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scale (h,)
            full(wq), full(bq), full(wk), full(wv), full(bv),
            full(wp), full(bp),
            per_b(ln1w), per_b(ln1b),
            full(w1), full(b1), full(w2), full(b2),
            per_b(ln2w), per_b(ln2b),
            per_b(dp, pltpu.SMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
        **({} if compiler_params is None
           else {"compiler_params": compiler_params}),
    )(x, g, bias, scale, wq, bq, wk, wv, bv, wp, bp,
      ln1w, ln1b, w1, b1, w2, b2, ln2w, ln2b, dp)

    (dx, dbias, dsc, dwq, dbq, dwk, dwv, dbv, dwp, dbp,
     dw1, db1, dw2, db2, dln, ddp) = outs
    dln_sum = jnp.sum(dln, axis=0)                 # (b, 4, c)
    ddp_sum = jnp.sum(ddp, axis=0)[:, 0]           # (b, 2)
    return (dx, dbias.astype(bias.dtype), dsc[0],
            dwq, dbq, dwk, dwv, dbv, dwp, dbp, dln_sum[:, 0], dln_sum[:, 1],
            dw1, db1, dw2, db2, dln_sum[:, 2], dln_sum[:, 3], ddp_sum)


def _bwd(num_heads, window, eps, res, g):
    c = res[0].shape[-1]
    if c <= MAX_FUSED_BWD_DIM:
        interpret = jax.default_backend() != "tpu"
        grads = _fused_bwd_call(res, g, num_heads, window, eps, interpret)
    else:
        # larger stages: recompute-based gradients of the same block function
        _, vjp = jax.vjp(lambda *a: _ref_on_args(a, num_heads, window, eps),
                         *res)
        grads = vjp(g)
    # cotangent dtypes must match the primals' (the kernel accumulates in
    # f32; under compute_dtype=bfloat16 the primals are bf16 and upstream
    # transpose rules reject mixed-dtype muls)
    return tuple(gi.astype(a.dtype) for gi, a in zip(grads, res))


fused_swin_block.defvjp(_fwd, _bwd)
