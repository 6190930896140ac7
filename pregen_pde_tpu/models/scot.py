"""scOT / Poseidon — Swin-V2 U-shaped operator transformer (flax.linen, NHWC).

Architecture mirrors the reference `ScOT` (`Poseidon_mixing_Exp/scOT/model.py`,
1460 lines on top of HF `transformers` Swin-V2 internals), re-implemented
transformers-free:

- conv patchify (`ScOTPatchEmbeddings :219-283`) + norm (+optional abs-pos);
- encoder of Swin-V2 stages with `ScOTPatchMerging` downsample (`:600-662`),
  skips collected before each downsample;
- per-scale skip paths through ConvNeXt residual blocks (`:133-187`,
  wiring `:1216-1230,1338-1343`);
- decoder of Swin-V2 stages with `ScOTPatchUnmerging` pixel-shuffle upsample
  (`:665-710`) and ADDITIVE skip connections (`:1125-1127`);
- `ScOTPatchRecovery`: ConvTranspose + bias-free 5×5 mixup conv (Pangu-style,
  `:534-597`);
- lead-time conditioning: every LayerNorm replaced by `ConditionalLayerNorm`
  whose scale/bias are Linear(1→dim) of time (`:113-130`);
- Swin-V2 attention: cosine similarity with per-head learnable logit scale and
  a continuous log-spaced relative-position-bias MLP (the HF `Swinv2Attention`
  the reference imports at `model.py:5-17`);
- optional `learn_residual` (prediction += input physical channels) and
  FFT-based resolution transfer (`_downsample/_upsample :1243-1266` — exposed
  here as `fft_resize`);
- stochastic depth at every Swin residual (default rate 0.1, per-layer
  linspace split encoder/decoder exactly as `:926-947,1061-1082`; see
  `scot_drop_path_rates`), dropout hooks (`hidden_dropout_prob`,
  `attention_probs_dropout_prob`), both active only under ``train=True``;
- `use_mask_token` + `bool_masked_pos` masked-embedding path (`:286-340`);
- `pixel_mask` forcing applied to the PREDICTION inside forward (`:1372-1374`)
  so forced channels propagate through AR feedback;
- `residual_model="resnet"` skip-block alternative (`:190-216`).

TPU-first notes: tokens stay in NHWC image layout (window partition is a pure
reshape, lane dim = channels); attention einsums hit the MXU; shapes are fully
static per stage — window/shift sizes resolve at trace time.

Init deviation (documented): the reference's ConditionalLayerNorm uses default
torch Linear init for the time→scale/bias maps, so its LN starts randomly
scaled; we zero-init the kernels (scale bias=1, bias bias=0) so conditioning
starts as a standard LayerNorm — strictly more stable, same capacity.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from pregen_pde_tpu.ops.cpb_bias import relative_position_bias

# reference init: HF `Swinv2PreTrainedModel._init_weights` draws every
# Linear/Conv weight from N(0, initializer_range=0.02) with zero biases;
# matched here for training-dynamics parity (the CondLayerNorm time maps
# keep their deliberate zero-init — see the module docstring).
_REF_INIT = nn.initializers.normal(0.02)


@dataclasses.dataclass(frozen=True)
class ScOTConfig:
    """Mirrors reference `ScOTConfig` (`scOT/model.py:36-102`); model scales
    T/S/B/L = embed 48/48/96/192, depths [4]*4 or [8]*4 (`scOT/train.py:35-72`)."""

    image_size: int = 128
    patch_size: int = 4
    num_channels: int = 6
    num_out_channels: int = 3
    embed_dim: int = 48
    depths: Sequence[int] = (4, 4, 4, 4)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    skip_connections: Sequence[int] = (2, 2, 2, 0)  # residual-block depth/scale
    window_size: int = 16
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    use_conditioning: bool = True
    learn_residual: bool = False
    use_absolute_embeddings: bool = False
    layer_norm_eps: float = 1e-5
    # regularization (reference `scOT/model.py:59-61`; drop-path is the only
    # one active by default — stochastic depth rate 0.1, per-layer rates
    # linspace(0, rate, 2·sum(depths)) split encoder/decoder, `:926-947,
    # 1061-1082`). Active only when __call__ gets train=True (+ a "dropout"
    # rng).
    drop_path_rate: float = 0.1
    hidden_dropout_prob: float = 0.0
    attention_probs_dropout_prob: float = 0.0
    # MAE-style masked-embedding hook (`:286-340`): learnable mask token that
    # replaces patch embeddings where `bool_masked_pos` is set — Poseidon's
    # masked-pretraining path.
    use_mask_token: bool = False
    # skip-path residual family: "convnext" (`:133-187`) or "resnet" (`:190-216`)
    residual_model: str = "convnext"
    # per-stage pretrained window sizes (HF Swinv2 CPB convention, consumed
    # by `ScOTEncoder/Decoder` via `config.pretrained_window_sizes`): when a
    # stage's entry is > 0 the log-CPB coordinate table is normalized by
    # (pretrained_window − 1) instead of (window − 1), so a model fine-tuned
    # at a different window size keeps its pretrained relative-position
    # geometry. (0, 0, 0, 0) ≡ the reference default.
    pretrained_window_sizes: Sequence[int] = (0, 0, 0, 0)
    # attention lowering: "xla" (einsum chain) or "fused" (Pallas
    # VMEM-resident window attention, `ops/window_attention.py`); "auto" ==
    # "xla". Numerics-preserving — same matmul/softmax order. MEASURED
    # (PERF.md, scOT-B 128² bs16 on v5e): the fused kernel is SLOWER than
    # XLA's batched einsums (80.8 vs 67.8 ms/step f32, measured pre-CPB-
    # adjoint; both paths share the bias construction) — window attention
    # at these sizes is many small (n≤256, hd≤32) matmuls that XLA batches
    # onto the MXU well, and its HBM round trips pipeline; the kernel stays
    # available for explicit use (e.g. larger windows / head dims).
    attention_impl: str = "auto"
    # whole-block lowering: "fused" runs each Swin layer as ONE Pallas
    # kernel (`ops/swin_block.py`: qkv → cosine attention → proj → CondLN →
    # residual → MLP → CondLN → residual, all VMEM-resident; stages with
    # C > MAX_FUSED_DIM and layers with active dropout fall back to XLA).
    # Identical parameter tree and math; the VJP currently recomputes via
    # the jnp reference (forward-side fusion). "auto" == "xla".
    block_impl: str = "auto"


MODEL_SIZES = {
    # `scOT/train.py:35-72` MODEL_MAP
    "T": dict(embed_dim=48, depths=(4, 4, 4, 4)),
    "S": dict(embed_dim=48, depths=(8, 8, 8, 8)),
    "B": dict(embed_dim=96, depths=(8, 8, 8, 8)),
    "L": dict(embed_dim=192, depths=(8, 8, 8, 8)),
}


class CondLayerNorm(nn.Module):
    """LayerNorm whose affine params are Linear(1→dim) of the lead time
    (`ConditionalLayerNorm`, `scOT/model.py:113-130`). With
    ``use_conditioning=False`` this is a plain learnable LayerNorm."""

    dim: int
    use_conditioning: bool = True
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array, time: jax.Array | None = None) -> jax.Array:
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(x * x, axis=-1, keepdims=True) - mean**2
        xn = (x - mean) * jax.lax.rsqrt(var + self.eps)
        if not self.use_conditioning or time is None:
            scale = self.param("scale", nn.initializers.ones, (self.dim,))
            bias = self.param("bias", nn.initializers.zeros, (self.dim,))
            return xn * scale + bias
        t = time.reshape(-1, 1).astype(x.dtype)
        zeros = nn.initializers.zeros
        w = nn.Dense(self.dim, kernel_init=zeros,
                     bias_init=nn.initializers.ones, name="time_scale")(t)
        b = nn.Dense(self.dim, kernel_init=zeros, bias_init=zeros,
                     name="time_bias")(t)
        # broadcast (B, dim) over any number of middle axes
        shape = (x.shape[0],) + (1,) * (x.ndim - 2) + (self.dim,)
        return xn * w.reshape(shape) + b.reshape(shape)


class DropPath(nn.Module):
    """Per-sample stochastic depth (`Swinv2DropPath`; reference applies it at
    every Swin residual add, `scOT/model.py:518-523`). Identity when
    deterministic or rate == 0."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / jnp.asarray(keep, x.dtype), jnp.zeros_like(x))


class WindowAttentionV2(nn.Module):
    """Swin-V2 window attention: cosine similarity × clamped learnable per-head
    logit scale, continuous relative-position bias from a log-CPB MLP."""

    dim: int
    num_heads: int
    window_size: int
    qkv_bias: bool = True
    attn_dropout: float = 0.0
    proj_dropout: float = 0.0
    pretrained_window_size: int = 0
    impl: str = "auto"  # "auto" | "xla" | "fused" (see ScOTConfig)

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array | None = None,
                 deterministic: bool = True) -> jax.Array:
        # x: (num_windows*B, N, C) with N = window²
        nb, n, c = x.shape
        h = self.num_heads
        hd = c // h
        ws = self.window_size

        q = nn.Dense(c, use_bias=self.qkv_bias, kernel_init=_REF_INIT, name="query")(x)
        k = nn.Dense(c, use_bias=False, kernel_init=_REF_INIT, name="key")(x)
        v = nn.Dense(c, use_bias=self.qkv_bias, kernel_init=_REF_INIT, name="value")(x)

        # NOTE: the fill value must be strong-typed — a python-float fill
        # makes the param weak_type, and a weak param re-traces the whole
        # train step twice (param then optimizer state flip to strong after
        # one update), costing two full recompiles through the TPU tunnel.
        logit_scale = self.param(
            "logit_scale",
            lambda key, shape: jnp.full(shape, jnp.float32(np.log(10.0))),
            (h, 1, 1),
        )
        scale = jnp.exp(jnp.minimum(logit_scale, float(np.log(100.0))))

        # continuous relative position bias (log-spaced coords → MLP → 16σ);
        # normalized by (pretrained_window − 1) when fine-tuning from a model
        # pretrained at another window size (HF Swinv2 CPB convention)
        coords = np.arange(-(ws - 1), ws, dtype=np.float32)
        table = np.stack(np.meshgrid(coords, coords, indexing="ij"), -1)  # (2w-1,2w-1,2)
        norm_w = (self.pretrained_window_size - 1
                  if self.pretrained_window_size > 0 else max(ws - 1, 1))
        table = table / norm_w * 8.0
        table = np.sign(table) * np.log2(np.abs(table) + 1.0) / np.log2(8.0)
        table = jnp.asarray(table.reshape(-1, 2))
        cpb = nn.Dense(512, kernel_init=_REF_INIT, name="cpb_mlp1")(table)
        cpb = nn.relu(cpb)
        cpb = nn.Dense(h, use_bias=False, kernel_init=_REF_INIT, name="cpb_mlp2")(cpb)  # ((2w-1)², h)

        # table -> (h, n, n) expansion: gather forward + Toeplitz-einsum
        # adjoint (the autodiff scatter-add of n² duplicate indices is a
        # serialized TPU slow path — ops/cpb_bias.py)
        bias = relative_position_bias(cpb, ws).reshape(n, n, h).transpose(2, 0, 1)
        bias16 = 16.0 * jax.nn.sigmoid(bias)  # (h, n, n)

        dropout_active = self.attn_dropout > 0.0 and not deterministic
        # "auto" == xla: measured slower fused at reference scales (see
        # ScOTConfig.attention_impl). Explicit "fused" only works
        # single-device or under shard_map (a pallas_call inside a jit over
        # a sharded batch can't be auto-partitioned by XLA SPMD).
        use_fused = self.impl == "fused" and not dropout_active
        if use_fused:
            from pregen_pde_tpu.ops.window_attention import window_attention

            # normalize per head and fold the per-head logit scale into q,
            # so the kernel computes plain q·kᵀ + bias; layout (nb, h, n, hd)
            # (the kernel's per-head block tiling rule — see its docstring)
            qh = q.reshape(nb, n, h, hd).transpose(0, 2, 1, 3)
            kh = k.reshape(nb, n, h, hd).transpose(0, 2, 1, 3)
            vh = v.reshape(nb, n, h, hd).transpose(0, 2, 1, 3)
            qh = qh / (jnp.linalg.norm(qh, axis=-1, keepdims=True) + 1e-6)
            kh = kh / (jnp.linalg.norm(kh, axis=-1, keepdims=True) + 1e-6)
            qh = qh * scale.reshape(1, h, 1, 1).astype(qh.dtype)
            total_bias = (bias16[None] if mask is None
                          else bias16[None] + mask[:, None])  # (nw, h, n, n)
            out = window_attention(qh, kh, vh, total_bias)
            out = out.transpose(0, 2, 1, 3).reshape(nb, n, c)
        else:
            q = q.reshape(nb, n, h, hd).transpose(0, 2, 1, 3)
            k = k.reshape(nb, n, h, hd).transpose(0, 2, 1, 3)
            v = v.reshape(nb, n, h, hd).transpose(0, 2, 1, 3)

            # cosine attention
            q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-6)
            k = k / (jnp.linalg.norm(k, axis=-1, keepdims=True) + 1e-6)
            attn = jnp.einsum("bhnd,bhmd->bhnm", q, k)
            attn = attn * scale
            attn = attn + bias16[None]

            if mask is not None:
                nw = mask.shape[0]
                attn = attn.reshape(nb // nw, nw, h, n, n) + mask[None, :, None]
                attn = attn.reshape(nb, h, n, n)
            attn = jax.nn.softmax(attn, axis=-1)
            attn = nn.Dropout(self.attn_dropout, deterministic=deterministic)(attn)
            out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
            out = out.transpose(0, 2, 1, 3).reshape(nb, n, c)
        out = nn.Dense(c, kernel_init=_REF_INIT, name="proj")(out)
        return nn.Dropout(self.proj_dropout, deterministic=deterministic)(out)


def _window_partition(x: jax.Array, ws: int) -> jax.Array:
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def _window_reverse(wins: jax.Array, ws: int, h: int, w: int) -> jax.Array:
    b = wins.shape[0] // ((h // ws) * (w // ws))
    x = wins.reshape(b, h // ws, w // ws, ws, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


def _shift_attn_mask(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """Additive (-100/0) mask for shifted windows (`scOT/model.py:411-439`)."""
    img = np.zeros((h, w), np.float32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wss in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[hs, wss] = cnt
            cnt += 1
    m = img.reshape(h // ws, ws, w // ws, ws).transpose(0, 2, 1, 3).reshape(-1, ws * ws)
    diff = m[:, None, :] - m[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class _DenseParams(nn.Module):
    """Declares exactly the parameters `nn.Dense` would (same names, shapes,
    inits) and returns them raw — the fused-block path's way of sharing one
    checkpoint tree with the XLA path without running the XLA matmuls."""

    in_features: int
    features: int
    use_bias: bool = True
    kernel_init: nn.initializers.Initializer = _REF_INIT
    bias_init: nn.initializers.Initializer = nn.initializers.zeros

    @nn.compact
    def __call__(self):
        # explicit f32 == nn.Dense's param_dtype default (without it,
        # jax_enable_x64 test mode would init f64 values that diverge from
        # the XLA path's tree)
        k = self.param("kernel", self.kernel_init,
                       (self.in_features, self.features), jnp.float32)
        b = (self.param("bias", self.bias_init, (self.features,),
                        jnp.float32)
             if self.use_bias else None)
        return k, b


class _CondAffine(nn.Module):
    """`CondLayerNorm`'s parameters + per-sample affine vectors, without the
    normalization (the fused kernel normalizes in VMEM). Same tree as
    `CondLayerNorm` under the same name."""

    dim: int
    use_conditioning: bool = True

    @nn.compact
    def __call__(self, time, batch: int):
        if not self.use_conditioning or time is None:
            scale = self.param("scale", nn.initializers.ones, (self.dim,))
            bias = self.param("bias", nn.initializers.zeros, (self.dim,))
            shape = (batch, self.dim)
            return jnp.broadcast_to(scale, shape), jnp.broadcast_to(bias, shape)
        t = time.reshape(-1, 1).astype(jnp.float32)
        zeros = nn.initializers.zeros
        w = nn.Dense(self.dim, kernel_init=zeros,
                     bias_init=nn.initializers.ones, name="time_scale")(t)
        b = nn.Dense(self.dim, kernel_init=zeros, bias_init=zeros,
                     name="time_bias")(t)
        return w, b


class _WindowAttentionParams(nn.Module):
    """`WindowAttentionV2`'s parameter tree (same names/inits) plus the
    precomputed pieces the fused block kernel needs: per-head packed q/k/v/
    proj weights, exp-clamped logit scale, and the 16σ(CPB) bias."""

    dim: int
    num_heads: int
    window_size: int
    qkv_bias: bool = True
    pretrained_window_size: int = 0

    @nn.compact
    def __call__(self):
        c, h, ws = self.dim, self.num_heads, self.window_size
        wq, bq = _DenseParams(c, c, self.qkv_bias, name="query")()
        wk, _ = _DenseParams(c, c, False, name="key")()
        wv, bv = _DenseParams(c, c, self.qkv_bias, name="value")()
        logit_scale = self.param(
            "logit_scale",
            lambda key, shape: jnp.full(shape, jnp.float32(np.log(10.0))),
            (h, 1, 1),
        )
        coords = np.arange(-(ws - 1), ws, dtype=np.float32)
        table = np.stack(np.meshgrid(coords, coords, indexing="ij"), -1)
        norm_w = (self.pretrained_window_size - 1
                  if self.pretrained_window_size > 0 else max(ws - 1, 1))
        table = table / norm_w * 8.0
        table = np.sign(table) * np.log2(np.abs(table) + 1.0) / np.log2(8.0)
        table = jnp.asarray(table.reshape(-1, 2))
        cpb = nn.Dense(512, kernel_init=_REF_INIT, name="cpb_mlp1")(table)
        cpb = nn.relu(cpb)
        cpb = nn.Dense(h, use_bias=False, kernel_init=_REF_INIT,
                       name="cpb_mlp2")(cpb)
        n = ws * ws
        bias = relative_position_bias(cpb, ws).reshape(n, n, h).transpose(2, 0, 1)
        bias16 = 16.0 * jax.nn.sigmoid(bias)  # (h, n, n)
        wp, bp = _DenseParams(c, c, True, name="proj")()

        from pregen_pde_tpu.ops.swin_block import pack_heads

        wq_h, wk_h, wv_h, wp_h = pack_heads(wq, wk, wv, wp, h)
        hd = c // h
        zero = jnp.zeros((h, 1, hd), jnp.float32)
        bq_h = bq.reshape(h, 1, hd) if bq is not None else zero
        bv_h = bv.reshape(h, 1, hd) if bv is not None else zero
        scale = jnp.exp(jnp.minimum(logit_scale, float(np.log(100.0))))
        return dict(wq=wq_h, bq=bq_h, wk=wk_h, wv=wv_h, bv=bv_h,
                    wp=wp_h, bp=bp.reshape(1, c),
                    scale=scale.reshape(h), bias16=bias16)


class SwinLayerV2(nn.Module):
    """One Swin-V2 block in NHWC: windowed attention (+cyclic shift) with
    post-norm residuals (`ScOTLayer`, `scOT/model.py:343-531`); stochastic
    depth applied at both residual adds (`:518-523`)."""

    dim: int
    num_heads: int
    window_size: int
    shift: bool
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    use_conditioning: bool = True
    drop_path: float = 0.0
    hidden_dropout: float = 0.0
    attn_dropout: float = 0.0
    pretrained_window_size: int = 0
    attention_impl: str = "auto"
    block_impl: str = "auto"

    def _drop_path_mask(self, batch: int, deterministic: bool) -> jax.Array:
        """(B, 2) per-sample keep multipliers for the two residual adds
        (the fused kernel applies them as scalars — same stochastic-depth
        law as `DropPath`, independent draws per residual)."""
        if self.drop_path == 0.0 or deterministic:
            return jnp.ones((batch, 2), jnp.float32)
        keep = 1.0 - self.drop_path
        rng = self.make_rng("dropout")
        mask = jax.random.bernoulli(rng, keep, (batch, 2))
        return mask.astype(jnp.float32) / keep

    @nn.compact
    def __call__(self, x: jax.Array, time: jax.Array | None,
                 deterministic: bool = True) -> jax.Array:
        b, h, w, c = x.shape
        ws = min(self.window_size, h, w)
        shift = ws // 2 if (self.shift and h > ws) else 0

        from pregen_pde_tpu.ops.swin_block import (
            MAX_FUSED_DIM,
            fused_swin_block,
        )

        dropout_active = not deterministic and (
            self.hidden_dropout > 0.0 or self.attn_dropout > 0.0)
        if (self.block_impl == "fused" and c <= MAX_FUSED_DIM
                and not dropout_active):
            ap = _WindowAttentionParams(
                dim=c, num_heads=self.num_heads, window_size=ws,
                qkv_bias=self.qkv_bias,
                pretrained_window_size=self.pretrained_window_size,
                name="attention")()
            if shift > 0:
                mask = jnp.asarray(_shift_attn_mask(h, w, ws, shift))
                bias_total = ap["bias16"][None] + mask[:, None]
            else:
                bias_total = ap["bias16"][None]  # (1, h, n, n)
            ln1w, ln1b = _CondAffine(c, self.use_conditioning,
                                     name="norm1")(time, b)
            ln2w, ln2b = _CondAffine(c, self.use_conditioning,
                                     name="norm2")(time, b)
            dp = self._drop_path_mask(b, deterministic)
            hidden = int(c * self.mlp_ratio)
            w1, b1 = _DenseParams(c, hidden, name="mlp1")()
            w2, b2 = _DenseParams(hidden, c, name="mlp2")()
            xs = jnp.roll(x, (-shift, -shift), (1, 2)) if shift > 0 else x
            y = fused_swin_block(
                xs, bias_total, ap["scale"], ap["wq"], ap["bq"], ap["wk"],
                ap["wv"], ap["bv"], ap["wp"], ap["bp"], ln1w, ln1b,
                w1, b1.reshape(1, -1), w2, b2.reshape(1, -1),
                ln2w, ln2b, dp, self.num_heads, ws, 1e-5)
            return jnp.roll(y, (shift, shift), (1, 2)) if shift > 0 else y

        shortcut = x
        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(_shift_attn_mask(h, w, ws, shift))
        else:
            mask = None
        wins = _window_partition(x, ws)
        wins = WindowAttentionV2(
            dim=c, num_heads=self.num_heads, window_size=ws,
            qkv_bias=self.qkv_bias, attn_dropout=self.attn_dropout,
            proj_dropout=self.hidden_dropout,
            pretrained_window_size=self.pretrained_window_size,
            impl=self.attention_impl,
            name="attention",
        )(wins, mask, deterministic)
        x = _window_reverse(wins, ws, h, w)
        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))

        x = CondLayerNorm(c, self.use_conditioning, name="norm1")(x, time)
        x = shortcut + DropPath(self.drop_path, name="drop_path1")(
            x, deterministic
        )

        y = nn.Dense(int(c * self.mlp_ratio), kernel_init=_REF_INIT, name="mlp1")(x)
        y = nn.gelu(y)
        y = nn.Dense(c, kernel_init=_REF_INIT, name="mlp2")(y)
        y = nn.Dropout(self.hidden_dropout, deterministic=deterministic)(y)
        y = CondLayerNorm(c, self.use_conditioning, name="norm2")(y, time)
        return x + DropPath(self.drop_path, name="drop_path2")(y, deterministic)


class PatchMerging(nn.Module):
    """2×2 space-to-channel concat → Linear(4C→2C) → norm
    (`ScOTPatchMerging`, `scOT/model.py:600-662`)."""

    dim: int
    use_conditioning: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, time) -> jax.Array:
        b, h, w, c = x.shape
        x = x.reshape(b, h // 2, 2, w // 2, 2, c)
        # order: (0::2,0::2), (1::2,0::2), (0::2,1::2), (1::2,1::2)
        x = jnp.concatenate(
            [x[:, :, 0, :, 0], x[:, :, 1, :, 0], x[:, :, 0, :, 1], x[:, :, 1, :, 1]],
            axis=-1,
        )
        x = nn.Dense(2 * c, use_bias=False, kernel_init=_REF_INIT, name="reduction")(x)
        return CondLayerNorm(2 * c, self.use_conditioning, name="norm")(x, time)


class PatchUnmerging(nn.Module):
    """Linear(C→2C) → pixel-shuffle ×2 → norm → bias-free mixup Linear
    (`ScOTPatchUnmerging`, `scOT/model.py:665-710`)."""

    dim: int
    use_conditioning: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, time) -> jax.Array:
        b, h, w, c = x.shape
        x = nn.Dense(2 * c, use_bias=False, kernel_init=_REF_INIT, name="upsample")(x)
        x = x.reshape(b, h, w, 2, 2, c // 2)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, c // 2)
        x = CondLayerNorm(c // 2, self.use_conditioning, name="norm")(x, time)
        return nn.Dense(c // 2, use_bias=False, kernel_init=_REF_INIT, name="mixup")(x)


class ConvNeXtBlock(nn.Module):
    """Skip-path residual block (`scOT/model.py:133-187`): 7×7 depthwise conv
    → norm → Linear(4×) → GELU → Linear → layer-scale → +residual."""

    dim: int
    use_conditioning: bool = True
    layer_scale_init: float = 1e-6

    @nn.compact
    def __call__(self, x: jax.Array, time) -> jax.Array:  # NHWC
        inp = x
        x = nn.Conv(self.dim, (7, 7), padding="SAME", feature_group_count=self.dim,
                    kernel_init=_REF_INIT, name="dwconv")(x)
        x = CondLayerNorm(self.dim, self.use_conditioning, name="norm")(x, time)
        x = nn.Dense(4 * self.dim, kernel_init=_REF_INIT, name="pwconv1")(x)
        x = nn.gelu(x)
        x = nn.Dense(self.dim, kernel_init=_REF_INIT, name="pwconv2")(x)
        # strong-typed fill (weak params force train-step retraces; see
        # WindowAttentionV2.logit_scale)
        gamma = self.param(
            "layer_scale",
            lambda key, shape: jnp.full(shape, jnp.float32(self.layer_scale_init)),
            (self.dim,),
        )
        return inp + gamma * x


class ResNetBlock(nn.Module):
    """Skip-path residual alternative (`scOT/model.py:190-216`): two 3×3
    convs with batch norm + leaky-ReLU, + residual. The reference's
    BatchNorm2d is replaced by a stateless batch-stat norm (current-batch
    statistics in train and eval; no running averages — same rationale as
    `models/cno.py`'s norm="batch" note)."""

    dim: int
    use_conditioning: bool = True  # unused (parity: reference ignores time too)

    @nn.compact
    def __call__(self, x: jax.Array, time) -> jax.Array:  # NHWC
        def bnorm(z, name):
            mu = jnp.mean(z, axis=(0, 1, 2), keepdims=True)
            var = jnp.var(z, axis=(0, 1, 2), keepdims=True)
            z = (z - mu) * jax.lax.rsqrt(var + 1e-5)
            gamma = self.param(f"{name}_scale", nn.initializers.ones,
                               (self.dim,), z.dtype)
            beta = self.param(f"{name}_bias", nn.initializers.zeros,
                              (self.dim,), z.dtype)
            return z * gamma + beta

        inp = x
        x = nn.Conv(self.dim, (3, 3), padding="SAME", kernel_init=_REF_INIT, name="conv1")(x)
        x = jax.nn.leaky_relu(bnorm(x, "bn1"), 0.01)
        x = nn.Conv(self.dim, (3, 3), padding="SAME", kernel_init=_REF_INIT, name="conv2")(x)
        x = bnorm(x, "bn2")
        return inp + x


def scot_drop_path_rates(depths: Sequence[int], rate: float):
    """Per-layer stochastic-depth rates, exactly the reference scheme
    (`scOT/model.py:926-947` encoder, `:1061-1082` decoder):
    linspace(0, rate, 2·sum(depths)); encoder takes the first half in layer
    order; the decoder takes the second half, sliced per stage as
    dpr[sum(depths[i+1:]) : sum(depths[i:])]. Within a decode stage the two
    reversals cancel: blocks are CONSTRUCTED `for i in reversed(range(depth))`
    with `drop_path[depth-1-i]` (`:841-851`), so execution-order block j gets
    stage_slice[j] — straight. Returns (enc[(stage, blk)], dec[(stage, blk)])
    rate dicts keyed by (dim-level stage i, execution-order block b)."""
    total = 2 * sum(depths)
    full = np.linspace(0.0, rate, total) if total else np.zeros(0)
    half = total // 2
    enc_flat, dec_flat = full[:half], full[half:]
    enc, dec = {}, {}
    for i, d in enumerate(depths):
        off = sum(depths[:i])
        for b in range(d):
            enc[(i, b)] = float(enc_flat[off + b])
        lo = sum(depths[i + 1 :])
        stage = dec_flat[lo : lo + d]
        for b in range(d):
            dec[(i, b)] = float(stage[b])
    return enc, dec


def fft_resize(image: jax.Array, target_size: int) -> jax.Array:
    """FFT-based up/downsampling of square NHWC images
    (reference `_downsample/_upsample`, `scOT/model.py:1243-1266`)."""
    size = image.shape[1]
    if size == target_size:
        return image
    x_hat = jnp.fft.fft2(image, axes=(1, 2), norm="forward")
    if target_size < size:
        freqs = np.fft.fftfreq(size, d=1.0 / size)
        sel = np.nonzero((freqs >= -target_size / 2) & (freqs <= target_size / 2 - 1))[0]
        x_hat = x_hat[:, sel][:, :, sel]
        return jnp.fft.ifft2(x_hat, axes=(1, 2), norm="forward").real
    pad = (target_size - size) // 2
    x_hat = jnp.fft.fftshift(x_hat, axes=(1, 2))
    x_hat = jnp.pad(x_hat, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    x_hat = jnp.fft.ifftshift(x_hat, axes=(1, 2))
    return jnp.fft.ifft2(x_hat, axes=(1, 2), norm="forward").real


class ScOT(nn.Module):
    """Input (B, S, S, num_channels) + lead time (B,) →
    (B, S, S, num_out_channels); inputs at other resolutions are FFT-resized
    to `config.image_size` and back (`scOT/model.py:1310-1316,1366-1371`).

    ``train=True`` enables drop-path/dropout (requires a "dropout" rng in
    `apply(..., rngs={"dropout": key})`). ``bool_masked_pos`` (B, grid, grid)
    replaces masked patch embeddings by the learnable mask token
    (`:286-340`; requires config.use_mask_token). ``pixel_mask`` (bool,
    broadcastable to the output) forces those output pixels to ``labels`` —
    the reference does this INSIDE forward (`:1372-1374`), so AR rollouts
    feed forced values back."""

    config: ScOTConfig

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        time: jax.Array | None = None,
        train: bool = False,
        bool_masked_pos: jax.Array | None = None,
        pixel_mask: jax.Array | None = None,
        labels: jax.Array | None = None,
    ) -> jax.Array:
        cfg = self.config
        det = not train
        in_size = x.shape[1]
        pixel_input = x
        if in_size != cfg.image_size:
            x = fft_resize(x, cfg.image_size)

        uc = cfg.use_conditioning
        L = len(cfg.depths)
        grid = cfg.image_size // cfg.patch_size
        enc_dpr, dec_dpr = scot_drop_path_rates(cfg.depths, cfg.drop_path_rate)
        res_block = {"convnext": ConvNeXtBlock, "resnet": ResNetBlock}[
            cfg.residual_model
        ]

        # patchify
        x = nn.Conv(cfg.embed_dim, (cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size),
                    kernel_init=_REF_INIT, name="patch_embed")(x)
        x = CondLayerNorm(cfg.embed_dim, uc, name="embed_norm")(x, time)
        if cfg.use_mask_token:
            mask_token = self.param(
                "mask_token", nn.initializers.zeros, (1, 1, 1, cfg.embed_dim)
            )
            if bool_masked_pos is not None:
                m = bool_masked_pos[..., None].astype(x.dtype)  # (B, g, g, 1)
                x = x * (1.0 - m) + mask_token * m
        elif bool_masked_pos is not None:
            raise ValueError("bool_masked_pos requires config.use_mask_token")
        if cfg.use_absolute_embeddings:
            pos = self.param("pos_embed", nn.initializers.zeros,
                             (1, grid, grid, cfg.embed_dim))
            x = x + pos
        # embeddings dropout (`:316,338`)
        x = nn.Dropout(cfg.hidden_dropout_prob, deterministic=det)(x)

        # encoder: collect skips BEFORE each downsample; the downsample input
        # additionally carries a stage-level residual — the reference merges
        # `hidden_states_before_downsampling + inputs` (`scOT/model.py:797-800`)
        skips = []
        for i in range(L):
            dim = cfg.embed_dim * 2**i
            stage_in = x
            for d in range(cfg.depths[i]):
                x = SwinLayerV2(
                    dim=dim, num_heads=cfg.num_heads[i],
                    window_size=cfg.window_size, shift=(d % 2 == 1),
                    mlp_ratio=cfg.mlp_ratio, qkv_bias=cfg.qkv_bias,
                    use_conditioning=uc, drop_path=enc_dpr[(i, d)],
                    hidden_dropout=cfg.hidden_dropout_prob,
                    attn_dropout=cfg.attention_probs_dropout_prob,
                    pretrained_window_size=cfg.pretrained_window_sizes[i],
                    attention_impl=cfg.attention_impl,
                    block_impl=cfg.block_impl,
                    name=f"enc_{i}_blk_{d}",
                )(x, time, det)
            skips.append(x)
            if i < L - 1:
                x = PatchMerging(dim, uc, name=f"enc_{i}_merge")(
                    x + stage_in, time
                )

        # residual skip paths (depth per scale; 0 → identity)
        for i in range(L):
            for d in range(cfg.skip_connections[i]):
                skips[i] = res_block(
                    cfg.embed_dim * 2**i, uc, name=f"skip_{i}_blk_{d}",
                )(skips[i], time)

        # decoder: deepest → shallowest, additive skips, unmerge after blocks.
        # Decode-stage blocks are CONSTRUCTED `for i in reversed(range(depth))`
        # in the reference (`scOT/model.py:841-851`), so execution-order block
        # d has shift_size from i = depth-1-d — for the even depths of every
        # reference scale the stage STARTS with a shifted block.
        x = skips[-1]
        for j, i in enumerate(reversed(range(L))):
            dim = cfg.embed_dim * 2**i
            if j != 0:
                x = x + skips[i]
            for d in range(cfg.depths[i]):
                x = SwinLayerV2(
                    dim=dim, num_heads=cfg.num_heads[i],
                    window_size=cfg.window_size,
                    shift=((cfg.depths[i] - 1 - d) % 2 == 1),
                    mlp_ratio=cfg.mlp_ratio, qkv_bias=cfg.qkv_bias,
                    use_conditioning=uc, drop_path=dec_dpr[(i, d)],
                    hidden_dropout=cfg.hidden_dropout_prob,
                    attn_dropout=cfg.attention_probs_dropout_prob,
                    pretrained_window_size=cfg.pretrained_window_sizes[i],
                    attention_impl=cfg.attention_impl,
                    block_impl=cfg.block_impl,
                    name=f"dec_{i}_blk_{d}",
                )(x, time, det)
            if i > 0:
                x = PatchUnmerging(dim, uc, name=f"dec_{i}_unmerge")(x, time)

        # patch recovery: ConvTranspose + bias-free 5×5 mixup conv
        x = nn.ConvTranspose(
            cfg.num_out_channels, (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            kernel_init=_REF_INIT, name="patch_recovery",
        )(x)
        x = nn.Conv(cfg.num_out_channels, (5, 5), padding="SAME", use_bias=False,
                    kernel_init=_REF_INIT, name="recovery_mixup")(x)

        if cfg.learn_residual:
            x = x + fft_resize(pixel_input[..., : cfg.num_out_channels],
                               cfg.image_size)
        if in_size != cfg.image_size:
            x = fft_resize(x, in_size)
        if pixel_mask is not None:
            if labels is None:
                raise ValueError("pixel_mask forcing requires labels")
            # `prediction[pixel_mask] = labels[pixel_mask]` (`:1372-1374`)
            x = jnp.where(pixel_mask, labels.astype(x.dtype), x)
        return x
