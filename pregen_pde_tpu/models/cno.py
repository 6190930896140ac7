"""CNO — Convolutional Neural Operator with anti-aliased activations
(flax.linen, NHWC).

Architecture mirrors the reference `CNO_time`
(`CNO_Experiments/CNO_timeModule_CIN.py:514-884`): lift → N_layers ×
[N_res ResidualBlocks → (D) CNOBlock, skip saved] → optional ViT bottleneck →
N_res_neck residual neck → N_layers × [(I) ED_expansion on skip + concat →
decoder_inv → (U) CNOBlock] → concat skip0 → project. Channel schedule
`encoder_features = [mult/2, mult·2^i]` (`:585-599`); filter parameters
cutoff = size/2.0001, halfwidth = 0.8·size − cutoff (`:262-266`); FILM
lead-time conditioning with zero-initialized scale/bias MLPs (`:27-70`).

The computational core is the anti-aliased LReLu (reference
`training/filtered_networks.py:199-311` calling the CUDA `filtered_lrelu`):
here it is `pregen_pde_tpu.ops.filtered_lrelu` — two depthwise dilated convs
XLA fuses onto the TPU conv units, with Kaiser filters designed host-side at
module-construction time.

Norm note: the reference's FILM selects BatchNorm/InstanceNorm/LayerNorm/
Identity by `nl_dim` (`CNO_timeModule_CIN.py:51-58`), and the reference
training default is `nl_dim="23"` → InstanceNorm(affine=True)
(`TrainCNO_time_L.py:57-59`) — so `norm="instance"` is the default here too.
`norm="batch"` (≡ nl_dim=[0,2,3]) is a *stateless* batch-stat norm: it
normalizes by the statistics of the current batch in train AND eval instead
of keeping running averages — running averages are mutable state that would
thread a `batch_stats` collection through the whole SPMD trainer for an
option the reference never trains with (when `is_time=1` the plain
`batch_norm` is replaced by Identity and the norm lives inside FILM,
`CNO_timeModule_CIN.py:321-326,482-491`). Under data parallelism the
stats are per-replica (no cross-replica sync), like torch BatchNorm under
DDP without SyncBN.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from pregen_pde_tpu.ops.filter_design import design_lowpass_filter
from pregen_pde_tpu.ops.filtered_lrelu import filtered_lrelu


# ---------------------------------------------------------------------------
# Anti-aliased leaky ReLU layer
# ---------------------------------------------------------------------------
class AntiAliasedLReLu(nn.Module):
    """Reference `LReLu` (`filtered_networks.py:199-311`): design per-layer
    Kaiser FIR up/down filters, compute the symmetric-interpretation padding,
    apply filtered_lrelu with gain √2, slope 0.2, learnable bias."""

    channels: int
    in_size: int
    out_size: int
    in_cutoff: float
    out_cutoff: float
    in_half_width: float
    out_half_width: float
    filter_size: int = 6
    lrelu_upsampling: int = 2

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # NHWC
        in_rate, out_rate = self.in_size, self.out_size
        tmp_rate = max(in_rate, out_rate) * self.lrelu_upsampling

        up_factor = int(np.rint(tmp_rate / in_rate))
        up_taps = self.filter_size * up_factor if up_factor > 1 else 1
        fu = design_lowpass_filter(
            up_taps, cutoff=self.in_cutoff, width=self.in_half_width * 2,
            fs=tmp_rate,
        )

        down_factor = int(np.rint(tmp_rate / out_rate))
        down_taps = self.filter_size * down_factor if down_factor > 1 else 1
        fd = design_lowpass_filter(
            down_taps, cutoff=self.out_cutoff, width=self.out_half_width * 2,
            fs=tmp_rate,
        )

        # padding per the symmetric interpretation (`filtered_networks.py:254-262`)
        pad_total = (self.out_size - 1) * down_factor + 1
        pad_total -= self.in_size * up_factor
        pad_total += up_taps + down_taps - 2
        pad_lo = (pad_total + up_factor) // 2
        pad_hi = pad_total - pad_lo
        padding = [int(pad_lo), int(pad_hi), int(pad_lo), int(pad_hi)]

        b = self.param("bias", nn.initializers.zeros, (self.channels,))
        fu_j = None if fu is None else jnp.asarray(fu)
        fd_j = None if fd is None else jnp.asarray(fd)
        y = filtered_lrelu(
            x, fu_j, fd_j, b.astype(x.dtype),
            up=up_factor, down=down_factor, padding=padding,
            gain=float(np.sqrt(2)), slope=0.2, clamp=None,
        )
        assert y.shape[1] == self.out_size and y.shape[2] == self.out_size, (
            y.shape, self.out_size)
        return y


class StandardLReLu(nn.Module):
    """Plain leaky-ReLU activation with bilinear resampling — the reference's
    cheap `LReLu_standard` variant (`filtered_networks.py:316-347`: lrelu +
    avgpool/interp instead of the anti-aliased filter pipeline)."""

    channels: int
    in_size: int
    out_size: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b = self.param("bias", nn.initializers.zeros, (self.channels,))
        x = jax.nn.leaky_relu(x + b.reshape(1, 1, 1, -1).astype(x.dtype), 0.2)
        if self.out_size != self.in_size:
            x = jax.image.resize(
                x, (x.shape[0], self.out_size, self.out_size, x.shape[-1]),
                method="bilinear",
            )
        return x


# ---------------------------------------------------------------------------
# FILM lead-time conditioning
# ---------------------------------------------------------------------------
class FILM(nn.Module):
    """Per-channel scale/bias MLPs on the scalar lead time after a norm
    (reference `CNO_timeModule_CIN.py:27-70`); zero-initialized so the layer
    starts as identity (`:43-49`). norm ∈ {"none", "instance", "layer",
    "batch"} ≡ the reference's nl_dim ∈ {other, [2,3], [1,2,3], [0,2,3]}
    (`:51-58`); default "instance" = the reference training default
    nl_dim="23" (`TrainCNO_time_L.py:57-59`). "batch" is stateless
    batch-stat normalization (see the module docstring's norm note)."""

    channels: int
    norm: str = "instance"
    intermediate: int = 128

    @nn.compact
    def __call__(self, x: jax.Array, time: jax.Array) -> jax.Array:
        if self.norm == "instance":
            # epsilon 1e-5 = torch InstanceNorm2d's default (flax defaults to
            # 1e-6); pinned by the cross-implementation oracle test
            x = nn.GroupNorm(num_groups=None, group_size=1, use_bias=True,
                             use_scale=True, epsilon=1e-5)(x)
        elif self.norm == "layer":
            x = nn.LayerNorm(reduction_axes=(-3, -2, -1), epsilon=1e-5)(x)
        elif self.norm == "batch":
            # per-channel stats over (batch, H, W); affine learnable like
            # torch BatchNorm2d, but no running averages (stateless)
            mu = jnp.mean(x, axis=(0, 1, 2), keepdims=True)
            var = jnp.var(x, axis=(0, 1, 2), keepdims=True)
            x = (x - mu) * jax.lax.rsqrt(var + 1e-5)
            gamma = self.param("bn_scale", nn.initializers.ones,
                               (self.channels,), x.dtype)
            beta = self.param("bn_bias", nn.initializers.zeros,
                              (self.channels,), x.dtype)
            x = x * gamma + beta
        elif self.norm != "none":
            raise ValueError(self.norm)

        t = time.reshape(-1, 1).astype(x.dtype)
        zeros = nn.initializers.zeros

        # inp2lat biases keep torch Linear's default U(-1/√fan_in, 1/√fan_in)
        # = U(-1, 1) at fan_in=1 (the reference zeroes only the WEIGHTS,
        # `CNO_timeModule_CIN.py:43-49`) — the random biases break symmetry
        # across intermediate units so the zero-init outer layers get
        # distinct gradients from step one
        def u11(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -1.0, 1.0)

        lat_s = nn.Dense(self.intermediate, kernel_init=zeros,
                         bias_init=u11)(t)
        scale = nn.Dense(self.channels, kernel_init=zeros,
                         bias_init=nn.initializers.ones)(lat_s)
        lat_b = nn.Dense(self.intermediate, kernel_init=zeros,
                         bias_init=u11)(t)
        bias = nn.Dense(self.channels, kernel_init=zeros, bias_init=zeros)(lat_b)
        return x * scale[:, None, None, :] + bias[:, None, None, :]


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------

def _torch_conv_init(fan_in: int):
    """torch Conv2d default init (kaiming_uniform(a=√5) ≡ U(±1/√fan_in) for
    both weight and bias, fan_in = C_in·kh·kw) — matched for training-dynamics
    parity with the reference blocks (torch `_ConvNd.reset_parameters`)."""
    bound = 1.0 / np.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _conv(out_ch: int, k: int, in_ch: int, name=None):
    fi = _torch_conv_init(in_ch * k * k)
    return nn.Conv(out_ch, (k, k), padding="SAME", kernel_init=fi,
                   bias_init=fi, name=name)


def _filter_params(size: int, cutoff_den: float, half_width_mult: float):
    cutoff = size / cutoff_den
    half_width = half_width_mult * size - cutoff
    return cutoff, half_width


class CNOBlock(nn.Module):
    """conv3×3 → FILM(time) → anti-aliased activation with in→out resampling
    (reference `CNO_timeModule_CIN.py:227-335`)."""

    out_channels: int
    in_size: int
    out_size: int
    cutoff_den: float = 2.0001
    conv_kernel: int = 3
    filter_size: int = 6
    lrelu_upsampling: int = 2
    half_width_mult: float = 0.8
    use_time: bool = True
    norm: str = "instance"
    activation: str = "cno_lrelu"  # "cno_lrelu" (anti-aliased) | "lrelu" (plain)

    @nn.compact
    def __call__(self, x: jax.Array, time: jax.Array | None = None) -> jax.Array:
        in_cut, in_hw = _filter_params(self.in_size, self.cutoff_den,
                                       self.half_width_mult)
        out_cut, out_hw = _filter_params(self.out_size, self.cutoff_den,
                                         self.half_width_mult)
        x = _conv(self.out_channels, self.conv_kernel, x.shape[-1])(x)
        if self.use_time:
            x = FILM(self.out_channels, norm=self.norm)(x, time)
        if self.activation == "lrelu":
            return StandardLReLu(self.out_channels, self.in_size, self.out_size)(x)
        return AntiAliasedLReLu(
            channels=self.out_channels, in_size=self.in_size,
            out_size=self.out_size, in_cutoff=in_cut, out_cutoff=out_cut,
            in_half_width=in_hw, out_half_width=out_hw,
            filter_size=self.filter_size, lrelu_upsampling=self.lrelu_upsampling,
        )(x)


class LiftProjectBlock(nn.Module):
    """CNOBlock(in→latent, no time) → conv(latent→out)
    (reference `:338-387`)."""

    out_channels: int
    in_size: int
    out_size: int
    latent_dim: int = 64
    conv_kernel: int = 3

    @nn.compact
    def __call__(self, x: jax.Array, time: jax.Array | None = None) -> jax.Array:
        x = CNOBlock(
            out_channels=self.latent_dim, in_size=self.in_size,
            out_size=self.out_size, use_time=False,
        )(x)
        return _conv(self.out_channels, self.conv_kernel, x.shape[-1])(x)


class ResidualBlock(nn.Module):
    """2 × (conv → FILM → act) + skip, constant size (reference `:393-510`)."""

    channels: int
    size: int
    cutoff_den: float = 2.0001
    conv_kernel: int = 3
    filter_size: int = 6
    lrelu_upsampling: int = 2
    half_width_mult: float = 0.8
    use_time: bool = True
    norm: str = "instance"
    activation: str = "cno_lrelu"

    @nn.compact
    def __call__(self, x: jax.Array, time: jax.Array | None = None) -> jax.Array:
        cut, hw = _filter_params(self.size, self.cutoff_den, self.half_width_mult)
        out = _conv(self.channels, self.conv_kernel, x.shape[-1])(x)
        if self.use_time:
            out = FILM(self.channels, norm=self.norm)(out, time)
        if self.activation == "lrelu":
            out = StandardLReLu(self.channels, self.size, self.size)(out)
        else:
            out = AntiAliasedLReLu(
                channels=self.channels, in_size=self.size, out_size=self.size,
                in_cutoff=cut, out_cutoff=cut, in_half_width=hw, out_half_width=hw,
                filter_size=self.filter_size,
                lrelu_upsampling=self.lrelu_upsampling,
            )(out)
        out = _conv(self.channels, self.conv_kernel, out.shape[-1])(out)
        if self.use_time:
            out = FILM(self.channels, norm=self.norm)(out, time)
        return x + out


# ---------------------------------------------------------------------------
# Optional ViT bottleneck (reference `:76-216`, off by default)
# ---------------------------------------------------------------------------
class ViTBottleneck(nn.Module):
    """Reference `ViT` (`CNO_timeModule_CIN.py:76-216`): patchify →
    [LayerNorm, Linear(patch_dim→dim), LayerNorm] → +randn pos-embedding →
    depth × [pre-norm attention (fused bias-free qkv, scale dim_head^-1/2,
    out projection unless heads==1 and dim_head==dim) + pre-norm
    FeedForward(dim→mlp_dim→dim, GELU)] → LayerNorm →
    [Linear(dim→patch_dim), LayerNorm] → depatchify. dim/dim_head/mlp_dim
    derive from the multipliers exactly as the CNO wiring (`:938-949`):
    dim = dim_multiplier·p²·C, dim_head = dim_head_multiplier·dim,
    mlp_dim = mlp_dim_multiplier·dim."""

    patch_size: int = 1
    depth: int = 4
    heads: int = 4
    dim_multiplier: float = 1.0
    dim_head_multiplier: float = 1.0
    mlp_dim_multiplier: float = 1.0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # NHWC
        b, h, w, c = x.shape
        p = self.patch_size
        patch_dim = c * p * p
        dim = int(self.dim_multiplier * patch_dim)
        dim_head = int(self.dim_head_multiplier * dim)
        mlp_dim = int(self.mlp_dim_multiplier * dim)
        inner = dim_head * self.heads
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, name=name)

        # 'b c (h p1) (w p2) -> b (h w) (p1 p2 c)'
        t = x.reshape(b, h // p, p, w // p, p, c).transpose(0, 1, 3, 2, 4, 5)
        t = t.reshape(b, (h // p) * (w // p), patch_dim)
        t = ln("embed_norm1")(t)
        t = nn.Dense(dim, name="embed")(t)
        t = ln("embed_norm2")(t)
        pos = self.param("pos_embedding", nn.initializers.normal(1.0),
                         (1, t.shape[1], dim))
        t = t + pos

        scale = dim_head ** -0.5
        for d in range(self.depth):
            y = ln(f"attn_{d}_norm")(t)
            qkv = nn.Dense(inner * 3, use_bias=False, name=f"attn_{d}_qkv")(y)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            shp = (b, -1, self.heads, dim_head)
            q = q.reshape(shp).transpose(0, 2, 1, 3)
            k = k.reshape(shp).transpose(0, 2, 1, 3)
            v = v.reshape(shp).transpose(0, 2, 1, 3)
            attn = jax.nn.softmax(
                jnp.einsum("bhnd,bhmd->bhnm", q, k) * scale, axis=-1
            )
            out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
            out = out.transpose(0, 2, 1, 3).reshape(b, -1, inner)
            if not (self.heads == 1 and dim_head == dim):
                out = nn.Dense(dim, name=f"attn_{d}_out")(out)
            t = t + out
            y = ln(f"ff_{d}_norm")(t)
            y = nn.Dense(mlp_dim, name=f"ff_{d}_1")(y)
            y = nn.gelu(y)
            y = nn.Dense(dim, name=f"ff_{d}_2")(y)
            t = t + y
        t = ln("final_norm")(t)

        t = nn.Dense(patch_dim, name="unembed")(t)
        t = ln("unembed_norm")(t)
        x = t.reshape(b, h // p, w // p, p, p, c).transpose(0, 1, 3, 2, 4, 5)
        return x.reshape(b, h, w, c)


# ---------------------------------------------------------------------------
# Full model
# ---------------------------------------------------------------------------
class CNO(nn.Module):
    """U-shaped operator; input (B, in_size, in_size, in_dim) + lead time (B,)
    → (B, out_size, out_size, out_dim). Reference `CNO_time.forward`
    (`CNO_timeModule_CIN.py:838-884`)."""

    in_size: int
    out_dim: int = 3
    n_layers: int = 3
    n_res: int = 1
    n_res_neck: int = 6
    channel_multiplier: int = 32
    latent_lift_proj_dim: int = 64
    conv_kernel: int = 3
    add_inv: bool = True
    use_time: bool = True
    norm: str = "instance"
    activation: str = "cno_lrelu"  # "cno_lrelu" | "lrelu" (reference variants)
    use_attention: bool = False
    # ViT bottleneck hyperparameters (reference `is_att` block, `:938-949`)
    attention_patch_size: int = 1
    attention_depth: int = 4
    attention_heads: int = 4
    attention_dim_multiplier: float = 1.0
    attention_dim_head_multiplier: float = 1.0
    attention_mlp_dim_multiplier: float = 1.0
    out_size: int | None = None  # None → in_size
    # pad the latent grid up to the next 2^N_layers multiple (reference
    # `expand_input`, `CNO_timeModule_CIN.py:609-632`: the lift's resampling
    # activation carries in_size → latent_size, the projection back) —
    # enables sizes the down/upsampling ladder doesn't divide
    expand_input: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, time: jax.Array | None = None) -> jax.Array:
        nl = self.n_layers
        out_size = self.out_size or self.in_size
        # channel schedule (`:585-599`)
        enc_feat = [self.channel_multiplier // 2] + [
            (2**i) * self.channel_multiplier for i in range(nl)
        ]
        dec_feat_in = list(reversed(enc_feat[1:]))
        dec_feat_out = list(reversed(enc_feat[:-1]))
        for i in range(1, nl):
            dec_feat_in[i] *= 2  # concat with expanded skips
        inv_feat = list(dec_feat_in) + [enc_feat[0] + dec_feat_out[-1]]

        # latent sizes (`:609-632`): expand_input jumps to the next 2^N
        # multiple (e.g. 64 → 72 at N=3... reference's own example)
        def latent(size):
            if not self.expand_input:
                return size
            de = 2**nl
            return size - (size % de) + de

        latent_in, latent_out = latent(self.in_size), latent(out_size)
        enc_sizes = [latent_in // 2**i for i in range(nl + 1)]
        dec_sizes = [latent_out // 2 ** (nl - i) for i in range(nl + 1)]

        kw = dict(use_time=self.use_time, norm=self.norm,
                  activation=self.activation, conv_kernel=self.conv_kernel)

        x = LiftProjectBlock(
            out_channels=enc_feat[0], in_size=self.in_size,
            out_size=enc_sizes[0], latent_dim=self.latent_lift_proj_dim,
            conv_kernel=self.conv_kernel,
        )(x, time)

        skips = []
        for i in range(nl):
            for _ in range(self.n_res):
                x = ResidualBlock(channels=enc_feat[i], size=enc_sizes[i], **kw)(
                    x, time
                )
            skips.append(x)
            x = CNOBlock(
                out_channels=enc_feat[i + 1], in_size=enc_sizes[i],
                out_size=enc_sizes[i + 1], **kw,
            )(x, time)

        if self.use_attention:
            x = ViTBottleneck(
                patch_size=self.attention_patch_size,
                depth=self.attention_depth,
                heads=self.attention_heads,
                dim_multiplier=self.attention_dim_multiplier,
                dim_head_multiplier=self.attention_dim_head_multiplier,
                mlp_dim_multiplier=self.attention_mlp_dim_multiplier,
            )(x)
        for _ in range(self.n_res_neck):
            x = ResidualBlock(channels=enc_feat[nl], size=enc_sizes[nl], **kw)(
                x, time
            )

        def expansion(z, level):
            """(I) block: resize skip at encoder level → decoder size
            (`ED_expansion`, concat wiring `:870-875`)."""
            return CNOBlock(
                out_channels=enc_feat[level], in_size=enc_sizes[level],
                out_size=dec_sizes[nl - level], **kw,
            )(z, time)

        for i in range(nl):
            if i == 0:
                x = expansion(x, nl)
            else:
                x = jnp.concatenate([x, expansion(skips[-i], nl - i)], axis=-1)
            if self.add_inv:
                x = CNOBlock(
                    out_channels=inv_feat[i], in_size=dec_sizes[i],
                    out_size=dec_sizes[i], **kw,
                )(x, time)
            x = CNOBlock(
                out_channels=dec_feat_out[i], in_size=dec_sizes[i],
                out_size=dec_sizes[i + 1], **kw,
            )(x, time)

        x = jnp.concatenate([x, expansion(skips[0], 0)], axis=-1)
        x = LiftProjectBlock(
            out_channels=self.out_dim, in_size=dec_sizes[nl],
            out_size=out_size, latent_dim=self.latent_lift_proj_dim,
            conv_kernel=self.conv_kernel,
        )(x, time)
        return x
