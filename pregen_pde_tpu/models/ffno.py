"""FFNO — Factorized Fourier Neural Operator (flax.linen, NHWC).

Reference-faithful re-implementation of the baseline
(`Autoregressive_Baseline_Scripts/models/FFNO.py`): per layer, separate 1-D
Fourier transforms along x and y with per-axis factorized mode weights
(`forward_fourier :73-114`) that are SHARED across all layers by default
(`share_weight=True`, `FFNO.py:139-146`), a backcast FeedForward
(dim → factor·dim → dim with GELU + dropout, `utils/feedforward.py:19-31`)
with residual connection, [0,1]² coordinate features appended inside the
model (`get_grid`, `FFNO.py:203-209`), fixed domain zero-padding of 8
(`FFNO.py:126,173-176`), and a no-activation 128-wide projection head applied
to the FINAL BACKCAST output (not the residual stream — `FFNO.py:185-190`:
``b = b[..unpad..]; output = self.out(b)``). Weight-normalized linears
throughout (`utils/linear.py:44-105` — written there specifically because
stock weight_norm produced NaNs).

The reference's rffts use ``norm='ortho'`` (`FFNO.py:84,90`); the forward and
inverse ortho factors cancel inside the linear transform sandwich, so the
un-normalized transforms here compute the identical function for identical
weights (pinned by the cross-implementation oracle test
`tests/test_reference_oracle.py`).

Masking: the reference reorders its loader output to [...,SDF,ValidMask] and
multiplies by ValidMask (`FFNO.py:130-134`, `utils/data_loader.py:62-95`).
THIS framework feeds the raw contract [Ux,Uy,p,Re,mask(1=hole),SDF](+time),
so validity = 1 − mask: set ``hole_mask_channel`` (default 4) and physical
channels/output are masked by (1 − hole_mask), ≡ the reference's
``physical * mask`` / ``output * mask``.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class WNDense(nn.Module):
    """Weight-normalized Dense: w = g * v / sqrt(||v||² + eps²), norm over
    the input axis per output feature (reference `utils/linear.py:78-84`:
    w = g·v/max(‖v‖, ε), v:(out,in) normed over in).

    Folding ε inside the sqrt (instead of the reference's clamp) additionally
    keeps the *gradient* finite at v = 0, where sqrt has an infinite
    derivative under autodiff (torch's norm uses a zero subgradient there,
    JAX does not); for ‖v‖ ≫ ε the two parameterizations agree to O(ε²)."""

    features: int
    eps: float = 1e-6
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_f = x.shape[-1]
        # reference init (`utils/linear.py:70-74`): v ~ kaiming_uniform(a=√5)
        # = U(±1/√fan_in), g = ‖v_row‖ so the initial weight equals v.
        # flax params draw independently, so g takes E‖v_row‖ = √(fan_in·
        # bound²/3) = 1/√3 (exact in expectation, tight for fan_in ≫ 1) —
        # matching the reference's initial weight scale instead of forcing
        # unit-norm rows (g = 1).
        bound = 1.0 / np.sqrt(in_f)
        v = self.param(
            "v",
            lambda key, shape: jax.random.uniform(
                key, shape, jnp.float32, -bound, bound),
            (in_f, self.features),
        )
        g = self.param(
            "g",
            lambda key, shape: jnp.full(shape, jnp.float32(1.0 / np.sqrt(3.0))),
            (self.features,),
        )
        norm = jnp.sqrt(jnp.sum(v * v, axis=0, keepdims=True) + self.eps**2)
        w = v / norm * g[None, :]
        y = x @ w
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b
        return y


class FactorizedSpectralLayer(nn.Module):
    """Separate 1-D spectral convs along H and W, summed (`FFNO.py:73-114`).

    ``weights`` (optional call arg) supplies externally-owned complex weight
    pairs ``(w_x, w_y)`` — the reference's layer-shared ``fourier_weight``
    ParameterList (`FFNO.py:139-146`); when None the layer owns its weights.
    w_x (c, modes, out) multiplies the axis-2 (W / physical-x) transform ≡
    reference ``fourier_weight[1]`` ("modes_y": N axis of [B,I,M,N]); w_y
    multiplies axis 1 ≡ ``fourier_weight[0]``.
    """

    channels: int
    modes: int
    impl: str = "matmul"  # "matmul" = truncated-DFT fast path; "fft" = jnp.fft

    @nn.compact
    def __call__(self, x: jax.Array, weights=None) -> jax.Array:  # (B, H, W, C)
        b, h, w, c = x.shape
        m = self.modes
        scale = 1.0 / c

        def cplx(name, shape):
            re = self.param(f"{name}_re", nn.initializers.uniform(scale), shape)
            im = self.param(f"{name}_im", nn.initializers.uniform(scale), shape)
            return jax.lax.complex(re.astype(jnp.float32),
                                   im.astype(jnp.float32))

        if weights is None:
            wx = cplx("w_x", (c, m, self.channels))
            wy = cplx("w_y", (c, m, self.channels))
        else:
            wx, wy = weights
        mw, mh = min(m, w // 2 + 1), min(m, h // 2 + 1)
        wx = wx[:, :mw]
        wy = wy[:, :mh]

        if self.impl == "matmul":
            # truncated DFTs as skinny MXU matmuls (see fno.SpectralConv2d)
            from pregen_pde_tpu.ops import truncated_dft as td

            xf = x.astype(jnp.float32)
            xr, xi = td.rdft(xf, 2, mw)
            wxr, wxi = jnp.real(wx), jnp.imag(wx)
            yr = jnp.einsum("bhmi,imo->bhmo", xr, wxr) - jnp.einsum(
                "bhmi,imo->bhmo", xi, wxi
            )
            yi = jnp.einsum("bhmi,imo->bhmo", xr, wxi) + jnp.einsum(
                "bhmi,imo->bhmo", xi, wxr
            )
            y_x = td.irdft(yr, yi, 2, w)

            xr, xi = td.rdft(xf, 1, mh)
            wyr, wyi = jnp.real(wy), jnp.imag(wy)
            yr = jnp.einsum("bmwi,imo->bmwo", xr, wyr) - jnp.einsum(
                "bmwi,imo->bmwo", xi, wyi
            )
            yi = jnp.einsum("bmwi,imo->bmwo", xr, wyi) + jnp.einsum(
                "bmwi,imo->bmwo", xi, wyr
            )
            y_y = td.irdft(yr, yi, 1, h)
            return (y_x + y_y).astype(x.dtype)

        # along W (x-direction): rfft over axis 2
        x_hx = jnp.fft.rfft(x.astype(jnp.float32), axis=2)  # (B, H, W//2+1, C)
        out_x = jnp.einsum("bhmi,imo->bhmo", x_hx[:, :, :mw, :], wx)
        zx = jnp.zeros((b, h, w // 2 + 1, self.channels), jnp.float32)
        full_x = jax.lax.complex(zx, zx)  # complex built on device (see fno.py)
        full_x = full_x.at[:, :, :mw, :].set(out_x)
        y_x = jnp.fft.irfft(full_x, n=w, axis=2)

        # along H (y-direction): rfft over axis 1
        x_hy = jnp.fft.rfft(x.astype(jnp.float32), axis=1)  # (B, H//2+1, W, C)
        out_y = jnp.einsum("bmwi,imo->bmwo", x_hy[:, :mh, :, :], wy)
        zy = jnp.zeros((b, h // 2 + 1, w, self.channels), jnp.float32)
        full_y = jax.lax.complex(zy, zy)
        full_y = full_y.at[:, :mh, :, :].set(out_y)
        y_y = jnp.fft.irfft(full_y, n=h, axis=1)

        return (y_x + y_y).astype(x.dtype)


class FFNO2d(nn.Module):
    """Reference wiring (`FFNO.py:120-201`): mask → [+grid] → WN in_proj →
    pad → n_layers × (shared-weight factorized spectral + backcast FF,
    residual) → unpad the final backcast → WN(head_width) → WN(out) → mask."""

    out_channels: int = 3
    modes: int = 12
    width: int = 48
    n_layers: int = 4
    factor: int = 4  # backcast-FF hidden multiple (`FFNO.py:150` factor=4)
    padding: int = 8  # fixed zero-pad of both axes (`FFNO.py:126`)
    share_weight: bool = True  # layer-shared spectral weights (`FFNO.py:139`)
    append_grid: bool = True  # [0,1]² coords appended inside (`get_grid`)
    dropout_rate: float = 0.1  # backcast-FF dropout (`FFNO.py:150`)
    head_width: int = 128  # `FFNO.py:159-162`
    hole_mask_channel: int | None = 4  # contract mask channel (1 = hole)

    @nn.compact
    def __call__(self, x: jax.Array, lead_time: jax.Array | None = None,
                 train: bool = False) -> jax.Array:
        bsz, h, w, _ = x.shape
        valid = None
        if self.hole_mask_channel is not None and x.shape[-1] > self.hole_mask_channel:
            hole = x[..., self.hole_mask_channel : self.hole_mask_channel + 1]
            valid = 1.0 - jnp.clip(hole, 0.0, 1.0)
            # ≡ reference `physical * mask` (`FFNO.py:169`): zero the physical
            # fields (the channels before the mask) inside obstacles before
            # lifting; mask/SDF/time channels stay as features
            phys = x[..., : self.hole_mask_channel] * valid
            x = jnp.concatenate([phys, x[..., self.hole_mask_channel :]], -1)
        if self.append_grid:
            gx, gy = np.meshgrid(
                np.linspace(0, 1, h, dtype=np.float32),
                np.linspace(0, 1, w, dtype=np.float32),
                indexing="ij",
            )
            grid = jnp.broadcast_to(
                jnp.asarray(np.stack([gx, gy], -1))[None], (bsz, h, w, 2)
            ).astype(x.dtype)
            x = jnp.concatenate([x, grid], axis=-1)

        x = WNDense(self.width, name="in_proj")(x)
        p = self.padding
        if p:
            x = jnp.pad(x, ((0, 0), (0, p), (0, p), (0, 0)))

        shared = None
        if self.share_weight:
            scale = 1.0 / self.width

            def cplx(name):
                re = self.param(f"{name}_re", nn.initializers.uniform(scale),
                                (self.width, self.modes, self.width))
                im = self.param(f"{name}_im", nn.initializers.uniform(scale),
                                (self.width, self.modes, self.width))
                return jax.lax.complex(re.astype(jnp.float32),
                                       im.astype(jnp.float32))

            shared = (cplx("w_x"), cplx("w_y"))

        b = x
        for i in range(self.n_layers):
            z = FactorizedSpectralLayer(
                self.width, self.modes, name=f"spectral_{i}"
            )(x, shared)
            # backcast FeedForward (`utils/feedforward.py:19-31`):
            # WN(dim→factor·dim) → GELU → dropout → WN(factor·dim→dim)
            z = WNDense(self.factor * self.width, name=f"ff_{i}_0")(z)
            z = nn.gelu(z)
            z = nn.Dropout(self.dropout_rate, deterministic=not train)(z)
            b = WNDense(self.width, name=f"ff_{i}_1")(z)
            x = x + b  # backcast residual (`FFNO.py:180-183`)
        # head applied to the final BACKCAST, not the residual stream
        # (`FFNO.py:185-190`), unpadded; no activation between the two heads
        y = b[:, :h, :w, :]
        y = WNDense(self.head_width, name="head_0")(y)
        y = WNDense(self.out_channels, name="head_1")(y)
        if valid is not None:
            y = y * valid
        return y
