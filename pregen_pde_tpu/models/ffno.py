"""FFNO — Factorized Fourier Neural Operator (flax.linen, NHWC).

Same architecture family as the reference baseline
(`Autoregressive_Baseline_Scripts/models/FFNO.py`): per layer, separate 1-D
Fourier transforms along x and y with per-axis factorized mode weights
(`forward_fourier :73-114`), a two-layer feed-forward "backcast" with residual
connection (`:191-199`), and ε-guarded weight-normalized linears throughout
(`utils/linear.py:44-105` — written there specifically because stock
weight_norm produced NaNs).

Masking: the reference reorders its loader output to [...,SDF,ValidMask] and
multiplies by ValidMask (`FFNO.py:130-134`, `utils/data_loader.py:62-95`).
THIS framework feeds the raw contract [Ux,Uy,p,Re,mask(1=hole),SDF](+time),
so validity = 1 − mask: set ``hole_mask_channel`` (default 4) and the output
is re-masked by (1 − hole_mask).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class WNDense(nn.Module):
    """Weight-normalized Dense: w = g * v / sqrt(||v||² + eps²), per output
    column.

    The ε-guard is the reference's documented NaN fix (`utils/linear.py:44-105`,
    w = g·v/(‖v‖+ε)); folding ε inside the sqrt additionally keeps the
    *gradient* finite at v = 0, where sqrt has an infinite derivative under
    autodiff (torch's norm uses a zero subgradient there, JAX does not)."""

    features: int
    eps: float = 1e-6
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_f = x.shape[-1]
        v = self.param("v", nn.initializers.lecun_normal(), (in_f, self.features))
        g = self.param("g", nn.initializers.ones, (self.features,))
        norm = jnp.sqrt(jnp.sum(v * v, axis=0, keepdims=True) + self.eps**2)
        w = v / norm * g[None, :]
        y = x @ w
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b
        return y


class FactorizedSpectralLayer(nn.Module):
    """Separate 1-D spectral convs along H and W, summed (`FFNO.py:73-114`)."""

    channels: int
    modes: int
    impl: str = "matmul"  # "matmul" = truncated-DFT fast path; "fft" = jnp.fft

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # (B, H, W, C)
        b, h, w, c = x.shape
        m = self.modes
        scale = 1.0 / c

        def cplx(name, shape):
            re = self.param(f"{name}_re", nn.initializers.uniform(scale), shape)
            im = self.param(f"{name}_im", nn.initializers.uniform(scale), shape)
            return jax.lax.complex(re.astype(jnp.float32),
                                   im.astype(jnp.float32))

        mw, mh = min(m, w // 2 + 1), min(m, h // 2 + 1)
        wx = cplx("w_x", (c, m, self.channels))[:, :mw]
        wy = cplx("w_y", (c, m, self.channels))[:, :mh]

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
    out_channels: int = 3
    modes: int = 12
    width: int = 48
    n_layers: int = 4
    hole_mask_channel: int | None = 4  # contract mask channel (1 = hole)

    @nn.compact
    def __call__(self, x: jax.Array, lead_time: jax.Array | None = None) -> jax.Array:
        valid = None
        if self.hole_mask_channel is not None and x.shape[-1] > self.hole_mask_channel:
            hole = x[..., self.hole_mask_channel : self.hole_mask_channel + 1]
            valid = 1.0 - jnp.clip(hole, 0.0, 1.0)
        x = WNDense(self.width)(x)
        for _ in range(self.n_layers):
            z = FactorizedSpectralLayer(self.width, self.modes)(x)
            z = WNDense(self.width)(z)
            z = nn.relu(z)
            z = WNDense(self.width)(z)
            x = x + z  # backcast residual (`FFNO.py:191-199`)
        x = WNDense(self.width)(x)
        x = nn.relu(x)
        x = WNDense(self.out_channels)(x)
        if valid is not None:
            x = x * valid
        return x
