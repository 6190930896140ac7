"""FNO — 2-D Fourier Neural Operator (flax.linen, NHWC).

Same architecture family as the reference baseline
(`Autoregressive_Baseline_Scripts/models/FNO.py`): lift 1×1 conv on
[input channels, x-grid, y-grid] → n_layers × (truncated-mode spectral conv
+ 1×1 conv + GELU) → two-layer projection head, domain zero-padding of ¼
before the spectral layers, output re-masked by the validity mask when given.

TPU notes: the mode contraction is one complex einsum ``bxyi,ixyo->bxyo``
evaluated as two real einsums (MXU-friendly); FFTs are XLA's native TPU FFT.
Weights are stored as separate real/imag parameters (optimizer-friendly,
avoids complex dtypes in the param pytree).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class SpectralConv2d(nn.Module):
    """Truncated-mode spectral convolution (reference `FNO.py:9-45`):
    rfft2 → complex channel-mixing einsum on the lowest modes1×modes2 modes
    (two corner blocks: positive and negative y-frequencies) → irfft2.

    ``impl="matmul"`` (default) evaluates the truncated transforms as skinny
    DFT matmuls (`ops/truncated_dft.py`) instead of full FFT + slice — the
    same math exactly, but MXU-shaped (XLA's FFT is the train-step
    bottleneck, PERF.md); ``impl="fft"`` keeps the jnp.fft path (oracle for
    the equivalence test)."""

    out_channels: int
    modes1: int  # retained modes along H (full-fft axis): ±modes1
    modes2: int  # retained modes along W (rfft axis)
    impl: str = "matmul"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # (B, H, W, C)
        b, h, w, c = x.shape
        # Weight shapes are FIXED by self.modes (resolution-independent) —
        # FNO's resolution invariance means params trained at one grid apply
        # at any other. At apply time only the modes the current resolution
        # supports participate; the rest of the (fixed-shape) weight block is
        # simply unused when the grid is smaller than 2*modes.
        m1 = min(self.modes1, h // 2)
        m2 = min(self.modes2, w // 2 + 1)
        scale = 1.0 / (c * self.out_channels)

        def cplx_param(name):
            re = self.param(
                f"{name}_re",
                nn.initializers.uniform(scale),
                (c, self.modes1, self.modes2, self.out_channels),
                jnp.float32,
            )
            im = self.param(
                f"{name}_im",
                nn.initializers.uniform(scale),
                (c, self.modes1, self.modes2, self.out_channels),
                jnp.float32,
            )
            # spectral weights always act in f32 (TPU FFT is f32; bf16
            # compute_dtype upstream casts params, so upcast here)
            return jax.lax.complex(re.astype(jnp.float32), im.astype(jnp.float32))

        # Row k of w_pos is frequency +k, row k of w_neg is frequency
        # k - modes1 (it multiplies x_hat[-modes1+k] when h >= 2*modes1).
        # When the grid only supports m1 < modes1, the surviving negative
        # frequencies -m1..-1 live in the TAIL of w_neg — slice [-m1:], not
        # [:m1], so each weight keeps its trained frequency across
        # resolutions (resolution invariance).
        w_pos = cplx_param("w_pos")[:, :m1, :m2, :]  # modes [0, m1)
        w_neg = cplx_param("w_neg")[:, self.modes1 - m1 :, :m2, :]  # modes [-m1, 0)

        if self.impl == "matmul":
            from pregen_pde_tpu.ops import truncated_dft as td

            xr, xi = td.rdft(x.astype(jnp.float32), 2, m2)  # (B,H,m2,C)
            xr, xi = td.cdft_pm(xr, xi, 1, m1)  # (B,2m1,m2,C), rows [+m1|-m1]
            wts = jnp.concatenate([w_pos, w_neg], axis=1)  # (C,2m1,m2,O)
            wr, wi = jnp.real(wts), jnp.imag(wts)
            yr = jnp.einsum("bxyi,ixyo->bxyo", xr, wr) - jnp.einsum(
                "bxyi,ixyo->bxyo", xi, wi
            )
            yi = jnp.einsum("bxyi,ixyo->bxyo", xr, wi) + jnp.einsum(
                "bxyi,ixyo->bxyo", xi, wr
            )
            yr, yi = td.icdft_pm(yr, yi, 1, h)
            return td.irdft(yr, yi, 2, w).astype(x.dtype)

        x_hat = jnp.fft.rfft2(x.astype(jnp.float32), axes=(1, 2))  # complex64
        top = jnp.einsum("bxyi,ixyo->bxyo", x_hat[:, :m1, :m2, :], w_pos)
        bot = jnp.einsum("bxyi,ixyo->bxyo", x_hat[:, -m1:, :m2, :], w_neg)

        # build the complex zero buffer ON DEVICE (lax.complex of real zeros):
        # eager host→device transfer of complex constants is unimplemented on
        # tunneled TPU backends, so never materialize complex eagerly
        zr = jnp.zeros((b, h, w // 2 + 1, self.out_channels), jnp.float32)
        out_hat = jax.lax.complex(zr, zr)
        out_hat = out_hat.at[:, :m1, :m2, :].set(top)
        out_hat = out_hat.at[:, -m1:, :m2, :].set(bot)
        return jnp.fft.irfft2(out_hat, s=(h, w), axes=(1, 2)).astype(x.dtype)


class FNO2d(nn.Module):
    """in: (B, H, W, in_channels) [+ optional coordinate grid appended inside];
    out: (B, H, W, out_channels)."""

    out_channels: int = 3
    modes: int = 12
    width: int = 32
    n_layers: int = 4
    pad_frac: float = 0.25  # zero-pad the domain before spectral layers
    head_width: int = 128  # fixed projection-head width (`FNO.py:84` fc1)
    append_grid: bool = True
    mask_channel: int | None = None  # input channel index of validity mask

    @nn.compact
    def __call__(self, x: jax.Array, lead_time: jax.Array | None = None) -> jax.Array:
        b, h, w, _ = x.shape
        valid = None
        if self.mask_channel is not None:
            valid = x[..., self.mask_channel : self.mask_channel + 1]
        if self.append_grid:
            gx, gy = np.meshgrid(
                np.linspace(0, 1, h, dtype=np.float32),
                np.linspace(0, 1, w, dtype=np.float32),
                indexing="ij",
            )
            grid = jnp.broadcast_to(
                jnp.asarray(np.stack([gx, gy], -1))[None], (b, h, w, 2)
            ).astype(x.dtype)
            x = jnp.concatenate([x, grid], axis=-1)

        x = nn.Dense(self.width)(x)

        # `FNO.py:113-115`: int(round(size * frac))
        pad_h = int(round(h * self.pad_frac))
        pad_w = int(round(w * self.pad_frac))
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))

        for k in range(self.n_layers):
            x_spec = SpectralConv2d(self.width, self.modes, self.modes)(x)
            x_loc = nn.Dense(self.width)(x)
            x = x_spec + x_loc
            if k != self.n_layers - 1:  # GELU between layers only (`FNO.py:121-122`)
                x = nn.gelu(x)

        x = x[:, :h, :w, :]
        x = nn.Dense(self.head_width)(x)
        x = nn.gelu(x)
        x = nn.Dense(self.out_channels)(x)
        if valid is not None:
            x = x * valid
        return x
