"""upfirdn2d — pad / zero-stuff upsample / FIR filter / downsample, TPU-native.

Same op contract as the reference CUDA kernel + dispatcher
(`torch_utils/ops/upfirdn2d.{cu,py}`, semantics documented at
`upfirdn2d.py:110-150` and reference impl `:158-186`):

1. upsample by inserting up−1 zeros after each pixel,
2. pad (negative = crop) w.r.t. the upsampled image,
3. convolve with the FIR filter (flip_filter=False means true convolution),
4. keep every down-th pixel.

TPU-first design: instead of a hand-scheduled kernel this lowers to ONE
`lax.conv_general_dilated` (or two 1-D depthwise convs for separable filters)
with `lhs_dilation` for the zero-stuffing and `window_strides` for the
decimation — exactly the access pattern XLA's TPU conv emitter tiles onto the
MXU/VPU, with fusion into neighboring elementwise ops for free. Gradients come
from XLA's conv transpose rules (the reference needed a custom autograd
Function, `upfirdn2d.py:231-283`).

Layout: NHWC (channels-last — the TPU-native layout; C maps to the 128-lane
dimension). The reference is NCHW.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _parse_scaling(scaling) -> tuple[int, int]:
    if isinstance(scaling, int):
        return scaling, scaling
    sx, sy = scaling
    return int(sx), int(sy)


def parse_padding(padding) -> tuple[int, int, int, int]:
    """→ (px0, px1, py0, py1); accepts int, [x, y], or [x0, x1, y0, y1]."""
    if isinstance(padding, int):
        return padding, padding, padding, padding
    padding = list(padding)
    if len(padding) == 2:
        px, py = padding
        return px, px, py, py
    px0, px1, py0, py1 = padding
    return px0, px1, py0, py1


def _depthwise_conv(
    x: jax.Array,  # NHWC
    f: jax.Array,  # (fh, fw)
    up: tuple[int, int],
    down: tuple[int, int],
    pad: tuple[int, int, int, int],  # (py0, py1, px0, px1) incl. dilation fixup
) -> jax.Array:
    c = x.shape[-1]
    rhs = jnp.broadcast_to(f[:, :, None, None], (*f.shape, 1, c)).astype(x.dtype)
    return jax.lax.conv_general_dilated(
        x,
        rhs,
        window_strides=down,
        padding=((pad[0], pad[1]), (pad[2], pad[3])),
        lhs_dilation=up,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def upfirdn2d(
    x: jax.Array,
    f: np.ndarray | jax.Array | None,
    up=1,
    down=1,
    padding=0,
    flip_filter: bool = False,
    gain: float = 1.0,
) -> jax.Array:
    """Args mirror the reference op (`upfirdn2d.py:110-150`) except layout:
    ``x`` is float NHWC ``[batch, in_height, in_width, channels]``; ``f`` is a
    float32 ``[fh, fw]`` (full), ``[taps]`` (separable), or None (identity).
    Returns ``[batch, out_height, out_width, channels]``.
    """
    assert x.ndim == 4
    if f is None:
        f = jnp.ones((1, 1), jnp.float32)
    f = jnp.asarray(f, jnp.float32)
    assert f.ndim in (1, 2)
    upx, upy = _parse_scaling(up)
    downx, downy = _parse_scaling(down)
    px0, px1, py0, py1 = parse_padding(padding)

    # lhs_dilation yields in*up − (up−1); the contract zero-stuffs AFTER each
    # pixel (length in*up), so fold the missing trailing zeros into 'after' pad.
    py1_eff = py1 + (upy - 1)
    px1_eff = px1 + (upx - 1)

    # contract: f scaled by gain^(ndim/2) — a separable (1-D) filter is applied
    # twice, so each pass carries gain^(1/2); a full 2-D filter carries gain^1.
    # (Callers compensate zero-stuffing attenuation themselves, e.g.
    # `_filtered_lrelu_ref` passes gain=up².)
    f = f * (gain ** (f.ndim / 2.0))
    if not flip_filter:  # contract: False = convolution → pre-flip for XLA corr
        f = jnp.flip(f)

    if f.ndim == 2:
        fh, fw = f.shape
        _check_min_size(x, upx, upy, px0, px1, py0, py1, fw, fh)
        return _depthwise_conv(
            x, f, (upy, upx), (downy, downx), (py0, py1_eff, px0, px1_eff)
        )
    # separable: x-pass then y-pass (order immaterial; matches ref `:181-183`)
    taps = f.shape[0]
    _check_min_size(x, upx, upy, px0, px1, py0, py1, taps, taps)
    x = _depthwise_conv(x, f[None, :], (1, upx), (1, downx), (0, 0, px0, px1_eff))
    x = _depthwise_conv(x, f[:, None], (upy, 1), (downy, 1), (py0, py1_eff, 0, 0))
    return x


def _check_min_size(x, upx, upy, px0, px1, py0, py1, fw, fh):
    up_w = x.shape[2] * upx + px0 + px1
    up_h = x.shape[1] * upy + py0 + py1
    if up_w < fw or up_h < fh:
        raise ValueError(
            f"upsampled size ({up_h}, {up_w}) smaller than filter ({fh}, {fw})"
        )


def upfirdn2d_output_shape(in_h, in_w, f_shape, up=1, down=1, padding=0):
    """Output spatial dims per the contract (`upfirdn2d.py` docstring math)."""
    upx, upy = _parse_scaling(up)
    downx, downy = _parse_scaling(down)
    px0, px1, py0, py1 = parse_padding(padding)
    if f_shape is None:
        fh = fw = 1
    elif len(f_shape) == 1:
        fh = fw = f_shape[0]
    else:
        fh, fw = f_shape
    out_h = (in_h * upy + py0 + py1 - fh) // downy + 1
    out_w = (in_w * upx + px0 + px1 - fw) // downx + 1
    return out_h, out_w
