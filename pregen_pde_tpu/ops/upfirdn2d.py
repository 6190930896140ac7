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


# ---------------------------------------------------------------------------
# MXU (matmul) lowering for separable filters
# ---------------------------------------------------------------------------
# A 1-D upfirdn along one axis is a linear map R^n_in → R^n_out; materializing
# it as a dense (n_in, n_out) matrix turns the whole pad/zero-stuff/FIR/
# decimate pipeline into ONE einsum on the MXU. On TPU this beats the
# depthwise-conv lowering by a wide margin (the conv path is VPU-bound and
# far off the bandwidth roofline); at n ≤ 512 the dense operator is small.
# Matrices are built host-side (numpy, exact reference semantics applied to
# the identity basis) and cached.

_MATRIX_CACHE: dict = {}


def _upfirdn1d_matrix(
    n_in: int, f: np.ndarray, up: int, down: int, p0: int, p1: int,
    flip_filter: bool, gain: float,
) -> np.ndarray:
    """(n_in, n_out) operator: columns are upfirdn applied to basis vectors."""
    f = np.asarray(f, np.float64) * (gain ** 0.5)  # separable: √gain per pass
    if not flip_filter:
        f = f[::-1]
    taps = f.shape[0]
    # basis rows processed together: zero-stuff the identity
    eye = np.eye(n_in)
    up_arr = np.zeros((n_in, n_in * up))
    up_arr[:, ::up] = eye
    # pad / crop
    up_arr = np.pad(up_arr, ((0, 0), (max(p0, 0), max(p1, 0))))
    up_arr = up_arr[:, max(-p0, 0): up_arr.shape[1] - max(-p1, 0)]
    # correlate with (possibly pre-flipped) f, 'valid'
    L = up_arr.shape[1]
    n_valid = L - taps + 1
    out = np.zeros((n_in, n_valid))
    for k in range(taps):
        out += f[k] * up_arr[:, k: k + n_valid]
    # decimate
    return np.ascontiguousarray(out[:, ::down]).astype(np.float32)


def _get_matrix(n_in, f, up, down, p0, p1, flip_filter, gain):
    key = (n_in, f.tobytes(), up, down, p0, p1, flip_filter, round(gain, 12))
    m = _MATRIX_CACHE.get(key)
    if m is None:
        m = _upfirdn1d_matrix(n_in, f, up, down, p0, p1, flip_filter, gain)
        _MATRIX_CACHE[key] = m
    return m


# ---------------------------------------------------------------------------
# Banded-blocked MXU lowering (large resolutions)
# ---------------------------------------------------------------------------
# The dense 1-D operator is BANDED: column j has ≤⌈taps/up⌉ nonzeros around
# row j·down/up. The dense einsum therefore wastes n_in/Bi of its FLOPs once
# n_in ≫ taps. Blocked form: split the output axis into blocks of Bo, gather
# the Bi-row input window each block actually touches, and contract with the
# per-block (Bi, Bo) slice of the dense matrix — a batched MXU matmul whose
# FLOPs scale as n_out·taps instead of n_out·n_in. Built numerically FROM the
# exact dense matrix, so pad/crop edge semantics are inherited, and windows
# are clamped to stay in bounds (edge blocks just see a few extra zero rows).

_BLOCK_CACHE: dict = {}


def _blocked_operator(n_in, f, up, down, p0, p1, flip_filter, gain,
                      block_out: int = 128):
    """→ (index (nJ, Bi) int32 gather rows, T (nJ, Bi, Bo) float32), or None
    when no useful blocking exists (tiny outputs or no divisor)."""
    key = ("blk", n_in, f.tobytes(), up, down, p0, p1, flip_filter,
           round(gain, 12), block_out)
    hit = _BLOCK_CACHE.get(key, "miss")
    if hit != "miss":
        return hit
    M = _upfirdn1d_matrix(n_in, f, up, down, p0, p1, flip_filter, gain)
    n_out = M.shape[1]
    bo = block_out
    n_blocks = -(-n_out // bo)  # ragged: last block zero-padded, then sliced
    result = None
    if n_blocks >= 2:
        Mp = np.pad(M, ((0, 0), (0, n_blocks * bo - n_out)))
        starts, widths = [], []
        for j in range(n_blocks):
            nz = np.nonzero(np.any(Mp[:, j * bo:(j + 1) * bo] != 0, axis=1))[0]
            if len(nz) == 0:
                starts.append(0)
                widths.append(1)
            else:
                starts.append(int(nz[0]))
                widths.append(int(nz[-1] - nz[0] + 1))
        bi = min(-(-max(widths) // 8) * 8, n_in)  # sublane-align the window
        if bi * 2 <= n_in:  # only worth it when ≥2x FLOP savings
            starts = np.asarray([min(s, n_in - bi) for s in starts], np.int64)
            t = np.stack(
                [Mp[s:s + bi, j * bo:(j + 1) * bo]
                 for j, s in enumerate(starts)]
            ).astype(np.float32)
            index = (starts[:, None] + np.arange(bi)[None, :]).astype(np.int32)
            result = (index, t, n_out)
    _BLOCK_CACHE[key] = result
    return result


def _apply_blocked_w(x, index, t, n_out):
    """x (B,H,W,C) → (B,H,n_out,C) via the blocked operator along W."""
    b, h, _, c = x.shape
    nj, bi, bo = t.shape
    xw = x[:, :, jnp.asarray(index), :]  # (B, H, nJ, Bi, C)
    y = jnp.einsum("bhjic,jio->bhjoc", xw, jnp.asarray(t, x.dtype),
                   precision=jax.lax.Precision.HIGH)
    return y.reshape(b, h, nj * bo, c)[:, :, :n_out, :]


def _apply_blocked_h(x, index, t, n_out):
    """x (B,H,W,C) → (B,n_out,W,C) via the blocked operator along H."""
    b, _, w, c = x.shape
    nj, bi, bo = t.shape
    xh = x[:, jnp.asarray(index), :, :]  # (B, nJ, Bi, W, C)
    y = jnp.einsum("bjiwc,jio->bjowc", xh, jnp.asarray(t, x.dtype),
                   precision=jax.lax.Precision.HIGH)
    return y.reshape(b, nj * bo, w, c)[:, :n_out, :, :]


# Measured on-chip (v5e, filtered_lrelu chain, f32): dense beats blocked at
# every size up to 1024² (256²: 3.9 vs 8.6 ms; 512²: 9.1 vs 23.5; 1024²:
# 16.4 vs 21.3) — the window gather plus small-K batched matmuls underuse
# the MXU more than the banded FLOP savings recover. `auto` therefore NEVER
# routes here; `impl="blocked"` stays available (tested, bit-equal) for
# hardware where gathers are cheaper. PERF.md roofline note has details.
_BLOCKED_MIN_OUT = None  # disabled: dense wins at all measured sizes


def _upfirdn2d_blocked(x, f_np, upx, upy, downx, downy, px0, px1, py0, py1,
                       flip_filter, gain):
    """Blocked pass per axis where profitable, dense einsum otherwise.
    Returns None if neither axis has a blocked form (caller falls back)."""
    bw = _blocked_operator(x.shape[2], f_np, upx, downx, px0, px1,
                           flip_filter, gain)
    if bw is not None:
        x = _apply_blocked_w(x, *bw)
    else:
        mw = _get_matrix(x.shape[2], f_np, upx, downx, px0, px1, flip_filter,
                         gain)
        x = jnp.einsum("bhwc,wo->bhoc", x, jnp.asarray(mw, x.dtype),
                       precision=jax.lax.Precision.HIGH)
    bh = _blocked_operator(x.shape[1], f_np, upy, downy, py0, py1,
                           flip_filter, gain)
    if bh is not None:
        x = _apply_blocked_h(x, *bh)
    else:
        mh = _get_matrix(x.shape[1], f_np, upy, downy, py0, py1, flip_filter,
                         gain)
        x = jnp.einsum("bhwc,ho->bowc", x, jnp.asarray(mh, x.dtype),
                       precision=jax.lax.Precision.HIGH)
    return x


def _upfirdn2d_matmul(x, f_np, upx, upy, downx, downy, px0, px1, py0, py1,
                      flip_filter, gain):
    mw = _get_matrix(x.shape[2], f_np, upx, downx, px0, px1, flip_filter, gain)
    mh = _get_matrix(x.shape[1], f_np, upy, downy, py0, py1, flip_filter, gain)
    mw_j = jnp.asarray(mw, x.dtype)
    mh_j = jnp.asarray(mh, x.dtype)
    # W pass: (B,H,W,C),(W,W') → (B,H,W',C); H pass analogous — MXU
    # contractions. Precision.HIGH (bf16x3 on TPU) keeps ~1e-5 relative
    # accuracy at ~1.2x less MXU time than HIGHEST; CPU (tests) is exact
    # either way.
    prec = jax.lax.Precision.HIGH
    x = jnp.einsum("bhwc,wo->bhoc", x, mw_j, precision=prec)
    x = jnp.einsum("bhwc,ho->bowc", x, mh_j, precision=prec)
    return x


def upfirdn2d(
    x: jax.Array,
    f: np.ndarray | jax.Array | None,
    up=1,
    down=1,
    padding=0,
    flip_filter: bool = False,
    gain: float = 1.0,
    impl: str = "auto",
) -> jax.Array:
    """Args mirror the reference op (`upfirdn2d.py:110-150`) except layout:
    ``x`` is float NHWC ``[batch, in_height, in_width, channels]``; ``f`` is a
    float32 ``[fh, fw]`` (full), ``[taps]`` (separable), or None (identity).
    Returns ``[batch, out_height, out_width, channels]``.
    """
    assert x.ndim == 4
    assert impl in ("auto", "conv", "matmul", "blocked")
    if f is None:
        f = jnp.ones((1, 1), jnp.float32)
    f_np = np.asarray(f, np.float32) if not isinstance(f, jax.core.Tracer) else None
    f = jnp.asarray(f, jnp.float32)
    assert f.ndim in (1, 2)
    upx, upy = _parse_scaling(up)
    downx, downy = _parse_scaling(down)
    px0, px1, py0, py1 = parse_padding(padding)

    # MXU paths: separable filter, concrete taps, static spatial dims
    if (
        impl in ("auto", "matmul", "blocked")
        and f.ndim == 1
        and f_np is not None
        and not isinstance(x.shape[1], jax.core.Tracer)
    ):
        taps = f_np.shape[0]
        _check_min_size(x, upx, upy, px0, px1, py0, py1, taps, taps)
        if impl == "blocked":
            return _upfirdn2d_blocked(
                x, f_np, upx, upy, downx, downy, px0, px1, py0, py1,
                flip_filter, gain,
            )
        return _upfirdn2d_matmul(
            x, f_np, upx, upy, downx, downy, px0, px1, py0, py1,
            flip_filter, gain,
        )
    if impl in ("matmul", "blocked"):
        raise ValueError(f"{impl} impl requires a concrete separable filter")

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
