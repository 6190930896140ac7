"""filtered_lrelu — fused anti-aliased leaky ReLU, TPU-native.

Op contract identical to the reference CUDA mega-kernel
(`torch_utils/ops/filtered_lrelu.cu:131-132`, semantics documented at
`filtered_lrelu.py:49-102`, reference path `:113-145`): per channel,

  1. add bias,  2. zero-stuff upsample ×up,  3. pad (neg = crop),
  4. FIR filter `fu`,  5. ×gain,  6. leaky-ReLU(slope),  7. clamp,
  8. FIR filter `fd`,  9. decimate ×down.

TPU-first rationale: the reference needs a 1276-line hand-tuned CUDA kernel
plus a bit-packed sign buffer to make this memory-efficient; on TPU the whole
pipeline lowers to two depthwise convolutions (MXU/VPU-tiled by the XLA conv
emitter) with the bias/lrelu/clamp fused into their epilogues, and the
backward pass is XLA's conv-transpose — same math as the reference's
swapped-filter gradient trick (`filtered_lrelu.py:230-260`) derived
automatically at arbitrary order.

Layout: NHWC.
"""

from __future__ import annotations

import jax
import numpy as np

from pregen_pde_tpu.ops.bias_act import bias_act
from pregen_pde_tpu.ops.upfirdn2d import (
    parse_padding,
    upfirdn2d,
    upfirdn2d_output_shape,
)


def _filter_size(f) -> tuple[int, int]:
    if f is None:
        return 1, 1
    if f.ndim == 1:
        return int(f.shape[0]), int(f.shape[0])
    return int(f.shape[1]), int(f.shape[0])  # (fw, fh)


def filtered_lrelu(
    x: jax.Array,
    fu=None,
    fd=None,
    b: jax.Array | None = None,
    up: int = 1,
    down: int = 1,
    padding=0,
    gain: float = float(np.sqrt(2)),
    slope: float = 0.2,
    clamp: float | None = None,
    flip_filter: bool = False,
) -> jax.Array:
    """x: float NHWC [batch, H, W, C]; fu/fd: float32 [taps] (separable),
    [fh, fw] (full), or None; b: [C] bias. Returns NHWC."""
    assert x.ndim == 4
    fu_w, fu_h = _filter_size(fu)
    fd_w, fd_h = _filter_size(fd)
    assert isinstance(up, int) and up >= 1
    assert isinstance(down, int) and down >= 1
    px0, px1, py0, py1 = parse_padding(padding)
    assert slope >= 0.0 and gain > 0.0

    batch, in_h, in_w, ch = x.shape
    out_w = (in_w * up + (px0 + px1) - (fu_w - 1) - (fd_w - 1) + (down - 1)) // down
    out_h = (in_h * up + (py0 + py1) - (fu_h - 1) - (fd_h - 1) + (down - 1)) // down

    x = bias_act(x, b, dim=-1)  # bias only (linear act)
    x = upfirdn2d(
        x, fu, up=up, padding=[px0, px1, py0, py1], gain=up**2,
        flip_filter=flip_filter,
    )
    x = bias_act(x, act="lrelu", alpha=slope, gain=gain, clamp=clamp)
    x = upfirdn2d(x, fd, down=down, flip_filter=flip_filter)

    assert x.shape == (batch, out_h, out_w, ch), (x.shape, (batch, out_h, out_w, ch))
    return x
