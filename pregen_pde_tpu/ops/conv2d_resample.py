"""conv2d_resample — 2-D convolution with optional FIR up/downsampling.

Same capability as the reference `torch_utils/ops/conv2d_resample.py:39-134`
(conv2d_resample: pad once w.r.t. the upsampled image, upfirdn-upsample,
convolve, upfirdn-downsample). The reference carries five hand-ordered "fast
paths" (1x1-conv reordering, strided conv, transpose-conv folding) because
each torch op is a separate kernel launch; on TPU all orderings lower to the
same fused XLA program, so ONE generic composition — the reference's own
fallback path (`conv2d_resample.py:129-134`) — is the whole implementation.

Layout: NHWC activations, HWIO weights (kh, kw, in_ch // groups, out_ch).
The reference is NCHW / OIHW.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pregen_pde_tpu.ops.upfirdn2d import parse_padding, upfirdn2d


def _filter_size(f) -> tuple[int, int]:
    if f is None:
        return 1, 1
    if f.ndim == 1:
        return int(f.shape[0]), int(f.shape[0])
    return int(f.shape[1]), int(f.shape[0])  # (fw, fh)


def conv2d_resample(
    x: jax.Array,
    w: jax.Array,
    f=None,
    up: int = 1,
    down: int = 1,
    padding=0,
    groups: int = 1,
    flip_weight: bool = True,
    flip_filter: bool = False,
) -> jax.Array:
    """``x``: float NHWC; ``w``: HWIO ``[kh, kw, in_ch//groups, out_ch]``;
    ``f``: separable ``[taps]`` or full ``[fh, fw]`` float32 FIR filter (None =
    identity). ``padding`` is w.r.t. the upsampled image, applied once up
    front (contract: `conv2d_resample.py:44-59`). ``flip_weight=True`` means
    correlation (the torch-conv2d convention), False true convolution;
    ``flip_filter`` likewise for ``f``.
    """
    assert x.ndim == 4 and w.ndim == 4
    assert isinstance(up, int) and up >= 1
    assert isinstance(down, int) and down >= 1
    assert isinstance(groups, int) and groups >= 1
    kh, kw = int(w.shape[0]), int(w.shape[1])
    fw, fh = _filter_size(f)
    px0, px1, py0, py1 = parse_padding(padding)

    # Padding adjustment so the FIR stages keep the contract's output-size
    # arithmetic (`conv2d_resample.py:73-84`).
    if up > 1:
        px0 += (fw + up - 1) // 2
        px1 += (fw - up) // 2
        py0 += (fh + up - 1) // 2
        py1 += (fh - up) // 2
    if down > 1:
        px0 += (fw - down + 1) // 2
        px1 += (fw - down) // 2
        py0 += (fh - down + 1) // 2
        py1 += (fh - down) // 2

    x = upfirdn2d(
        x,
        f if up > 1 else None,
        up=up,
        padding=[px0, px1, py0, py1],
        gain=up**2,
        flip_filter=flip_filter,
    )
    ww = w if flip_weight else jnp.flip(w, axis=(0, 1))
    x = jax.lax.conv_general_dilated(
        x,
        ww.astype(x.dtype),
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    if down > 1:
        x = upfirdn2d(x, f, down=down, flip_filter=flip_filter)
    return x
