"""Golden-value tests of the TPU ops against an independent numpy oracle
implementing the documented reference semantics
(`torch_utils/ops/upfirdn2d.py:110-150`, `filtered_lrelu.py:49-102`)."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.signal

from pregen_pde_tpu.ops.bias_act import bias_act
from pregen_pde_tpu.ops.filter_design import design_lowpass_filter, setup_filter
from pregen_pde_tpu.ops.filtered_lrelu import filtered_lrelu
from pregen_pde_tpu.ops.upfirdn2d import upfirdn2d, upfirdn2d_output_shape


# ---------------------------------------------------------------------------
# numpy oracle (loops + scipy, no shared code with the jax implementation)
# ---------------------------------------------------------------------------
def np_upfirdn2d(x, f, up=1, down=1, padding=0, flip_filter=False, gain=1.0):
    upx = upy = up if isinstance(up, int) else None
    if upx is None:
        upx, upy = up
    downx = downy = down if isinstance(down, int) else None
    if downx is None:
        downx, downy = down
    if isinstance(padding, int):
        px0 = px1 = py0 = py1 = padding
    elif len(padding) == 2:
        px0 = px1 = padding[0]
        py0 = py1 = padding[1]
    else:
        px0, px1, py0, py1 = padding

    if f is None:
        f2 = np.ones((1, 1), np.float64)
    elif f.ndim == 1:
        f2 = np.outer(f, f).astype(np.float64)
    else:
        f2 = f.astype(np.float64)
    f2 = f2 * gain  # total gain (ndim/2 per separable pass ≡ 1.0 for the product)

    B, H, W, C = x.shape
    # zero-stuff (zeros AFTER each pixel → length H*upy)
    up_arr = np.zeros((B, H * upy, W * upx, C), np.float64)
    up_arr[:, ::upy, ::upx, :] = x
    # pad / crop
    up_arr = np.pad(
        up_arr,
        ((0, 0), (max(py0, 0), max(py1, 0)), (max(px0, 0), max(px1, 0)), (0, 0)),
    )
    up_arr = up_arr[
        :,
        max(-py0, 0) : up_arr.shape[1] - max(-py1, 0),
        max(-px0, 0) : up_arr.shape[2] - max(-px1, 0),
        :,
    ]
    # filter
    conv = scipy.signal.correlate2d if flip_filter else scipy.signal.convolve2d
    out = np.stack(
        [
            np.stack([conv(up_arr[b, :, :, c], f2, mode="valid") for c in range(C)], -1)
            for b in range(B)
        ],
        0,
    )
    # decimate
    return out[:, ::downy, ::downx, :]


def np_filtered_lrelu(x, fu, fd, b, up, down, padding, gain, slope, clamp):
    if b is not None:
        x = x + b.reshape(1, 1, 1, -1)
    x = np_upfirdn2d(x, fu, up=up, padding=padding, gain=up**2)
    x = np.where(x >= 0, x, slope * x) * gain
    if clamp is not None:
        x = np.clip(x, -clamp, clamp)
    return np_upfirdn2d(x, fd, down=down)


def _rand(shape, seed):
    return np.random.default_rng(seed).normal(size=shape).astype(np.float64)


def test_upfirdn2d_identity():
    x = _rand((2, 5, 7, 3), 0)
    out = np.asarray(upfirdn2d(jnp.asarray(x), None))
    np.testing.assert_allclose(out, x, atol=1e-12)


def test_upfirdn2d_full_filter_matches_oracle():
    x = _rand((2, 8, 9, 3), 1)
    f = _rand((4, 3), 2).astype(np.float32)  # asymmetric, non-separable
    for flip in (False, True):
        for pad in (0, 2, [1, 3, 2, 0]):
            ours = np.asarray(
                upfirdn2d(jnp.asarray(x), jnp.asarray(f), padding=pad, flip_filter=flip)
            )
            ref = np_upfirdn2d(x, f, padding=pad, flip_filter=flip)
            np.testing.assert_allclose(ours, ref, atol=1e-6, err_msg=f"{flip} {pad}")


def test_upfirdn2d_up_down_gain():
    x = _rand((1, 6, 6, 2), 3)
    f = design_lowpass_filter(8, cutoff=0.25, width=0.25, fs=2.0)
    for up, down, pad, gain in [(2, 1, 4, 4.0), (1, 2, 3, 1.0), (2, 2, 5, 2.0)]:
        ours = np.asarray(
            upfirdn2d(jnp.asarray(x), jnp.asarray(f), up=up, down=down, padding=pad, gain=gain)
        )
        ref = np_upfirdn2d(x, f, up=up, down=down, padding=pad, gain=gain)
        np.testing.assert_allclose(ours, ref, atol=1e-6)
        oh, ow = upfirdn2d_output_shape(6, 6, f.shape, up=up, down=down, padding=pad)
        assert ours.shape == (1, oh, ow, 2)


def test_upfirdn2d_negative_padding_crops():
    x = _rand((1, 8, 8, 1), 4)
    f = _rand((3, 3), 5).astype(np.float32)
    ours = np.asarray(upfirdn2d(jnp.asarray(x), jnp.asarray(f), padding=[-1, -2, -1, 0]))
    ref = np_upfirdn2d(x, f, padding=[-1, -2, -1, 0])
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_bias_act_table():
    x = jnp.asarray(_rand((2, 4, 4, 3), 6))
    b = jnp.asarray(_rand((3,), 7))
    out = np.asarray(bias_act(x, b, act="lrelu"))
    xb = np.asarray(x) + np.asarray(b).reshape(1, 1, 1, 3)
    ref = np.where(xb >= 0, xb, 0.2 * xb) * np.sqrt(2)
    np.testing.assert_allclose(out, ref, atol=1e-6)
    # clamp + custom gain
    out2 = np.asarray(bias_act(x, act="linear", gain=3.0, clamp=0.5))
    np.testing.assert_allclose(out2, np.clip(np.asarray(x) * 3.0, -0.5, 0.5), atol=1e-6)


def test_filtered_lrelu_matches_oracle():
    x = _rand((2, 8, 8, 4), 8)
    b = _rand((4,), 9)
    fu = design_lowpass_filter(12, cutoff=0.5, width=0.4, fs=4.0)
    fd = design_lowpass_filter(12, cutoff=0.5, width=0.4, fs=4.0)
    for up, down, pad, clamp in [(2, 2, 11, None), (2, 1, 6, 0.8), (1, 2, 12, None)]:
        ours = np.asarray(
            filtered_lrelu(
                jnp.asarray(x), jnp.asarray(fu), jnp.asarray(fd), jnp.asarray(b),
                up=up, down=down, padding=pad, clamp=clamp,
            )
        )
        ref = np_filtered_lrelu(
            x, fu, fd, b, up, down, pad, gain=np.sqrt(2), slope=0.2, clamp=clamp
        )
        np.testing.assert_allclose(ours, ref, atol=1e-6, err_msg=f"{up} {down}")


def test_filtered_lrelu_grad_finite_and_correct():
    x = jnp.asarray(_rand((1, 6, 6, 2), 10))
    fu = jnp.asarray(design_lowpass_filter(8, 0.5, 0.4, 4.0))

    def loss(x):
        return jnp.sum(filtered_lrelu(x, fu, fu, up=2, down=2, padding=7) ** 2)

    g = jax.grad(loss)(x)
    assert np.all(np.isfinite(np.asarray(g)))
    # finite-difference check on one element
    eps = 1e-5
    x0 = np.asarray(x, np.float64)
    xp = x0.copy()
    xp[0, 3, 3, 1] += eps
    xm = x0.copy()
    xm[0, 3, 3, 1] -= eps
    fd_val = (float(loss(jnp.asarray(xp))) - float(loss(jnp.asarray(xm)))) / (2 * eps)
    np.testing.assert_allclose(float(g[0, 3, 3, 1]), fd_val, rtol=1e-4)


def test_setup_filter_conventions():
    # <8 taps → auto non-separable (outer product) per the reference convention
    f = setup_filter([1, 3, 3, 1])
    assert f.ndim == 2 and np.isclose(f.sum(), 1.0)
    f2 = setup_filter(np.ones(8))
    assert f2.ndim == 1  # >=8 taps stays separable
    f3 = setup_filter(np.ones((3, 3)), gain=4.0)
    assert f3.ndim == 2 and np.isclose(f3.sum(), 4.0)


def test_matmul_path_matches_conv_path():
    """The MXU matmul lowering equals the conv lowering for separable filters
    (all up/down/pad/flip/gain combinations)."""
    x = jnp.asarray(_rand((2, 12, 10, 3), 20), jnp.float32)
    f = design_lowpass_filter(8, 0.3, 0.3, 2.0)
    for up, down, pad, flip, gain in [
        (2, 1, 4, False, 4.0), (1, 2, 4, True, 1.0), (2, 2, 7, False, 2.0),
        (1, 1, 4, True, 1.5),
    ]:
        a = upfirdn2d(x, f, up=up, down=down, padding=pad, flip_filter=flip,
                      gain=gain, impl="conv")
        b = upfirdn2d(x, f, up=up, down=down, padding=pad, flip_filter=flip,
                      gain=gain, impl="matmul")
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5,
            err_msg=f"{up} {down} {pad} {flip} {gain}",
        )


def test_blocked_path_matches_matmul_path():
    """The banded-blocked lowering (large-resolution MXU path) equals the
    dense matmul lowering bit-for-bit in f64 semantics (same operator matrix,
    gathered windows) across up/down/pad/flip/gain and ragged sizes."""
    f = design_lowpass_filter(12, 0.35, 0.3, 2.0)
    for shape, up, down, pad, flip, gain in [
        ((2, 64, 64, 3), 2, 1, 5, False, 4.0),
        ((2, 64, 48, 3), 1, 2, 5, True, 1.0),
        ((1, 96, 96, 2), 2, 2, 7, False, 2.0),
        ((2, 60, 60, 3), 2, 1, 5, False, 4.0),  # odd n_out → partial fallback
    ]:
        x = jnp.asarray(_rand(shape, 21), jnp.float32)
        a = upfirdn2d(x, f, up=up, down=down, padding=pad, flip_filter=flip,
                      gain=gain, impl="matmul")
        b = upfirdn2d(x, f, up=up, down=down, padding=pad, flip_filter=flip,
                      gain=gain, impl="blocked")
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5,
            err_msg=f"{shape} {up} {down} {pad} {flip} {gain}",
        )


def test_blocked_operator_and_gradients():
    """The blocked operator is well-formed (narrow in-bounds windows) and
    gradients flow (gather + einsum are linear, XLA differentiates exactly).
    Note `auto` never routes here — dense measured faster at all sizes on
    TPU (see PERF.md); `blocked` is explicit-opt-in only."""
    from pregen_pde_tpu.ops.upfirdn2d import _BLOCKED_MIN_OUT, _blocked_operator

    f = design_lowpass_filter(12, 0.35, 0.3, 2.0)
    # the blocked operator exists and the window is much narrower than n_in
    blk = _blocked_operator(512, np.asarray(f, np.float32), 2, 1, 5, 5,
                            False, 4.0)
    assert blk is not None
    index, t, n_out = blk
    assert n_out == 512 * 2 + 10 - 12 + 1
    assert t.shape[1] * 2 <= 512 and t.shape[1] >= 12
    assert index.max() < 512 and index.min() >= 0
    assert _BLOCKED_MIN_OUT is None  # auto-routing disabled by measurement

    x = jnp.asarray(_rand((1, 48, 48, 2), 22), jnp.float32)

    def loss(xx, impl):
        return jnp.sum(upfirdn2d(xx, f, up=2, padding=5, gain=4.0,
                                 impl=impl) ** 2)

    ga = jax.grad(lambda xx: loss(xx, "matmul"))(x)
    gb = jax.grad(lambda xx: loss(xx, "blocked"))(x)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), atol=1e-3)


def test_filtered_lrelu_blocked_consistency():
    """The decomposed blocked pipeline matches filtered_lrelu (dense/auto)
    at a large-resolution CNO same-size config."""
    from pregen_pde_tpu.ops.filtered_lrelu import filtered_lrelu
    from pregen_pde_tpu.ops.bias_act import bias_act
    from pregen_pde_tpu.ops.upfirdn2d import upfirdn2d as _ufd

    x = jnp.asarray(_rand((1, 300, 300, 2), 23), jnp.float32)
    fu = design_lowpass_filter(12, 0.35, 0.3, 2.0)
    fd = design_lowpass_filter(12, 0.35, 0.3, 2.0)
    # padding chosen so out = in (the CNO same-size config)
    pad = 10
    a = filtered_lrelu(x, fu, fd, up=2, down=2, padding=pad)
    y = bias_act(x, None, dim=-1)
    y = _ufd(y, fu, up=2, padding=pad, gain=4, impl="blocked")
    y = bias_act(y, act="lrelu", alpha=0.2, gain=float(np.sqrt(2)))
    y = _ufd(y, fd, down=2, impl="blocked")
    np.testing.assert_allclose(np.asarray(a), np.asarray(y), atol=2e-4)


# ---------------------------------------------------------------------------
# conv2d_resample (reference torch_utils/ops/conv2d_resample.py:39-134)
# ---------------------------------------------------------------------------
def np_conv2d_resample(x, w, f=None, up=1, down=1, padding=0, groups=1,
                       flip_weight=True, flip_filter=False):
    kh, kw = w.shape[0], w.shape[1]
    if f is None:
        fw = fh = 1
    elif f.ndim == 1:
        fw = fh = f.shape[0]
    else:
        fh, fw = f.shape
    if isinstance(padding, int):
        px0 = px1 = py0 = py1 = padding
    else:
        px0, px1, py0, py1 = padding
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
    x = np_upfirdn2d(x, f if up > 1 else None, up=up,
                     padding=[px0, px1, py0, py1], gain=up**2,
                     flip_filter=flip_filter)
    B, H, W, Cin = x.shape
    Cout = w.shape[3]
    cpg, opg = Cin // groups, Cout // groups
    out = np.zeros((B, H - kh + 1, W - kw + 1, Cout), np.float64)
    op = scipy.signal.correlate2d if flip_weight else scipy.signal.convolve2d
    for b in range(B):
        for g in range(groups):
            for oc in range(opg):
                for ic in range(cpg):
                    out[b, :, :, g * opg + oc] += op(
                        x[b, :, :, g * cpg + ic], w[:, :, ic, g * opg + oc],
                        mode="valid",
                    )
    if down > 1:
        out = np_upfirdn2d(out, f, down=down, flip_filter=flip_filter)
    return out


def test_conv2d_resample_matches_oracle():
    from pregen_pde_tpu.ops.conv2d_resample import conv2d_resample

    f = design_lowpass_filter(4, 0.4, 0.4, 2.0)
    for up, down, k, pad, groups, flip_w in [
        (1, 1, 3, 1, 1, True),
        (2, 1, 3, 0, 1, True),
        (1, 2, 1, 0, 2, True),
        (2, 2, 3, 2, 1, False),
        (1, 1, 1, 0, 4, True),
    ]:
        cin, cout = 4, 8
        x = _rand((2, 10, 12, cin), seed=up * 100 + down * 10 + k)
        w = _rand((k, k, cin // groups, cout), seed=k) * 0.3
        got = conv2d_resample(jnp.asarray(x), jnp.asarray(w), f, up=up,
                              down=down, padding=pad, groups=groups,
                              flip_weight=flip_w)
        want = np_conv2d_resample(x, w, np.asarray(f), up=up, down=down,
                                  padding=pad, groups=groups,
                                  flip_weight=flip_w)
        # the FIR stages run through f32 operator matrices → ~1e-7 abs noise
        np.testing.assert_allclose(
            np.asarray(got), want, atol=1e-5,
            err_msg=f"up={up} down={down} k={k} pad={pad} g={groups}",
        )


def test_conv2d_resample_grad_finite():
    from pregen_pde_tpu.ops.conv2d_resample import conv2d_resample

    f = design_lowpass_filter(4, 0.4, 0.4, 2.0)
    x = jnp.asarray(_rand((1, 8, 8, 2), 3))
    w = jnp.asarray(_rand((3, 3, 2, 4), 4)) * 0.3

    def loss(x, w):
        return jnp.sum(conv2d_resample(x, w, f, up=2, down=2, padding=1) ** 2)

    gx, gw = jax.grad(loss, argnums=(0, 1))(x, w)
    assert np.isfinite(np.asarray(gx)).all() and np.isfinite(np.asarray(gw)).all()
