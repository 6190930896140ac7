"""Fused whole-Swin-block kernel (`ops/swin_block.py`) vs the XLA layer.

The fused path must be a drop-in lowering of `SwinLayerV2`: identical
parameter tree (same names/shapes/inits — one checkpoint serves both) and
the same function (forward + gradients). CPU runs the kernel in interpreter
mode, so comparisons here are arithmetic-faithful."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pregen_pde_tpu.models.scot import SwinLayerV2


def _mk(impl, shift, use_conditioning=True, c=32, heads=4, ws=4):
    return SwinLayerV2(dim=c, num_heads=heads, window_size=ws, shift=shift,
                       use_conditioning=use_conditioning,
                       block_impl=impl)


def _data(b=2, hw=8, c=32, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(b, hw, hw, c)).astype(np.float32))
    t = jnp.asarray(rng.uniform(0.1, 1.0, (b,)).astype(np.float32))
    return x, t


@pytest.mark.parametrize("shift", [False, True])
@pytest.mark.parametrize("use_conditioning", [True, False])
def test_fused_block_matches_xla(shift, use_conditioning):
    x, t = _data()
    xla = _mk("xla", shift, use_conditioning)
    fused = _mk("fused", shift, use_conditioning)
    p_xla = xla.init(jax.random.key(7), x, t)["params"]
    p_fused = fused.init(jax.random.key(7), x, t)["params"]

    # identical parameter trees: same paths, same shapes, same init values
    flat_x = jax.tree_util.tree_leaves_with_path(p_xla)
    flat_f = jax.tree_util.tree_leaves_with_path(p_fused)
    assert [k for k, _ in flat_x] == [k for k, _ in flat_f]
    for (k, a), (_, b) in zip(flat_x, flat_f):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(k))

    y_xla = xla.apply({"params": p_xla}, x, t)
    y_fused = fused.apply({"params": p_xla}, x, t)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_xla),
                               rtol=2e-5, atol=2e-5)


def test_fused_block_gradients_match():
    x, t = _data()
    xla = _mk("xla", True)
    fused = _mk("fused", True)
    params = xla.init(jax.random.key(3), x, t)["params"]

    def loss(mod, p, xx):
        y = mod.apply({"params": p}, xx, t)
        return jnp.sum(y * y)

    lx, gx = jax.value_and_grad(lambda p: loss(xla, p, x))(params)
    lf, gf = jax.value_and_grad(lambda p: loss(fused, p, x))(params)
    np.testing.assert_allclose(float(lf), float(lx), rtol=1e-5)
    for (k, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(gx),
                              jax.tree_util.tree_leaves_with_path(gf)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=5e-3,
                                   atol=1e-4, err_msg=str(k))
    # d/dx too (the AR rollout path differentiates through inputs)
    dx_x = jax.grad(lambda xx: loss(xla, params, xx))(x)
    dx_f = jax.grad(lambda xx: loss(fused, params, xx))(x)
    np.testing.assert_allclose(np.asarray(dx_f), np.asarray(dx_x),
                               rtol=5e-3, atol=1e-4)


def test_full_scot_fused_matches_default():
    """End-to-end: a small full ScOT with block_impl='fused' reproduces the
    default lowering on the same params (stage dims ≤ MAX_FUSED_DIM here, so
    every layer takes the fused path)."""
    from pregen_pde_tpu.models.scot import ScOT, ScOTConfig

    kw = dict(image_size=16, patch_size=2, num_channels=4,
              num_out_channels=2, embed_dim=16, depths=(1, 1),
              num_heads=(2, 4), skip_connections=(2, 0), window_size=4)
    base = ScOT(ScOTConfig(**kw))
    fused = ScOT(ScOTConfig(**kw, block_impl="fused"))
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 4)).astype(np.float32))
    t = jnp.asarray(rng.uniform(0.1, 1.0, (2,)).astype(np.float32))
    p = jax.jit(lambda r: base.init(r, x, t)["params"])(jax.random.key(0))
    y0 = base.apply({"params": p}, x, t)
    y1 = fused.apply({"params": p}, x, t)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=3e-5, atol=3e-5)


@pytest.mark.parametrize("nw_shift", [1, 4])
def test_fused_backward_kernel_matches_reference_vjp(nw_shift):
    """The fused backward KERNEL (`_fused_bwd_call`) against jax.vjp of the
    jnp reference on identical packed operands — per-gradient-leaf, tight
    tolerance (same math, same matmul granularity). Covers both the shared
    (nw=1) and per-window (nw=4, shift-mask) bias accumulation orders."""
    import pregen_pde_tpu.ops.swin_block as sb

    rng = np.random.default_rng(5)
    b, hw, c, heads, ws = 2, 8, 32, 4, 4
    n = ws * ws
    hd = c // heads
    nw = nw_shift
    mk = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.1)
    x = mk(b, hw, hw, c) * 10
    bias = mk(nw, heads, n, n) * 10
    scale = jnp.asarray(rng.uniform(1, 3, (heads,)).astype(np.float32))
    args = (x, bias, scale, mk(heads, c, hd), mk(heads, 1, hd),
            mk(heads, c, hd), mk(heads, c, hd), mk(heads, 1, hd),
            mk(heads, hd, c), mk(1, c), mk(b, c) + 1, mk(b, c),
            mk(c, 4 * c), mk(1, 4 * c), mk(4 * c, c), mk(1, c),
            mk(b, c) + 1, mk(b, c),
            jnp.asarray(rng.uniform(0.5, 1.5, (b, 2)).astype(np.float32)))
    g = mk(b, hw, hw, c) * 10

    _, vjp = jax.vjp(lambda *a: sb._ref_on_args(a, heads, ws, 1e-5), *args)
    ref = vjp(g)
    fused = sb._fused_bwd_call(args, g, heads, ws, 1e-5, True)
    names = ("dx dbias dscale dwq dbq dwk dwv dbv dwp dbp dln1w dln1b "
             "dw1 db1 dw2 db2 dln2w dln2b ddp").split()
    for nm, a, f in zip(names, ref, fused):
        np.testing.assert_allclose(np.asarray(f), np.asarray(a), rtol=2e-4,
                                   atol=5e-5, err_msg=nm)
