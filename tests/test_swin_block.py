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
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-3,
                                   atol=5e-5, err_msg=str(k))
    # d/dx too (the AR rollout path differentiates through inputs)
    dx_x = jax.grad(lambda xx: loss(xla, params, xx))(x)
    dx_f = jax.grad(lambda xx: loss(fused, params, xx))(x)
    np.testing.assert_allclose(np.asarray(dx_f), np.asarray(dx_x),
                               rtol=1e-3, atol=5e-5)


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
