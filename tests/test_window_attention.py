"""Fused Pallas window attention (`ops/window_attention.py`) vs the XLA
einsum path — forward and gradients, kernel-level and through the full
scOT block stack (interpreter mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pregen_pde_tpu.ops.window_attention import window_attention


def _oracle(q, k, v, bias):
    """Pure-jnp reference: same math on the kernel's (nb, h, n, hd) layout."""
    nb = q.shape[0]
    nw = bias.shape[0]
    attn = jnp.einsum("bhnd,bhmd->bhnm", q, k)
    attn = attn + jnp.tile(bias, (nb // nw, 1, 1, 1))
    p = jax.nn.softmax(attn, axis=-1)
    return jnp.einsum("bhnm,bhmd->bhnd", p, v)


@pytest.mark.parametrize("nb,n,c,h,nw", [
    (8, 16, 8, 2, 4),    # stage-0-like: several windows per image
    (4, 64, 24, 3, 1),   # single window (bias shared by every row)
])
def test_kernel_matches_oracle_fwd_and_grads(nb, n, c, h, nw):
    rng = np.random.default_rng(0)
    hd = c // h
    q = jnp.asarray(rng.normal(size=(nb, h, n, hd)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(nb, h, n, hd)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(nb, h, n, hd)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(nw, h, n, n)).astype(np.float32))

    out = window_attention(q, k, v, bias)
    ref = _oracle(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-6, atol=2e-6)

    # cotangent-weighted scalar -> exercises every gradient path
    w = jnp.asarray(rng.normal(size=out.shape).astype(np.float32))

    def loss(fn):
        return lambda *a: jnp.sum(fn(*a) * w)

    g = jax.grad(loss(window_attention), argnums=(0, 1, 2, 3))(q, k, v, bias)
    gr = jax.grad(loss(_oracle), argnums=(0, 1, 2, 3))(q, k, v, bias)
    for name, a, b in zip("qkv bias".split() + ["bias"], g, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-6, atol=5e-6, err_msg=name)


def _small_scot(impl):
    from pregen_pde_tpu.models.scot import ScOT, ScOTConfig

    return ScOT(ScOTConfig(
        image_size=16, patch_size=2, num_channels=4, num_out_channels=2,
        embed_dim=8, depths=(2, 2), num_heads=(2, 4),
        skip_connections=(1, 0), window_size=4, attention_impl=impl,
    ))


def test_scot_fused_equals_xla():
    """Same params, same input: fused and xla attention must agree through
    the full model (incl. the shifted-window mask path — grid 8 > window 4
    makes every odd block shift) in forward AND parameter gradients."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 4)).astype(np.float32))
    t = jnp.asarray(rng.uniform(size=(2,)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(2, 16, 16, 2)).astype(np.float32))

    m_x = _small_scot("xla")
    m_f = _small_scot("fused")
    params = jax.jit(lambda key: m_x.init(key, x, t)["params"])(jax.random.key(0))

    out_x = m_x.apply({"params": params}, x, t)
    out_f = m_f.apply({"params": params}, x, t)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_x),
                               rtol=1e-5, atol=1e-5)

    def loss(m):
        return lambda p: jnp.mean((m.apply({"params": p}, x, t) - y) ** 2)

    gx = jax.grad(loss(m_x))(params)
    gf = jax.grad(loss(m_f))(params)
    flat_x = jax.tree_util.tree_leaves_with_path(gx)
    flat_f = jax.tree_util.tree_leaves_with_path(gf)
    assert len(flat_x) == len(flat_f)
    for (px, ax), (pf, af) in zip(flat_x, flat_f):
        assert px == pf
        np.testing.assert_allclose(
            np.asarray(af), np.asarray(ax), rtol=2e-4, atol=1e-6,
            err_msg=jax.tree_util.keystr(px))
