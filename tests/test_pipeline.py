"""GPipe-style pipeline parallelism (`parallel/pipeline.py`) — forward and
gradients match the sequential stage composition, on the virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from pregen_pde_tpu.parallel.pipeline import (
    make_pp_mesh,
    pipeline_apply,
    stack_stage_params,
)


def _stage_fn(params, x):
    # shape-preserving residual block
    return x + jnp.tanh(x @ params["w"] + params["b"])


def _setup(n_stages=4, m=3, mb=2, d=8):
    rng = np.random.default_rng(0)
    per_stage = [
        {
            "w": jnp.asarray(rng.normal(size=(d, d)).astype(np.float32) * 0.3),
            "b": jnp.asarray(rng.normal(size=(d,)).astype(np.float32) * 0.1),
        }
        for _ in range(n_stages)
    ]
    x = jnp.asarray(rng.normal(size=(m, mb, d)).astype(np.float32))
    return per_stage, x


def _sequential(per_stage, x_mb):
    y = x_mb
    for p in per_stage:
        y = _stage_fn(p, y)
    return y


def test_pipeline_forward_matches_sequential():
    per_stage, x = _setup()
    mesh = make_pp_mesh(4)
    apply = pipeline_apply(_stage_fn, mesh)
    got = jax.jit(apply)(stack_stage_params(per_stage), x)
    want = _sequential(per_stage, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_pipeline_full_device_count():
    n = len(jax.devices())
    per_stage, x = _setup(n_stages=n, m=5)
    mesh = make_pp_mesh(n)
    apply = pipeline_apply(_stage_fn, mesh)
    got = jax.jit(apply)(stack_stage_params(per_stage), x)
    want = _sequential(per_stage, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_pipeline_gradients_match_sequential():
    per_stage, x = _setup()
    mesh = make_pp_mesh(4)
    apply = pipeline_apply(_stage_fn, mesh)
    stacked = stack_stage_params(per_stage)
    target = _sequential(per_stage, x) * 1.1

    def pp_loss(p):
        return jnp.mean((apply(p, x) - target) ** 2)

    def seq_loss(stacked_p):
        per = [
            jax.tree_util.tree_map(lambda l: l[i], stacked_p)
            for i in range(4)
        ]
        return jnp.mean((_sequential(per, x) - target) ** 2)

    g_pp = jax.jit(jax.grad(pp_loss))(stacked)
    g_seq = jax.jit(jax.grad(seq_loss))(stacked)
    for (ka, a), (kb, b) in zip(
        jax.tree_util.tree_flatten_with_path(g_pp)[0],
        jax.tree_util.tree_flatten_with_path(g_seq)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6, err_msg=str(ka)
        )
