"""Tensor-parallel (channel-sharded) training step — correctness vs the
single-device run, on the 8-virtual-CPU-device mesh (conftest)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from pregen_pde_tpu.models.fno import FNO2d
from pregen_pde_tpu.parallel.tensor_parallel import (
    channel_sharded_params,
    data_sharding,
    make_tp_mesh,
    make_tp_train_step,
    shard_params,
)
from pregen_pde_tpu.training.losses import relative_lp_loss


def _setup(width=16):
    model = FNO2d(out_channels=3, modes=6, width=width, n_layers=2,
                  append_grid=False)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(8, 16, 16, 4)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(8, 16, 16, 3)).astype(np.float32))
    params = model.init(jax.random.key(0), x)["params"]
    return model, params, {"input": x, "label": y}


def test_channel_sharding_rules():
    mesh = make_tp_mesh(2, 4)
    model, params, _ = _setup(width=16)
    sh = channel_sharded_params(params, mesh)
    # spectral weights shard on the output-channel (last) axis
    spec = sh["SpectralConv2d_0"]["w_pos_re"].spec
    assert spec == P(None, None, None, "model")
    # lift Dense kernel shards on out-channels
    assert sh["Dense_0"]["kernel"].spec == P(None, "model")
    # final projection head (out=3, not divisible by 4) stays replicated
    assert sh["Dense_4"]["kernel"].spec == P()
    assert sh["Dense_4"]["bias"].spec == P()


@pytest.mark.parametrize("n_data,n_model", [(2, 4), (1, 8)])
def test_tp_train_step_matches_single_device(n_data, n_model):
    model, params, batch = _setup(width=16)
    tx = optax.adamw(1e-3)

    def loss_fn(p, b):
        pred = model.apply({"params": p}, b["input"])
        return relative_lp_loss(pred, b["label"])

    # single-device reference
    def ref_step(p, s, b):
        loss, grads = jax.value_and_grad(loss_fn)(p, b)
        upd, s = tx.update(grads, s, p)
        return optax.apply_updates(p, upd), s, loss

    p_ref, s_ref, loss_ref = jax.jit(ref_step)(params, tx.init(params), batch)

    # TP run
    mesh = make_tp_mesh(n_data, n_model)
    p_tp = shard_params(params, mesh)
    opt0 = tx.init(params)
    s_tp = jax.device_put(opt0, channel_sharded_params(opt0, mesh))
    b_tp = {
        k: jax.device_put(v, data_sharding(mesh, v.ndim))
        for k, v in batch.items()
    }
    step = make_tp_train_step(loss_fn, tx, mesh)
    p_out, s_out, loss_tp = step(p_tp, s_tp, b_tp)

    np.testing.assert_allclose(float(loss_tp), float(loss_ref), rtol=1e-5)
    for (ka, a), (kb, b) in zip(
        jax.tree_util.tree_flatten_with_path(p_out)[0],
        jax.tree_util.tree_flatten_with_path(p_ref)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5,
            err_msg=str(ka),
        )


def test_tp_cno_forward_matches_single_device():
    """Channel TP generalizes to the flagship CNO (conv kernels, FILM MLPs):
    sharded forward == replicated forward."""
    from pregen_pde_tpu.models.cno import CNO

    model = CNO(in_size=16, out_dim=3, n_layers=1, n_res=1, n_res_neck=1,
                channel_multiplier=8)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(4, 16, 16, 7)).astype(np.float32))
    t = jnp.asarray(rng.uniform(size=(4,)).astype(np.float32))
    params = model.init(jax.random.key(0), x, t)["params"]

    want = jax.jit(lambda p: model.apply({"params": p}, x, t))(params)

    mesh = make_tp_mesh(2, 4)
    p_tp = shard_params(params, mesh)
    x_tp = jax.device_put(x, data_sharding(mesh, 4))
    t_tp = jax.device_put(t, data_sharding(mesh, 1))
    got = jax.jit(lambda p, xx, tt: model.apply({"params": p}, xx, tt))(
        p_tp, x_tp, t_tp
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
