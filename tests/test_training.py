import numpy as np

from pregen_pde_tpu.training.datasets import (
    BatchLoader,
    TimePairConfig,
    TimePairDataset,
    build_time_indices,
    compute_stats,
    make_mixed_datasets,
)
from pregen_pde_tpu.training.losses import (
    grouped_relative_lp_loss,
    masked_mse,
    relative_lp_loss,
)

import jax.numpy as jnp


def _fake_data(n=12, t=5, hw=8, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(n, t, hw, hw, 6)).astype(np.float32)
    d[..., 4] = 0.0
    d[..., 5] = 1.0
    return d


def test_time_indices_transitions():
    # allowed_transitions=[1,2]: all (i,j) with j-i in {1,2}
    cfg = TimePairConfig(max_num_time_steps=4, time_step_size=1,
                         allowed_transitions=[1, 2])
    idx = build_time_indices(cfg)
    assert (0, 1) in idx and (0, 2) in idx and (2, 4) in idx
    assert (0, 3) not in idx and (0, 0) not in idx
    # None → t1 fixed at 0 incl. (0,0)
    cfg2 = TimePairConfig(max_num_time_steps=4, allowed_transitions=None)
    idx2 = build_time_indices(cfg2)
    assert idx2 == [(0, 0), (0, 1), (0, 2), (0, 3), (0, 4)]


def test_dataset_item_semantics():
    data = _fake_data()
    cfg = TimePairConfig(max_num_time_steps=4, allowed_transitions=[1],
                         n_val=2, n_test=2, time_input=True)
    ds = TimePairDataset(data, cfg, "train", num_trajectories=8)
    assert len(ds) == 8 * 4  # 4 transitions of size 1
    time, inp, lab = ds[0]
    assert inp.shape == (8, 8, 7)  # 6 + time channel
    assert lab.shape == (8, 8, 3)
    np.testing.assert_allclose(time, 1 / 19.0, rtol=1e-6)
    np.testing.assert_allclose(inp[..., 6], 1 / 19.0, rtol=1e-6)
    # normalization: reconstructed label must equal raw data
    raw = ds.data[0, 1, :, :, :3]
    np.testing.assert_allclose(lab * ds.std + ds.mean, raw, rtol=1e-4, atol=1e-5)
    # splits
    val = TimePairDataset(data, cfg, "val", mean=ds.mean, std=ds.std)
    test = TimePairDataset(data, cfg, "test", mean=ds.mean, std=ds.std)
    assert val.start == 8 and val.n_traj == 2
    assert test.start == 10 and test.n_traj == 2


def test_streaming_stats_match_global():
    a, b = _fake_data(seed=1), _fake_data(seed=2)
    mean, std = compute_stats([a, b])
    both = np.concatenate([a, b])[..., :3].reshape(-1, 3)
    np.testing.assert_allclose(mean, both.mean(0), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(std, both.std(0), rtol=1e-4)


def test_mixing_alpha_split():
    hard, easy = _fake_data(seed=3), _fake_data(seed=4)
    cfg = TimePairConfig(max_num_time_steps=4, allowed_transitions=[1],
                         n_val=2, n_test=2)
    train, vh, ve, th, te = make_mixed_datasets(hard, easy, alpha=0.25,
                                                total_trajectories=8, cfg=cfg)
    # 2 hard + 6 easy trajectories × 4 pairs
    assert len(train) == 8 * 4
    assert train.parts[0].n_traj == 2 and train.parts[1].n_traj == 6
    # alpha=0 → all easy
    tr0, *_ = make_mixed_datasets(hard, easy, 0.0, 8, cfg)
    assert len(tr0.parts) == 1 and tr0.parts[0].n_traj == 8


def test_batch_loader():
    data = _fake_data()
    cfg = TimePairConfig(max_num_time_steps=4, allowed_transitions=[1],
                         n_val=2, n_test=2)
    ds = TimePairDataset(data, cfg, "train", num_trajectories=8)
    loader = BatchLoader(ds, batch_size=8, seed=1)
    batches = list(loader)
    assert len(batches) == len(ds) // 8
    b = batches[0]
    assert b["input"].shape == (8, 8, 8, 7)
    assert b["label"].shape == (8, 8, 8, 3)
    assert b["time"].shape == (8,)


def test_losses():
    pred = jnp.ones((2, 4, 4, 3))
    target = jnp.ones((2, 4, 4, 3))
    assert float(relative_lp_loss(pred, target)) < 1e-9
    # doubling error doubles relative L1
    t2 = jnp.zeros((2, 4, 4, 3)).at[:, 0, 0, 0].set(1.0)
    l1 = float(relative_lp_loss(target + 1.0, target))
    np.testing.assert_allclose(l1, 1.0, rtol=1e-6)
    g = float(grouped_relative_lp_loss(pred + 1.0, pred, [[0], [1, 2]]))
    np.testing.assert_allclose(g, 1.0, rtol=1e-6)
    valid = jnp.ones((2, 4, 4, 1))
    m = float(masked_mse(pred + 2.0, pred, valid))
    np.testing.assert_allclose(m, 4.0, rtol=1e-6)


def test_trainer_bf16_and_remat():
    """Mixed-precision + remat training paths produce finite decreasing loss."""
    import jax
    from pregen_pde_tpu.models.fno import FNO2d
    from pregen_pde_tpu.training.datasets import TimePairConfig, TimePairDataset
    from pregen_pde_tpu.training.trainer import Trainer, TrainerConfig

    data = _fake_data(n=12, t=5, hw=16, seed=7)
    cfg = TimePairConfig(max_num_time_steps=4, allowed_transitions=[1],
                         n_val=2, n_test=2)
    ds = TimePairDataset(data, cfg, "train", num_trajectories=8)
    model = FNO2d(out_channels=3, modes=4, width=8, n_layers=1)
    for kw in ({"compute_dtype": "bfloat16"}, {"remat": True}):
        trainer = Trainer(model, TrainerConfig(
            epochs=2, batch_size=8, learning_rate=1e-3,
            early_stop_patience=None, **kw,
        ))
        res = trainer.fit(BatchLoader(ds, 8, seed=0))
        h = res["history"]
        assert np.isfinite(h[-1]["train_loss"]), kw
        assert h[-1]["train_loss"] < h[0]["train_loss"] * 1.5, kw
        # master weights stay f32
        leaves = jax.tree_util.tree_leaves(trainer.state.params)
        assert all(l.dtype == np.float32 for l in leaves), kw


def test_config_json_roundtrip_nested():
    """Typed-config JSON round-trip, incl. the nested-dataclass path
    (string annotations are resolved, not compared as str)."""
    import dataclasses
    from pregen_pde_tpu.core.config import NSVorticityConfig, _ConfigBase, _filter_fields

    cfg = NSVorticityConfig(resolution=64, viscosity=1e-3)
    back = NSVorticityConfig.from_json(cfg.to_json())
    assert back == cfg

    @dataclasses.dataclass(frozen=True)
    class Outer(_ConfigBase):
        solver: NSVorticityConfig = NSVorticityConfig()
        name: str = "x"

    outer = Outer(solver=NSVorticityConfig(resolution=32), name="y")
    restored = Outer(**_filter_fields(Outer, __import__("json").loads(outer.to_json())))
    assert isinstance(restored.solver, NSVorticityConfig)
    assert restored.solver.resolution == 32 and restored.name == "y"


def test_split_bounds_validation():
    import pytest
    data = _fake_data(n=4)
    cfg = TimePairConfig(max_num_time_steps=4, allowed_transitions=[1],
                         n_val=2, n_test=2)
    with pytest.raises(ValueError, match="split needs"):
        TimePairDataset(data, cfg, "val")


def test_weight_decay_skips_biases_and_norms():
    """No-decay group ≡ reference `scOT/trainer.py:77-227`: with zero grads,
    AdamW's decoupled decay moves kernels but not biases."""
    import jax
    import jax.numpy as jnp
    import optax
    from pregen_pde_tpu.training.trainer import TrainerConfig, build_optimizer

    cfg = TrainerConfig(learning_rate=0.1, weight_decay=0.5, epochs=1,
                        schedule="constant", grad_clip=1e9)
    params = {
        "Dense_0": {"kernel": jnp.ones((4, 4)), "bias": jnp.ones((4,))},
        "norm": {"scale": jnp.ones((4,))},
    }
    tx = build_optimizer(cfg, steps_per_epoch=1, params=params)
    state = tx.init(params)
    zero_grads = jax.tree_util.tree_map(jnp.zeros_like, params)
    updates, _ = tx.update(zero_grads, state, params)
    new = optax.apply_updates(params, updates)
    assert float(jnp.abs(new["Dense_0"]["kernel"] - 1).max()) > 1e-3
    np.testing.assert_allclose(np.asarray(new["Dense_0"]["bias"]), 1.0)
    np.testing.assert_allclose(np.asarray(new["norm"]["scale"]), 1.0)


def test_compute_stats_streams_chunks_identically():
    """Chunked streaming stats == whole-array stats (chunking must not
    change the Chan-merge result; memmapped 20 GB shards rely on it)."""
    import numpy as np

    from pregen_pde_tpu.training.datasets import compute_stats

    rng = np.random.default_rng(0)
    a = rng.normal(2.0, 3.0, size=(13, 4, 6, 6, 6)).astype(np.float32)
    b = rng.normal(-1.0, 0.5, size=(7, 4, 6, 6, 6)).astype(np.float32)
    m1, s1 = compute_stats([a, b], chunk_rows=3)
    m2, s2 = compute_stats([a, b], chunk_rows=10**9)
    np.testing.assert_allclose(m1, m2, rtol=1e-6)
    np.testing.assert_allclose(s1, s2, rtol=1e-6)
    ref_m = np.concatenate([a.reshape(-1, 6), b.reshape(-1, 6)])[:, :3].mean(0)
    np.testing.assert_allclose(m1, ref_m, rtol=1e-5)


def test_fused_adamw_bit_identical_to_optax():
    """fused_adamw (bucketed single-kernel update) must equal optax.adamw
    EXACTLY — same updates, same moments — over several steps, with a
    matrix-only decay mask and a schedule (training/fused_optim.py)."""
    import jax
    import optax

    from pregen_pde_tpu.training.fused_optim import fused_adamw

    rng = np.random.default_rng(0)
    params = {
        "dense": {"kernel": jnp.asarray(rng.normal(size=(7, 5)), jnp.float32),
                  "bias": jnp.asarray(rng.normal(size=(5,)), jnp.float32)},
        "norm": {"scale": jnp.asarray(rng.normal(size=(5,)), jnp.float32)},
        "deep": {"w": jnp.asarray(rng.normal(size=(3, 4, 5)), jnp.float32)},
    }

    def mask(tree):
        return jax.tree_util.tree_map(lambda l: l.ndim >= 2, tree)

    sched = optax.warmup_cosine_decay_schedule(0.0, 3e-3, 2, 10)
    ref = optax.adamw(sched, weight_decay=0.02, mask=mask)
    fus = fused_adamw(sched, weight_decay=0.02, mask=mask)

    s_ref, s_fus = ref.init(params), fus.init(params)
    p_ref = p_fus = params
    for step in range(5):
        grads = jax.tree_util.tree_map(
            lambda l: jnp.asarray(
                rng.normal(size=l.shape) * 0.1, jnp.float32), params)
        u_ref, s_ref = ref.update(grads, s_ref, p_ref)
        u_fus, s_fus = fus.update(grads, s_fus, p_fus)
        for kp, a in jax.tree_util.tree_leaves_with_path(u_ref):
            b = dict(jax.tree_util.tree_leaves_with_path(u_fus))[kp]
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=str(kp) + f" step {step}")
        p_ref = optax.apply_updates(p_ref, u_ref)
        p_fus = optax.apply_updates(p_fus, u_fus)


def test_fused_adamw_inside_multi_transform():
    """fused_adamw must compose with optax.multi_transform (the tiered scOT
    optimizer): MaskedNode placeholders flatten to zero leaves, and the
    result must equal the same multi_transform over optax.adamw exactly."""
    import jax
    import optax

    from pregen_pde_tpu.training.fused_optim import fused_adamw

    rng = np.random.default_rng(1)
    params = {
        "embed": {"kernel": jnp.asarray(rng.normal(size=(4, 6)), jnp.float32),
                  "bias": jnp.asarray(rng.normal(size=(6,)), jnp.float32)},
        "head": {"kernel": jnp.asarray(rng.normal(size=(6, 2)), jnp.float32)},
    }
    labels = {"embed": {"kernel": "emb", "bias": "emb"},
              "head": {"kernel": "main"}}

    def make(builder):
        return optax.multi_transform(
            {"emb": builder(1e-3, weight_decay=0.01),
             "main": builder(5e-4, weight_decay=0.0)}, labels)

    ref = make(lambda lr, weight_decay: optax.adamw(
        lr, weight_decay=weight_decay))
    fus = make(lambda lr, weight_decay: fused_adamw(
        lr, weight_decay=weight_decay))
    s_ref, s_fus = ref.init(params), fus.init(params)
    grads = jax.tree_util.tree_map(
        lambda l: jnp.asarray(rng.normal(size=l.shape), jnp.float32), params)
    for _ in range(3):
        u_ref, s_ref = ref.update(grads, s_ref, params)
        u_fus, s_fus = fus.update(grads, s_fus, params)
        for kp, a in jax.tree_util.tree_leaves_with_path(u_ref):
            b = dict(jax.tree_util.tree_leaves_with_path(u_fus))[kp]
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=str(kp))
