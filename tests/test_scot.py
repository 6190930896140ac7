import jax
import jax.numpy as jnp
import numpy as np

from pregen_pde_tpu.models.scot import (
    CondLayerNorm,
    MODEL_SIZES,
    PatchMerging,
    PatchUnmerging,
    ScOT,
    ScOTConfig,
    SwinLayerV2,
    WindowAttentionV2,
    fft_resize,
)

TINY = ScOTConfig(
    image_size=32, patch_size=4, num_channels=6, num_out_channels=3,
    embed_dim=16, depths=(2, 2), num_heads=(2, 4), skip_connections=(1, 0),
    window_size=4,
)


def test_cond_layernorm_identity_at_init():
    m = CondLayerNorm(8, use_conditioning=True)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 5, 8)), jnp.float32)
    t = jnp.asarray([0.2, 0.9])
    params = m.init(jax.random.key(0), x, t)
    y = np.asarray(m.apply(params, x, t))
    # zero-init kernels → behaves as plain LN at init
    ref = (np.asarray(x) - np.asarray(x).mean(-1, keepdims=True)) / np.sqrt(
        np.asarray(x).var(-1, keepdims=True) + 1e-5
    )
    np.testing.assert_allclose(y, ref, atol=1e-4)


def test_window_attention_shapes():
    m = WindowAttentionV2(dim=16, num_heads=4, window_size=4)
    x = jnp.ones((6, 16, 16), jnp.float32)  # 6 windows, 16 tokens
    params = m.init(jax.random.key(0), x)
    y = m.apply(params, x)
    assert y.shape == (6, 16, 16)


def test_swin_layer_shift_and_noshift():
    for shift in (False, True):
        m = SwinLayerV2(dim=16, num_heads=4, window_size=4, shift=shift)
        x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 8, 8, 16)), jnp.float32)
        t = jnp.asarray([0.1, 0.2])
        y = m.apply(m.init(jax.random.key(0), x, t), x, t)
        assert y.shape == x.shape


def test_patch_merge_unmerge_shapes():
    x = jnp.ones((2, 8, 8, 16), jnp.float32)
    t = jnp.asarray([0.3, 0.4])
    pm = PatchMerging(16)
    y = pm.apply(pm.init(jax.random.key(0), x, t), x, t)
    assert y.shape == (2, 4, 4, 32)
    pu = PatchUnmerging(32)
    z = pu.apply(pu.init(jax.random.key(0), y, t), y, t)
    assert z.shape == (2, 8, 8, 16)


def test_fft_resize_roundtrip():
    # band-limited input (no Nyquist energy): roundtrip is exact. Full-band
    # inputs lose half their (one-sided) Nyquist energy — a property of the
    # reference algorithm itself (`scOT/model.py:1243-1266`).
    raw = np.random.default_rng(2).normal(size=(1, 16, 16, 2))
    rh = np.fft.fft2(raw, axes=(1, 2))
    rh[:, 8, :, :] = 0.0
    rh[:, :, 8, :] = 0.0
    x = jnp.asarray(np.fft.ifft2(rh, axes=(1, 2)).real, jnp.float32)
    up = fft_resize(x, 32)
    assert up.shape == (1, 32, 32, 2)
    back = fft_resize(up, 16)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-4)


def test_scot_forward_and_conditioning():
    model = ScOT(TINY)
    x = jnp.asarray(np.random.default_rng(3).normal(size=(2, 32, 32, 6)), jnp.float32)
    t = jnp.asarray([0.2, 0.8])
    params = model.init(jax.random.key(0), x, t)["params"]
    y = model.apply({"params": params}, x, t)
    assert y.shape == (2, 32, 32, 3)
    assert np.all(np.isfinite(np.asarray(y)))

    def loss(p):
        return jnp.mean(model.apply({"params": p}, x, t) ** 2)

    g = jax.tree_util.tree_leaves(jax.grad(loss)(params))
    assert all(np.all(np.isfinite(np.asarray(l))) for l in g)
    # time gradients reach the conditional norms
    import flax

    flat = flax.traverse_util.flatten_dict(
        jax.tree_util.tree_map(lambda a: float(jnp.abs(a).sum()),
                               jax.grad(loss)(params))
    )
    time_grads = [v for k, v in flat.items() if "time_scale" in "/".join(k)]
    assert len(time_grads) > 0


def test_scot_resolution_transfer():
    """Inputs at a different resolution are FFT-resized through the model
    (reference `scOT/model.py:1310-1316`)."""
    model = ScOT(TINY)
    x32 = jnp.ones((1, 32, 32, 6), jnp.float32)
    t = jnp.asarray([0.5])
    params = model.init(jax.random.key(0), x32, t)["params"]
    y64 = model.apply({"params": params}, jnp.ones((1, 64, 64, 6), jnp.float32), t)
    assert y64.shape == (1, 64, 64, 3)


def test_scot_learn_residual():
    cfg = ScOTConfig(**{**TINY.__dict__, "learn_residual": True})
    model = ScOT(cfg)
    x = jnp.asarray(np.random.default_rng(4).normal(size=(1, 32, 32, 6)), jnp.float32)
    t = jnp.asarray([0.0])
    params = model.init(jax.random.key(0), x, t)["params"]
    y = model.apply({"params": params}, x, t)
    assert y.shape == (1, 32, 32, 3)


def test_model_size_table():
    assert MODEL_SIZES["B"]["embed_dim"] == 96
    assert MODEL_SIZES["L"]["embed_dim"] == 192


def test_scot_trains_with_trainer():
    """scOT through the unified Trainer (1 epoch, tiny config)."""
    import numpy as np
    from pregen_pde_tpu.training.datasets import (
        BatchLoader, TimePairConfig, TimePairDataset,
    )
    from pregen_pde_tpu.training.trainer import Trainer, TrainerConfig

    rng = np.random.default_rng(0)
    data = rng.normal(size=(10, 4, 32, 32, 6)).astype(np.float32)
    cfg = TimePairConfig(max_num_time_steps=3, allowed_transitions=[1],
                         n_val=2, n_test=2)
    train = TimePairDataset(data, cfg, "train", num_trajectories=6)
    model = ScOT(ScOTConfig(
        image_size=32, patch_size=4, num_channels=7, num_out_channels=3,
        embed_dim=16, depths=(1, 1), num_heads=(2, 2), skip_connections=(1, 0),
        window_size=4,
    ))
    trainer = Trainer(model, TrainerConfig(epochs=1, batch_size=4,
                                           early_stop_patience=None))
    result = trainer.fit(BatchLoader(train, 4, seed=0))
    assert np.isfinite(result["history"][0]["train_loss"])


def test_drop_path_rates_match_reference_law():
    """Per-layer stochastic-depth rates ≡ `scOT/model.py:926-947,1061-1082`:
    linspace(0, rate, 2·sum(depths)); encoder = first half in layer order;
    decoder = second half sliced dpr[sum(depths[i+1:]):sum(depths[i:])] per
    stage. Within a decode stage the construction's two reversals cancel
    (`:841-851`: blocks built `for i in reversed(range(depth))` with
    `drop_path[depth-1-i]`) → execution-order block b gets stage[b].
    Recomputed independently here (torch.linspace ≡ np.linspace, endpoints
    included)."""
    from pregen_pde_tpu.models.scot import scot_drop_path_rates

    depths, rate = (4, 4, 4, 4), 0.1
    enc, dec = scot_drop_path_rates(depths, rate)
    full = np.linspace(0.0, rate, 2 * sum(depths))
    enc_flat, dec_flat = full[:16], full[16:]
    for i in range(4):
        for b in range(4):
            assert np.isclose(enc[(i, b)], enc_flat[sum(depths[:i]) + b]), (i, b)
            lo = sum(depths[i + 1:])
            stage = dec_flat[lo:lo + depths[i]]
            assert np.isclose(dec[(i, b)], stage[b]), (i, b)
    # spot values: encoder starts at 0, last decoder stage reaches `rate`
    assert enc[(0, 0)] == 0.0
    assert np.isclose(max(dec.values()), rate)
    # default config carries the reference default rate (`model.py:61`)
    assert ScOTConfig().drop_path_rate == 0.1


def test_scot_train_mode_stochastic_eval_deterministic():
    cfg = ScOTConfig(**{**TINY.__dict__, "drop_path_rate": 0.5})
    model = ScOT(cfg)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(4, 32, 32, 6)),
                    jnp.float32)
    t = jnp.full((4,), 0.5, jnp.float32)
    params = model.init(jax.random.key(0), x, t)["params"]
    # eval (train=False, default): deterministic, no rng needed
    y1 = model.apply({"params": params}, x, t)
    y2 = model.apply({"params": params}, x, t)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    # train mode: stochastic across rngs, reproducible for the same rng
    ya = model.apply({"params": params}, x, t, train=True,
                     rngs={"dropout": jax.random.key(1)})
    yb = model.apply({"params": params}, x, t, train=True,
                     rngs={"dropout": jax.random.key(2)})
    yc = model.apply({"params": params}, x, t, train=True,
                     rngs={"dropout": jax.random.key(1)})
    assert float(jnp.abs(ya - yb).max()) > 1e-6
    np.testing.assert_array_equal(np.asarray(ya), np.asarray(yc))


def test_scot_mask_token():
    cfg = ScOTConfig(**{**TINY.__dict__, "use_mask_token": True})
    model = ScOT(cfg)
    x = jnp.asarray(np.random.default_rng(3).normal(size=(2, 32, 32, 6)),
                    jnp.float32)
    t = jnp.full((2,), 0.5, jnp.float32)
    grid = cfg.image_size // cfg.patch_size
    mask = jnp.zeros((2, grid, grid), bool).at[:, :4, :4].set(True)
    params = model.init(jax.random.key(0), x, t, bool_masked_pos=mask)["params"]
    assert params["mask_token"].shape == (1, 1, 1, cfg.embed_dim)
    y_masked = model.apply({"params": params}, x, t, bool_masked_pos=mask)
    y_plain = model.apply({"params": params}, x, t)
    assert y_masked.shape == y_plain.shape
    # a zero mask is a no-op; a real mask changes the output
    y_zero = model.apply({"params": params}, x, t,
                         bool_masked_pos=jnp.zeros((2, grid, grid), bool))
    # atol covers XLA fusion/rounding differences between the two programs
    np.testing.assert_allclose(np.asarray(y_zero), np.asarray(y_plain),
                               atol=1e-5)
    assert float(jnp.abs(y_masked - y_plain).max()) > 1e-6
    # without use_mask_token the arg is rejected
    import pytest

    with pytest.raises(ValueError):
        ScOT(TINY).init(jax.random.key(0), x, t, bool_masked_pos=mask)


def test_scot_pixel_mask_forcing_in_forward():
    """`prediction[pixel_mask] = labels[pixel_mask]` inside forward
    (`scOT/model.py:1372-1374`)."""
    model = ScOT(TINY)
    x = jnp.asarray(np.random.default_rng(4).normal(size=(2, 32, 32, 6)),
                    jnp.float32)
    t = jnp.full((2,), 0.5, jnp.float32)
    params = model.init(jax.random.key(0), x, t)["params"]
    labels = jnp.asarray(np.random.default_rng(5).normal(size=(2, 32, 32, 3)),
                         jnp.float32)
    pm = jnp.zeros((2, 32, 32, 3), bool).at[..., 2].set(True)  # force channel 2
    y = model.apply({"params": params}, x, t, pixel_mask=pm, labels=labels)
    np.testing.assert_array_equal(np.asarray(y[..., 2]),
                                  np.asarray(labels[..., 2]))
    y_free = model.apply({"params": params}, x, t)
    np.testing.assert_allclose(np.asarray(y[..., :2]),
                               np.asarray(y_free[..., :2]), atol=1e-6)


def test_scot_resnet_residual_model():
    cfg = ScOTConfig(**{**TINY.__dict__, "residual_model": "resnet"})
    model = ScOT(cfg)
    x = jnp.ones((2, 32, 32, 6), jnp.float32)
    t = jnp.full((2,), 0.5, jnp.float32)
    params = model.init(jax.random.key(0), x, t)["params"]
    assert any("skip_0_blk_0" in k for k in params)
    y = model.apply({"params": params}, x, t)
    assert y.shape == (2, 32, 32, 3)


def test_rollout_pixel_mask_forcing_propagates():
    """AR rollout with pixel_mask: forced channels enter the feedback, so a
    downstream prediction differs from the unforced rollout even on channels
    that were never forced (reference feeds the FORCED prediction back,
    `scOT/model.py:1372-1374` + `scOT/trainer.py:240-316`). Must be
    warning-free: the implicit scatter dtype cast is a JAX FutureWarning
    slated to become an error."""
    import warnings

    from pregen_pde_tpu.evalx.rollout import rollout_pattern

    warnings.simplefilter("error", FutureWarning)

    model = ScOT(TINY)
    rng = np.random.default_rng(6)
    inp = jnp.asarray(rng.normal(size=(2, 32, 32, 6)), jnp.float32)
    t0 = jnp.full((2,), 0.5, jnp.float32)
    params = model.init(jax.random.key(0), inp, t0)["params"]
    forced = [jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
              for _ in range(2)]
    pm = jnp.zeros((2, 32, 32, 3), bool).at[..., 0].set(True)

    def fwd(vars_, x, t):
        return model.apply(vars_, x, t)

    preds_free = rollout_pattern(fwd, params, inp, [1, 1],
                                 time_channel=False, out_channels=3)
    preds_forced = rollout_pattern(fwd, params, inp, [1, 1],
                                   time_channel=False, out_channels=3,
                                   pixel_mask=pm, forced_labels=forced)
    # step-2 forced prediction: channel 0 pinned to the forced frame
    np.testing.assert_array_equal(np.asarray(preds_forced[1][..., 0]),
                                  np.asarray(forced[1][..., 0]))
    # un-forced channels at step 2 differ because step-1 feedback carried the
    # forced channel 0
    assert float(jnp.abs(preds_forced[1][..., 1:]
                         - preds_free[1][..., 1:]).max()) > 1e-6


def test_cpb_bias_custom_vjp_matches_gather_grad():
    """The Toeplitz-einsum adjoint of the CPB bias expansion must equal
    jax.grad through the plain gather (scatter-add adjoint) exactly (f64)."""
    from pregen_pde_tpu.ops.cpb_bias import _rel_index, relative_position_bias

    for ws, h in ((4, 3), (8, 6), (5, 2)):
        table = jnp.asarray(
            np.random.default_rng(ws).normal(size=((2 * ws - 1) ** 2, h)))
        cot = jnp.asarray(
            np.random.default_rng(ws + 1).normal(size=(ws**4, h)))
        idx = jnp.asarray(_rel_index(ws))

        def loss_gather(t):
            return jnp.vdot(t[idx], cot)

        def loss_custom(t):
            return jnp.vdot(relative_position_bias(t, ws), cot)

        np.testing.assert_array_equal(
            np.asarray(relative_position_bias(table, ws)),
            np.asarray(table[idx]))
        g_ref = np.asarray(jax.grad(loss_gather)(table))
        g_new = np.asarray(jax.grad(loss_custom)(table))
        np.testing.assert_allclose(g_new, g_ref, rtol=1e-12, atol=1e-12)
