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
