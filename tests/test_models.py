import jax
import jax.numpy as jnp
import numpy as np

from pregen_pde_tpu.models.ffno import FFNO2d, WNDense
from pregen_pde_tpu.models.fno import FNO2d, SpectralConv2d


def test_spectral_conv_shapes_and_linearity():
    m = SpectralConv2d(out_channels=8, modes1=4, modes2=4)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 16, 16, 5)), jnp.float32)
    params = m.init(jax.random.key(0), x)
    y = m.apply(params, x)
    assert y.shape == (2, 16, 16, 8)
    # linear op: f(2x) == 2 f(x)
    y2 = m.apply(params, 2 * x)
    np.testing.assert_allclose(np.asarray(y2), 2 * np.asarray(y), rtol=1e-4)


def test_fno_forward_and_grad():
    model = FNO2d(out_channels=3, modes=4, width=16, n_layers=2)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 16, 16, 7)), jnp.float32)
    t = jnp.ones((2,), jnp.float32)
    params = model.init(jax.random.key(0), x, t)["params"]
    y = model.apply({"params": params}, x, t)
    assert y.shape == (2, 16, 16, 3)

    def loss(p):
        return jnp.sum(model.apply({"params": p}, x, t) ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_ffno_forward_and_mask():
    # contract channel 4 = hole mask (1 = solid); output masked by 1 - mask
    model = FFNO2d(out_channels=3, modes=4, width=16, n_layers=2,
                   hole_mask_channel=4)
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 16, 16, 6)).astype(np.float32)
    x[..., 4] = 0.0
    x[0, :4, :4, 4] = 1.0  # blocked (hole) region
    xj = jnp.asarray(x)
    t = jnp.ones((2,), jnp.float32)
    params = model.init(jax.random.key(0), xj, t)["params"]
    y = np.asarray(model.apply({"params": params}, xj, t))
    assert y.shape == (2, 16, 16, 3)
    np.testing.assert_allclose(y[0, :4, :4], 0.0)  # output re-masked
    assert np.abs(y[1]).max() > 0


def test_wndense_stable_at_zero_weights():
    """The ε-guard must keep gradients finite even with degenerate v
    (the reference's documented NaN scenario, `utils/linear.py:44-105`)."""
    m = WNDense(4)
    x = jnp.ones((3, 5), jnp.float32)
    params = m.init(jax.random.key(0), x)
    zeroed = jax.tree_util.tree_map(jnp.zeros_like, params)

    def loss(p):
        return jnp.sum(m.apply(p, x) ** 2)

    g = jax.tree_util.tree_leaves(jax.grad(loss)(zeroed))
    assert all(np.all(np.isfinite(np.asarray(l))) for l in g)


def test_no_weak_typed_params_and_single_trace_step():
    """Weak-typed params (python-float initializers) force the train step to
    retrace twice — minutes of recompile through the TPU tunnel. Guard every
    model's init, and assert the step reaches aval fixed-point immediately."""
    import jax
    import jax.numpy as jnp
    import optax

    from pregen_pde_tpu.models.cno import CNO
    from pregen_pde_tpu.models.ffno import FFNO2d
    from pregen_pde_tpu.models.fno import FNO2d
    from pregen_pde_tpu.models.scot import ScOT, ScOTConfig

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 6)).astype(np.float32))
    t = jnp.asarray(rng.uniform(size=(2,)).astype(np.float32))

    models = [
        FNO2d(out_channels=3, modes=4, width=8, n_layers=2),
        FFNO2d(out_channels=3, modes=4, width=8, n_layers=2),
        CNO(in_size=32, out_dim=3, n_layers=1, n_res=1, n_res_neck=1,
            channel_multiplier=8),
        ScOT(ScOTConfig(image_size=32, num_channels=6, num_out_channels=3,
                        embed_dim=24, depths=(1, 1, 1, 1), window_size=4,
                        num_heads=(2, 2, 2, 2))),
    ]
    for model in models:
        params = model.init(jax.random.key(0), x, t)["params"]
        weak = [
            jax.tree_util.keystr(k)
            for k, v in jax.tree_util.tree_flatten_with_path(params)[0]
            if v.aval.weak_type
        ]
        assert not weak, f"{type(model).__name__}: weak-typed params {weak[:4]}"

        # one-trace fixed point: in/out avals of a full train step match
        tx = optax.adamw(1e-4)
        opt_state = tx.init(params)
        traces = [0]

        @jax.jit
        def step(p, o):
            traces[0] += 1
            loss, grads = jax.value_and_grad(
                lambda q: jnp.mean(
                    jnp.abs(model.apply({"params": q}, x, t))
                )
            )(p)
            upd, o = tx.update(grads, o, p)
            return optax.apply_updates(p, upd), o, loss

        p, o = params, opt_state
        for _ in range(3):
            p, o, _ = step(p, o)
        assert traces[0] == 1, f"{type(model).__name__}: retraced {traces[0]}x"


def test_fno_resolution_invariance():
    """Params trained at one grid apply at another (weight shapes are fixed
    by `modes`, not by the input resolution) — the FNO's defining property,
    exercised by the `resolutions` CLI / `evalx.resolution_eval`."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from pregen_pde_tpu.models.fno import FNO2d

    model = FNO2d(out_channels=3, modes=12, width=8, n_layers=1)
    x16 = jnp.ones((2, 16, 16, 7))
    params = model.init(jax.random.key(0), x16, jnp.ones((2,)))["params"]
    # weight shape comes from modes, not resolution
    assert params["SpectralConv2d_0"]["w_pos_re"].shape[1:3] == (12, 12)
    y16 = model.apply({"params": params}, x16, jnp.ones((2,)))
    assert y16.shape == (2, 16, 16, 3)
    # same params at 32x32 and 64x64
    for n in (32, 64):
        xn = jnp.ones((2, n, n, 7))
        yn = model.apply({"params": params}, xn, jnp.ones((2,)))
        assert yn.shape == (2, n, n, 3)
        assert np.isfinite(np.asarray(yn)).all()
    # constant-input outputs agree across resolutions approximately (the
    # zero-padded domain is not truly band-limited and 16² retains only 8 of
    # the 12 modes, so edge effects differ by a few %; the rigorous
    # per-frequency alignment check is the test below)
    np.testing.assert_allclose(
        np.asarray(y16[:, 0, 0]),
        np.asarray(model.apply({"params": params}, jnp.ones((2, 64, 64, 7)),
                               jnp.ones((2,)))[:, 0, 0]),
        rtol=6e-2,
    )


def test_spectral_conv_frequency_alignment_across_resolutions():
    """Per-frequency weight alignment below 2*modes: on a band-limited input,
    each retained Fourier mode must be multiplied by the SAME trained weight
    at every resolution — including h < 2*modes1, where the surviving
    negative frequencies -m1..-1 must take the TAIL rows of w_neg (a ky=-2
    mode at h=6 with modes1=4 previously got the weight trained for ky=-3)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from pregen_pde_tpu.models.fno import SpectralConv2d

    modes = 4
    rng = np.random.default_rng(0)
    # Band-limited spectral coefficients: ky in [-2, 2], kx in [0, 2] (rfft
    # side), 2 input channels. Representable exactly at h=w=6 and h=w=12.
    kys, kxs = range(-2, 3), range(0, 3)
    coef = rng.normal(size=(5, 3, 2)) + 1j * rng.normal(size=(5, 3, 2))

    def synth(n):
        spec = np.zeros((1, n, n // 2 + 1, 2), np.complex128)
        for iy, ky in enumerate(kys):
            for ix, kx in enumerate(kxs):
                spec[0, ky % n, kx] = coef[iy, ix]
        return jnp.asarray(np.fft.irfft2(spec, s=(n, n), axes=(1, 2)) * n * n)

    for impl in ("fft", "matmul"):
        mod = SpectralConv2d(out_channels=3, modes1=modes, modes2=modes, impl=impl)
        params = mod.init(jax.random.key(1), synth(12))
        outs = {}
        for n in (12, 6):  # 12 >= 2*modes (full), 6 < 2*modes (truncated)
            y = np.asarray(mod.apply(params, synth(n)), np.float64)
            # normalized per-mode output coefficients
            spec = np.fft.rfft2(y, axes=(1, 2)) / (n * n)
            outs[n] = np.stack(
                [[spec[0, ky % n, kx] for kx in kxs] for ky in kys]
            )
        np.testing.assert_allclose(outs[6], outs[12], rtol=1e-4, atol=1e-8), impl
