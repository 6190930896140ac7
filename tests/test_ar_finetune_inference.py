import jax
import jax.numpy as jnp
import numpy as np

from pregen_pde_tpu.models.fno import FNO2d
from pregen_pde_tpu.training.ar import (
    TrajectoryBatcher,
    homogeneous_steps,
    make_ar_loss,
)
from pregen_pde_tpu.training.datasets import TimePairConfig, TimePairDataset
from pregen_pde_tpu.training.finetune import (
    AdapterWrapper,
    DEFAULT_FT_TIERS,
    finetune_tier_fn,
)
from pregen_pde_tpu.utils.debug import (
    finite_ratio,
    grad_finiteness_sweep,
    sanitize_contract,
)
from pregen_pde_tpu.utils.preflight import check_contract


def _fake_contract(n=8, t=6, hw=16, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(n, t, hw, hw, 6)).astype(np.float32)
    d[..., 3] = 0.5
    d[..., 4] = 0.0
    d[..., 5] = 1.0
    return d


def test_homogeneous_steps():
    assert homogeneous_steps(6, 3) == [2, 2, 2]
    assert homogeneous_steps(7, 3) == [3, 2, 2]
    assert sum(homogeneous_steps(19, 4)) == 19


def test_ar_loss_modes():
    model = FNO2d(out_channels=3, modes=4, width=8, n_layers=1)
    data = _fake_contract()
    mean = data[..., :3].mean((0, 1, 2, 3))
    std = data[..., :3].std((0, 1, 2, 3))
    batcher = TrajectoryBatcher(data, steps=[1, 2, 2], mean=mean, std=std)
    batch = batcher.make_batch(np.arange(4))
    assert batch["input"].shape == (4, 16, 16, 7)
    assert batch["labels"].shape == (4, 3, 16, 16, 3)

    x = jnp.asarray(batch["input"])
    params = model.init(jax.random.key(0), x, jnp.ones((4,)))["params"]
    jb = {"input": x, "labels": jnp.asarray(batch["labels"])}
    for tf in (False, True):
        loss_fn = make_ar_loss(model.apply, [1, 2, 2], teacher_forcing=tf)
        loss, grads = jax.value_and_grad(loss_fn)(params, jb)
        assert np.isfinite(float(loss))
        assert not grad_finiteness_sweep(jax.device_get(grads))


def test_adapter_wrapper_and_tiers():
    base = FNO2d(out_channels=4, modes=4, width=8, n_layers=1, append_grid=False)
    wrapped = AdapterWrapper(base=base, base_in_channels=5, out_channels=2)
    x = jnp.ones((2, 16, 16, 9))  # new in_dim 9 ≠ base 5
    t = jnp.ones((2,))
    params = wrapped.init(jax.random.key(0), x, t)["params"]
    y = wrapped.apply({"params": params}, x, t)
    assert y.shape == (2, 16, 16, 2)
    # tier assignment hits all three tiers
    tiers = set()
    import jax.tree_util as jtu

    def visit(path, leaf):
        tiers.add(finetune_tier_fn(tuple(str(p) for p in path)))
        return leaf

    jtu.tree_map_with_path(visit, params)
    assert "adapter" in tiers and "base" in tiers
    assert set(DEFAULT_FT_TIERS) == {"base", "norm", "adapter"}


def test_accumulation_and_resolution_eval():
    from pregen_pde_tpu.evalx.inference import (
        accumulation_error,
        resolution_eval,
        save_samples,
    )

    data = _fake_contract(n=8, t=6)
    cfg = TimePairConfig(max_num_time_steps=5, allowed_transitions=[1],
                         n_val=2, n_test=2)
    ds = TimePairDataset(data, cfg, "test")
    model = FNO2d(out_channels=3, modes=4, width=8, n_layers=1)
    x0 = jnp.ones((1, 16, 16, 7))
    params = model.init(jax.random.key(0), x0, jnp.ones((1,)))["params"]

    acc = accumulation_error(model.apply, params, ds, max_steps=3, batch_size=2)
    assert [a["step"] for a in acc] == [1, 2, 3]
    assert all(np.isfinite(a["mean_rel_%"]) for a in acc)

    res = resolution_eval(model.apply, params, ds, resolutions=[16, 32],
                          batch_size=2)
    assert set(res) == {16, 32}

    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        path = save_samples(model.apply, params, ds, os.path.join(d, "s.npz"),
                            n_samples=2)
        loaded = np.load(path)
        assert loaded["prediction"].shape == (2, 16, 16, 3)


def test_preflight_and_sanitize():
    good = _fake_contract()
    rep = check_contract(good)
    assert rep["finite_fraction"] == 1.0
    bad = good.copy()
    bad[0, 0, 0, 0, 0] = np.nan
    import pytest

    with pytest.raises(ValueError):
        check_contract(bad)
    fixed = sanitize_contract(bad.copy())
    assert np.isfinite(fixed).all()
    # hole zeroing
    holey = good.copy()
    holey[..., 4] = 1.0
    z = sanitize_contract(holey.copy())
    np.testing.assert_allclose(z[..., 0:3], 0.0)
    # finite_ratio reporting
    fr = finite_ratio({"a": np.asarray([1.0, np.nan])})
    assert 0.0 < list(fr.values())[0] < 1.0


def test_trainer_ar_mode():
    """AR-rollout training through the Trainer (full_loss_fn path)."""
    import jax.numpy as jnp
    from pregen_pde_tpu.training.trainer import Trainer, TrainerConfig

    model = FNO2d(out_channels=3, modes=4, width=8, n_layers=1)
    data = _fake_contract(n=8, t=6, hw=16)
    mean = data[..., :3].mean((0, 1, 2, 3))
    std = data[..., :3].std((0, 1, 2, 3))
    steps = [1, 2, 2]
    batcher = TrajectoryBatcher(data, steps=steps, mean=mean, std=std)
    loss_fn = make_ar_loss(model.apply, steps)
    trainer = Trainer(model, TrainerConfig(epochs=2, batch_size=4,
                                           learning_rate=1e-3,
                                           early_stop_patience=None),
                      full_loss_fn=loss_fn)

    class ARLoader:
        def __len__(self):
            return 2

        def __iter__(self):
            for s in (np.arange(4), np.arange(4, 8)):
                yield batcher.make_batch(s)

    result = trainer.fit(ARLoader())
    assert len(result["history"]) == 2
    assert np.isfinite(result["history"][-1]["train_loss"])


def test_plots_and_pretraining_mix(tmp_path):
    from pregen_pde_tpu.evalx.plots import plot_from_samples, prediction_grid
    from pregen_pde_tpu.training.datasets import make_pretraining_mix

    rng = np.random.default_rng(0)
    inp = rng.normal(size=(3, 16, 16, 7)).astype(np.float32)
    pred = rng.normal(size=(3, 16, 16, 3)).astype(np.float32)
    lab = rng.normal(size=(3, 16, 16, 3)).astype(np.float32)
    p = prediction_grid(inp, pred, lab, str(tmp_path / "grid.png"))
    assert (tmp_path / "grid.png").stat().st_size > 1000
    np.savez(tmp_path / "s.npz", input=inp, prediction=pred, label=lab)
    plot_from_samples(str(tmp_path / "s.npz"), str(tmp_path / "g2.png"))
    assert (tmp_path / "g2.png").exists()

    cfg = TimePairConfig(max_num_time_steps=4, allowed_transitions=[1],
                         n_val=2, n_test=2)
    a = TimePairDataset(_fake_contract(seed=1), cfg, "train", num_trajectories=4)
    b = TimePairDataset(_fake_contract(seed=2), cfg, "train", num_trajectories=4)
    mix = make_pretraining_mix([a, b])
    assert len(mix) == len(a) + len(b)
    assert mix[len(a)][1].shape == a[0][1].shape


def test_ar_eval_composes_substeps_exactly():
    """`ar_eval` rolls k homogeneous sub-steps feeding predictions back
    (≡ scOT set_ar_steps, `scOT/trainer.py:240-316`): with linear dynamics
    pred = (1 + t_sub)·x, a k-step rollout composes to Π(1 + t/k)·x0 — a
    label built that way scores ~0 error, and a 1-step label scores large."""
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from pregen_pde_tpu.evalx.inference import ar_eval

    @dataclasses.dataclass
    class Cfg:
        time_input: bool = False

    class DS:
        cfg = Cfg()

        def __init__(self, k):
            rng = np.random.default_rng(0)
            self.x0 = rng.normal(size=(6, 8, 8, 2)).astype(np.float32)
            self.t = np.full((6,), 0.8, np.float32)
            gain = (1.0 + 0.8 / k) ** k
            self.lab = (gain * self.x0).astype(np.float32)

        def __len__(self):
            return 6

        def __getitem__(self, i):
            return self.t[i], self.x0[i], self.lab[i]

    def apply_fn(_vars, x, t):
        return x * (1.0 + t)[:, None, None, None]

    res = ar_eval(apply_fn, {}, DS(4), 4, batch_size=3)
    assert res["max_rel_%"] < 1e-3, res
    # wrong sub-step count → composition differs → visible error
    res_wrong = ar_eval(apply_fn, {}, DS(4), 1, batch_size=3)
    assert res_wrong["max_rel_%"] > 1.0, res_wrong


def test_ar_eval_heterogeneous_fractions_and_static_channels():
    """Heterogeneous step lists normalize to fractions of the pair horizon;
    channels beyond the label width stay frozen (≡ the reference's static
    extra-channel re-concat when in_dim > out_dim)."""
    import dataclasses

    import numpy as np

    from pregen_pde_tpu.evalx.inference import ar_eval

    @dataclasses.dataclass
    class Cfg:
        time_input: bool = False

    class DS:
        cfg = Cfg()

        def __init__(self):
            rng = np.random.default_rng(1)
            self.x0 = rng.normal(size=(4, 8, 8, 3)).astype(np.float32)
            t = 0.6
            self.t = np.full((4,), t, np.float32)
            # model: pred = x[..., :2] + t_sub * aux; steps [1, 2] →
            # fractions 1/3, 2/3 → total aux·t added (aux frozen)
            self.lab = (self.x0[..., :2]
                        + t * self.x0[..., 2:3]).astype(np.float32)

        def __len__(self):
            return 4

        def __getitem__(self, i):
            return self.t[i], self.x0[i], self.lab[i]

    def apply_fn(_vars, x, t):
        return x[..., :2] + t[:, None, None, None] * x[..., 2:3]

    res = ar_eval(apply_fn, {}, DS(), [1, 2], batch_size=2)
    assert res["max_rel_%"] < 1e-3, res
