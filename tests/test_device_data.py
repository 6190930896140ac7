"""Device-resident input pipeline (`training/device_data.py`): bit-parity of
the on-device gather with the host `TimePairDataset`, loss parity of
`fit_resident`'s per-epoch scan with the per-step `Trainer.fit` path, and
parity of the fused device evaluation with `Trainer.evaluate`."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pregen_pde_tpu.models.fno import FNO2d
from pregen_pde_tpu.training.datasets import (
    BatchLoader,
    TimePairConfig,
    TimePairDataset,
    compute_stats,
)
from pregen_pde_tpu.training.device_data import (
    DeviceDataStore,
    fit_resident,
    make_device_eval_fn,
    make_gather,
)
from pregen_pde_tpu.training.trainer import Trainer, TrainerConfig


@pytest.fixture(scope="module")
def small_data():
    rng = np.random.default_rng(0)
    return rng.normal(size=(6, 5, 8, 8, 6)).astype(np.float32)


CFG = TimePairConfig(max_num_time_steps=4, allowed_transitions=[1, 2],
                     n_val=1, n_test=1)


def test_gather_matches_host_dataset(small_data):
    mean, std = compute_stats([small_data])
    store = DeviceDataStore({"d": small_data})
    tri = store.triples("d", "train", CFG)
    ds = TimePairDataset(small_data, CFG, "train", mean=mean, std=std)
    assert len(tri) == len(ds)
    gather = jax.jit(make_gather(mean, std))
    time, inp, lab = gather(store.data, jnp.asarray(tri, jnp.int32))
    for k in [0, 3, len(ds) - 1]:
        t_h, inp_h, lab_h = ds[k]
        np.testing.assert_array_equal(np.asarray(time)[k], t_h)
        # XLA lowers the z-score divide as multiply-by-reciprocal → ≤1 ulp
        np.testing.assert_allclose(np.asarray(inp)[k], inp_h, rtol=3e-7,
                                   atol=3e-7)
        np.testing.assert_allclose(np.asarray(lab)[k], lab_h, rtol=3e-7,
                                   atol=3e-7)


def test_triples_split_ranges(small_data):
    store = DeviceDataStore({"a": small_data, "b": small_data})
    mult = len(TimePairDataset(small_data, CFG, "train").time_indices)
    tr = store.triples("b", "train", CFG, num_trajectories=2)
    assert len(tr) == 2 * mult
    # array "b" starts at offset 6; train trajectories are [0, n)
    assert tr[:, 0].min() == 6 and tr[:, 0].max() == 7
    va = store.triples("b", "val", CFG)
    te = store.triples("b", "test", CFG)
    assert set(va[:, 0]) == {6 + 4} and set(te[:, 0]) == {6 + 5}


class _ReplayLoader:
    """Host loader replaying fit_resident's exact epoch permutations."""

    def __init__(self, ds, orders, bs):
        self.ds, self.orders, self.bs = ds, orders, bs
        self._epoch = 0

    def __len__(self):
        return self.orders.shape[1]

    def __iter__(self):
        order = self.orders[self._epoch]
        self._epoch += 1
        for row in order:
            t, i, l = zip(*(self.ds[int(k)] for k in row))
            yield {"time": np.stack(t), "input": np.stack(i),
                   "label": np.stack(l)}


def _tiny_trainer(epochs=2):
    model = FNO2d(out_channels=3, modes=2, width=4, n_layers=1)
    return Trainer(model, TrainerConfig(
        learning_rate=1e-3, epochs=epochs, batch_size=4,
        early_stop_patience=None, seed=0))


def test_fit_resident_matches_host_fit(small_data):
    mean, std = compute_stats([small_data])
    store = DeviceDataStore({"d": small_data})
    tri = store.triples("d", "train", CFG)

    tr_dev = _tiny_trainer()
    res_dev = fit_resident(tr_dev, store, tri, mean, std)

    # replay the identical permutations through the host per-step path
    m, bs, epochs = len(tri), 4, 2
    steps = m // bs
    rng = np.random.default_rng(0)
    orders = np.stack([rng.permutation(m)[: steps * bs].reshape(steps, bs)
                       for _ in range(epochs)])
    ds = TimePairDataset(small_data, CFG, "train", mean=mean, std=std)
    tr_host = _tiny_trainer()
    loader = _ReplayLoader(ds, orders, bs)
    # pre-init: fit() otherwise consumes one iter() for shape inference,
    # shifting the replayed epoch permutations
    tr_host.init_state(next(iter(loader)), steps_per_epoch=steps)
    loader._epoch = 0
    res_host = tr_host.fit(loader)

    for a, b in zip(res_dev["history"], res_host["history"]):
        np.testing.assert_allclose(a["train_loss"], b["train_loss"],
                                   rtol=1e-5)


def test_device_eval_matches_trainer_evaluate(small_data):
    mean, std = compute_stats([small_data])
    store = DeviceDataStore({"d": small_data})
    tri = store.triples("d", "train", CFG)
    trainer = _tiny_trainer(epochs=1)
    fit_resident(trainer, store, tri, mean, std)

    val_tri = store.triples("d", "val", CFG)
    dev_fn = make_device_eval_fn(trainer, store, val_tri, mean, std,
                                 batch_size=3)  # forces padding (7 % 3 != 0)
    s_dev = dev_fn(trainer.state)
    ds = TimePairDataset(small_data, CFG, "val", mean=mean, std=std)
    s_host = trainer.evaluate(BatchLoader(ds, 3, shuffle=False,
                                          drop_last=False))
    for k in s_dev:
        np.testing.assert_allclose(s_dev[k], s_host[k], rtol=1e-5, atol=1e-6)


def test_fit_resident_early_stop_and_best(small_data):
    mean, std = compute_stats([small_data])
    store = DeviceDataStore({"d": small_data}, device_dtype="float16")
    tri = store.triples("d", "train", CFG)
    val = {"v": store.triples("d", "val", CFG)}
    model = FNO2d(out_channels=3, modes=2, width=4, n_layers=1)
    trainer = Trainer(model, TrainerConfig(
        learning_rate=1e-3, epochs=4, batch_size=4, early_stop_patience=2,
        seed=0))
    res = fit_resident(trainer, store, tri, mean, std, val_triples=val)
    assert np.isfinite(res["best_metric"])
    assert trainer.best_params is not None
    vals = [r["mean_val_rel_%"] for r in res["history"]]
    assert res["best_metric"] == pytest.approx(min(vals))
    trainer.restore_best()  # device-side best params restore must not raise
