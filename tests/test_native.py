import numpy as np
import pytest

from pregen_pde_tpu import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason=f"native toolchain unavailable: {native.load_error()}"
)


def test_npy_write_read_roundtrip(tmp_path):
    arr = np.random.default_rng(0).normal(size=(3, 4, 8, 8, 6)).astype(np.float32)
    p = tmp_path / "x.npy"
    native.npy_write(p, arr)
    # numpy can load the native file
    loaded = np.load(p)
    np.testing.assert_array_equal(loaded, arr)
    # native can load a numpy-written file
    p2 = tmp_path / "y.npy"
    np.save(p2, arr)
    np.testing.assert_array_equal(native.npy_read(p2), arr)
    # and its own file
    np.testing.assert_array_equal(native.npy_read(p), arr)


def test_native_shard_writer(tmp_path):
    w = native.NativeShardWriter(tmp_path, prefix="t", queue_depth=2)
    a = np.ones((2, 3, 4, 4, 6), np.float32)
    b = np.full((3, 3, 4, 4, 6), 2.0, np.float32)
    w.write_batch(a)
    w.write_batch(b)
    w.close()
    f0 = np.load(tmp_path / "t_batch_0.npy")
    f1 = np.load(tmp_path / "t_batch_1.npy")
    np.testing.assert_array_equal(f0, a)
    np.testing.assert_array_equal(f1, b)
    meta = (tmp_path / "t_meta.json").read_text()
    assert '"n_trajectories": 5' in meta
    assert '"backend": "native"' in meta


def test_native_writer_matches_python_writer(tmp_path):
    from pregen_pde_tpu.datagen.writer import load_shards

    w = native.NativeShardWriter(tmp_path, prefix="r")
    batches = [
        np.random.default_rng(i).normal(size=(2, 3, 8, 8, 6)).astype(np.float32)
        for i in range(4)
    ]
    for b in batches:
        w.write_batch(b)
    w.close()
    data = load_shards(tmp_path, prefix="r")
    np.testing.assert_array_equal(data, np.concatenate(batches))


def test_1d_and_odd_shapes(tmp_path):
    for shape in [(7,), (1, 1), (5, 3, 2)]:
        arr = np.arange(np.prod(shape), dtype=np.float32).reshape(shape)
        p = tmp_path / f"s{len(shape)}.npy"
        native.npy_write(p, arr)
        np.testing.assert_array_equal(np.load(p), arr)


# ---------------------------------------------------------------------------
# native time-pair batch assembly (dataload.cpp)
# ---------------------------------------------------------------------------
def _fake_contract(n=6, t=5, h=8, w=8, c=6, seed=0):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(n, t, h, w, c)).astype(np.float32)


def test_native_gather_matches_python_getitem():
    from pregen_pde_tpu import native
    from pregen_pde_tpu.training.datasets import TimePairConfig, TimePairDataset

    if not native.available():
        import pytest

        pytest.skip(f"no native toolchain: {native.load_error()}")

    data = _fake_contract()
    cfg = TimePairConfig(max_num_time_steps=4, allowed_transitions=[1, 2],
                         n_val=1, n_test=1)
    ds = TimePairDataset(data, cfg, "train")
    g = native.NativeTimePairGather(np.ascontiguousarray(data))

    # every sample: native gather == python __getitem__
    from pregen_pde_tpu.training.native_loader import _index_tables

    traj, t1, t2, time = _index_tables(ds)
    inp, lab = g.gather(traj, t1, t2, time, ds.mean, ds.std,
                        time_input=cfg.time_input)
    for i in range(len(ds)):
        t_py, inp_py, lab_py = ds[i]
        np.testing.assert_allclose(inp[i], inp_py, atol=1e-6, err_msg=str(i))
        np.testing.assert_allclose(lab[i], lab_py, atol=1e-6)
        assert abs(float(time[i]) - float(t_py)) < 1e-7

    # async protocol
    g.submit(traj[:4], t1[:4], t2[:4], time[:4], ds.mean, ds.std,
             cfg.time_input)
    inp2, lab2 = g.wait()
    np.testing.assert_allclose(inp2, inp[:4])
    np.testing.assert_allclose(lab2, lab[:4])

    # out-of-range index is rejected, not UB
    import pytest

    with pytest.raises(IndexError):
        g.gather(np.array([99]), t1[:1], t2[:1], time[:1], ds.mean, ds.std)
    g.close()


def test_native_batch_loader_matches_python_loader():
    from pregen_pde_tpu import native

    if not native.available():
        import pytest

        pytest.skip(f"no native toolchain: {native.load_error()}")

    from pregen_pde_tpu.training.datasets import (
        BatchLoader,
        TimePairConfig,
        TimePairDataset,
        make_mixed_datasets,
    )
    from pregen_pde_tpu.training.native_loader import NativeBatchLoader

    cfg = TimePairConfig(max_num_time_steps=4, allowed_transitions=[1],
                         n_val=1, n_test=1)
    hard = _fake_contract(seed=1)
    easy = _fake_contract(seed=2)
    train, *_ = make_mixed_datasets(hard, easy, alpha=0.5,
                                    total_trajectories=4, cfg=cfg)

    py = BatchLoader(train, batch_size=4, shuffle=True, seed=7)
    nat = NativeBatchLoader(train, batch_size=4, shuffle=True, seed=7)
    assert len(py) == len(nat)
    def canon(batch):
        # canonical row order (native regroups part-contiguously within a
        # shuffled batch, so compare batches as multisets of samples)
        flat = np.concatenate(
            [batch["time"][:, None],
             batch["input"].reshape(len(batch["time"]), -1),
             batch["label"].reshape(len(batch["time"]), -1)],
            axis=1,
        )
        return flat[np.lexsort(flat.T[::-1])]

    for b_py, b_nat in zip(py, nat):
        np.testing.assert_allclose(canon(b_py), canon(b_nat), atol=1e-6)
    nat.close()


def test_native_gather_protocol_rejects_double_submit():
    from pregen_pde_tpu import native

    if not native.available():
        import pytest

        pytest.skip(f"no native toolchain: {native.load_error()}")

    import pytest

    data = _fake_contract(n=64, t=5, h=32, w=32)  # big enough to stay busy
    g = native.NativeTimePairGather(np.ascontiguousarray(data))
    traj = np.arange(64, dtype=np.int64)
    t1 = np.zeros(64, np.int64)
    t2 = np.ones(64, np.int64)
    tv = np.ones(64, np.float32)
    mean = np.zeros(3, np.float32)
    std = np.ones(3, np.float32)
    g.submit(traj, t1, t2, tv, mean, std)
    with pytest.raises(RuntimeError, match="tp_submit failed"):
        g.submit(traj, t1, t2, tv, mean, std)
    inp, lab = g.wait()
    assert inp.shape == (64, 32, 32, 7) and lab.shape == (64, 32, 32, 3)
    # after wait, a new submit is accepted again
    g.submit(traj[:2], t1[:2], t2[:2], tv[:2], mean, std)
    g.wait()
    g.close()


def test_native_batch_loader_survives_abandoned_iterator():
    """Trainer.fit peeks one batch with next(iter(loader)) then iterates
    fresh — the abandoned iterator's in-flight prefetch must be drained, not
    poison (or worse, misalign) the next epoch."""
    from pregen_pde_tpu.training.datasets import TimePairConfig, TimePairDataset
    from pregen_pde_tpu.training.native_loader import NativeBatchLoader

    data = _fake_contract(n=8)
    cfg = TimePairConfig(max_num_time_steps=4, allowed_transitions=[1],
                         n_val=1, n_test=1)
    ds = TimePairDataset(data, cfg, "train")
    nat = NativeBatchLoader(ds, batch_size=4, shuffle=True, seed=3)
    peek = next(iter(nat))  # abandons its iterator with a prefetch in flight
    assert peek["input"].shape[0] == 4
    # two full epochs after the abandonment, content-checked vs python loader
    from pregen_pde_tpu.training.datasets import BatchLoader

    py = BatchLoader(ds, batch_size=4, shuffle=True, seed=3)
    next(iter(py))  # consume one shuffle so both RNG streams stay in step
    for _ in range(2):
        for b_nat, b_py in zip(nat, py):
            np.testing.assert_allclose(b_nat["time"], b_py["time"])
            np.testing.assert_allclose(b_nat["input"], b_py["input"], atol=1e-6)
            np.testing.assert_allclose(b_nat["label"], b_py["label"], atol=1e-6)


def test_native_batch_loader_rejects_concurrent_iterators():
    """Two live iterators over one loader would mispair (time, input, label);
    the stale iterator must raise, not corrupt."""
    from pregen_pde_tpu.training.datasets import TimePairConfig, TimePairDataset
    from pregen_pde_tpu.training.native_loader import NativeBatchLoader

    ds = TimePairDataset(_fake_contract(n=8), TimePairConfig(
        max_num_time_steps=4, allowed_transitions=[1], n_val=1, n_test=1),
        "train")
    nat = NativeBatchLoader(ds, batch_size=4, shuffle=False)
    it1 = iter(nat)
    next(it1)
    it2 = iter(nat)  # supersedes it1
    next(it2)
    with pytest.raises(RuntimeError, match="superseded"):
        next(it1)
    # it2 keeps working
    for _ in it2:
        pass
    nat.close()


def test_native_gather_rejects_oversized_stats():
    """mean/std wider than the contract channels must fail cleanly, not
    corrupt memory."""
    data = _fake_contract()
    g = native.NativeTimePairGather(np.ascontiguousarray(data))
    idx = np.zeros(2, np.int64)
    with pytest.raises(IndexError):
        g.gather(idx, idx, idx + 1, np.ones(2, np.float32),
                 np.zeros(10, np.float32), np.ones(10, np.float32))
    g.close()


def test_prefetch_loader_matches_direct_iteration():
    """PrefetchLoader yields the same batches in the same order as the
    wrapped loader and re-raises worker exceptions."""
    import numpy as np
    import pytest

    from pregen_pde_tpu.training.datasets import BatchLoader, TimePairConfig, TimePairDataset
    from pregen_pde_tpu.training.native_loader import PrefetchLoader

    rng = np.random.default_rng(0)
    data = rng.normal(size=(8, 4, 6, 6, 6)).astype(np.float32)
    cfg = TimePairConfig(max_num_time_steps=3, allowed_transitions=[1],
                         n_val=2, n_test=2)
    ds = TimePairDataset(data, cfg, "train")
    direct = list(BatchLoader(ds, 4, shuffle=True, seed=7))
    fetched = list(PrefetchLoader(BatchLoader(ds, 4, shuffle=True, seed=7)))
    assert len(direct) == len(fetched) == len(
        PrefetchLoader(BatchLoader(ds, 4, shuffle=True, seed=7)))
    for a, b in zip(direct, fetched):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])

    class Boom:
        def __len__(self):
            return 1

        def __iter__(self):
            raise RuntimeError("boom")
            yield  # pragma: no cover

    with pytest.raises(RuntimeError, match="boom"):
        list(PrefetchLoader(Boom()))


def test_make_batch_loader_prefetches_non_timepair_datasets():
    """Benchmark-style (file-backed) datasets get the threaded prefetch
    wrapper from make_batch_loader."""
    import numpy as np

    from pregen_pde_tpu.training.native_loader import (
        PrefetchLoader,
        make_batch_loader,
    )

    class MiniDS:  # duck-typed sample dataset (not a TimePairDataset)
        def __len__(self):
            return 6

        def __getitem__(self, i):
            return (np.float32(0.5), np.zeros((4, 4, 2), np.float32),
                    np.zeros((4, 4, 1), np.float32))

    loader = make_batch_loader(MiniDS(), 2, shuffle=False)
    assert isinstance(loader, PrefetchLoader)
    batches = list(loader)
    assert len(batches) == 3 and batches[0]["input"].shape == (2, 4, 4, 2)
