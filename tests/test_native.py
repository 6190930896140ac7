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
