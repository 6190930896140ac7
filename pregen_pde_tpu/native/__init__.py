"""JIT-built native (C++) runtime components, bound via ctypes.

The loader mirrors the reference's hash-cached plugin builder
(`torch_utils/custom_ops.py:53-151`: md5 of sources → cached build dir →
dlopen): here `g++ -O3 -shared` with the source hash in the artifact name,
rebuilt only when the source changes. ctypes instead of pybind11 (not in this
environment). Everything degrades gracefully: `available()` is False when no
toolchain exists and callers fall back to the pure-Python paths.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from pathlib import Path

import numpy as np

_SRC = Path(__file__).parent / "shardio.cpp"
_LIB = None
_LIB_ERR: str | None = None


def _build_dir() -> Path:
    d = Path(os.environ.get("PREGEN_PDE_TPU_CACHE",
                            Path.home() / ".cache" / "pregen_pde_tpu"))
    d.mkdir(parents=True, exist_ok=True)
    return d


def _load():
    global _LIB, _LIB_ERR
    if _LIB is not None or _LIB_ERR is not None:
        return _LIB
    try:
        src = _SRC.read_bytes()
        tag = hashlib.md5(src).hexdigest()[:12]
        so_path = _build_dir() / f"shardio_{tag}.so"
        if not so_path.exists():
            tmp = so_path.with_suffix(f".{os.getpid()}.tmp")
            subprocess.run(
                ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
                 str(_SRC), "-o", str(tmp)],
                check=True, capture_output=True,
            )
            os.replace(tmp, so_path)  # atomic vs concurrent builders
        lib = ctypes.CDLL(str(so_path))
        lib.shard_writer_create.restype = ctypes.c_void_p
        lib.shard_writer_create.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                            ctypes.c_int]
        lib.shard_writer_write.restype = ctypes.c_int
        lib.shard_writer_write.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
        ]
        lib.shard_writer_close.restype = ctypes.c_int64
        lib.shard_writer_close.argtypes = [ctypes.c_void_p]
        lib.npy_write.restype = ctypes.c_int
        lib.npy_write.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
        ]
        lib.npy_read_header.restype = ctypes.c_int
        lib.npy_read_header.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.npy_read_f32.restype = ctypes.c_int64
        lib.npy_read_f32.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ]
        _LIB = lib
    except Exception as e:  # no toolchain / build failure → python fallback
        _LIB_ERR = f"{type(e).__name__}: {e}"
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def load_error() -> str | None:
    _load()
    return _LIB_ERR


def _as_f32_ptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _shape_arr(arr: np.ndarray):
    return (ctypes.c_int64 * arr.ndim)(*arr.shape)


class NativeShardWriter:
    """Drop-in for `datagen.writer.ShardWriter` (npy format) backed by the C++
    background-thread writer: `write_batch` returns after one memcpy into the
    native queue; disk I/O happens off the Python thread, no GIL held."""

    def __init__(self, out_dir, prefix: str = "results", queue_depth: int = 2):
        lib = _load()
        if lib is None:
            raise RuntimeError(f"native shardio unavailable: {_LIB_ERR}")
        self._lib = lib
        self.out_dir = Path(out_dir)
        self.out_dir.mkdir(parents=True, exist_ok=True)
        self.prefix = prefix
        self._h = lib.shard_writer_create(
            str(self.out_dir).encode(), prefix.encode(), queue_depth
        )
        self._n_shards = 0

    def write_batch(self, arr: np.ndarray):
        arr = np.ascontiguousarray(arr, dtype=np.float32)
        rc = self._lib.shard_writer_write(
            self._h, _as_f32_ptr(arr), _shape_arr(arr), arr.ndim
        )
        if rc < 0:
            raise RuntimeError(f"native shard write failed: {rc}")
        self._n_shards += 1

    def close(self, metadata: dict | None = None):
        n = int(self._lib.shard_writer_close(self._h))
        self._h = None
        if n < 0:
            raise RuntimeError(f"native shard writer failed: {n}")
        import json

        meta = {"n_trajectories": n, "n_shards": self._n_shards,
                "format": "npy", "backend": "native", **(metadata or {})}
        (self.out_dir / f"{self.prefix}_meta.json").write_text(
            json.dumps(meta, indent=2)
        )


def npy_write(path, arr: np.ndarray) -> None:
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native shardio unavailable: {_LIB_ERR}")
    arr = np.ascontiguousarray(arr, dtype=np.float32)
    rc = lib.npy_write(str(path).encode(), _as_f32_ptr(arr), _shape_arr(arr),
                       arr.ndim)
    if rc != 0:
        raise RuntimeError(f"npy_write failed: {rc}")


def npy_read(path) -> np.ndarray:
    """Fast float32 .npy loader through the native reader."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native shardio unavailable: {_LIB_ERR}")
    shape = (ctypes.c_int64 * 8)()
    offset = ctypes.c_int64()
    ndim = lib.npy_read_header(str(path).encode(), shape, ctypes.byref(offset))
    if ndim < 0:
        raise RuntimeError(f"npy_read_header failed: {ndim}")
    shp = tuple(shape[i] for i in range(ndim))
    out = np.empty(shp, np.float32)
    got = lib.npy_read_f32(str(path).encode(), _as_f32_ptr(out), out.size)
    if got != out.size:
        raise RuntimeError(f"npy_read_f32 failed: {got}")
    return out
