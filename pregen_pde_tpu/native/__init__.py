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

_SRCS = [Path(__file__).parent / "shardio.cpp",
         Path(__file__).parent / "dataload.cpp"]
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
        src = b"".join(s.read_bytes() for s in _SRCS)
        tag = hashlib.md5(src).hexdigest()[:12]
        so_path = _build_dir() / f"shardio_{tag}.so"
        if not so_path.exists():
            tmp = so_path.with_suffix(f".{os.getpid()}.tmp")
            subprocess.run(
                ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread"]
                + [str(s) for s in _SRCS] + ["-o", str(tmp)],
                check=True, capture_output=True,
            )
            os.replace(tmp, so_path)  # atomic vs concurrent builders
        lib = ctypes.CDLL(str(so_path))
        lib.shard_writer_create.restype = ctypes.c_void_p
        lib.shard_writer_create.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                            ctypes.c_int, ctypes.c_int]
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
        i64p = ctypes.POINTER(ctypes.c_int64)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.tp_loader_create.restype = ctypes.c_void_p
        lib.tp_loader_create.argtypes = [f32p] + [ctypes.c_int64] * 5
        lib.tp_gather.restype = ctypes.c_int
        lib.tp_gather.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, i64p, i64p, i64p, f32p, f32p,
            f32p, ctypes.c_int64, ctypes.c_int, f32p, f32p, ctypes.c_int,
        ]
        lib.tp_submit.restype = ctypes.c_int
        lib.tp_submit.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, i64p, i64p, i64p, f32p, f32p,
            f32p, ctypes.c_int64, ctypes.c_int,
        ]
        lib.tp_wait.restype = ctypes.c_int64
        lib.tp_wait.argtypes = [ctypes.c_void_p, f32p, f32p]
        lib.tp_loader_close.restype = None
        lib.tp_loader_close.argtypes = [ctypes.c_void_p]
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

    def __init__(self, out_dir, prefix: str = "results", queue_depth: int = 2,
                 start_index: int = 0):
        lib = _load()
        if lib is None:
            raise RuntimeError(f"native shardio unavailable: {_LIB_ERR}")
        self._lib = lib
        self.out_dir = Path(out_dir)
        self.out_dir.mkdir(parents=True, exist_ok=True)
        self.prefix = prefix
        self._h = lib.shard_writer_create(
            str(self.out_dir).encode(), prefix.encode(), queue_depth,
            int(start_index),
        )
        self._n_shards = int(start_index)

    def write_batch(self, arr: np.ndarray):
        if arr.dtype != np.float32:
            raise TypeError(
                f"native shard writer is float32-only, got {arr.dtype}; "
                "use ShardWriter(backend='python', dtype=...) for other dtypes"
            )
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


class NativeTimePairGather:
    """Zero-copy view over a contiguous float32 (N,T,H,W,C) contract tensor
    with multithreaded batch assembly (gather + z-score + lead-time channel
    fused in C) and an optional background-prefetch protocol
    (`submit` → `wait`). The caller keeps `data` alive."""

    def __init__(self, data: np.ndarray):
        lib = _load()
        if lib is None:
            raise RuntimeError(f"native dataload unavailable: {_LIB_ERR}")
        assert data.ndim == 5, data.shape
        assert data.dtype == np.float32 and data.flags["C_CONTIGUOUS"], (
            "contract tensor must be contiguous float32"
        )
        self._lib = lib
        self._data = data  # keep the buffer alive
        self._h = lib.tp_loader_create(_as_f32_ptr(data), *map(int, data.shape))
        self.shape = data.shape
        self._pending = None

    def _idx_args(self, traj, t1, t2, tval, mean, std):
        traj = np.ascontiguousarray(traj, np.int64)
        t1 = np.ascontiguousarray(t1, np.int64)
        t2 = np.ascontiguousarray(t2, np.int64)
        tval = np.ascontiguousarray(tval, np.float32)
        mean = np.ascontiguousarray(np.ravel(mean), np.float32)
        std = np.ascontiguousarray(np.ravel(std), np.float32)
        i64 = ctypes.POINTER(ctypes.c_int64)
        return (
            len(traj),
            traj.ctypes.data_as(i64), t1.ctypes.data_as(i64),
            t2.ctypes.data_as(i64), _as_f32_ptr(tval), _as_f32_ptr(mean),
            _as_f32_ptr(std), len(mean),
            (traj, t1, t2, tval, mean, std),  # keepalive
        )

    def _out_bufs(self, n, oc, time_input):
        _, _, h, w, c = self.shape
        inp = np.empty((n, h, w, c + int(time_input)), np.float32)
        lab = np.empty((n, h, w, oc), np.float32)
        return inp, lab

    def gather(self, traj, t1, t2, tval, mean, std, time_input=True,
               inp_out=None, lab_out=None, n_threads: int = 2):
        n, *args, oc, keep = self._idx_args(traj, t1, t2, tval, mean, std)
        if inp_out is None:
            inp_out, lab_out = self._out_bufs(n, oc, time_input)
        rc = self._lib.tp_gather(self._h, n, *args, oc, int(time_input),
                                 _as_f32_ptr(inp_out), _as_f32_ptr(lab_out),
                                 n_threads)
        if rc != 0:
            raise IndexError(f"tp_gather failed: {rc} (index out of range?)")
        return inp_out, lab_out

    def submit(self, traj, t1, t2, tval, mean, std, time_input=True):
        n, *args, oc, keep = self._idx_args(traj, t1, t2, tval, mean, std)
        rc = self._lib.tp_submit(self._h, n, *args, oc, int(time_input))
        if rc != 0:
            raise RuntimeError(f"tp_submit failed: {rc}")
        self._pending = (n, oc, time_input)

    def wait(self):
        n, oc, time_input = self._pending
        inp, lab = self._out_bufs(n, oc, time_input)
        got = self._lib.tp_wait(self._h, _as_f32_ptr(inp), _as_f32_ptr(lab))
        self._pending = None
        if got != n:
            raise RuntimeError(f"tp_wait failed: {got}")
        return inp, lab

    def drain(self):
        """Discard any in-flight submit (an abandoned iterator may have left
        one pending); afterwards a fresh submit is accepted."""
        if getattr(self, "_pending", None) is not None:
            self.wait()

    def close(self):
        if self._h is not None:
            self._lib.tp_loader_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


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
