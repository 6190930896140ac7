"""Native-backed batch loader for time-pair training.

The data-loader runtime counterpart of the reference's multi-worker torch
DataLoaders (`CNO_timeModule_CIN.py:1016-1146` num_workers=6;
`utils/data_loader.py:200-267`): batch assembly (frame gather + z-score +
lead-time channel) runs in the C++ `dataload` library (multithreaded, no
GIL), and the NEXT batch is assembled by background native workers while the
current one feeds the TPU (submit/wait double buffering). Falls back to the
pure-Python `BatchLoader` when no toolchain is available.

Drop-in: iterates the same {"time", "input", "label"} dicts as `BatchLoader`
over a `TimePairDataset` or a `ConcatDataset` of them (the mixing train set).
"""

from __future__ import annotations

import numpy as np

from pregen_pde_tpu import native
from pregen_pde_tpu.training.datasets import (
    BatchLoader,
    ConcatDataset,
    TIME_NORMALIZER,
    TimePairDataset,
)

__all__ = ["NativeBatchLoader", "make_batch_loader"]


def _index_tables(ds: TimePairDataset):
    """Per-sample (traj, t1, t2, time) decode tables for one dataset part —
    the same arithmetic as `TimePairDataset.__getitem__`."""
    cfg = ds.cfg
    mult = ds.multiplier
    if cfg.fix_input_to_time_step is None:
        pairs = np.asarray(ds.time_indices, np.int64)  # (mult, 2)
    else:
        pairs = np.stack(
            [
                np.full(mult, cfg.fix_input_to_time_step, np.int64),
                cfg.time_step_size * (np.arange(mult, dtype=np.int64) + 1),
            ],
            axis=1,
        )
    idx = np.arange(len(ds), dtype=np.int64)
    traj = ds.start + idx // mult
    t1 = pairs[idx % mult, 0]
    t2 = pairs[idx % mult, 1]
    time = (t2 - t1).astype(np.float32) / TIME_NORMALIZER
    return traj, t1, t2, time


class NativeBatchLoader:
    """Same iteration contract as `BatchLoader`; native assembly + prefetch."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 seed: int = 0, drop_last: bool = True):
        parts = dataset.parts if isinstance(dataset, ConcatDataset) else [dataset]
        assert all(isinstance(p, TimePairDataset) for p in parts)
        self.parts = parts
        self.bs = batch_size
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)
        self.drop_last = drop_last
        self.time_input = parts[0].cfg.time_input

        self._gathers = []
        self._tables = []
        self._stats = []
        for p in parts:
            data = np.ascontiguousarray(p.data, np.float32)  # view if already ok
            self._gathers.append(native.NativeTimePairGather(data))
            self._tables.append(_index_tables(p))
            # per-channel stats (broadcast scalars up — the C side keys the
            # label width off len(mean))
            self._stats.append((
                np.broadcast_to(np.ravel(np.float32(p.mean)), (p.out_channels,)),
                np.broadcast_to(np.ravel(np.float32(p.std)), (p.out_channels,)),
            ))
        self._offsets = np.cumsum([0] + [len(p) for p in parts])

    def __len__(self):
        n = int(self._offsets[-1])
        return n // self.bs if self.drop_last else -(-n // self.bs)

    def _submit(self, global_idx: np.ndarray):
        """Hand one batch's indices to the per-part background workers.
        Samples regroup part-contiguously (order within a shuffled batch is
        irrelevant). Each part's gather has exactly one in-flight job."""
        part_of = np.searchsorted(self._offsets, global_idx, side="right") - 1
        groups = []
        for pi in range(len(self.parts)):
            sel = global_idx[part_of == pi] - self._offsets[pi]
            if len(sel) == 0:
                continue
            traj, t1, t2, time = self._tables[pi]
            mean, std = self._stats[pi]
            self._gathers[pi].submit(
                traj[sel], t1[sel], t2[sel], time[sel], mean, std,
                self.time_input,
            )
            groups.append((pi, time[sel]))
        return groups

    def _collect(self, groups):
        inps, labs, times = [], [], []
        for pi, time in groups:
            inp, lab = self._gathers[pi].wait()
            inps.append(inp)
            labs.append(lab)
            times.append(time)
        return {
            "time": np.concatenate(times),
            "input": np.concatenate(inps),
            "label": np.concatenate(labs),
        }

    def __iter__(self):
        # a previous iterator abandoned mid-epoch (e.g. Trainer peeking one
        # batch with next(iter(loader))) leaves an in-flight prefetch — drain
        # it and SUPERSEDE that iterator: two concurrently-live iterators
        # would interleave submits/waits on the shared native workers and
        # silently mispair (time, input, label), so a stale iterator raises
        # instead of corrupting batches.
        for g in self._gathers:
            g.drain()
        self._iter_token = token = object()
        n = int(self._offsets[-1])
        order = np.arange(n)
        if self.shuffle:
            self.rng.shuffle(order)
        stop = n - (self.bs - 1 if self.drop_last else 0)
        batches = [order[s : s + self.bs] for s in range(0, stop, self.bs)]
        if not batches:
            return
        pending = self._submit(batches[0])
        for i in range(len(batches)):
            if self._iter_token is not token:
                raise RuntimeError(
                    "NativeBatchLoader iterator superseded by a newer "
                    "iter() of the same loader; only one live iterator is "
                    "supported (use separate loaders for nested iteration)"
                )
            out = self._collect(pending)
            if i + 1 < len(batches):
                pending = self._submit(batches[i + 1])
            yield out

    def close(self):
        for g in self._gathers:
            g.close()


def make_batch_loader(dataset, batch_size: int, **kw):
    """NativeBatchLoader when the toolchain + dataset layout allow it; for
    other dataset types (the file-backed benchmark loaders) a
    thread-prefetched BatchLoader; plain BatchLoader as the last resort."""
    try:
        if native.available():
            return NativeBatchLoader(dataset, batch_size, **kw)
    except Exception:
        pass
    parts = dataset.parts if isinstance(dataset, ConcatDataset) else [dataset]
    if not all(isinstance(p, TimePairDataset) for p in parts):
        # file-backed loaders: overlap container reads with device steps
        return PrefetchLoader(BatchLoader(dataset, batch_size, **kw))
    return BatchLoader(dataset, batch_size, **kw)


class PrefetchLoader:
    """Background-thread batch prefetch around ANY batch loader.

    The benchmark datasets (`training/benchmark_datasets.py`) read lazily
    from HDF5/netCDF containers per sample; h5py/numpy I/O releases the GIL,
    so a single worker thread assembling batch k+1 while batch k feeds the
    TPU recovers the reference's multi-worker DataLoader overlap
    (`CNO_timeModule_CIN.py:1016-1146` num_workers=6) without processes.
    ``depth`` bounds the queue (prefetched batches hold host memory).
    Exceptions in the worker re-raise in the consumer."""

    def __init__(self, loader, depth: int = 2):
        self.loader = loader
        self.depth = depth

    def __len__(self):
        return len(self.loader)

    def __iter__(self):
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        _END = object()

        def work():
            try:
                for batch in self.loader:
                    q.put(batch)
                q.put(_END)
            except BaseException as e:  # pragma: no cover - propagated below
                q.put(e)

        t = threading.Thread(target=work, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is _END:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
        t.join()
