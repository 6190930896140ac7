"""Device-resident time-pair training — the TPU-idiomatic input pipeline.

The reference feeds every batch through host DataLoader workers
(`CNO_timeModule_CIN.py:1016-1073` num_workers=6; the HF Trainer dataloaders
in `scOT/train.py`). On a TPU the equivalent host loop re-uploads ~0.5 MB per
sample every step; through this dev environment's tunneled interconnect that
upload IS the training bottleneck (~0.28 s/step measured for a 38 ms scOT-T
step — PERF.md). On real hardware it still costs host RAM bandwidth, PCIe,
and input-pipeline latency. This module keeps the whole trajectory tensor
resident in HBM and assembles batches ON DEVICE:

- ``DeviceDataStore`` uploads one or more ``(N, T, H, W, C)`` contract arrays
  once (any storage dtype — float16 halves the upload; gathers cast to f32);
- batch assembly (frame gather + z-score of the first ``out_channels`` +
  constant lead-time channel) exactly mirrors
  ``TimePairDataset.__getitem__`` (`training/datasets.py`, which itself pins
  the reference semantics `CNO_TimeLoaders.py:219-248`) — parity to ≤1 ulp
  (XLA lowers the z-score divide as multiply-by-reciprocal) is tested in
  `tests/test_device_data.py`;
- ``fit_resident`` runs ONE jitted program per epoch (`lax.scan` over steps)
  and one per validation set: per-epoch host traffic is a few KB of shuffled
  int32 index triples plus scalars, independent of resolution and batch size.
  Best-params tracking stays on device (no per-improvement fetch).

The dataset must fit in HBM next to model + optimizer state (e.g. the
320-trajectory 128² mixing sets are 2×1.06 GB in f16 on a 16 GB v5e) — for
larger corpora use the streaming `training/native_loader.py` path.
"""

from __future__ import annotations

import functools
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from pregen_pde_tpu.training.datasets import (
    TIME_NORMALIZER,
    TimePairConfig,
    build_time_indices,
)
from pregen_pde_tpu.training.metrics import summarize_rel_errors


class DeviceDataStore:
    """One device-resident concatenation of named (N, T, H, W, C) arrays.

    All arrays must share (T, H, W, C); trajectory indices into array ``name``
    are globalized by ``offsets[name]`` so one gather program serves every
    difficulty/split."""

    def __init__(self, arrays: dict[str, np.ndarray],
                 device_dtype: str | None = None):
        names = list(arrays)
        tails = {tuple(np.shape(arrays[k])[1:]) for k in names}
        if len(tails) != 1:
            raise ValueError(f"arrays must share (T,H,W,C), got {tails}")
        self.offsets: dict[str, int] = {}
        self.n: dict[str, int] = {}
        off = 0
        parts = []
        for k in names:
            a = arrays[k]
            self.offsets[k] = off
            self.n[k] = a.shape[0]
            off += a.shape[0]
            parts.append(np.asarray(a))
        host = np.concatenate(parts, 0) if len(parts) > 1 else parts[0]
        if device_dtype is not None:
            host = host.astype(device_dtype)
        self.data = jnp.asarray(host)

    def triples(self, name: str, which: str, cfg: TimePairConfig,
                num_trajectories: int | None = None) -> np.ndarray:
        """(M, 3) int32 ``(global_traj, t1, t2)`` sample table for a split —
        the same trajectory-range split + time-pair enumeration as
        ``TimePairDataset`` (train = [0, n), val/test = the tail)."""
        n_max = self.n[name]
        if n_max < cfg.n_val + cfg.n_test + 1:
            raise ValueError(
                f"{name} has {n_max} trajectories but the split needs "
                f"n_val({cfg.n_val}) + n_test({cfg.n_test}) + >=1 train")
        if which == "train":
            avail = n_max - cfg.n_val - cfg.n_test
            n = num_trajectories if num_trajectories is not None else avail
            assert 0 < n <= avail, (n, n_max)
            start = 0
        elif which == "val":
            start, n = n_max - cfg.n_val - cfg.n_test, cfg.n_val
        elif which == "test":
            start, n = n_max - cfg.n_test, cfg.n_test
        else:
            raise ValueError(which)
        if cfg.fix_input_to_time_step is not None:
            t1f = cfg.fix_input_to_time_step
            pairs = [(t1f, cfg.time_step_size * (j + 1) + t1f)
                     for j in range(cfg.max_num_time_steps)]
        else:
            pairs = build_time_indices(cfg)
        base = self.offsets[name] + start
        tr = np.repeat(np.arange(base, base + n), len(pairs))
        tp = np.tile(np.asarray(pairs, np.int32), (n, 1))
        return np.column_stack([tr.astype(np.int32), tp]).astype(np.int32)


def make_gather(mean: np.ndarray, std: np.ndarray, out_channels: int = 3,
                time_input: bool = True) -> Callable:
    """``gather(data, idx)`` with idx (B, 3) int32 → (time (B,), input
    (B,H,W,Cin), label (B,H,W,out_channels)) — the on-device twin of
    ``TimePairDataset.__getitem__``: f32 cast, z-score of the first
    ``out_channels`` with shared stats, lead time = (t2−t1)/19, optional
    constant time channel appended to the input."""
    mean_d = jnp.asarray(mean, jnp.float32)
    std_d = jnp.asarray(std, jnp.float32)

    def gather(data, idx):
        traj, t1, t2 = idx[:, 0], idx[:, 1], idx[:, 2]
        time = (t2 - t1).astype(jnp.float32) / TIME_NORMALIZER
        inp = data[traj, t1].astype(jnp.float32)
        lab = data[traj, t2, :, :, :out_channels].astype(jnp.float32)
        inp = inp.at[..., :out_channels].set(
            (inp[..., :out_channels] - mean_d) / std_d)
        lab = (lab - mean_d) / std_d
        if time_input:
            tch = jnp.broadcast_to(time[:, None, None, None],
                                   (*inp.shape[:3], 1))
            inp = jnp.concatenate([inp, tch], axis=-1)
        return time, inp, lab

    return gather


def make_device_eval_fn(trainer, store: DeviceDataStore, triples: np.ndarray,
                        mean, std, batch_size: int = 32, out_channels: int = 3,
                        time_input: bool = True) -> Callable:
    """Whole-validation-set evaluation as ONE jitted program: scan over
    batches of device-gathered samples, per-sample relative-Lp errors (%)
    reduced on device — a single (M,) fetch per call. Returns
    ``fn(state) -> summary dict`` (same summary as ``Trainer.evaluate``)."""
    gather = make_gather(mean, std, out_channels, time_input)
    m_true = len(triples)
    bs = min(batch_size, m_true)
    s = -(-m_true // bs)
    pad = np.concatenate([triples,
                          np.repeat(triples[-1:], s * bs - m_true, axis=0)])
    tri_dev = jnp.asarray(pad.reshape(s, bs, 3), jnp.int32)
    p = trainer.cfg.loss_p
    apply_fn = trainer.model.apply

    # `data` and the index table enter as ARGUMENTS, never closure captures —
    # a captured device array is materialized as an HLO constant at lowering
    # (the whole multi-GB store baked into every eval executable; measured:
    # a 2.6 GB captured-constants warning + minutes-long transfers through
    # the tunnel)
    @jax.jit
    def eval_all(params, data, tri):
        def body(_, ix):
            time, inp, lab = gather(data, ix)
            pred = apply_fn({"params": params}, inp, time).astype(jnp.float32)
            axes = tuple(range(1, pred.ndim))
            num = (jnp.abs(pred - lab) ** p).sum(axes) ** (1.0 / p)
            den = (jnp.abs(lab) ** p).sum(axes) ** (1.0 / p) + 1e-10
            return None, num / den * 100.0

        _, rel = jax.lax.scan(body, None, tri)
        return rel.reshape(-1)[:m_true]

    return lambda state: summarize_rel_errors(
        np.asarray(eval_all(state.params, store.data, tri_dev)))


def fit_resident(trainer, store: DeviceDataStore, train_triples: np.ndarray,
                 mean, std, val_triples: dict[str, np.ndarray] | None = None,
                 out_channels: int = 3, time_input: bool = True,
                 eval_batch_size: int = 32,
                 log_fn: Callable[[dict], None] | None = None) -> dict:
    """Device-resident ``Trainer.fit``: one jitted `lax.scan` program per
    epoch, on-device best-params tracking, the usual early stopping on the
    mean validation relative error. Plain-DP only (``zero_stage`` unsupported
    here — the streaming loader path covers FSDP runs)."""
    cfg = trainer.cfg
    assert cfg.zero_stage is None, "fit_resident supports plain DP only"
    assert trainer.full_loss_fn is None, "custom objectives use Trainer.fit"
    bs = cfg.batch_size
    gather = make_gather(mean, std, out_channels, time_input)
    data = store.data
    m = len(train_triples)
    steps = m // bs
    assert steps >= 1, (m, bs)

    if trainer.state is None:
        idx0 = jnp.asarray(train_triples[:bs], jnp.int32)
        t0, inp0, lab0 = jax.jit(gather)(data, idx0)
        trainer.init_state({"input": inp0, "time": t0, "label": lab0},
                           steps_per_epoch=steps)
    raw_step = trainer._make_train_step_raw()

    @functools.partial(jax.jit, donate_argnums=(0,))
    def epoch_fn(state, data, idx):  # idx (S, B, 3)
        def body(st, ix):
            time, inp, lab = gather(data, ix)
            return raw_step(st, {"input": inp, "time": time, "label": lab})

        return jax.lax.scan(body, state, idx)

    eval_fns = {
        name: make_device_eval_fn(trainer, store, tri, mean, std,
                                  eval_batch_size, out_channels, time_input)
        for name, tri in (val_triples or {}).items()
    }

    import time as _time

    rng = np.random.default_rng(cfg.seed)
    patience_left = cfg.early_stop_patience or np.inf
    for epoch in range(cfg.epochs):
        t_start = _time.time()
        order = rng.permutation(m)[: steps * bs].reshape(steps, bs)
        idx = jnp.asarray(train_triples[order], jnp.int32)
        trainer.state, losses = epoch_fn(trainer.state, data, idx)
        rec = {"epoch": epoch, "train_loss": float(jnp.mean(losses)),
               "time_s": _time.time() - t_start}
        if eval_fns:
            vals = []
            for name, fn in eval_fns.items():
                s = fn(trainer.state)
                rec[f"{name}_median_rel_%"] = s["median_rel_%"]
                rec[f"{name}_mean_rel_%"] = s["mean_rel_%"]
                vals.append(s["mean_rel_%"])
            mean_val = float(np.mean(vals))
            rec["mean_val_rel_%"] = mean_val
            if mean_val < trainer.best_metric:
                trainer.best_metric = mean_val
                # device-side copy — fetching 20M+ params per improvement
                # would cost ~6 s each through the tunnel; restore_best()
                # device_puts these directly
                trainer.best_params = jax.tree_util.tree_map(
                    jnp.copy, trainer.state.params)
                patience_left = cfg.early_stop_patience or np.inf
            else:
                patience_left -= 1
        trainer.history.append(rec)
        if log_fn:
            log_fn(rec)
        if patience_left <= 0:
            break
    return {"best_metric": trainer.best_metric, "history": trainer.history}
