"""Inference/evaluation tools beyond plain rollouts.

Mirrors the reference `scOT/inference.py` modes (`:394-407`):
- `accumulation_error` — per-step error growth under homogeneous AR rollout
  (≡ eval_accumulation_error);
- `resolution_eval` — evaluate at multiple spatial resolutions via FFT
  resampling (≡ eval_resolutions, using the model's `fft_resize` transfer);
- `save_samples` — dump (input, prediction, label) triplets to an .npz.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from pregen_pde_tpu.models.scot import fft_resize as _fft_resize_eager
from pregen_pde_tpu.training.datasets import TIME_NORMALIZER
from pregen_pde_tpu.training.metrics import relative_lp_error

# fft_resize builds complex intermediates; run it under jit — EAGER complex
# ops (pad with a host complex zero, etc.) are unimplemented on tunneled TPU
# backends (CLAUDE.md gotcha), and jit compiles once per (shape, target).
fft_resize = jax.jit(_fft_resize_eager, static_argnums=1)


def _prep_inputs(dataset, idx, out_channels):
    frames0 = dataset.data[idx, 0].astype(np.float32).copy()
    frames0[..., :out_channels] = (
        frames0[..., :out_channels] - dataset.mean
    ) / dataset.std
    if dataset.cfg.time_input:
        tch = np.zeros((*frames0.shape[:3], 1), np.float32)
        frames0 = np.concatenate([frames0, tch], axis=-1)
    return frames0


def accumulation_error(
    apply_fn: Callable,
    params,
    dataset,
    max_steps: int = 7,
    batch_size: int = 16,
    out_channels: int = 3,
) -> list[dict]:
    """Roll 1-step jumps `max_steps` times; report error vs truth at each step."""
    fwd = jax.jit(apply_fn)
    n = dataset.n_traj
    start = dataset.start
    errors = [[] for _ in range(max_steps)]
    for s in range(0, n, batch_size):
        idx = np.arange(start + s, start + min(s + batch_size, n))
        x = jnp.asarray(_prep_inputs(dataset, idx, out_channels))
        ts = dataset.cfg.time_step_size
        for step in range(1, max_steps + 1):
            lead = ts / TIME_NORMALIZER  # one time_step_size jump per AR step
            t = jnp.full((x.shape[0],), lead, x.dtype)
            if dataset.cfg.time_input:
                tch = jnp.full((*x.shape[:3], 1), lead, x.dtype)
                x = jnp.concatenate([x[..., :-1], tch], axis=-1)
            pred = fwd({"params": params}, x, t)
            lab = dataset.data[idx, step * dataset.cfg.time_step_size,
                               :, :, :out_channels].astype(np.float32)
            lab = (lab - dataset.mean) / dataset.std
            errors[step - 1].append(relative_lp_error(np.asarray(pred), lab))
            x = x.at[..., :out_channels].set(pred)
    return [
        {"step": i + 1,
         "median_rel_%": float(np.median(np.concatenate(e))),
         "mean_rel_%": float(np.mean(np.concatenate(e)))}
        for i, e in enumerate(errors)
    ]


def _sample_batches(dataset, batch_size: int, limit: int | None = None):
    """(time, input, label) numpy batches over any sample-style dataset —
    the generic path for file-backed benchmark loaders (no `.data` array)."""
    n = len(dataset) if limit is None else min(limit, len(dataset))
    for s in range(0, n, batch_size):
        items = [dataset[i] for i in range(s, min(s + batch_size, n))]
        t, x, y = zip(*(it[:3] for it in items))
        yield np.stack(t), np.stack(x), np.stack(y)


def resolution_eval(
    apply_fn: Callable,
    params,
    dataset,
    resolutions: Sequence[int],
    batch_size: int = 16,
    out_channels: int = 3,
) -> dict[int, dict]:
    """Evaluate the t=0 → t=1 prediction with inputs/labels FFT-resampled to
    each resolution (resolution-transfer study, ≡ `eval_resolutions`).
    Datasets without a raw `.data` array (benchmark loaders) evaluate their
    own (t1, t2) sample pairs instead of the t=0 frame."""
    fwd = jax.jit(apply_fn)
    results = {}
    if not hasattr(dataset, "data"):
        for res in resolutions:
            preds, labs = [], []
            for t, x, y in _sample_batches(dataset, batch_size):
                xr = fft_resize(jnp.asarray(x), res)
                pred = fwd({"params": params}, xr, jnp.asarray(t))
                preds.append(np.asarray(pred))
                labs.append(np.asarray(fft_resize(jnp.asarray(y), res)))
            rel = relative_lp_error(np.concatenate(preds), np.concatenate(labs))
            results[res] = {
                "median_rel_%": float(np.median(rel)),
                "mean_rel_%": float(np.mean(rel)),
            }
        return results
    n, start = dataset.n_traj, dataset.start
    ts = dataset.cfg.time_step_size
    for res in resolutions:
        preds, labs = [], []
        for s in range(0, n, batch_size):
            idx = np.arange(start + s, start + min(s + batch_size, n))
            x = jnp.asarray(_prep_inputs(dataset, idx, out_channels))
            x = fft_resize(x, res)
            t = jnp.full((x.shape[0],), ts / TIME_NORMALIZER, x.dtype)
            pred = fwd({"params": params}, x, t)
            lab = dataset.data[idx, ts, :, :, :out_channels].astype(np.float32)
            lab = (lab - dataset.mean) / dataset.std
            lab = np.asarray(fft_resize(jnp.asarray(lab), res))
            preds.append(np.asarray(pred))
            labs.append(lab)
        rel = relative_lp_error(np.concatenate(preds), np.concatenate(labs))
        results[res] = {
            "median_rel_%": float(np.median(rel)),
            "mean_rel_%": float(np.mean(rel)),
        }
    return results


def save_samples(
    apply_fn: Callable,
    params,
    dataset,
    path: str,
    n_samples: int = 8,
    out_channels: int = 3,
):
    """Dump (input, prediction, label) for the first n_samples test items.
    Sample-style datasets without `.data` (benchmark loaders) dump their own
    (t1, t2) pairs."""
    fwd = jax.jit(apply_fn)
    if not hasattr(dataset, "data"):
        t, x, y = next(_sample_batches(dataset, n_samples, limit=n_samples))
        pred = np.asarray(fwd({"params": params}, jnp.asarray(x),
                              jnp.asarray(t)))
        np.savez(path, input=x, prediction=pred, label=y)
        return path
    idx = np.arange(dataset.start, dataset.start + min(n_samples, dataset.n_traj))
    x = jnp.asarray(_prep_inputs(dataset, idx, out_channels))
    ts = dataset.cfg.time_step_size
    t = jnp.full((x.shape[0],), 1 / TIME_NORMALIZER, x.dtype)
    pred = np.asarray(fwd({"params": params}, x, t))
    lab = dataset.data[idx, ts, :, :, :out_channels].astype(np.float32)
    lab = (lab - dataset.mean) / dataset.std
    np.savez(path, input=np.asarray(x), prediction=pred, label=lab)
    return path


def ar_eval(
    apply_fn: Callable,
    params,
    dataset,
    ar_steps: int | Sequence[int],
    batch_size: int = 16,
) -> dict:
    """Autoregressive rollout test over any time-pair dataset — the
    reference's post-train AR evaluation (`scOT/train.py:666-695`:
    `trainer.set_ar_steps(k)` then predict; `scOT/trainer.py:240-316`
    `_model_forward`): roll the model to each sample's (t1 → t2) horizon in
    ``ar_steps`` homogeneous sub-steps (or a heterogeneous list of
    fractions), feeding the prediction back; score the FINAL state against
    the label.

    The dataset supplies samples `(time, input, label)` — works for
    `TimePairDataset` and `BenchmarkTimeDataset` alike (aux input channels
    beyond the label width — wave speed, forcing, lead-time channel — stay
    frozen across the rollout, ≡ the reference's static-channel re-concat
    when in_dim > out_dim, `trainer.py:262-276`). Returns the same summary
    stats as the direct evaluation.

    Rank-aware under multi-process execution (≡ the reference's
    DistributedSampler + gather eval, `scOT/train.py:573-696`): each process
    rolls only its rank-strided shard of the test samples and the per-sample
    errors are allgathered, so every rank reports identical global
    metrics."""
    from pregen_pde_tpu.parallel import multihost
    from pregen_pde_tpu.training.datasets import BatchLoader, Subset
    from pregen_pde_tpu.training.metrics import summarize_rel_errors

    n_total = len(dataset)
    if jax.process_count() > 1:
        dataset = Subset(dataset, multihost.shard_indices(n_total))

    if isinstance(ar_steps, int):
        fracs = [1.0 / ar_steps] * ar_steps
    else:
        total = float(sum(ar_steps))
        fracs = [s / total for s in ar_steps]
    fracs_t = tuple(float(f) for f in fracs)

    @jax.jit
    def roll(inp, time, lab):
        x = inp
        out_c = lab.shape[-1]
        time_ch = inp.shape[-1] > out_c and bool(
            getattr(dataset.cfg, "time_input", False))
        for f in fracs_t:
            t_sub = time * f
            if time_ch:  # the lead-time channel tracks the SUB-step time
                tch = jnp.broadcast_to(
                    t_sub[:, None, None, None],
                    (*x.shape[:3], 1)).astype(x.dtype)
                x = jnp.concatenate([x[..., :-1], tch], axis=-1)
            pred = apply_fn({"params": params}, x, t_sub)
            x = x.at[..., :out_c].set(pred.astype(x.dtype))
        pred = x[..., :out_c].astype(jnp.float32)
        labf = lab.astype(jnp.float32)
        axes = tuple(range(1, pred.ndim))
        num = jnp.abs(pred - labf).sum(axes)
        den = jnp.abs(labf).sum(axes) + 1e-10
        return num / den * 100.0

    rel = []
    for batch in BatchLoader(dataset, batch_size, shuffle=False,
                             drop_last=False):
        rel.append(np.asarray(roll(jnp.asarray(batch["input"]),
                                   jnp.asarray(batch["time"]),
                                   jnp.asarray(batch["label"]))))
    rel_all = multihost.allgather_samplewise(np.concatenate(rel), n_total)
    return summarize_rel_errors(rel_all)
