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


def resolution_eval(
    apply_fn: Callable,
    params,
    dataset,
    resolutions: Sequence[int],
    batch_size: int = 16,
    out_channels: int = 3,
) -> dict[int, dict]:
    """Evaluate the t=0 → t=1 prediction with inputs/labels FFT-resampled to
    each resolution (resolution-transfer study, ≡ `eval_resolutions`)."""
    fwd = jax.jit(apply_fn)
    results = {}
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
    """Dump (input, prediction, label) for the first n_samples test items."""
    fwd = jax.jit(apply_fn)
    idx = np.arange(dataset.start, dataset.start + min(n_samples, dataset.n_traj))
    x = jnp.asarray(_prep_inputs(dataset, idx, out_channels))
    ts = dataset.cfg.time_step_size
    t = jnp.full((x.shape[0],), 1 / TIME_NORMALIZER, x.dtype)
    pred = np.asarray(fwd({"params": params}, x, t))
    lab = dataset.data[idx, ts, :, :, :out_channels].astype(np.float32)
    lab = (lab - dataset.mean) / dataset.std
    np.savez(path, input=np.asarray(x), prediction=pred, label=lab)
    return path
