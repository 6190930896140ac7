"""Autoregressive rollout evaluation.

The reference evaluates three rollout regimes (`TestCNO_ALL.py:412`,
`_test_pattern :71-198`): direct prediction (pattern [k]), heterogeneous AR
(e.g. [2,2,2,1] — jump sizes fed back), homogeneous AR ([1]*k). A pattern is a
list of time-jumps; after each jump the prediction replaces the physical
channels of the input while static channels (Re, mask, SDF, time) are kept —
the same feedback scheme as scOT's `set_ar_steps`/`_model_forward`
(`scOT/trainer.py:229-403`).

Implemented as one jitted scan-free python loop over the (short, static)
pattern; each step is a jitted model call.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from pregen_pde_tpu.training.datasets import TIME_NORMALIZER
from pregen_pde_tpu.training.metrics import error_summary


def rollout_pattern(
    apply_fn: Callable,
    params,
    inp: jax.Array,  # (B, H, W, Cin) — normalized, time channel last if present
    pattern: Sequence[int],
    time_channel: bool = True,
    out_channels: int = 3,
    time_step_size: int = 1,
    pixel_mask: jax.Array | None = None,
    forced_labels: Sequence[jax.Array] | None = None,
    time_normalizer: float = TIME_NORMALIZER,
) -> list[jax.Array]:
    """Run the AR pattern, returning the prediction after each jump.

    The prediction overwrites input channels [0, out_channels); the lead-time
    channel (last) is rewritten each step to
    jump·time_step_size/time_normalizer — the reference's jump·delta with
    delta = dt/max_steps (`TestCNO_ALL.py:88,141-146`). The normalizer is the
    dataset's (19 for the generated contract; 20/15/10 for the benchmark
    families — pass the spec's value).

    ``pixel_mask`` + ``forced_labels`` replicate the reference's
    prediction-level forcing (`scOT/model.py:1372-1374`): after each step,
    prediction pixels where the mask is set are overwritten with that step's
    forced label frame, and the FORCED prediction is fed back — so forced
    channels propagate through the AR feedback exactly as in the reference
    (scOT applies this inside forward; here it covers every model family)."""
    preds = []
    x = inp
    for s_idx, jump in enumerate(pattern):
        lead = jump * time_step_size / time_normalizer
        t = jnp.full((x.shape[0],), lead, x.dtype)
        if time_channel:
            tch = jnp.full((*x.shape[:3], 1), lead, x.dtype)
            x = jnp.concatenate([x[..., :-1], tch], axis=-1)
        pred = apply_fn({"params": params}, x, t)
        if pixel_mask is not None:
            if forced_labels is None:
                raise ValueError("pixel_mask forcing requires forced_labels")
            pred = jnp.where(pixel_mask, forced_labels[s_idx].astype(pred.dtype),
                             pred)
        preds.append(pred)
        # explicit cast: an implicit f64→f32 scatter cast is a FutureWarning
        # slated to become an error (and dtype-tiered runs do mix f32 preds
        # into f64 rollout state under jax_enable_x64 tests)
        x = x.at[..., :out_channels].set(pred.astype(x.dtype))
    return preds


def evaluate_patterns(
    apply_fn: Callable,
    params,
    dataset,
    patterns: Sequence[Sequence[int]],
    batch_size: int = 16,
    out_channels: int = 3,
    label_description: str | None = None,
) -> dict[str, dict]:
    """For each pattern, roll out from t=0 inputs and score the final state
    against the true frame at t = sum(pattern) (per-step sums ≡ reference
    `_test_pattern` accumulation). Dataset must be a TimePairDataset-like over
    the contract array with `fix`-style access to raw frames."""
    data = dataset.data
    mean, std = dataset.mean, dataset.std
    start, n = dataset.start, dataset.n_traj
    time_channel = dataset.cfg.time_input
    results = {}
    fwd = jax.jit(apply_fn)

    for pattern in patterns:
        t_final = int(np.sum(pattern)) * dataset.cfg.time_step_size
        preds_all, labs_all = [], []
        for s in range(0, n, batch_size):
            idx = np.arange(start + s, start + min(s + batch_size, n))
            frames0 = data[idx, 0].astype(np.float32).copy()  # (B,H,W,6)
            frames0[..., :out_channels] = (
                frames0[..., :out_channels] - mean
            ) / std
            if time_channel:
                tch = np.zeros((*frames0.shape[:3], 1), np.float32)
                inp = np.concatenate([frames0, tch], axis=-1)
            else:
                inp = frames0
            preds = rollout_pattern(
                fwd, params, jnp.asarray(inp), pattern,
                time_channel=time_channel, out_channels=out_channels,
                time_step_size=dataset.cfg.time_step_size,
                time_normalizer=float(
                    getattr(getattr(dataset, "spec", None), "time_normalizer",
                            TIME_NORMALIZER)
                ),
            )
            lab = data[idx, t_final, :, :, :out_channels].astype(np.float32)
            lab = (lab - mean) / std
            preds_all.append(np.asarray(preds[-1]))
            labs_all.append(lab)
        pa, la = np.concatenate(preds_all), np.concatenate(labs_all)
        if label_description is not None:
            # per-variable-group reporting ≡ the reference's separate_dim /
            # channel_slice_list metrics (`TestCNO_ALL.py:166-186`,
            # `scOT/train.py:455-523`)
            from pregen_pde_tpu.training.metrics import grouped_error_summary

            results[str(list(pattern))] = grouped_error_summary(
                pa, la, label_description
            )
        else:
            results[str(list(pattern))] = error_summary(pa, la)
    return results
