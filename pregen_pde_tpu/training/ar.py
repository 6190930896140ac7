"""Autoregressive-rollout training losses.

Covers both reference AR-training behaviors with one builder:

- scOT's `set_ar_steps` + `_model_forward` (`scOT/trainer.py:229-403`): int n →
  n homogeneous steps with time/n, list → heterogeneous step sizes; the
  prediction is fed back DETACHED (`outputs.output.detach()`), static input
  channels beyond the output channels are carried over, loss averaged over
  steps;
- the FNO/FFNO baselines' teacher-forced unroll over all target steps
  (`Autoregressive_Baseline_Scripts/scripts/train.py:245-263`): ground truth
  is fed back instead of the prediction (teacher_forcing=True).
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp

from pregen_pde_tpu.training.datasets import TIME_NORMALIZER
from pregen_pde_tpu.training.losses import relative_lp_loss


def make_ar_loss(
    apply_fn: Callable,
    steps: Sequence[int],
    out_channels: int = 3,
    time_channel: bool = True,
    teacher_forcing: bool = False,
    detach_feedback: bool = True,
    p: int = 1,
    final_label_only: bool = False,
):
    """Returns loss_fn(params, batch) for trajectory batches.

    batch: {"input": (B,H,W,Cin) frame at t=0 (incl. static channels and the
    lead-time channel last if time_channel), "labels": (B,K,H,W,out_channels)
    ground truth after each of the K steps}.

    ``final_label_only=True`` is the scOT Trainer's EXACT AR-training
    semantics (`scOT/trainer.py:234-403`): `inputs["labels"]` is never
    updated in `_model_forward`'s loop, so EVERY intermediate prediction is
    penalized toward the single final label (and only labels[:, -1] is
    consulted here). The default supervises each step with its own ground
    truth — the baselines' teacher-forced scheme
    (`scripts/train.py:245-263`) and the more informative target when
    per-step frames exist.
    """
    steps = list(steps)
    k_steps = len(steps)

    def loss_fn(params, batch):
        x = batch["input"]
        labels = batch["labels"]
        assert labels.shape[1] == k_steps
        total = 0.0
        for s_idx, jump in enumerate(steps):
            t = jnp.full((x.shape[0],), jump / TIME_NORMALIZER, x.dtype)
            if time_channel:
                tch = jnp.full((*x.shape[:3], 1), jump / TIME_NORMALIZER, x.dtype)
                x = jnp.concatenate([x[..., :-1], tch], axis=-1)
            pred = apply_fn({"params": params}, x, t)
            target = labels[:, -1] if final_label_only else labels[:, s_idx]
            total = total + relative_lp_loss(pred, target, p=p)
            feedback = labels[:, s_idx] if teacher_forcing else pred
            if detach_feedback and not teacher_forcing:
                feedback = jax.lax.stop_gradient(feedback)
            x = x.at[..., :out_channels].set(feedback)
        return total / k_steps

    return loss_fn


def homogeneous_steps(total_jump: int, n: int) -> list[int]:
    """set_ar_steps(int n) semantics: n equal steps covering total_jump
    (`scOT/trainer.py:240-260`, time divided by n)."""
    base = total_jump // n
    rem = total_jump - base * n
    return [base + (1 if i < rem else 0) for i in range(n)]


class TrajectoryBatcher:
    """Builds AR batches from a (N,T,H,W,6) contract array: seed frame t=0 +
    label sequence at cumulative steps (the baselines' sample layout,
    `utils/data_loader.py:146-151`)."""

    def __init__(self, data, steps: Sequence[int], mean, std,
                 out_channels: int = 3, time_channel: bool = True):
        import numpy as np

        self.data = data
        self.steps = list(steps)
        self.cum = np.cumsum(self.steps)
        self.mean, self.std = mean, std
        self.out_channels = out_channels
        self.time_channel = time_channel

    def make_batch(self, idx):
        import numpy as np

        d = self.data
        oc = self.out_channels
        inp = d[idx, 0].astype(np.float32).copy()
        inp[..., :oc] = (inp[..., :oc] - self.mean) / self.std
        if self.time_channel:
            tch = np.zeros((*inp.shape[:3], 1), np.float32)
            inp = np.concatenate([inp, tch], axis=-1)
        labels = d[idx][:, self.cum, :, :, :oc].astype(np.float32)
        labels = (labels - self.mean) / self.std
        return {"input": inp, "labels": labels}
