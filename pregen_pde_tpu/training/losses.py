"""Relative-Lp losses and per-channel-group variants.

Loss of record across all three reference stacks: relative L1
(`CNO_timeModule_CIN.py:938-939`), per-channel-group normalized L1/L2 inside
the model forward (`scOT/model.py:1376-1435`), masked MSE
(`scripts/train.py:161-169`). Implemented once here as pure functions.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def relative_lp_loss(
    pred: jax.Array,
    target: jax.Array,
    p: int = 1,
    eps: float = 1e-10,
    reduce_batch: bool = True,
) -> jax.Array:
    """mean over batch of  ||pred − target||_p / (||target||_p + eps),
    norms over all non-batch axes (reference CNO loss)."""
    axes = tuple(range(1, pred.ndim))
    if p == 1:
        num = jnp.sum(jnp.abs(pred - target), axis=axes)
        den = jnp.sum(jnp.abs(target), axis=axes)
    else:
        num = jnp.sum(jnp.abs(pred - target) ** p, axis=axes) ** (1.0 / p)
        den = jnp.sum(jnp.abs(target) ** p, axis=axes) ** (1.0 / p)
    rel = num / (den + eps)
    return jnp.mean(rel) if reduce_batch else rel


def grouped_relative_lp_loss(
    pred: jax.Array,
    target: jax.Array,
    channel_groups: Sequence[Sequence[int]],
    p: int = 1,
    eps: float = 1e-10,
) -> jax.Array:
    """Mean of per-group relative Lp over channel groups (scOT's
    `channel_slice_list_normalized_loss`, `scOT/model.py:1376-1435`)."""
    losses = [
        relative_lp_loss(pred[..., list(g)], target[..., list(g)], p=p, eps=eps)
        for g in channel_groups
    ]
    return jnp.mean(jnp.stack(losses))


def masked_mse(pred: jax.Array, target: jax.Array, valid: jax.Array,
               eps: float = 1e-8) -> jax.Array:
    """MSE over valid (fluid) pixels only (`scripts/train.py:161-169`).
    valid broadcastable to pred, 1 = count."""
    num = jnp.sum(((pred - target) ** 2) * valid)
    den = jnp.sum(jnp.broadcast_to(valid, pred.shape)) + eps
    return num / den
