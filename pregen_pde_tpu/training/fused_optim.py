"""Bucketed ("fused") AdamW — one update kernel per bucket instead of ~1200
per-leaf chains. Kept as an OPTION (`TrainerConfig.fused_optimizer`), not
the default — measured outcome below.

scOT-B's parameter tree has ~1200 leaves; `optax.adamw` runs its ~8-op
elementwise chain per leaf, so one ISOLATED optimizer step is ~10k tiny
HLOs: measured 35.0 ms alone at scOT-B (157M params) vs a ~6 ms HBM
roofline, and this bucketed version cuts that to 25.3 ms. Inside the
jitted TRAIN STEP, however, XLA fuses each leaf's update chain into the
backward kernels that produce its gradient, so the per-leaf form costs
only ~9 ms in-step — while bucketing forces every gradient to materialize
before one serialized gather→update→scatter chain and REGRESSES the full
step 46.8 → 60.4 ms/step (v5e, PERF.md round 4). The analogous torch
notion is foreach/fused AdamW, which wins there because torch runs eager
per-leaf kernels with real launch overhead; under XLA the compiler already
performs the better fusion. Measured dead ends recorded here so nobody
re-walks them: `optax.flatten` does not even compile at this scale (the
whole-tree ravel makes XLA materialize a padded f32[52.6M, 3] relayout =
26.9 GB > HBM).

`fused_adamw` keeps optax's exact AdamW semantics but concatenates all
leaves that share (dtype, decay-flag) into a single 1-D bucket and runs the
update math once per bucket. Elementwise math on a raveled vector is
bit-identical per element to the per-leaf chain, so this is numerically
THE SAME optimizer — the torch-pinned optimizer oracles
(`tests/test_reference_oracle.py`) hold unchanged, and
`tests/test_training.py::test_fused_adamw_bit_identical_to_optax` asserts
exact equality of params and optimizer state over several steps.

Works inside `optax.multi_transform` (the scOT 4-group tiered optimizer,
`training/tiers.py`): `optax.MaskedNode` placeholders flatten to zero
leaves, so masked-out parameters never enter a bucket.

Reference semantics matched: `optax.adamw(learning_rate, b1, b2, eps,
eps_root, weight_decay, mask)` == chain(scale_by_adam,
add_decayed_weights(wd, mask), scale_by_learning_rate(lr)) — bias
correction at count+1, schedule evaluated at count, decay added to the
Adam direction then jointly scaled by -lr.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Union

import jax
import jax.numpy as jnp
import numpy as np
import optax


class FusedAdamWState(NamedTuple):
    count: jax.Array  # int32 scalar, shared by bias correction + schedule
    mu: dict  # bucket key -> 1-D vector
    nu: dict  # bucket key -> 1-D vector


def _bucket_plan(params, mask):
    """Static bucketing of array leaves by (dtype, decay flag).

    Returns (treedef, plan) where plan maps bucket key -> list of
    (leaf_index, shape, size, offset) and the per-bucket decay flag.
    """
    mask_tree = mask(params) if callable(mask) else mask
    leaves, treedef = jax.tree_util.tree_flatten(params)
    if mask_tree is None:
        flags = [True] * len(leaves)
    else:
        flags = jax.tree_util.tree_leaves(mask_tree)
        assert len(flags) == len(leaves), "mask/param tree mismatch"
    plan: dict[str, dict[str, Any]] = {}
    for i, (leaf, decay) in enumerate(zip(leaves, flags)):
        key = f"{jnp.asarray(leaf).dtype}_{'d' if bool(decay) else 'n'}"
        b = plan.setdefault(key, {"decay": bool(decay), "items": [],
                                  "size": 0})
        size = int(np.prod(leaf.shape) or 1)
        # pad every leaf's ravel to a 128-lane multiple: each slice of the
        # bucket is then tile-aligned (TPU minor dim = 128 lanes), which
        # keeps XLA from rewriting the concat/slice chain into a padded-2-D
        # relayout (measured: an unpadded 157M bucket compiled to a
        # f32[52.6M, 3]{T(8,128)} reshape = 26.9 GB > HBM)
        pad = -size % 128
        b["items"].append((i, leaf.shape, size, b["size"]))
        b["size"] += size + pad
    return treedef, plan


def _gather(leaves, bucket):
    parts = []
    for i, _, size, _ in bucket["items"]:
        flat = jnp.ravel(leaves[i])
        pad = -size % 128
        parts.append(jnp.pad(flat, (0, pad)) if pad else flat)
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts)


def _scatter(vec, bucket, out_leaves):
    for i, shape, size, off in bucket["items"]:
        out_leaves[i] = jax.lax.slice_in_dim(vec, off, off + size) \
            .reshape(shape)


def fused_adamw(
    learning_rate: Union[float, Callable],
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    eps_root: float = 0.0,
    weight_decay: float = 1e-4,
    mask=None,
) -> optax.GradientTransformation:
    """Drop-in, bit-identical replacement for ``optax.adamw`` (mu_dtype and
    nesterov not supported — the project never uses them)."""

    def init(params):
        _, plan = _bucket_plan(params, mask)
        leaves = jax.tree_util.tree_leaves(params)
        mu = {k: jnp.zeros((b["size"],),
                           dtype=leaves[b["items"][0][0]].dtype)
              for k, b in plan.items()}
        nu = {k: v for k, v in
              ((k, jnp.zeros_like(m)) for k, m in mu.items())}
        return FusedAdamWState(jnp.zeros([], jnp.int32), mu, nu)

    def update(grads, state, params=None):
        if params is None:
            raise ValueError("fused_adamw requires params (weight decay)")
        treedef, plan = _bucket_plan(params, mask)
        g_leaves = jax.tree_util.tree_leaves(grads)
        p_leaves = jax.tree_util.tree_leaves(params)
        assert len(g_leaves) == len(p_leaves)

        count_inc = optax.safe_int32_increment(state.count)
        lr = (learning_rate(state.count) if callable(learning_rate)
              else learning_rate)
        if (set(plan) != set(state.mu)
                or any(plan[k]["size"] != state.mu[k].shape[0]
                       for k in plan)):
            raise ValueError(
                "fused_adamw: parameter tree bucketing no longer matches the "
                "optimizer state (param dtypes/shapes changed after init — "
                f"state {[(k, v.shape[0]) for k, v in state.mu.items()]} vs "
                f"params {[(k, b['size']) for k, b in plan.items()]}). "
                "Re-initialize the optimizer for the new tree "
                "(Trainer.replace_params does this).")
        new_mu, new_nu = {}, {}
        out_leaves: list = [None] * len(g_leaves)
        for key, bucket in plan.items():
            g = _gather(g_leaves, bucket)
            c = g.dtype
            mu = state.mu[key] * jnp.asarray(b1, c) + \
                g * jnp.asarray(1 - b1, c)
            nu = state.nu[key] * jnp.asarray(b2, c) + \
                (g * g) * jnp.asarray(1 - b2, c)
            # optax.tree_bias_correction, formula copied verbatim for bit
            # identity: python-float ** int32 count (integer-exponent power
            # lowers differently from float pow), THEN cast to the moment
            # dtype
            bc1 = (1 - b1**count_inc).astype(c)
            bc2 = (1 - b2**count_inc).astype(c)
            upd = (mu / bc1) / (jnp.sqrt(nu / bc2 + eps_root) + eps)
            if weight_decay and bucket["decay"]:
                upd = upd + jnp.asarray(weight_decay, c) * \
                    _gather(p_leaves, bucket)
            upd = upd * jnp.asarray(-lr, c)
            new_mu[key], new_nu[key] = mu, nu
            _scatter(upd, bucket, out_leaves)
        updates = jax.tree_util.tree_unflatten(treedef, out_leaves)
        return updates, FusedAdamWState(count_inc, new_mu, new_nu)

    return optax.GradientTransformation(init, update)
