"""scOT train-step cost breakdown on chip (VERDICT r3 #5: why is bf16 flat,
and where does the step go?).

Measures full train steps (fwd+bwd+AdamW, donated state) for an ablation
matrix around the reference-exact scOT, plus forward-only timings — the
differences localize the cost between the attention path, the conditional
layer norms, drop-path/regularization, and the backward pass. Prints one
JSON line per measurement.

Usage: python examples/profile_scot.py [--size T|B] [--batch 16] [--res 128]
"""

from __future__ import annotations

import argparse
import json
import time
from functools import partial


def measure_step(model, batch, res, cin, cout, compute_dtype=None, reps=20,
                 fwd_only=False, train_flag=True, split=None, flat_opt=False):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from pregen_pde_tpu.training.losses import relative_lp_loss

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, res, res, cin)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(batch, res, res, cout)).astype(np.float32))
    t = jnp.asarray(rng.uniform(size=(batch,)).astype(np.float32))
    params = jax.jit(lambda k: model.init(k, x, t)["params"])(jax.random.key(0))
    params = jax.tree_util.tree_map(
        lambda l: jax.lax.convert_element_type(l, l.dtype), params)
    if flat_opt == "flatten":
        # optax.flatten DOES NOT COMPILE at scOT-B on TPU: the whole-tree
        # ravel makes XLA materialize a padded (52.6M, 3) layout intermediate
        # (26.9 GB > HBM) — kept as a case to document the dead end
        tx = optax.flatten(optax.adamw(1e-4))
    elif flat_opt:
        from pregen_pde_tpu.training.fused_optim import fused_adamw

        tx = fused_adamw(1e-4, weight_decay=1e-4)
    else:
        tx = optax.adamw(1e-4)
    opt_state = tx.init(params)
    cast = ((lambda a: a.astype(compute_dtype)) if compute_dtype
            else (lambda a: a))
    drng = jax.random.key(1)

    def apply(p, xx, tt):
        kw = {}
        if train_flag:
            kw = dict(train=True, rngs={"dropout": drng})
        return model.apply({"params": jax.tree_util.tree_map(cast, p)},
                           cast(xx), tt, **kw)

    def loss_fn(p):
        return relative_lp_loss(apply(p, x, t).astype(jnp.float32), y)

    if split == "grad":
        # backward share alone: params are NOT donated (unchanged across
        # iterations) and NOT returned (returning an undonated input copies
        # the whole 157M-param tree — see fwd_only note); the gradient tree
        # is written into a donated grads-shaped buffer each call.
        @partial(jax.jit, donate_argnums=(1,))
        def _grad(p, gbuf):
            loss, grads = jax.value_and_grad(loss_fn)(p)
            return grads, loss

        gbuf = jax.tree_util.tree_map(jnp.zeros_like, params)

        def step(params, opt_state):
            nonlocal gbuf
            gbuf, loss = _grad(params, gbuf)
            return params, opt_state, loss
    elif split == "opt":
        # optimizer share alone: AdamW update + apply on a fixed grads tree
        grads = jax.tree_util.tree_map(
            lambda l: jnp.full_like(l, 1e-4), params)

        @partial(jax.jit, donate_argnums=(0, 1))
        def step(params, opt_state):
            updates, new_state = tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            sc = jax.tree_util.tree_leaves(new_params)[0].ravel()[0]
            return new_params, new_state, sc
    elif fwd_only:
        # return ONLY the loss: returning the (undonated) param tree copies
        # the whole model every step (measured: 157M params inflated the
        # scOT-B forward above the full train step)
        _loss_only = jax.jit(loss_fn)

        def step(params, opt_state):
            return params, opt_state, _loss_only(params)
    else:
        @partial(jax.jit, donate_argnums=(0, 1))
        def step(params, opt_state):
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

    params, opt_state, loss = step(params, opt_state)
    jax.device_get(loss)  # sync (block_until_ready is a no-op on the tunnel)
    t0 = time.perf_counter()
    for _ in range(reps):
        params, opt_state, loss = step(params, opt_state)
    jax.device_get(loss)
    return (time.perf_counter() - t0) / reps * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="B")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--cases", default="base_f32,base_bf16,fwd_f32,fwd_bf16,"
                    "noCondLN_f32,noTrainFlag_f32,window8_f32,remat_f32,"
                    "fused_f32,fused_bf16")
    args = ap.parse_args()

    from pregen_pde_tpu.utils.compcache import enable_persistent_cache
    from pregen_pde_tpu.utils.misc import use_best_backend

    use_best_backend()
    enable_persistent_cache()
    import jax.numpy as jnp

    from pregen_pde_tpu.models.scot import MODEL_SIZES, ScOT, ScOTConfig

    kw0 = dict(MODEL_SIZES[args.size])
    cin, cout = 6, 3

    def make(**over):
        return ScOT(ScOTConfig(image_size=args.res, num_channels=cin,
                               num_out_channels=cout, **{**kw0, **over}))

    cases = {
        # base_* follow attention_impl="auto" (fused on single-device TPU);
        # xla_* pin the einsum attention path for an explicit baseline
        "base_f32": (make(), None, False, True),
        "base_bf16": (make(), jnp.bfloat16, False, True),
        "xla_f32": (make(attention_impl="xla"), None, False, True),
        "xla_bf16": (make(attention_impl="xla"), jnp.bfloat16, False, True),
        "fwd_f32": (make(), None, True, True),
        "fwd_bf16": (make(), jnp.bfloat16, True, True),
        # ablations pin attention_impl="xla" so their deltas are measured
        # against the xla baseline, not the Pallas path
        # conditioning off: every ConditionalLayerNorm becomes a plain LN
        "noCondLN_f32": (make(use_conditioning=False, attention_impl="xla"),
                         None, False, True),
        # train=False: drop-path/dropout branches compiled out
        "noTrainFlag_f32": (make(attention_impl="xla"), None, False, False),
        # window 8: attention cost scales ~w^2 per token — localizes the
        # window-attention share
        "window8_f32": (make(window_size=8, attention_impl="xla"),
                        None, False, True),
        # fwd-only with xla attention (backward share)
        "xla_fwd_f32": (make(attention_impl="xla"), None, True, True),
        "remat_f32": ("remat", None, False, True),
        # fwd+bwd only (no optimizer): the backward share in isolation
        "gradonly_f32": (make(attention_impl="xla"), None, "grad", True),
        "gradonly_bf16": (make(attention_impl="xla"), jnp.bfloat16, "grad",
                          True),
        # AdamW update alone on the 157M-param tree (HBM-bound)
        "optonly_f32": (make(attention_impl="xla"), None, "opt", True),
        # depth linearity: 16 enc blocks instead of 32 at embed 96
        "halfdepth_f32": (make(depths=(4, 4, 4, 4), attention_impl="xla"),
                          None, False, True),
        # bucketed fused AdamW (training/fused_optim.py): one update kernel
        # per (dtype, decay) bucket instead of ~1200 per-leaf chains
        "optfused_f32": (make(attention_impl="xla"), None, "opt", True),
        "fusedstep_f32": (make(attention_impl="xla"), None, False, True),
        "fusedstep_bf16": (make(attention_impl="xla"), jnp.bfloat16, False,
                           True),
        # optax.flatten (whole-tree ravel): measured NOT to compile at
        # scOT-B on TPU (26.9 GB padded relayout) — see measure_step
        "optflat_f32": (make(attention_impl="xla"), None, "opt", True),
        # Pallas VMEM-resident window attention (ops/window_attention.py)
        "fused_f32": (make(attention_impl="fused"), None, False, True),
        "fused_bf16": (make(attention_impl="fused"), jnp.bfloat16, False, True),
        "fused_fwd_f32": (make(attention_impl="fused"), None, True, True),
        # whole-Swin-block fusion (ops/swin_block.py): one kernel per layer
        # for stages with C ≤ MAX_FUSED_DIM; VJP recomputes via jnp (the
        # full-step case measures fwd-fusion + recompute-backward, the fwd
        # case the pure kernel win)
        "block_f32": (make(block_impl="fused"), None, False, True),
        "block_bf16": (make(block_impl="fused"), jnp.bfloat16, False, True),
        "block_fwd_f32": (make(block_impl="fused"), None, True, True),
        "block_fwd_bf16": (make(block_impl="fused"), jnp.bfloat16, True, True),
        "block_grad_f32": (make(block_impl="fused"), None, "grad", True),
    }
    want = args.cases.split(",")
    for name in want:
        model, dt, fwd, tf = cases[name]
        if model == "remat":
            import jax

            base = make(attention_impl="xla")

            class _R:
                def init(self, *a, **k):
                    return base.init(*a, **k)

                def apply(self, *a, **k):
                    return jax.checkpoint(
                        lambda p, xx, tt: base.apply(p, xx, tt, **k)
                    )(a[0], a[1], a[2])

            model = _R()
        split = fwd if isinstance(fwd, str) else None
        ms = measure_step(model, args.batch, args.res, cin, cout,
                          compute_dtype=dt, reps=args.reps,
                          fwd_only=(fwd is True), train_flag=tf, split=split,
                          flat_opt=("flatten" if name.startswith("optflat")
                                    else name.startswith(("optfused",
                                                          "fusedstep"))))
        print(json.dumps({"case": name, "size": args.size,
                          "batch": args.batch, "res": args.res,
                          "ms_per_step": round(ms, 2)}), flush=True)


if __name__ == "__main__":
    main()
