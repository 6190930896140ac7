"""Model train-step throughput on the real TPU chip (feeds PERF.md).

Measures a FULL train step (forward + backward + AdamW update) per model at
the reference training scales (CNO: `TrainCNO_time_L.py:23-72`; scOT-T/B:
`configs/mixing.yaml` + `scOT/train.py:35-72`; FNO/FFNO:
`config/config.yaml`). Prints one JSON line per configuration.

Run: `python examples/perf_models.py [--models cno,scot_t,scot_b,fno,ffno]`
Timing: submit + device_get of a small slice (block_until_ready is a no-op
through the tunnel — CLAUDE.md).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pregen_pde_tpu.training.losses import relative_lp_loss


def measure(model, batch, in_ch, out_ch, size, compute_dtype=None, reps=10):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, size, size, in_ch)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(batch, size, size, out_ch)).astype(np.float32))
    t = jnp.asarray(rng.uniform(size=(batch,)).astype(np.float32))
    # jit the init: eager flax init dispatches thousands of tiny programs
    # through the tunnel (minutes); jitted it is one compile
    params = jax.jit(lambda k: model.init(k, x, t)["params"])(jax.random.key(0))
    tx = optax.adamw(1e-4)
    opt_state = tx.init(params)

    def loss_fn(p):
        cast = (lambda a: a.astype(compute_dtype)) if compute_dtype else (lambda a: a)
        pred = model.apply({"params": jax.tree_util.tree_map(cast, p)},
                           cast(x), t)
        return relative_lp_loss(pred.astype(jnp.float32), y)

    from functools import partial

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params, opt_state, loss = step(params, opt_state)  # compile
    jax.device_get(loss)
    t0 = time.perf_counter()
    for _ in range(reps):
        params, opt_state, loss = step(params, opt_state)
    jax.device_get(loss)
    dt = (time.perf_counter() - t0) / reps
    n_par = sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(params))
    return dt, n_par


def measure_infer(model, batch, in_ch, out_ch, size, compute_dtype=None,
                  reps=20):
    """Forward-only (serving) throughput: jitted apply, params pre-cast."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, size, size, in_ch)).astype(np.float32))
    t = jnp.asarray(rng.uniform(size=(batch,)).astype(np.float32))
    params = jax.jit(lambda k: model.init(k, x, t)["params"])(jax.random.key(0))
    if compute_dtype is not None:
        params = jax.tree_util.tree_map(
            lambda l: l.astype(compute_dtype), params)
        x = x.astype(compute_dtype)

    @jax.jit
    def fwd(p, xx, tt):
        return model.apply({"params": p}, xx, tt)

    out = fwd(params, x, t)
    jax.device_get(out[0, 0, 0, :1])  # sync (block_until_ready is a no-op)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fwd(params, x, t)
    jax.device_get(out[0, 0, 0, :1])
    dt = (time.perf_counter() - t0) / reps
    n_par = sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(params))
    return dt, n_par


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default="cno,scot_t,scot_b,fno,ffno")
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--inference", action="store_true",
                    help="forward-only (serving) throughput instead of the "
                         "train step")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--fast", action="store_true",
                    help="toy sizes for CI smoke (tests/test_examples.py)")
    args = ap.parse_args()
    from pregen_pde_tpu.utils.misc import use_best_backend

    use_best_backend()  # tolerate the tunnel's shifting platform name
    want = args.models.split(",")
    dtype = jnp.bfloat16 if args.bf16 else None
    global measure
    bs = args.batch
    if args.inference:
        measure = measure_infer
    if args.fast:
        _measure_full = measure

        def measure(m, batch, cin, cout, size, dt):  # noqa: F811
            return _measure_full(m, 2, cin, cout, 32, dt, reps=1)

    if "cno" in want:
        from pregen_pde_tpu.models.cno import CNO

        m = CNO(in_size=128, out_dim=3, n_layers=3, n_res=4, n_res_neck=6,
                channel_multiplier=32)
        dt, n = measure(m, bs, 7, 3, 128, dtype)
        print(json.dumps({"model": "CNO 128^2 mult=32 (ref scale)", "params": n,
                          "batch": bs, "ms_per_step": round(dt * 1e3, 2),
                          "samples_per_s": round(bs / dt, 1)}))

    for name, key in [("scot_t", "T"), ("scot_s", "S"), ("scot_b", "B"), ("scot_l", "L")]:
        if name in want:
            from pregen_pde_tpu.models.scot import MODEL_SIZES, ScOT, ScOTConfig

            cfg = ScOTConfig(image_size=128, num_channels=6, num_out_channels=3,
                             **MODEL_SIZES[key])
            m = ScOT(cfg)
            dt, n = measure(m, bs, 6, 3, 128, dtype)
            print(json.dumps({"model": f"scOT-{key} 128^2 (mixing.yaml scale)",
                              "params": n, "batch": bs,
                              "ms_per_step": round(dt * 1e3, 2),
                              "samples_per_s": round(bs / dt, 1)}))

    if "fno" in want:
        from pregen_pde_tpu.models.fno import FNO2d

        m = FNO2d(out_channels=3, modes=12, width=48, n_layers=4)
        dt, n = measure(m, bs, 6, 3, 128, dtype)
        print(json.dumps({"model": "FNO 128^2 modes=12 width=48", "params": n,
                          "batch": bs, "ms_per_step": round(dt * 1e3, 2),
                          "samples_per_s": round(bs / dt, 1)}))

    if "ffno" in want:
        from pregen_pde_tpu.models.ffno import FFNO2d

        m = FFNO2d(out_channels=3, modes=12, width=48, n_layers=4)
        dt, n = measure(m, bs, 6, 3, 128, dtype)
        print(json.dumps({"model": "FFNO 128^2 modes=12 width=48", "params": n,
                          "batch": bs, "ms_per_step": round(dt * 1e3, 2),
                          "samples_per_s": round(bs / dt, 1)}))


if __name__ == "__main__":
    main()
