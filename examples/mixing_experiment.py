"""The headline experiment: multi-difficulty data mixing (reference README
claim: ~8.9× classical-solver compute saved at equal error by mixing cheap
easy trajectories with a few hard ones, `README.md:41,75-79`).

This is the reference's ACTUAL headline configuration — **geometry
difficulty** (`README.md:18-21`, `scOT/mixingexp.py:299-384,650-711`):

- EASY = flow past obstacle-free domain (`fpo_regular` — the reference's
  no-hole Gaussians set), HARD = random multi-hole geometry
  (`fpo_multi_hole` ≡ `Multiple_Hole/main.py`);
- for each α: train on α·N hard + (1−α)·N easy with shared streaming
  normalization stats (≡ `streaming_stats`, `mixingexp.py:275-296`);
- evaluate every model on BOTH held-out test sets (hole and no-hole,
  `mixingexp.py:650-711`);
- models: CNO (the reference's primary mixing model here) — `--model
  fno|cno|scot-T` selects the family.

Run `--fast` for a minutes-scale smoke configuration. The physics-difficulty
variant (viscosity axis) remains available through the CLI `mix-sweep` on
`ns_spectral` datasets. Full measured tables live in PERF.md.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import numpy as np

from pregen_pde_tpu.datagen.masked_ns import MaskedNSConfig, generate_masked_ns_batch
from pregen_pde_tpu.training.datasets import (
    BatchLoader,
    TimePairConfig,
    make_mixed_datasets,
)
from pregen_pde_tpu.training.native_loader import make_batch_loader
from pregen_pde_tpu.training.trainer import Trainer, TrainerConfig


def _make_model(name, in_size, fast):
    if name == "fno":
        from pregen_pde_tpu.models.fno import FNO2d

        return FNO2d(out_channels=3, modes=8 if fast else 12,
                     width=16 if fast else 32, n_layers=2 if fast else 4)
    if name == "cno":
        from pregen_pde_tpu.models.cno import CNO

        # the reference mixing CNO (`TrainCNO_time_L.py:46-72` scale, shrunk
        # in --fast); in_size must divide by 2^n_layers
        return CNO(in_size=in_size, out_dim=3,
                   n_layers=2 if fast else 3,
                   n_res=1 if fast else 4,
                   n_res_neck=2 if fast else 6,
                   channel_multiplier=8 if fast else 32)
    if name.startswith("scot"):
        from pregen_pde_tpu.models.scot import MODEL_SIZES, ScOT, ScOTConfig

        size = name.split("-")[1].upper() if "-" in name else "T"
        kw = dict(MODEL_SIZES[size])
        if fast:
            kw["embed_dim"] = 16
            kw["num_heads"] = (2, 4, 8, 16)  # embed 16 not divisible by 3
        return ScOT(ScOTConfig(image_size=in_size, num_channels=7,
                               num_out_channels=3, **kw))
    raise SystemExit(f"unknown model {name}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fast", action="store_true")
    ap.add_argument("--model", default="cno", help="fno | cno | scot-T/S/B/L")
    ap.add_argument("--n", type=int, default=None, help="trajectories per difficulty")
    ap.add_argument("--alphas", default="0.0,0.25,0.5,0.75,1.0")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--batch-size", type=int, default=8)
    args = ap.parse_args()

    from pregen_pde_tpu.utils.compcache import enable_persistent_cache
    from pregen_pde_tpu.utils.misc import use_best_backend

    use_best_backend()  # tolerate the tunnel's shifting platform name
    enable_persistent_cache()
    fast = args.fast
    n = args.n or (24 if fast else 256)
    epochs = args.epochs or (2 if fast else 100)
    res = 32 if fast else 128
    gen_kw = dict(
        resolution=res,
        dt=0.05 if fast else 0.2,
        n_snapshots=4 if fast else 20,
        time_scale=2e-4 if fast else 1.0,
        cg_iters=60 if fast else 150,
    )

    # geometry difficulty: same physics sampling, holes vs no holes
    t0 = time.time()
    hard = generate_masked_ns_batch(
        jax.random.key(0), MaskedNSConfig(pipeline="fpo_multi_hole", **gen_kw), n
    )
    t_hard = time.time() - t0
    t0 = time.time()
    easy = generate_masked_ns_batch(
        jax.random.key(1), MaskedNSConfig(pipeline="fpo_regular", **gen_kw), n
    )
    t_easy = time.time() - t0
    print(json.dumps({"gen_hard_s": round(t_hard, 1),
                      "gen_easy_s": round(t_easy, 1)}), flush=True)

    t_steps = hard.shape[1] - 1
    cfg = TimePairConfig(
        max_num_time_steps=t_steps, allowed_transitions=[1],
        n_val=max(2, n // 8), n_test=max(2, n // 8),
    )
    n_train = n - cfg.n_val - cfg.n_test
    results = {}
    for alpha in [float(a) for a in args.alphas.split(",")]:
        train, vh, ve, th, te = make_mixed_datasets(hard, easy, alpha, n_train, cfg)
        model = _make_model(args.model, res, fast)
        trainer = Trainer(model, TrainerConfig(
            learning_rate=1e-3 if args.model == "fno" else 5e-5,
            epochs=epochs, batch_size=args.batch_size,
            early_stop_patience=None,
        ))
        trainer.fit(
            make_batch_loader(train, args.batch_size, seed=0),
            val_loaders={"vh": BatchLoader(vh, args.batch_size, shuffle=False),
                         "ve": BatchLoader(ve, args.batch_size, shuffle=False)},
        )
        trainer.restore_best()
        bs = args.batch_size
        results[alpha] = {
            "test_hard": trainer.evaluate(BatchLoader(th, bs, shuffle=False)),
            "test_easy": trainer.evaluate(BatchLoader(te, bs, shuffle=False)),
            # generation-cost proxy: each α's dataset costs α·t_hard +
            # (1−α)·t_easy of solver time (the 8.9× mechanism's x-axis)
            "gen_cost_s": round(alpha * t_hard + (1 - alpha) * t_easy, 1),
        }
        print(json.dumps({"alpha": alpha, **results[alpha]}), flush=True)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
