"""The headline experiment: multi-difficulty data mixing (reference README
claim: ~8.9× classical-solver compute saved at equal error by mixing cheap
easy trajectories with a few hard ones).

End-to-end protocol (reference `scOT/mixingexp.py` + `CNO_timeModule_CIN.py`
mixing dataloaders), on this framework:

1. generate a HARD dataset (multi-hole geometry, Re-sampled physics) and an
   EASY dataset (no holes) with the masked-NS pipelines;
2. for each α in the sweep: train on α·N hard + (1−α)·N easy with shared
   normalization stats;
3. evaluate every model on held-out hard AND easy test sets;
4. report the α → (test_hard, test_easy) table. Generation cost per α follows
   from the Re-dependent horizon schedule: hard trajectories integrate up to
   27× longer, so low-α mixes are proportionally cheaper to generate.

Run `--fast` for a minutes-scale smoke configuration.

Measured on one v5e chip (physics-difficulty variant via the CLI: easy
ν=1e-3 / hard ν=2e-5 spectral datasets + `mix-sweep`, FNO, 64 train
trajectories — full numbers in PERF.md):

    alpha 0.0 (all easy):  test-hard 16.5 %   test-easy  6.4 %  (median rel)
    alpha 0.5 (mixed):     test-hard  9.9 %   test-easy  6.2 %
    alpha 1.0 (all hard):  test-hard  8.5 %   test-easy 25.7 %

i.e. the 50/50 mix recovers most of the all-hard accuracy on hard data at
half the hard-trajectory generation cost while keeping the easy-domain
accuracy that all-hard training loses — the reference's headline mechanism.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import numpy as np

from pregen_pde_tpu.datagen.masked_ns import MaskedNSConfig, generate_masked_ns_batch
from pregen_pde_tpu.models.fno import FNO2d
from pregen_pde_tpu.training.datasets import (
    BatchLoader,
    TimePairConfig,
    make_mixed_datasets,
)
from pregen_pde_tpu.training.trainer import Trainer, TrainerConfig


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fast", action="store_true")
    ap.add_argument("--n", type=int, default=None, help="trajectories per difficulty")
    ap.add_argument("--alphas", default="0.0,0.25,0.5,1.0")
    ap.add_argument("--epochs", type=int, default=None)
    args = ap.parse_args()

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

    t0 = time.time()
    hard = generate_masked_ns_batch(
        jax.random.key(0), MaskedNSConfig(pipeline="fpo_multi_hole", **gen_kw), n
    )
    t_hard = time.time() - t0
    t0 = time.time()
    easy = generate_masked_ns_batch(
        jax.random.key(1), MaskedNSConfig(pipeline="ldc_regular", **gen_kw), n
    )
    t_easy = time.time() - t0
    print(json.dumps({"gen_hard_s": round(t_hard, 1), "gen_easy_s": round(t_easy, 1)}))

    t_steps = hard.shape[1] - 1
    cfg = TimePairConfig(
        max_num_time_steps=t_steps, allowed_transitions=[1],
        n_val=max(2, n // 8), n_test=max(2, n // 8),
    )
    n_train = n - cfg.n_val - cfg.n_test
    results = {}
    for alpha in [float(a) for a in args.alphas.split(",")]:
        train, vh, ve, th, te = make_mixed_datasets(hard, easy, alpha, n_train, cfg)
        model = FNO2d(out_channels=3, modes=8 if fast else 12,
                      width=16 if fast else 32, n_layers=2 if fast else 4)
        trainer = Trainer(model, TrainerConfig(
            learning_rate=1e-3, epochs=epochs, batch_size=8,
            early_stop_patience=None,
        ))
        trainer.fit(
            BatchLoader(train, 8, seed=0),
            val_loaders={"vh": BatchLoader(vh, 8, shuffle=False),
                         "ve": BatchLoader(ve, 8, shuffle=False)},
        )
        trainer.restore_best()
        # generation cost proxy: hard trajectories cost horizon(Re) steps,
        # easy the same schedule — difficulty cost ∝ α for the geometry axis
        results[alpha] = {
            "test_hard": trainer.evaluate(BatchLoader(th, 8, shuffle=False)),
            "test_easy": trainer.evaluate(BatchLoader(te, 8, shuffle=False)),
            "gen_cost_s": round(alpha * t_hard + (1 - alpha) * t_easy, 1),
        }
        print(json.dumps({"alpha": alpha, **results[alpha]}))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
