"""The minimum end-to-end slice (SURVEY.md §7.2): GRF ICs → spectral NS →
contract dataset → FNO trained with the time-pair loader + relative-L1 →
AR rollout eval. Exercises core/fields/solvers/datagen/models/training/eval."""

import jax
import numpy as np

from pregen_pde_tpu.core.config import NSVorticityConfig
from pregen_pde_tpu.datagen.pipeline import GenerationConfig, generate_ns_batch
from pregen_pde_tpu.evalx.rollout import evaluate_patterns
from pregen_pde_tpu.models.fno import FNO2d
from pregen_pde_tpu.training.datasets import (
    BatchLoader,
    TimePairConfig,
    TimePairDataset,
)
from pregen_pde_tpu.training.trainer import Trainer, TrainerConfig


def test_end_to_end_slice():
    # 1. generate a small dataset on the 8-device CPU mesh
    gen = GenerationConfig(
        solver=NSVorticityConfig(
            resolution=16, viscosity=1e-3, dt=1e-3, t_end=0.02, n_snapshots=4,
        ),
        batch_size=16,
        vary_difficulty=False,
    )
    data = generate_ns_batch(jax.random.key(0), gen, 16)
    assert data.shape == (16, 5, 16, 16, 6)

    # 2. time-pair datasets
    cfg = TimePairConfig(
        max_num_time_steps=4, allowed_transitions=[1, 2], n_val=3, n_test=3,
    )
    train = TimePairDataset(data, cfg, "train", num_trajectories=10)
    val = TimePairDataset(data, cfg, "val", mean=train.mean, std=train.std)

    # 3. train a small FNO for a few epochs
    model = FNO2d(out_channels=3, modes=4, width=16, n_layers=2)
    tcfg = TrainerConfig(
        learning_rate=2e-3, epochs=3, batch_size=8, early_stop_patience=None,
    )
    trainer = Trainer(model, tcfg)
    result = trainer.fit(
        BatchLoader(train, 8, seed=0),
        val_loaders={"val": BatchLoader(val, 8, shuffle=False)},
    )
    hist = result["history"]
    assert len(hist) == 3
    assert np.isfinite(hist[-1]["train_loss"])
    # training reduces loss on this easy task
    assert hist[-1]["train_loss"] < hist[0]["train_loss"]
    assert result["best_metric"] < np.inf

    # 4. AR rollout patterns: direct [4], heterogeneous [2,2], homogeneous [1]*4
    trainer.restore_best()
    res = evaluate_patterns(
        trainer.model.apply,
        jax.device_get(trainer.state.params),
        val,
        patterns=[[4], [2, 2], [1, 1, 1, 1]],
    )
    assert set(res) == {"[4]", "[2, 2]", "[1, 1, 1, 1]"}
    for stats in res.values():
        assert np.isfinite(stats["median_rel_%"])


def test_trainer_multi_tier_lr():
    """FT-style multi-tier learning rates (reference
    `CNO_timeModule_CIN.py:983-994`: separate lr for lift/project + norms)."""
    from pregen_pde_tpu.training.trainer import build_optimizer
    import jax.numpy as jnp

    model = FNO2d(out_channels=3, modes=4, width=8, n_layers=1)
    x = jnp.ones((1, 8, 8, 7))
    t = jnp.ones((1,))
    params = model.init(jax.random.key(0), x, t)["params"]

    def tier(path):
        return "head" if "Dense_2" in "/".join(path) else "base"

    cfg = TrainerConfig(lr_tiers={"head": 1e-3, "base": 1e-5}, epochs=1)
    tx = build_optimizer(cfg, 10, params, tier)
    state = tx.init(params)
    assert state is not None
