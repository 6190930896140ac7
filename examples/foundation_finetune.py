"""Foundation-model pretrain → fine-tune workflow.

The reference's CNO-FM recipe (`CNO_Experiments/CNO_FineTune.py` +
`test_and_fine_tune_utils/fine_tune_lift.py`): pretrain a model on a
multi-dataset mixture, then adapt it to a task whose channel counts differ —
1×1-conv adapters around the backbone (`FT_Lift`/`FT_Project`, chosen by dim
mismatch) and 3-tier learning rates (base ≪ norms ≪ adapters,
`CNO_FineTune.py:31-33`). Here that is `AdapterWrapper` + `finetune_tier_fn`
+ `TrainerConfig.lr_tiers` — no parameter surgery, the frozen-ish backbone is
just the low-lr tier.

Runs on synthetic data in a couple of minutes (CPU or one chip):
    python examples/foundation_finetune.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from pregen_pde_tpu.models.fno import FNO2d
from pregen_pde_tpu.training.datasets import (
    BatchLoader,
    TimePairConfig,
    TimePairDataset,
)
from pregen_pde_tpu.training.finetune import (
    DEFAULT_FT_TIERS,
    AdapterWrapper,
    finetune_tier_fn,
)
from pregen_pde_tpu.training.trainer import Trainer, TrainerConfig


def synth(n, t, res, c, seed):
    rng = np.random.default_rng(seed)
    x = np.linspace(0, 2 * np.pi, res, dtype=np.float32)
    base = np.sin(x)[None, None, :, None, None] * np.cos(x)[None, None, None, :, None]
    drift = (1 + 0.1 * np.arange(t, dtype=np.float32))[None, :, None, None, None]
    noise = 0.05 * rng.normal(size=(n, t, res, res, c)).astype(np.float32)
    return (base * drift + noise).astype(np.float32)


def main():
    res, epochs = 16, 3

    # 1) pretrain a 6-channel "foundation" FNO
    pre_data = synth(16, 5, res, 6, seed=0)
    cfg = TimePairConfig(max_num_time_steps=4, allowed_transitions=[1],
                         n_val=2, n_test=2)
    pre_train = TimePairDataset(pre_data, cfg, "train")
    pre_val = TimePairDataset(pre_data, cfg, "val",
                              mean=pre_train.mean, std=pre_train.std)
    backbone = FNO2d(out_channels=3, modes=4, width=16, n_layers=2)
    pre = Trainer(backbone, TrainerConfig(learning_rate=1e-3, epochs=epochs,
                                          batch_size=4))
    pre.fit(BatchLoader(pre_train, 4, seed=0),
            val_loaders={"val": BatchLoader(pre_val, 4, shuffle=False)},
            log_fn=lambda r: print(json.dumps({"phase": "pretrain", **r})))
    pretrained = pre.state.params

    # 2) fine-tune on a 4-physical-channel task (dim mismatch → adapters kick
    #    in) with the reference's 3-tier learning rates
    ft_raw = synth(12, 5, res, 4, seed=1)  # 4+time=5 inputs vs backbone's 7
    ft_cfg = TimePairConfig(max_num_time_steps=4, allowed_transitions=[1],
                            n_val=2, n_test=2)
    ft_train = TimePairDataset(ft_raw, ft_cfg, "train")
    ft_val = TimePairDataset(ft_raw, ft_cfg, "val",
                             mean=ft_train.mean, std=ft_train.std)

    model = AdapterWrapper(base=backbone, base_in_channels=7, out_channels=3)
    ft = Trainer(
        model,
        TrainerConfig(learning_rate=DEFAULT_FT_TIERS["base"], epochs=epochs,
                      batch_size=4, lr_tiers=DEFAULT_FT_TIERS),
        tier_fn=finetune_tier_fn,
    )
    first = next(iter(BatchLoader(ft_train, 4, seed=0)))
    ft.init_state(first, steps_per_epoch=len(BatchLoader(ft_train, 4)))
    # graft the pretrained backbone weights under the wrapper
    params = dict(ft.state.params)
    params["base"] = pretrained
    ft.replace_params(params)
    ft.fit(BatchLoader(ft_train, 4, seed=0),
           val_loaders={"val": BatchLoader(ft_val, 4, shuffle=False)},
           log_fn=lambda r: print(json.dumps({"phase": "finetune", **r})))
    print(json.dumps({"final_val_rel_%": ft.best_metric}))


if __name__ == "__main__":
    main()
