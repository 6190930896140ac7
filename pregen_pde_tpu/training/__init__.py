from pregen_pde_tpu.training.datasets import (
    TimePairConfig,
    TimePairDataset,
    BatchLoader,
    compute_stats,
    make_mixed_datasets,
)
from pregen_pde_tpu.training.losses import relative_lp_loss
from pregen_pde_tpu.training.trainer import Trainer, TrainerConfig

__all__ = [
    "TimePairConfig",
    "TimePairDataset",
    "BatchLoader",
    "compute_stats",
    "make_mixed_datasets",
    "relative_lp_loss",
    "Trainer",
    "TrainerConfig",
]
