from pregen_pde_tpu.training.datasets import (
    TimePairConfig,
    TimePairDataset,
    BatchLoader,
    compute_stats,
    make_mixed_datasets,
)
from pregen_pde_tpu.training.ar import TrajectoryBatcher, homogeneous_steps, make_ar_loss
from pregen_pde_tpu.training.benchmark_datasets import BENCHMARK_REGISTRY, get_dataset
from pregen_pde_tpu.training.finetune import AdapterWrapper, finetune_tier_fn
from pregen_pde_tpu.training.losses import relative_lp_loss
from pregen_pde_tpu.training.native_loader import NativeBatchLoader, make_batch_loader
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
    "TrajectoryBatcher",
    "homogeneous_steps",
    "make_ar_loss",
    "BENCHMARK_REGISTRY",
    "get_dataset",
    "AdapterWrapper",
    "finetune_tier_fn",
    "NativeBatchLoader",
    "make_batch_loader",
]
