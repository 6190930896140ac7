from pregen_pde_tpu.evalx.inference import (
    accumulation_error,
    resolution_eval,
    save_samples,
)
from pregen_pde_tpu.evalx.plots import plot_from_samples, prediction_grid
from pregen_pde_tpu.evalx.rollout import evaluate_patterns, rollout_pattern
from pregen_pde_tpu.evalx.sweep import discover_runs, sweep_eval

__all__ = [
    "discover_runs",
    "sweep_eval",
    "accumulation_error",
    "resolution_eval",
    "save_samples",
    "plot_from_samples",
    "prediction_grid",
    "evaluate_patterns",
    "rollout_pattern",
]
