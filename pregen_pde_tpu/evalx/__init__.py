from pregen_pde_tpu.evalx.rollout import rollout_pattern, evaluate_patterns

__all__ = ["rollout_pattern", "evaluate_patterns"]
