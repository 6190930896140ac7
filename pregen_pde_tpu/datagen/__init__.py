from pregen_pde_tpu.datagen.pipeline import (
    GenerationConfig,
    generate_ns_batch,
    generate_ns_dataset,
)
from pregen_pde_tpu.datagen.writer import ShardWriter

__all__ = [
    "GenerationConfig",
    "generate_ns_batch",
    "generate_ns_dataset",
    "ShardWriter",
]
