from pregen_pde_tpu.models.cno import CNO
from pregen_pde_tpu.models.ffno import FFNO2d
from pregen_pde_tpu.models.fno import FNO2d
from pregen_pde_tpu.models.fourier_features import FourierFeatures
from pregen_pde_tpu.models.scot import MODEL_SIZES, ScOT, ScOTConfig

__all__ = [
    "CNO",
    "FFNO2d",
    "FNO2d",
    "FourierFeatures",
    "MODEL_SIZES",
    "ScOT",
    "ScOTConfig",
]
