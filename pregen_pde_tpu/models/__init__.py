from pregen_pde_tpu.models.fno import FNO2d
from pregen_pde_tpu.models.ffno import FFNO2d

__all__ = ["FNO2d", "FFNO2d"]
