from pregen_pde_tpu.models.cno import CNO
from pregen_pde_tpu.models.ffno import FFNO2d
from pregen_pde_tpu.models.fno import FNO2d

__all__ = ["CNO", "FFNO2d", "FNO2d"]
