from pregen_pde_tpu.core.grid import SpectralGrid1D, SpectralGrid2D
from pregen_pde_tpu.core import config

__all__ = ["SpectralGrid1D", "SpectralGrid2D", "config"]
