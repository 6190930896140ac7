from pregen_pde_tpu.solvers.spectral_ns import NSVorticitySolver
from pregen_pde_tpu.solvers.burgers import BurgersSolver
from pregen_pde_tpu.solvers import schedules

__all__ = ["NSVorticitySolver", "BurgersSolver", "schedules"]
