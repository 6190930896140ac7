from pregen_pde_tpu.solvers.burgers import BurgersSolver
from pregen_pde_tpu.solvers.darcy import DarcyConfig, solve_darcy
from pregen_pde_tpu.solvers.heat import HeatConfig, HeatSolver
from pregen_pde_tpu.solvers.ns_projection import ProjectionConfig, ProjectionSolver
from pregen_pde_tpu.solvers.spectral_ns import NSVorticitySolver
from pregen_pde_tpu.solvers import schedules

__all__ = [
    "BurgersSolver",
    "DarcyConfig",
    "solve_darcy",
    "HeatConfig",
    "HeatSolver",
    "ProjectionConfig",
    "ProjectionSolver",
    "NSVorticitySolver",
    "schedules",
]
