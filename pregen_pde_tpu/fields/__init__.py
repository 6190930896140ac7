from pregen_pde_tpu.fields.grf import grf_1d, grf_2d, lognormal_grf_2d

__all__ = ["grf_1d", "grf_2d", "lognormal_grf_2d"]
