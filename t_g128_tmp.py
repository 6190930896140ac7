import time, numpy as np, jax, jax.numpy as jnp
from pregen_pde_tpu.core.config import NSVorticityConfig
from pregen_pde_tpu.solvers.spectral_ns import NSVorticitySolver
from pregen_pde_tpu.fields.grf import grf_2d
from pregen_pde_tpu.solvers import spectral_ns_pallas as snp
B = 64
cfg = NSVorticityConfig(resolution=128, viscosity=1e-4, dt=1e-4, t_end=0.25,
                        n_snapshots=50, forcing="fno", include_initial=True)
sol = NSVorticitySolver(cfg)
keys = jax.random.split(jax.random.key(0), B)
w0 = jax.jit(jax.vmap(lambda k: grf_2d(k, sol.grid)))(keys)
for g in [1, 2, 4, 8]:
    try:
        fn = jax.jit(snp.build_batched_traj(sol, group=g))
        run = lambda: jax.device_get(fn(w0)[:, -1, 0, 0])
        run(); t0 = time.perf_counter(); run(); run()
        dt = (time.perf_counter()-t0)/2
        print(f"n=128 g={g}: {dt:.3f}s -> {B/dt:.1f} traj/s/chip")
    except Exception as e:
        print(f"n=128 g={g}: FAILED {str(e)[:120]}")
