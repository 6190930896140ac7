"""Fused Pallas projection stepper vs the jnp `ProjectionSolver` path.

Runs through the Pallas interpreter on CPU; both domains (channel with a
penalized obstacle + inlet/outflow, cavity with the moving lid and its
pure-Neumann zero-mode handling) must match the jnp stepper to f32
roundoff. On-chip agreement (4.7e-7) and the throughput table are in
PERF.md.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pregen_pde_tpu.fields.geometry import disk_mask
from pregen_pde_tpu.solvers.ns_projection import (
    ProjectionConfig,
    ProjectionSolver,
)
from pregen_pde_tpu.solvers import ns_projection_pallas as npp


@pytest.mark.parametrize("domain", ["channel", "cavity"])
def test_pallas_projection_matches_jnp(domain):
    cfg = ProjectionConfig(
        resolution=128, domain=domain, dt=0.02, t_end=0.2,
        n_snapshots=2, pressure_solver="direct",
    )
    sol = ProjectionSolver(cfg)
    mask = (
        disk_mask(128, 64.0, 32.0, 8.0)
        if domain == "channel"
        else jnp.zeros((128, 128))
    )
    masks = jnp.broadcast_to(jnp.asarray(mask, jnp.float32)[None], (2, 128, 128))
    umax = jnp.asarray([0.0375, 0.05], jnp.float32)
    inner = jnp.asarray(3, jnp.int32)
    dt = jnp.asarray(0.02, jnp.float32)
    ref = np.asarray(
        jax.vmap(sol.make_trajectory_fn(), in_axes=(0, 0, None, None))(
            masks, umax, inner, dt
        )
    )
    got = np.asarray(npp.build_batched_traj(sol)(masks, umax, inner, dt))
    assert got.shape == ref.shape
    # the kernel's mixed-precision pressure refinement reorders f32 roundoff
    # through the ~1/dx² operator scales → agreement is f32-noise-grade
    # (~1e-5), not bitwise; semantic errors would be orders larger
    err = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
    assert err < 1e-4, err


def test_supported_gating():
    direct = ProjectionSolver(ProjectionConfig(resolution=128))
    assert npp.supported(direct)
    assert not npp.supported(
        ProjectionSolver(ProjectionConfig(resolution=128, pressure_solver="cg"))
    )
    assert not npp.supported(ProjectionSolver(ProjectionConfig(resolution=96)))
    assert not npp.supported(ProjectionSolver(ProjectionConfig(resolution=512)))
    with pytest.raises(ValueError):
        npp.build_batched_traj(
            ProjectionSolver(ProjectionConfig(resolution=96))
        )
