"""Difficulty schedules — physics-difficulty axis of the reference.

Re-implements, as pure vectorized functions, the reference's:

- Re sampling: Re ~ clip(N(5000, 2000²), 100, 10000)
  (`FPO_cylinder/Regular/main.py:474-489`)
- Re → integration-horizon schedule `RE_TIME_SCHEDULE`: piecewise-linear in Re,
  rounded *up* to the next 100 s (`Regular/main.py:969-998`) — harder (higher-Re)
  trajectories integrate longer, which is exactly what makes them expensive.
- Re normalization to [0,1] via (Re − 100) / (10000 − 100)
  (`Regular/main.py:840-844`).

The piecewise schedule: breakpoints (100→100s, 2000→500s, 5000→1500s,
10000→2700s), linear between, constant outside.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

RE_MIN = 100.0
RE_MAX = 10000.0

# (Re breakpoint, endTime seconds) — shape of the reference schedule.
_RE_BREAKS = jnp.asarray([100.0, 2000.0, 5000.0, 10000.0])
_T_BREAKS = jnp.asarray([100.0, 500.0, 1500.0, 2700.0])


def sample_reynolds(key: jax.Array, n: int, mean=5000.0, std=2000.0) -> jax.Array:
    """Re ~ clip(N(mean, std²), RE_MIN, RE_MAX), shape (n,)."""
    z = jax.random.normal(key, (n,))
    return jnp.clip(mean + std * z, RE_MIN, RE_MAX)


def end_time_from_re(re: jax.Array) -> jax.Array:
    """Piecewise-linear horizon, rounded up to the next multiple of 100."""
    t = jnp.interp(re, _RE_BREAKS, _T_BREAKS)
    return jnp.ceil(t / 100.0) * 100.0


def normalize_re(re: jax.Array) -> jax.Array:
    return (re - RE_MIN) / (RE_MAX - RE_MIN)


def denormalize_re(re_norm: jax.Array) -> jax.Array:
    return re_norm * (RE_MAX - RE_MIN) + RE_MIN


def viscosity_from_re(re: jax.Array, velocity_scale=1.0, length_scale=1.0) -> jax.Array:
    """ν = U·L/Re — maps the sampled Re onto the spectral solver's viscosity.

    The reference instead fixes ν=1.5e-5 and scales the inlet velocity
    (Umax = Re·ν/L, `Regular/main.py:491-518`); on the periodic vorticity
    benchmark the equivalent difficulty axis is ν itself.
    """
    return velocity_scale * length_scale / re


def steps_for_horizon(end_time: jax.Array, dt: float) -> jax.Array:
    return jnp.round(end_time / dt).astype(jnp.int32)
