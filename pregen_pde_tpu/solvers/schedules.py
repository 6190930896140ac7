"""Difficulty schedules — physics-difficulty axis of the reference.

Re-implements, as pure vectorized functions, the reference's:

- Re sampling: Re ~ clip(N(5000, 2000²), 100, 10000)
  (`FPO_cylinder/Regular/main.py:474-489`)
- Re → integration-horizon schedule ``RE_TIME_SCHEDULE`` +
  ``compute_endTime_from_Re`` (`Regular/main.py:969-998`): a *band table*,
  first-match-wins in list order.  Within a band [re_min, re_max] with
  multiplier ``mult``, the horizon is

      endTime = ceil( mult · L² / (Re·ν) / 100 ) · 100   seconds

  with L = 2 m, ν = 1.5e-5 m²/s (so L²/ν = 266 666.67 Re-seconds); for
  Re ∈ [10, 100) the horizon is the constant 2700 s.  Because the bands are
  listed in descending order, an exact band boundary takes the *upper* band's
  multiplier (Re=5000 → mult 40, Re=1000 → mult 10, ...).  The band
  multipliers (1,2,3,4,5 for Re bands up to 1000, then 10, 20, 30, 40) keep
  the horizon pinned at ≈2700 s at each band's lower edge while it decays
  ~1/Re inside the band, producing a sawtooth overall: endTime stays 2700 s
  throughout Re=100–1000 band edges, and falls to 2200 s at Re=2500/5000,
  2000 s at Re=4000, 1100 s at Re=10⁴.  Low-Re trajectories integrate the
  *longest* wall-clock horizon; with the reference Δt = 0.2 s
  (`controlDict:25-31`) that is 13 500 icoFoam steps at 2700 s down to
  5 500 steps at 1100 s — the difficulty-cost axis of the paper protocol.
- Re normalization to [0,1] via (Re − 100) / (10000 − 100)
  (`Regular/main.py:840-844`).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

RE_MIN = 100.0
RE_MAX = 10000.0

# Reference physical constants (`Regular/main.py:981-982`).
SCHEDULE_L = 2.0  # characteristic length [m]
SCHEDULE_NU = 1.5e-5  # kinematic viscosity [m²/s]
LOW_RE_END_TIME = 2700.0  # const horizon for Re ∈ [10, 100) (last band row)

# Band lower edges (ascending) and their multipliers.  Equivalent to the
# reference's descending first-match-wins list: mult(Re) = the multiplier of
# the highest lower-edge ≤ Re.
_BAND_EDGES = np.asarray([100.0, 200.0, 300.0, 400.0, 500.0, 1000.0, 2500.0, 4000.0, 5000.0])
_BAND_MULTS = np.asarray([1.0, 2.0, 3.0, 4.0, 5.0, 10.0, 20.0, 30.0, 40.0])


def sample_reynolds(key: jax.Array, n: int, mean=5000.0, std=2000.0) -> jax.Array:
    """Re ~ clip(N(mean, std²), RE_MIN, RE_MAX), shape (n,)."""
    z = jax.random.normal(key, (n,))
    return jnp.clip(mean + std * z, RE_MIN, RE_MAX)


def end_time_from_re_py(re: float) -> float:
    """Scalar float64 mirror of the reference ``compute_endTime_from_Re``
    (`Regular/main.py:983-998`), for oracle tests.  Re must lie in [10, 10⁴]."""
    if not 10.0 <= re <= RE_MAX:
        raise ValueError(f"Re={re} outside the reference schedule's [10, 10000]")
    if re < RE_MIN:
        raw = LOW_RE_END_TIME
    else:
        idx = int(np.searchsorted(_BAND_EDGES, re, side="right")) - 1
        raw = _BAND_MULTS[idx] * SCHEDULE_L**2 / (re * SCHEDULE_NU)
    return math.ceil(raw / 100.0) * 100.0


def end_time_from_re(re: jax.Array) -> jax.Array:
    """Vectorized reference horizon law (`Regular/main.py:969-998`).

    Inputs are clipped to the table's domain [10, 10⁴] (the reference
    function silently returns None outside it; Re sampling never leaves
    [100, 10⁴]).  A tiny relative slack before the ceil keeps exact band-edge
    values (raw = 2000.0 at Re=4000, ...) from rounding up a whole extra
    100 s under f32 arithmetic.
    """
    re = jnp.clip(jnp.asarray(re), 10.0, RE_MAX)
    edges = jnp.asarray(_BAND_EDGES, dtype=re.dtype)
    mults = jnp.asarray(_BAND_MULTS, dtype=re.dtype)
    idx = jnp.clip(jnp.searchsorted(edges, re, side="right") - 1, 0, len(_BAND_MULTS) - 1)
    raw_band = mults[idx] * (SCHEDULE_L**2) / (re * SCHEDULE_NU)
    raw = jnp.where(re < RE_MIN, jnp.asarray(LOW_RE_END_TIME, re.dtype), raw_band)
    q = raw / 100.0
    return jnp.ceil(q - q * 1e-6) * 100.0


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
    """Integration steps for a horizon; at the reference Δt = 0.2 s the full
    schedule spans 5 500 (Re=10⁴, 1100 s) – 13 500 (2700 s) steps."""
    return jnp.round(end_time / dt).astype(jnp.int32)
