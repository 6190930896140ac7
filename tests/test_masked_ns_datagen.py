import jax
import numpy as np
import pytest

from pregen_pde_tpu.datagen.masked_ns import (
    MaskedNSConfig,
    generate_masked_ns_batch,
    sample_masks,
)

FAST = dict(
    resolution=32, dt=0.05, n_snapshots=3, time_scale=2e-4, cg_iters=60,
)
# time_scale 2e-4: horizons 1100..2700 s → 0.22..0.54 s → 4..10 steps/snapshot


def test_sample_masks_per_pipeline():
    k = jax.random.key(0)
    cfg_r = MaskedNSConfig(pipeline="fpo_regular", resolution=64)
    m = np.asarray(sample_masks(k, cfg_r, 3))
    assert m.shape == (3, 64, 64)
    assert m.sum() > 0 and np.array_equal(m[0], m[1])  # fixed cylinder
    cfg_h = MaskedNSConfig(pipeline="fpo_hole", resolution=64)
    mh = np.asarray(sample_masks(k, cfg_h, 3))
    assert not np.array_equal(mh[0], mh[1])  # random placement
    cfg_l = MaskedNSConfig(pipeline="ldc_regular", resolution=64)
    assert np.asarray(sample_masks(k, cfg_l, 2)).sum() == 0


def test_fpo_regular_contract():
    cfg = MaskedNSConfig(pipeline="fpo_regular", **FAST)
    arr = generate_masked_ns_batch(jax.random.key(1), cfg, 4)
    assert arr.shape == (4, 4, 32, 32, 6)
    assert np.all(np.isfinite(arr))
    # Re channel in [0,1], constant per trajectory, distinct across
    re_ch = arr[:, 0, 0, 0, 3]
    assert np.all((re_ch >= 0) & (re_ch <= 1))
    assert len(np.unique(re_ch)) > 1
    # mask channel: obstacle present, velocity dead inside it at final frame
    mask = arr[0, 0, :, :, 4]
    assert mask.sum() > 0
    u_final = arr[0, -1, :, :, 0]
    assert np.abs(u_final[mask > 0.5]).max() <= np.abs(u_final).max()
    # SDF normalized to [-1, 1]
    sdf = arr[0, 0, :, :, 5]
    assert -1.0 <= sdf.min() and sdf.max() <= 1.0


def test_ldc_and_multi_hole_run():
    cfg = MaskedNSConfig(pipeline="ldc_regular", **FAST)
    arr = generate_masked_ns_batch(jax.random.key(2), cfg, 2)
    assert arr.shape == (2, 4, 32, 32, 6)
    assert np.all(np.isfinite(arr))
    np.testing.assert_allclose(arr[..., 4], 0.0)  # no holes

    cfg2 = MaskedNSConfig(pipeline="fpo_multi_hole", **FAST)
    arr2 = generate_masked_ns_batch(jax.random.key(3), cfg2, 2)
    assert np.all(np.isfinite(arr2))
    # holes scale with resolution: res//8 = 4 cells at res 32; ≥2 placed
    assert arr2[0, 0, :, :, 4].sum() >= 2 * 4 * 4


def test_per_trajectory_cfl_dt_subbuckets(monkeypatch):
    """VERDICT r4 #4: dt is derived from each trajectory's OWN u_max, not
    the horizon bucket's fastest inlet. Trajectories in one horizon bucket
    whose CFL dt differ by a power-of-two level run as separate sub-bucket
    launches at their own dt, so a slow-inlet trajectory keeps the full
    cfg.dt even when a fast one shares its horizon."""
    import jax.numpy as jnp

    from pregen_pde_tpu.datagen import masked_ns
    from pregen_pde_tpu.solvers import schedules

    calls = []

    def fake_cached(solver):
        def traj(masks, u_max, inner, dt):
            calls.append((np.asarray(u_max).copy(), float(dt), int(inner)))
            b = masks.shape[0]
            return jnp.ones((b, 3, masks.shape[1], masks.shape[2], 3))

        return traj

    monkeypatch.setattr(masked_ns, "_batched_traj_cached", fake_cached)
    # two slow + two fast inlets sharing ONE horizon bucket
    re_vals = np.array([2000.0, 20000.0, 20000.0, 2000.0], np.float32)
    monkeypatch.setattr(schedules, "sample_reynolds",
                        lambda k, n, m, s: jnp.asarray(re_vals))
    monkeypatch.setattr(schedules, "end_time_from_re",
                        lambda re: jnp.full_like(jnp.asarray(re), 1000.0))
    cfg = masked_ns.MaskedNSConfig(pipeline="fpo_regular", resolution=16,
                                   n_snapshots=2, time_scale=1e-3)
    out = masked_ns.generate_masked_ns_batch(jax.random.key(0), cfg, 4)
    assert np.isfinite(out).all()
    assert len(calls) == 2  # one launch per dt level, not per trajectory
    u_slow = 2000.0 * cfg.viscosity / cfg.length
    u_fast = 20000.0 * cfg.viscosity / cfg.length
    by_dt = sorted(calls, key=lambda c: -c[1])
    # slow sub-bucket keeps the full cfg.dt; fast one runs at ITS OWN cfl dt
    assert by_dt[0][1] == pytest.approx(
        masked_ns.cfl_dt(cfg, u_slow)) == pytest.approx(cfg.dt)
    assert by_dt[1][1] == pytest.approx(masked_ns.cfl_dt(cfg, u_fast))
    assert by_dt[1][1] < cfg.dt
    np.testing.assert_allclose(by_dt[0][0], u_slow, rtol=1e-6)
    np.testing.assert_allclose(by_dt[1][0], u_fast, rtol=1e-6)
    # the slow sub-bucket takes FEWER steps per snapshot than the fast one
    assert by_dt[0][2] < by_dt[1][2]


def test_nonfinite_bucket_retry(monkeypatch):
    """Outlier-geometry fail-soft: trajectories that come back non-finite
    re-run at dt/2 (same executable, traced dt) so the trajectory COUNT
    stays exact — 91/320 production multi-hole trajectories needed this
    when the muscl scheme landed (the old path silently wrote NaNs that
    poisoned the shared mixing stats downstream)."""
    import jax.numpy as jnp

    from pregen_pde_tpu.datagen import masked_ns

    calls = {"n": 0, "dts": []}

    def fake_cached(solver):
        def traj(masks, u_max, inner, dt):
            calls["n"] += 1
            calls["dts"].append(float(dt))
            b = masks.shape[0]
            out = jnp.ones((b, 3, masks.shape[1], masks.shape[2], 3))
            if calls["n"] == 1:  # first bucket call: poison one row
                out = out.at[0].set(jnp.nan)
            return out

        return traj

    monkeypatch.setattr(masked_ns, "_batched_traj_cached", fake_cached)
    cfg = masked_ns.MaskedNSConfig(pipeline="fpo_regular", resolution=16,
                                   n_snapshots=2, time_scale=1e-4,
                                   re_std=0.0)  # one horizon bucket
    out = masked_ns.generate_masked_ns_batch(jax.random.key(0), cfg, 4)
    assert np.isfinite(out).all()
    assert calls["n"] == 2  # one retry
    assert calls["dts"][1] == pytest.approx(calls["dts"][0] / 2.0)
