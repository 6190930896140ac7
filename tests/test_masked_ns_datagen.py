import jax
import numpy as np

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
