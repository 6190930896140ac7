import jax
import jax.numpy as jnp
import numpy as np
from scipy.ndimage import distance_transform_edt

from pregen_pde_tpu.fields.geometry import (
    box_mask,
    disk_mask,
    no_hole_mask,
    sample_multi_holes,
    sample_single_hole,
    sdf_from_mask,
)


def reference_sdf(mask: np.ndarray) -> np.ndarray:
    """The reference's construction (`Regular/main.py:853-869`)."""
    outside = distance_transform_edt(mask == 0)
    inside = distance_transform_edt(mask == 1)
    sdf = outside - inside
    m = np.max(np.abs(sdf))
    return sdf / m if m > 0 else sdf


def test_sdf_matches_scipy_box():
    mask = np.zeros((64, 64), np.float32)
    mask[20:36, 28:44] = 1.0
    ours = np.asarray(sdf_from_mask(jnp.asarray(mask)))
    np.testing.assert_allclose(ours, reference_sdf(mask), atol=1e-5)


def test_sdf_matches_scipy_disk_and_multi():
    mask = np.asarray(disk_mask(64, 32.0, 20.0, 7.5))
    np.testing.assert_allclose(
        np.asarray(sdf_from_mask(jnp.asarray(mask))), reference_sdf(mask), atol=1e-5
    )
    m2, n_placed = sample_multi_holes(jax.random.key(0), n=64)
    m2 = np.asarray(m2)
    assert int(n_placed) >= 2
    np.testing.assert_allclose(
        np.asarray(sdf_from_mask(jnp.asarray(m2))), reference_sdf(m2), atol=1e-5
    )


def test_single_hole_bounds():
    for seed in range(5):
        mask = np.asarray(sample_single_hole(jax.random.key(seed)))
        assert mask.shape == (128, 128)
        assert mask.sum() == 16 * 16  # hole never clipped at the border
        rows = np.nonzero(mask.any(axis=1))[0]
        assert 0 < rows[0] and rows[-1] < 127


def test_multi_holes_nonoverlap_and_count():
    for seed in range(5):
        mask, placed = sample_multi_holes(jax.random.key(seed))
        placed = int(placed)
        assert 2 <= placed <= 10
        # non-overlap ⇒ total area is exactly placed * 16²
        assert float(np.asarray(mask).sum()) == placed * 256


def test_no_hole_sdf_constant():
    sdf = np.asarray(sdf_from_mask(no_hole_mask(32)))
    np.testing.assert_allclose(sdf, 1.0, atol=1e-6)


def test_box_mask_traced_args():
    m = jax.jit(lambda r, c: box_mask(32, r, c, 8, 8))(
        jnp.asarray(4), jnp.asarray(10)
    )
    assert float(m.sum()) == 64.0


def test_multi_holes_forced_overlap():
    """Forced-overlap mode (`Multiple_Hole/main.py:1080-1139`,
    allow_overlap=True): all holes contain a common central sub-box, so the
    intersection of every placed hole is non-empty; hole count in [2, 10]."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from pregen_pde_tpu.fields.geometry import (
        box_mask,
        sample_multi_holes_overlap,
    )

    n, hole = 128, 16
    frac = 0.3
    box = frac * hole
    c = n / 2.0
    # the guaranteed common region
    r = np.arange(n)
    common = ((r[:, None] >= c - box / 2) & (r[:, None] <= c + box / 2 - 1)
              & (r[None, :] >= c - box / 2) & (r[None, :] <= c + box / 2 - 1))
    placed_counts = []
    for seed in range(8):
        mask, placed = jax.jit(
            lambda k: sample_multi_holes_overlap(k, n, hole_cells=hole,
                                                 overlap_fraction=frac)
        )(jax.random.key(seed))
        mask = np.asarray(mask)
        placed_counts.append(int(placed))
        assert 2 <= int(placed) <= 10
        # every cell of the common box is covered (all holes overlap there)
        assert mask[common].min() == 1.0, seed
        # total hole area ≤ placed · hole² (strictly less when overlapping),
        # and ≥ one hole's area
        area = mask.sum()
        assert hole * hole <= area <= int(placed) * hole * hole
    assert len(set(placed_counts)) > 1  # count really varies

    # invalid overlap_fraction rejected like the reference (:1085-1088)
    import pytest

    with pytest.raises(ValueError):
        sample_multi_holes_overlap(jax.random.key(0), n, overlap_fraction=0.0)


def test_masked_ns_config_overlap_pipeline():
    import jax
    import numpy as np
    from pregen_pde_tpu.datagen.masked_ns import MaskedNSConfig, sample_masks

    cfg = MaskedNSConfig(pipeline="fpo_multi_hole", resolution=64,
                         hole_overlap=True, overlap_fraction=0.4)
    masks = np.asarray(sample_masks(jax.random.key(0), cfg, 4))
    assert masks.shape == (4, 64, 64)
    # all masks have a hole centred region covered
    assert masks[:, 32, 32].min() == 1.0
