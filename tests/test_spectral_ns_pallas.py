"""Fused Pallas CN+AB2 stepper vs the jnp packed path.

On CPU the kernel automatically runs through the Pallas interpreter (slow,
so horizons are short) and must reproduce
`_build_traj_packed(scheme="ab2")` to f32 roundoff — the two paths share
scheme, constants, and snapshot cadence; the only difference is the
CT-matmul FFT vs `jnp.fft`. On-chip agreement, throughput, and the fast/
exact precision split are covered by `bench.py` + PERF.md.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pregen_pde_tpu.core.config import NSVorticityConfig
from pregen_pde_tpu.solvers.spectral_ns import NSVorticitySolver
from pregen_pde_tpu.solvers import spectral_ns_pallas as snp


@pytest.mark.parametrize(
    "n,drag,forcing",
    [(128, 0.0, "fno"), (256, 0.1, "none")],
)
def test_pallas_matches_jnp_packed_ab2(n, drag, forcing):
    cfg = NSVorticityConfig(
        resolution=n, viscosity=1e-3, dt=1e-3, t_end=6e-3,
        n_snapshots=3, include_initial=True, forcing=forcing, drag=drag,
    )
    sol = NSVorticitySolver(cfg)
    rng = np.random.default_rng(3)
    # B=4 exercises the image-grouping path (auto g=4 at 128², g=2 at 256²)
    B = 4 if n == 128 else 2
    w0 = jnp.asarray(rng.normal(size=(B, n, n)).astype(np.float32))
    nu = jnp.asarray([1e-3, 2e-3, 3e-3, 4e-3][:B], jnp.float32)
    ref = np.asarray(jax.vmap(sol.make_trajectory_fn_nu("cn_ab2_packed"))(w0, nu))
    got = np.asarray(snp.build_batched_traj(sol)(w0, nu))
    assert got.shape == ref.shape
    err = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
    # fast tier: loop matmuls are f32 in interpret mode, but the snapshot
    # epilogue runs the REAL 3-pass split-bf16 scheme (~2⁻¹⁷/op) → ~1e-5
    assert err < 5e-5, err


@pytest.mark.parametrize("n", [384, 640])
def test_pallas_odd_radix_matches_jnp(n):
    """m = 3 and m = 5 exercise the complex W_m butterfly weights in
    `_combine` (the 128/256 cases only hit the ±1 fast paths); 640/768/896
    were additionally validated on-chip (see `supported`)."""
    cfg = NSVorticityConfig(
        resolution=n, viscosity=1e-3, dt=1e-3, t_end=2e-3,
        n_snapshots=1, include_initial=False, forcing="fno",
    )
    sol = NSVorticitySolver(cfg)
    rng = np.random.default_rng(7)
    w0 = jnp.asarray(rng.normal(size=(1, n, n)).astype(np.float32))
    ref = np.asarray(jax.vmap(sol.make_trajectory_fn_nu("cn_ab2_packed"))(
        w0, jnp.asarray([1e-3], jnp.float32)))
    got = np.asarray(snp.build_batched_traj(sol)(w0))
    err = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
    # n ≤ 512: the fast tier's snapshot epilogue runs the real 3-pass
    # split-bf16 scheme (~2⁻¹⁷/op) → ~1e-5; n > 512 keeps the HIGHEST
    # epilogue (no split, no dealias fold — only the ≤1-ulp odd-radix 1/m
    # fold differs from the jnp path), so the tight f32 bound must hold
    assert err < (5e-5 if n <= 512 else 5e-6), (n, err)


def test_pallas_traced_inner_steps():
    """One build serves multiple horizon buckets via the SMEM trip count
    (≡ the jnp path's traced inner_steps — the difficulty-schedule
    requirement from `RE_TIME_SCHEDULE`)."""
    n = 128
    cfg = NSVorticityConfig(
        resolution=n, viscosity=1e-3, dt=1e-3, t_end=4e-3,
        n_snapshots=2, include_initial=False, forcing="fno",
    )
    sol = NSVorticitySolver(cfg)
    rng = np.random.default_rng(4)
    w0 = jnp.asarray(rng.normal(size=(1, n, n)).astype(np.float32))
    ref_fn = jax.vmap(sol.make_trajectory_fn_nu("cn_ab2_packed"), in_axes=(0, None, None))
    pal = snp.build_batched_traj(sol)
    for inner in (1, 3):
        ref = np.asarray(ref_fn(w0, 1e-3, jnp.asarray(inner, jnp.int32)))
        got = np.asarray(pal(w0, None, jnp.asarray(inner, jnp.int32)))
        err = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
        assert err < 5e-5, (inner, err)  # fast: split-bf16 epilogue


def test_sharded_traj_on_virtual_mesh():
    """`build_sharded_traj` shards the batch over the mesh `data` axis
    (one kernel instance per device, no collectives) and matches the
    unsharded result."""
    from pregen_pde_tpu.parallel.meshes import make_mesh

    mesh = make_mesh()
    n = 128
    cfg = NSVorticityConfig(
        resolution=n, viscosity=1e-3, dt=1e-3, t_end=2e-3,
        n_snapshots=1, include_initial=True, forcing="fno",
    )
    sol = NSVorticitySolver(cfg)
    rng = np.random.default_rng(5)
    B = len(jax.devices())
    w0 = jnp.asarray(rng.normal(size=(B, n, n)).astype(np.float32))
    nu = jnp.asarray(np.full(B, 1e-3, np.float32))
    ref = np.asarray(snp.build_batched_traj(sol)(w0, nu))
    got = np.asarray(jax.jit(snp.build_sharded_traj(sol, mesh))(w0, nu))
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_supported_and_validation():
    assert snp.supported(256) and snp.supported(128)
    assert snp.supported(384) and snp.supported(512)  # VMEM-diet sizes
    assert snp.supported(640) and snp.supported(768) and snp.supported(896)
    assert snp.supported(1024)  # VMEM diet v2
    assert not snp.supported(192) and not snp.supported(64) and not snp.supported(1152)
    sol = NSVorticitySolver(NSVorticityConfig(resolution=128))
    with pytest.raises(ValueError):
        snp.build_batched_traj(sol, precision="bogus")
    with pytest.raises(ValueError):
        snp.build_batched_traj(NSVorticitySolver(NSVorticityConfig(resolution=96)))
    with pytest.raises(ValueError):  # diet2 is a g=1 layout
        snp.build_batched_traj(sol, group=2, _diet2=True)(
            jnp.zeros((2, 128, 128), jnp.float32))


def test_pallas_diet2_matches_jnp():
    """VMEM diet v2 (the 1024² layout: no ik2 input plane, no CN-factor
    scratch — both rebuilt per use from the separable k² vectors) forced at
    128² through the interpreter must still reproduce the jnp path, for
    vorticity AND fused-fields output."""
    n = 128
    cfg = NSVorticityConfig(
        resolution=n, viscosity=1e-3, dt=1e-3, t_end=4e-3,
        n_snapshots=2, include_initial=True, forcing="fno", drag=0.1,
    )
    sol = NSVorticitySolver(cfg)
    rng = np.random.default_rng(13)
    w0 = jnp.asarray(rng.normal(size=(2, n, n)).astype(np.float32))
    nu = jnp.asarray([1e-3, 2e-3], jnp.float32)
    ref = np.asarray(jax.vmap(sol.make_trajectory_fn_nu("cn_ab2_packed"))(w0, nu))
    got = np.asarray(
        snp.build_batched_traj(sol, group=1, _diet2=True)(w0, nu))
    err = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
    assert err < 5e-6, err

    def per_frame(w):
        f = sol.fields_from_vorticity(w)
        return jnp.stack([f["u"], f["v"], f["p"]], axis=-1)

    w_ref = jax.vmap(sol.make_trajectory_fn_nu("cn_ab2_packed"))(w0, nu)
    ref_f = np.asarray(jax.vmap(jax.vmap(per_frame))(w_ref))
    got_f = np.asarray(
        snp.build_batched_traj(sol, output="fields", group=1, _diet2=True)(w0, nu))
    err_f = np.max(np.abs(got_f - ref_f)) / np.max(np.abs(ref_f))
    assert err_f < 5e-6, err_f


def test_resolve_method_auto_cpu_falls_back():
    from pregen_pde_tpu.datagen.pipeline import resolve_method

    # tests run on CPU → auto must select the jnp path
    assert resolve_method("auto", 256) == "cn_ab2_packed"
    assert resolve_method("cn_heun_packed", 256) == "cn_heun_packed"


def test_pallas_high_precision_matches_jnp():
    """precision="high" (3-pass split-bf16): must track the jnp f32 path far
    tighter than one-pass bf16 — per-op error ~2^-17, so a short trajectory
    agrees to ~1e-5 even in interpret mode (real bf16 arithmetic)."""
    n = 128
    cfg = NSVorticityConfig(
        resolution=n, viscosity=1e-3, dt=1e-3, t_end=6e-3,
        n_snapshots=3, include_initial=True, forcing="fno",
    )
    sol = NSVorticitySolver(cfg)
    rng = np.random.default_rng(7)
    w0 = jnp.asarray(rng.normal(size=(2, n, n)).astype(np.float32))
    nu = jnp.asarray([1e-3, 2e-3], jnp.float32)
    ref = np.asarray(jax.vmap(sol.make_trajectory_fn_nu("cn_ab2_packed"))(w0, nu))
    got = np.asarray(snp.build_batched_traj(sol, precision="high")(w0, nu))
    err = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
    assert err < 5e-5, err
    # strictly tighter than the one-pass fast path on the same trajectory
    # (fast is still correct, just noisier)
    got_fast = np.asarray(snp.build_batched_traj(sol, precision="fast")(w0, nu))
    err_fast = np.max(np.abs(got_fast - ref)) / np.max(np.abs(ref))
    assert err < err_fast or err < 1e-6, (err, err_fast)


def test_pallas_exact_precision_with_dealias_fold():
    """precision="exact" (HIGHEST everywhere) with dealiased forward
    matrices: the fold bakes the 2/3 mask into the LOOP's forward DFT
    matrices (`fold_dealias` also gates on `not use_split`, so it is live
    on the exact tier too); the trajectory must match the jnp packed path
    to ~f32 roundoff — the docstring's '~3e-7' claim, covered directly
    here rather than via the shared fast-tier path (ADVICE r3)."""
    n = 128
    cfg = NSVorticityConfig(
        resolution=n, viscosity=1e-3, dt=1e-3, t_end=6e-3,
        n_snapshots=3, include_initial=True, forcing="fno", dealias=True,
    )
    sol = NSVorticitySolver(cfg)
    rng = np.random.default_rng(11)
    w0 = jnp.asarray(rng.normal(size=(2, n, n)).astype(np.float32))
    nu = jnp.asarray([1e-3, 2e-3], jnp.float32)
    ref = np.asarray(jax.vmap(sol.make_trajectory_fn_nu("cn_ab2_packed"))(w0, nu))
    got = np.asarray(snp.build_batched_traj(sol, precision="exact")(w0, nu))
    err = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
    assert err < 1e-6, err


def test_matrix_pack_split_reconstructs_f32():
    """hi + lo bf16 halves must reconstruct the DFT matrix combos to ~2^-16
    relative (16 mantissa bits)."""
    from pregen_pde_tpu.ops import ct_fft

    plan = ct_fft.make_plan(256, 2)
    fwd_r, fwd_l, inv_r, inv_l = snp._matrix_pack_split(plan)
    assert fwd_r.shape == (12, 128, 128)
    # inverse packs carry the folded 1/m butterfly normalization
    inv_scaled = [d / plan.m for d in plan.inv]
    for pack, mats in ((fwd_r, plan.fwd), (inv_r, inv_scaled)):
        for c, d in enumerate(mats):
            for t, combo in enumerate((d.real - d.imag, d.imag, d.real)):
                rec = pack[c * 6 + 2 * t].astype(np.float64) + pack[
                    c * 6 + 2 * t + 1
                ].astype(np.float64)
                err = np.max(np.abs(rec - combo))
                assert err < 2.0 ** -15, (c, t, err)
    # transposed packs really are transposes
    np.testing.assert_array_equal(
        fwd_l[0].astype(np.float32), fwd_r[0].astype(np.float32).T
    )


def test_pallas_fields_output_matches_jnp_diagnosis():
    """output="fields": the kernel's fused per-snapshot (u,v,p) diagnosis
    must equal `fields_from_vorticity` applied to the jnp trajectory
    (`datagen/pipeline.py::_pack_contract`'s per-frame path)."""
    n = 128
    cfg = NSVorticityConfig(
        resolution=n, viscosity=1e-3, dt=1e-3, t_end=4e-3,
        n_snapshots=2, include_initial=True, forcing="fno",
    )
    sol = NSVorticitySolver(cfg)
    rng = np.random.default_rng(11)
    w0 = jnp.asarray(rng.normal(size=(2, n, n)).astype(np.float32))
    nu = jnp.asarray([1e-3, 2e-3], jnp.float32)
    w_ref = jax.vmap(sol.make_trajectory_fn_nu("cn_ab2_packed"))(w0, nu)

    def per_frame(w):
        f = sol.fields_from_vorticity(w)
        return jnp.stack([f["u"], f["v"], f["p"]], axis=-1)

    ref = np.asarray(jax.vmap(jax.vmap(per_frame))(w_ref))
    got = np.asarray(
        snp.build_batched_traj(sol, output="fields")(w0, nu)
    )
    assert got.shape == ref.shape == (2, 3, n, n, 3)
    err = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
    assert err < 5e-5, err  # fast: split-bf16 snapshot epilogue


def test_generate_bucket_pallas_fields_path_matches_packed(monkeypatch):
    """The datagen bucket with a Pallas method (fused fields output) must
    produce the same contract as the XLA-FFT path."""
    from pregen_pde_tpu.datagen import pipeline as pl_mod

    cfg = NSVorticityConfig(
        resolution=128, viscosity=1e-3, dt=1e-3, t_end=2e-3,
        n_snapshots=1, include_initial=True, forcing="fno",
    )
    sol = NSVorticitySolver(cfg)
    keys = jax.random.split(jax.random.key(0), 2)
    nu = jnp.asarray([1e-3, 2e-3], jnp.float32)
    re = jnp.asarray([0.1, 0.2], jnp.float32)
    ref = np.asarray(pl_mod._generate_bucket(
        keys, nu, re, sol, 2, method="cn_ab2_packed"))
    got = np.asarray(pl_mod._generate_bucket(
        keys, nu, re, sol, 2, method="cn_ab2_pallas"))
    assert got.shape == ref.shape and got.shape[-1] == 6
    err = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
    assert err < 5e-5, err  # fast: split-bf16 snapshot epilogue


def test_chunked_traj_bit_identical_to_single_program():
    """`chunk_steps` (bounded-program mode: AB2 state rounds through HBM in
    f32 between ≤chunk_steps programs) must reproduce the single-program
    kernel BITWISE — same op sequence, lossless state roundtrip. Chunk
    boundaries land both mid-snapshot-interval (cap 4 vs inner 10) and on
    the cadence."""
    cfg = NSVorticityConfig(
        resolution=128, viscosity=1e-3, dt=1e-3, t_end=0.03,
        n_snapshots=3, include_initial=True, forcing="fno",
    )
    sol = NSVorticitySolver(cfg)
    rng = np.random.default_rng(5)
    w0 = jnp.asarray(rng.normal(size=(2, 128, 128)).astype(np.float32))
    nu = jnp.asarray([1e-3, 2e-3], jnp.float32)
    for output in ("vorticity", "fields"):
        ref = np.asarray(
            snp.build_batched_traj(sol, output=output)(w0, nu, 10)
        )
        got = np.asarray(
            snp.build_batched_traj(sol, output=output, chunk_steps=4)(
                w0, nu, 10
            )
        )
        assert got.shape == ref.shape
        assert np.array_equal(got, ref), (
            output, np.max(np.abs(got - ref)))


def test_chunked_traj_rejects_traced_inner():
    cfg = NSVorticityConfig(
        resolution=128, viscosity=1e-3, dt=1e-3, t_end=2e-3,
        n_snapshots=1, include_initial=False, forcing="none",
    )
    sol = NSVorticitySolver(cfg)
    traj = snp.build_batched_traj(sol, chunk_steps=4)
    w0 = jnp.zeros((1, 128, 128), jnp.float32)
    with pytest.raises(TypeError, match="concrete int"):
        jax.jit(lambda s: traj(w0, None, s))(jnp.int32(3))


def test_generate_bucket_chunked_matches_unchunked():
    """The datagen bounded-program bucket path (`max_steps_per_program`)
    must produce the identical contract array."""
    from pregen_pde_tpu.datagen import pipeline as pl_mod

    cfg = NSVorticityConfig(
        resolution=128, viscosity=1e-3, dt=1e-3, t_end=2e-3,
        n_snapshots=2, include_initial=True, forcing="fno",
    )
    sol = NSVorticitySolver(cfg)
    keys = jax.random.split(jax.random.key(1), 2)
    nu = jnp.asarray([1e-3, 2e-3], jnp.float32)
    re = jnp.asarray([0.1, 0.2], jnp.float32)
    ref = np.asarray(pl_mod._generate_bucket(
        keys, nu, re, sol, 3, method="cn_ab2_pallas"))
    got = np.asarray(pl_mod._generate_bucket_chunked(
        keys, nu, re, sol, 3, 2.5, 7.0, None, "cn_ab2_pallas", 2))
    assert np.array_equal(got, ref), np.max(np.abs(got - ref))
