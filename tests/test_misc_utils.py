"""Tests for the dnnlib-util counterparts (`utils/misc.py`), the sweep
evaluator (`evalx/sweep.py`), and Fourier features
(`models/fourier_features.py`)."""

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pregen_pde_tpu.utils.misc import (
    EasyDict,
    TeeLogger,
    format_time,
    open_url,
)


def test_easydict_attribute_access():
    d = EasyDict(a=1)
    d.b = 2
    assert d.a == 1 and d["b"] == 2
    del d.a
    with pytest.raises(AttributeError):
        _ = d.a


def test_format_time():
    assert format_time(5) == "5s"
    assert format_time(65) == "1m 05s"
    assert format_time(3600 + 61) == "1h 01m 01s"
    assert format_time(86400 + 3661) == "1d 01h 01m"


def test_tee_logger(tmp_path):
    log = tmp_path / "run.log"
    with TeeLogger(str(log)) as _:
        print("hello-tee")
    assert sys.stdout is not None
    assert "hello-tee" in log.read_text()


def test_open_url_local_and_gated(tmp_path):
    p = tmp_path / "x.bin"
    p.write_bytes(b"abc")
    assert open_url(str(p), return_filename=True) == str(p)
    with open_url(f"file://{p}") as fh:
        assert fh.read() == b"abc"
    with pytest.raises(RuntimeError, match="no network egress"):
        open_url("https://example.com/weights.pkl", cache_dir=str(tmp_path))
    # cached copy is served without any fetch
    import hashlib

    md5 = hashlib.md5(b"https://example.com/weights.pkl").hexdigest()
    (tmp_path / f"{md5}_weights.pkl").write_bytes(b"W")
    got = open_url("https://example.com/weights.pkl", cache_dir=str(tmp_path),
                   return_filename=True)
    assert got.endswith("_weights.pkl")


def test_sweep_eval(tmp_path):
    from pregen_pde_tpu.evalx.sweep import discover_runs, sweep_eval

    for name, val in [("run_a", 1.0), ("run_b", 2.0), ("run_bad", None)]:
        d = tmp_path / name
        d.mkdir()
        (d / "config.json").write_text(json.dumps({"val": val}))
    (tmp_path / "not_a_run").mkdir()  # no config/ckpt → skipped
    (tmp_path / "loose_file.txt").write_text("x")

    runs = discover_runs(str(tmp_path))
    assert [os.path.basename(r) for r in runs] == ["run_a", "run_b", "run_bad"]

    def eval_one(run_dir):
        cfg = json.loads(open(os.path.join(run_dir, "config.json")).read())
        if cfg["val"] is None:
            raise ValueError("broken run")
        return {"median_rel_%": cfg["val"]}

    out = tmp_path / "sweep.jsonl"
    results = sweep_eval(str(tmp_path), eval_one, out_path=str(out))
    assert results["run_a"]["median_rel_%"] == 1.0
    assert "error" in results["run_bad"]
    lines = [json.loads(l) for l in out.read_text().splitlines()]
    assert len(lines) == 3 and lines[1]["run"] == "run_b"

    with pytest.raises(ValueError):
        sweep_eval(str(tmp_path), eval_one, skip_failed=False)


def test_fourier_features():
    from pregen_pde_tpu.models.fourier_features import FourierFeatures

    coords = jnp.stack(
        jnp.meshgrid(jnp.linspace(0, 1, 8), jnp.linspace(0, 1, 8),
                     indexing="ij"),
        axis=-1,
    )
    m = FourierFeatures(scale=1.0, mapping_size=16)
    variables = m.init(jax.random.key(0), coords)
    out = m.apply(variables, coords)
    assert out.shape == (8, 8, 32)
    # sin²+cos² = 1 pairing
    np.testing.assert_allclose(
        np.asarray(out[..., :16] ** 2 + out[..., 16:] ** 2),
        1.0,
        atol=1e-5,
    )
    # deterministic given the init key
    out2 = m.apply(m.init(jax.random.key(0), coords), coords)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2))

    ident = FourierFeatures(scale=0.0, mapping_size=16)
    v0 = ident.init(jax.random.key(0), coords)
    np.testing.assert_allclose(np.asarray(ident.apply(v0, coords)),
                               np.asarray(coords))


def test_stage_to_local_scratch(tmp_path, monkeypatch):
    from pregen_pde_tpu.parallel.multihost import stage_to_local_scratch

    src = tmp_path / "data.npy"
    src.write_bytes(b"payload")
    # no scratch configured → identity
    monkeypatch.delenv("SCRATCH", raising=False)
    monkeypatch.delenv("LOCAL_SCRATCH", raising=False)
    assert stage_to_local_scratch(str(src)) == str(src)
    # scratch via env → copied once, reused on second call
    scratch = tmp_path / "scratch"
    monkeypatch.setenv("SCRATCH", str(scratch))
    dst = stage_to_local_scratch(str(src))
    assert dst == str(scratch / "data.npy")
    assert (scratch / "data.npy").read_bytes() == b"payload"
    mtime = (scratch / "data.npy").stat().st_mtime_ns
    assert stage_to_local_scratch(str(src)) == dst
    assert (scratch / "data.npy").stat().st_mtime_ns == mtime  # not re-copied


def test_dump_hlo(tmp_path):
    from pregen_pde_tpu.utils.debug import dump_hlo

    f = lambda x: jnp.sin(x) * 2.0
    x = jnp.ones((4, 4), jnp.float32)
    txt = dump_hlo(f, x, path=str(tmp_path / "mod.hlo"))
    assert "sine" in txt and (tmp_path / "mod.hlo").exists()
    opt = dump_hlo(f, x, optimized=True)
    assert "fusion" in opt or "sine" in opt


def test_multihost_initialize_surfaces_configured_failures(monkeypatch):
    """`parallel.multihost.initialize` must re-raise real init failures when
    a coordinator IS configured (a pod job silently degrading to N
    disconnected single-host runs is the failure mode), while staying a
    no-op for unconfigured single-process runs."""
    import pytest

    from pregen_pde_tpu.parallel import multihost

    calls = {}

    def boom(**kw):
        calls["kw"] = kw
        raise RuntimeError("coordinator unreachable")

    monkeypatch.setattr(multihost.jax.distributed, "initialize", boom)
    # unconfigured: swallowed (single-host fallback)
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("MEGASCALE_COORDINATOR_ADDRESS", raising=False)
    multihost.initialize()  # no raise
    # configured via kwarg: surfaced
    with pytest.raises(RuntimeError, match="coordinator unreachable"):
        multihost.initialize(coordinator_address="10.0.0.1:1234")
    # configured via env: surfaced
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
    with pytest.raises(RuntimeError):
        multihost.initialize()
    # "already initialized" stays benign even when configured
    monkeypatch.setattr(
        multihost.jax.distributed, "initialize",
        lambda **kw: (_ for _ in ()).throw(
            RuntimeError("jax.distributed is already initialized")
        ),
    )
    multihost.initialize(coordinator_address="10.0.0.1:1234")  # no raise


def test_persistent_compilation_cache_config(monkeypatch, tmp_path):
    """`enable_persistent_cache` wires jax_compilation_cache_dir (the
    896²/1024² Mosaic kernels pay their ~5-min compile once per machine) and
    honours the opt-out env."""
    import jax

    from pregen_pde_tpu.utils.compcache import enable_persistent_cache

    prev = jax.config.jax_compilation_cache_dir
    try:
        d = enable_persistent_cache(str(tmp_path / "cache"))
        assert d == str(tmp_path / "cache")
        assert jax.config.jax_compilation_cache_dir == d
        monkeypatch.setenv("PREGEN_PDE_NO_COMP_CACHE", "1")
        assert enable_persistent_cache(str(tmp_path / "other")) is None
        assert jax.config.jax_compilation_cache_dir == d  # unchanged
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
