"""Scaled-down pod-run integration test (VERDICT r3 #4, BASELINE.md's
"10k-trajectory run shard_mapped over v5e-8 with streamed HDF5 shards"):
on an 8-virtual-device CPU mesh, generate a difficulty-bucketed dataset with
the batch axis sharded over the mesh, streamed to a growable HDF5 dataset,
SIGKILL the process mid-run, `--resume`, and verify the final dataset passes
the contract preflight with an exact trajectory count and ≥3 distinct
difficulty buckets exercised."""

import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
N_TRAJ = 400
BS = 50
RES = 32


def _cli(outdir, resume=False):
    cmd = [sys.executable, "-c", (
        "import sys, jax; jax.config.update('jax_platforms','cpu');"
        "from pregen_pde_tpu.__main__ import main;"
        f"sys.argv=['p','generate','--workload','ns_spectral','--n','{N_TRAJ}',"
        f"'--out',{str(outdir)!r},'--resolution','{RES}','--batch-size','{BS}',"
        "'--format','h5','--time-scale','2e-4'" + (",'--resume'" if resume else "")
        + "];main()")]
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["PYTHONPATH"] = f"{REPO}:{env.get('PYTHONPATH', '')}"
    return subprocess.Popen(cmd, env=env, cwd=str(REPO),
                            stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True)


def _h5_rows(path):
    import h5py

    if not path.exists():
        return 0
    try:
        with h5py.File(path, "r") as f:
            return int(f["data"].shape[0]) if "data" in f else 0
    except OSError:
        return 0  # writer currently holds it


def _h5_size(path):
    """Kill trigger: h5py's file lock blocks readers while the writer is
    alive, but each batch flush grows the file — size is the observable."""
    try:
        return path.stat().st_size
    except OSError:
        return 0


@pytest.mark.slow
def test_podrun_kill_resume_contract(tmp_path):
    h5 = tmp_path / "results.h5"

    # run 1: kill hard once the first batches are durably flushed
    batch_bytes = BS * 21 * RES * RES * 6 * 4
    p = _cli(tmp_path)
    deadline = time.time() + 900
    size = 0
    while time.time() < deadline:
        size = _h5_size(h5)
        if size >= batch_bytes:
            break
        if p.poll() is not None:
            break
        time.sleep(0.25)
    if p.poll() is None:
        os.kill(p.pid, signal.SIGKILL)
        p.wait()
        assert size >= batch_bytes, f"never saw a flushed batch ({size} B)"
        killed_rows = _h5_rows(h5)
        assert killed_rows % BS == 0, killed_rows  # batch-granular durability
        if not (0 < killed_rows < N_TRAJ):
            pytest.skip(f"all {killed_rows} rows flushed before the kill "
                        "(machine too fast for the race window)")
    else:
        pytest.skip("run finished before the kill window (machine too fast)")

    # run 2: --resume completes the dataset
    p2 = _cli(tmp_path, resume=True)
    out, _ = p2.communicate(timeout=1200)
    assert p2.returncode == 0, out[-3000:]

    import h5py

    with h5py.File(h5, "r") as f:
        data = np.asarray(f["data"])
    # exact trajectory count — the resume continued from the flushed rows,
    # no duplicates, no gaps
    assert data.shape[0] == N_TRAJ, data.shape
    assert data.shape[1:] == (21, RES, RES, 6)

    from pregen_pde_tpu.utils.preflight import check_contract

    report = check_contract(data.astype(np.float32), "podrun")
    assert report["finite_fraction"] == 1.0

    # difficulty bucketing exercised: the Re channel carries the sampled
    # normalized Reynolds numbers -> many distinct horizon buckets
    re_vals = np.unique(data[:, 0, 0, 0, 3].round(6))
    assert len(re_vals) >= 3, re_vals

    # meta sidecar from the final writer close
    meta = json.loads((tmp_path / "results_meta.json").read_text())
    assert meta["format"] == "h5"
