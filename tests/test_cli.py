"""CLI workflow tests (fast configs)."""

import json
import numpy as np
import pytest

import pregen_pde_tpu.__main__ as cli


def test_generate_burgers_heat_darcy(tmp_path, capsys):
    cli.main(["generate", "--workload", "burgers", "--n", "4", "--out",
              str(tmp_path / "b"), "--resolution", "64", "--batch-size", "4"])
    arr = np.load(tmp_path / "b" / "results_batch_0.npy")
    assert arr.shape[0] == 4 and arr.ndim == 3  # (N, T, X)
    assert np.isfinite(arr).all()

    cli.main(["generate", "--workload", "darcy", "--n", "2", "--out",
              str(tmp_path / "d"), "--resolution", "32", "--batch-size", "2"])
    arr = np.load(tmp_path / "d" / "results_batch_0.npy")
    assert arr.shape == (2, 2, 32, 32)  # (N, [a,u], H, W)
    assert np.isfinite(arr).all()


def test_train_ckpt_evaluate_roundtrip(tmp_path, capsys):
    # tiny dataset, 1-epoch train with checkpoint, then evaluate from ckpt
    cli.main(["generate", "--workload", "ns_spectral", "--n", "8", "--out",
              str(tmp_path), "--resolution", "16", "--batch-size", "8",
              "--fixed-difficulty"])
    data = str(tmp_path / "results_batch_0.npy")
    ckpt = str(tmp_path / "ckpt")
    cli.main(["train", "--model", "fno", "--data", data, "--epochs", "1",
              "--batch-size", "4", "--ckpt", ckpt, "--transitions", "all"])
    cli.main(["evaluate", "--model", "fno", "--data", data, "--ckpt", ckpt,
              "--patterns", "[2];[1,1]", "--batch-size", "4"])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    res = json.loads(out)
    assert "[2]" in res["patterns"] and "[1, 1]" in res["patterns"]
    assert res["accumulation"][0]["step"] == 1


def test_mix_sweep_fast(tmp_path, capsys):
    rng = np.random.default_rng(0)
    hard = rng.normal(size=(12, 4, 8, 8, 6)).astype(np.float32)
    easy = rng.normal(size=(12, 4, 8, 8, 6)).astype(np.float32)
    np.save(tmp_path / "hard.npy", hard)
    np.save(tmp_path / "easy.npy", easy)
    cli.main(["mix-sweep", "--model", "fno", "--hard", str(tmp_path / "hard.npy"),
              "--easy", str(tmp_path / "easy.npy"), "--alphas", "0.0,0.5",
              "--total-trajectories", "8", "--epochs", "1", "--batch-size", "4"])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    res = json.loads(out)
    assert set(res) == {"0.0", "0.5"}
    for v in res.values():
        assert "test_hard" in v and "test_easy" in v


def test_sweep_eval_cli(tmp_path, capsys):
    """sweep-eval iterates run dirs (fail-soft) and aggregates to JSONL."""
    cli.main(["generate", "--workload", "ns_spectral", "--n", "8", "--out",
              str(tmp_path), "--resolution", "16", "--batch-size", "8",
              "--fixed-difficulty"])
    data = str(tmp_path / "results_batch_0.npy")
    sweep = tmp_path / "sweep"
    for run in ("run_a", "run_b"):
        cli.main(["train", "--model", "fno", "--data", data, "--epochs", "1",
                  "--batch-size", "4", "--ckpt", str(sweep / run),
                  "--transitions", "one"])
    (sweep / "run_broken").mkdir()
    (sweep / "run_broken" / "config.json").write_text("{}")
    capsys.readouterr()
    cli.main(["sweep-eval", "--dir", str(sweep), "--model", "fno", "--data",
              data, "--patterns", "[1];[1,1]", "--batch-size", "4",
              "--out", str(tmp_path / "sweep.jsonl")])
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(res) == {"run_a", "run_b", "run_broken"}
    assert "patterns" in res["run_a"] and "error" in res["run_broken"]
    lines = (tmp_path / "sweep.jsonl").read_text().splitlines()
    assert len(lines) == 3


def test_generate_float16_storage(tmp_path, capsys):
    """--storage-dtype float16 halves shard bytes; values match the f32 run
    to f16 quantization; preflight and training both accept the file."""
    cli.main(["generate", "--workload", "ns_spectral", "--n", "4", "--out",
              str(tmp_path / "f32"), "--resolution", "16", "--batch-size", "4",
              "--fixed-difficulty"])
    cli.main(["generate", "--workload", "ns_spectral", "--n", "4", "--out",
              str(tmp_path / "f16"), "--resolution", "16", "--batch-size", "4",
              "--fixed-difficulty", "--storage-dtype", "float16"])
    a32 = np.load(tmp_path / "f32" / "results_batch_0.npy")
    a16 = np.load(tmp_path / "f16" / "results_batch_0.npy")
    assert a32.dtype == np.float32 and a16.dtype == np.float16
    assert a16.nbytes * 2 == a32.nbytes
    np.testing.assert_allclose(a16.astype(np.float32), a32, atol=2e-3)
    cli.main(["preflight", "--data", str(tmp_path / "f16" / "results_batch_0.npy")])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["finite_fraction"] == 1.0


def test_generate_resume(tmp_path, capsys):
    """--resume continues an interrupted run: existing shards are counted,
    numbering continues, and the reassembled dataset has the full size."""
    from pregen_pde_tpu.datagen.writer import load_shards

    out = str(tmp_path / "d")
    cli.main(["generate", "--workload", "burgers", "--n", "8", "--out", out,
              "--resolution", "64", "--batch-size", "4"])
    # "crash" happened after 8; resume to a 12-trajectory target
    cli.main(["generate", "--workload", "burgers", "--n", "12", "--out", out,
              "--resolution", "64", "--batch-size", "4", "--resume"])
    data = load_shards(out)
    assert data.shape[0] == 12
    # shards 0..2 all present, distinct content
    import numpy as np

    s0 = np.load(tmp_path / "d" / "results_batch_0.npy")
    s2 = np.load(tmp_path / "d" / "results_batch_2.npy")
    assert not np.allclose(s0, s2)
    # resuming a finished run is a no-op
    cli.main(["generate", "--workload", "burgers", "--n", "12", "--out", out,
              "--resolution", "64", "--batch-size", "4", "--resume"])
    out_line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out_line["generated"] == 0 and out_line["already_done"] == 12
    assert load_shards(out).shape[0] == 12


def test_generate_viscosity_and_time_scale_flags(tmp_path, capsys):
    """--viscosity sets the fixed-difficulty physics (lower nu = rougher
    fields); --time-scale shortens the ns_spectral difficulty horizons;
    --method selects the stepper explicitly."""
    cli.main(["generate", "--workload", "ns_spectral", "--n", "4", "--out",
              str(tmp_path / "lo"), "--resolution", "16", "--batch-size", "4",
              "--fixed-difficulty", "--viscosity", "1e-2",
              "--method", "cn_ab2_packed"])
    cli.main(["generate", "--workload", "ns_spectral", "--n", "4", "--out",
              str(tmp_path / "hi"), "--resolution", "16", "--batch-size", "4",
              "--fixed-difficulty", "--viscosity", "1e-4"])
    lo = np.load(tmp_path / "lo" / "results_batch_0.npy")
    hi = np.load(tmp_path / "hi" / "results_batch_0.npy")
    # higher viscosity decays the velocity field harder by the last frame
    assert np.abs(lo[:, -1, ..., :2]).mean() < np.abs(hi[:, -1, ..., :2]).mean()
    # Re channel reflects 1/nu (normalized)
    assert lo[0, 0, 0, 0, 3] < hi[0, 0, 0, 0, 3]
    # varied difficulty with a tiny time scale runs quickly end-to-end
    cli.main(["generate", "--workload", "ns_spectral", "--n", "4", "--out",
              str(tmp_path / "ts"), "--resolution", "16", "--batch-size", "4",
              "--time-scale", "2e-4"])
    ts = np.load(tmp_path / "ts" / "results_batch_0.npy")
    assert ts.shape == (4, 21, 16, 16, 6) and np.isfinite(ts).all()


def test_generate_max_steps_per_program(tmp_path):
    """--max-steps-per-program (bounded-program chunked mode, Pallas path)
    produces the identical dataset to the single-program run — the chunk
    schedule is a pure execution-shape choice."""
    common = ["generate", "--workload", "ns_spectral", "--n", "2",
              "--resolution", "128", "--batch-size", "2",
              "--time-scale", "1e-6", "--method", "cn_ab2_pallas"]
    cli.main(common + ["--out", str(tmp_path / "one")])
    cli.main(common + ["--out", str(tmp_path / "chunk"),
                       "--max-steps-per-program", "2"])
    one = np.load(tmp_path / "one" / "results_batch_0.npy")
    chunk = np.load(tmp_path / "chunk" / "results_batch_0.npy")
    assert np.array_equal(one, chunk)


def test_train_device_resident_roundtrip(tmp_path, capsys):
    """`train --device-resident` (the HBM-resident lax.scan pipeline) trains,
    tracks/saves the best params, and `evaluate` restores the checkpoint."""
    rng = np.random.default_rng(3)
    data = rng.normal(size=(10, 4, 16, 16, 6)).astype(np.float32)
    np.save(tmp_path / "d.npy", data)
    ckpt = str(tmp_path / "ckpt")
    cli.main(["train", "--model", "fno", "--data", str(tmp_path / "d.npy"),
              "--epochs", "2", "--batch-size", "4", "--ckpt", ckpt,
              "--device-resident"])
    lines = [json.loads(ln) for ln in
             capsys.readouterr().out.strip().splitlines()]
    assert len(lines) == 3  # 2 epoch records + summary
    assert all("mean_val_rel_%" in ln for ln in lines[:2])
    assert "best_mean_val_rel_%" in lines[-1]
    cli.main(["evaluate", "--model", "fno", "--data", str(tmp_path / "d.npy"),
              "--ckpt", ckpt, "--patterns", "[1]", "--batch-size", "4"])
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "[1]" in res["patterns"]

    # guard rails: ZeRO and resume route to the streaming-loader path
    with pytest.raises(SystemExit):
        cli.main(["train", "--model", "fno", "--data",
                  str(tmp_path / "d.npy"), "--epochs", "1",
                  "--device-resident", "--zero-stage", "1"])
