"""CLI tests for the AR-training, finetune, save-samples and resolutions
commands (fast configs)."""

import json

import numpy as np
import pytest

import pregen_pde_tpu.__main__ as cli


def _fake_contract(path, n=8, t=5, hw=16, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(n, t, hw, hw, 6)).astype(np.float32) * 0.1
    d[..., 3] = 0.5
    d[..., 4] = 0.0
    d[..., 5] = 1.0
    np.save(path, d)
    return str(path)


def test_parse_ar_steps():
    assert cli._parse_ar_steps("2,2,1", 5) == [2, 2, 1]
    assert cli._parse_ar_steps("3", 6) == [2, 2, 2]


def test_train_ar_steps(tmp_path, capsys):
    data = _fake_contract(tmp_path / "d.npy")
    cli.main(["train", "--model", "fno", "--data", data, "--epochs", "2",
              "--batch-size", "4", "--ar-steps", "1,2"])
    lines = capsys.readouterr().out.strip().splitlines()
    final = json.loads(lines[-1])
    assert np.isfinite(final["final_train_loss"])
    epochs = [json.loads(l) for l in lines[:-1] if '"epoch"' in l]
    assert len(epochs) == 2


def test_train_ar_steps_teacher_forcing_and_homogeneous(tmp_path, capsys):
    data = _fake_contract(tmp_path / "d.npy")
    cli.main(["train", "--model", "fno", "--data", data, "--epochs", "1",
              "--batch-size", "4", "--ar-steps", "2", "--teacher-forcing"])
    final = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(final["final_train_loss"])


def test_train_ar_steps_too_long_errors(tmp_path):
    data = _fake_contract(tmp_path / "d.npy", t=3)
    with pytest.raises(SystemExit):
        cli.main(["train", "--model", "fno", "--data", data, "--epochs", "1",
                  "--batch-size", "4", "--ar-steps", "2,2,2"])


def test_train_zero_stage_cli(tmp_path, capsys):
    data = _fake_contract(tmp_path / "d.npy")
    cli.main(["train", "--model", "fno", "--data", data, "--epochs", "1",
              "--batch-size", "8", "--transitions", "one",
              "--zero-stage", "3"])
    final = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(final["best_mean_val_rel_%"])


def test_finetune_save_samples_resolutions(tmp_path, capsys):
    # pretrain a tiny FNO on 6+1-channel data, then finetune on data with the
    # same channels (adapters trivially absent) — exercises restore + tiers
    data = _fake_contract(tmp_path / "d.npy")
    ckpt = str(tmp_path / "ckpt")
    cli.main(["train", "--model", "fno", "--data", data, "--epochs", "1",
              "--batch-size", "4", "--ckpt", ckpt, "--transitions", "one"])

    cli.main(["finetune", "--model", "fno", "--pretrained", ckpt,
              "--data", data, "--base-in-channels", "7",
              "--base-in-size", "16", "--epochs", "1", "--batch-size", "4"])
    final = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(final["best_mean_val_rel_%"])

    cli.main(["save-samples", "--model", "fno", "--data", data,
              "--ckpt", ckpt, "--out", str(tmp_path / "s.npz"),
              "--n-samples", "2", "--plot", str(tmp_path / "g.png")])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    loaded = np.load(out["samples"])
    assert loaded["prediction"].shape[0] == 2
    assert (tmp_path / "g.png").exists()

    cli.main(["resolutions", "--model", "fno", "--data", data,
              "--ckpt", ckpt, "--resolutions", "16,32", "--batch-size", "4"])
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(map(int, res)) == {16, 32}


def test_finetune_missing_ckpt_errors(tmp_path):
    data = _fake_contract(tmp_path / "d.npy")
    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(SystemExit):
        cli.main(["finetune", "--model", "fno", "--pretrained", str(empty),
                  "--data", data, "--base-in-channels", "7",
                  "--base-in-size", "16", "--epochs", "1"])
