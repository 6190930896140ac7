"""CLI training/evaluation on the benchmark datasets (VERDICT r2 item 2).

The reference's day-to-day workflow is training directly on a benchmark
dataset name (`scOT/train.py:219` → get_dataset, model dims from the dataset
`:329-357`; `TrainCNO_time_L.py:127-195`). These tests drive that workflow
end-to-end through the CLI on synthetic container fixtures: scOT-T on a
Kelvin-Helmholtz container (4 out-channels), CNO on a gauss.nc, plus the
multi-dataset pretraining mix and the scOT main-path LR tiers."""

import json

import h5py
import numpy as np
import pytest

import pregen_pde_tpu.__main__ as cli


def _write_h5_sample(path, n, t, c, res, seed=0):
    rng = np.random.default_rng(seed)
    path.parent.mkdir(parents=True, exist_ok=True)
    with h5py.File(path, "w") as f:
        for i in range(n):
            f[f"sample_{i}"] = rng.normal(
                size=(t, c, res, res)).astype(np.float16)


def _write_nc_data(path, n, t, c, res, seed=0):
    rng = np.random.default_rng(seed)
    path.parent.mkdir(parents=True, exist_ok=True)
    with h5py.File(path, "w") as f:
        f["data"] = rng.normal(size=(n, t, c, res, res)).astype(np.float16)


def _last_json(capsys):
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


@pytest.fixture(scope="module")
def kh_dir(tmp_path_factory):
    # res 32 is the smallest scOT-T can take (4 stages: grid 8→4→2→1 at
    # patch size 4); 12 trajectories + the shrunk splits below keep the
    # end-to-end run minutes-scale on the single host core
    d = tmp_path_factory.mktemp("kh")
    _write_nc_data(d / "kh.nc", n=12, t=21, c=4, res=32)
    return d


@pytest.fixture(scope="module")
def ns_dir(tmp_path_factory):
    # ns_gauss / ns_sines real split: n_val 40 + n_test 240 → ≥281
    # trajectories (the FNO mix test exercises the real split arithmetic)
    d = tmp_path_factory.mktemp("ns")
    _write_h5_sample(d / "gauss.nc", n=282, t=21, c=2, res=16, seed=1)
    _write_h5_sample(d / "sin.nc", n=282, t=21, c=2, res=16, seed=2)
    return d


def _shrink_splits(monkeypatch, *names, n_val=2, n_test=4):
    """Shrink a registry entry's val/test splits so the heavy-model CLI
    tests stay minutes-scale; the REAL split constants are byte-pinned by
    `test_benchmark_datasets.py::test_registry_constants_match_reference_table`."""
    import dataclasses

    from pregen_pde_tpu.training import benchmark_datasets as bd

    for name in names:
        monkeypatch.setitem(
            bd.BENCHMARK_REGISTRY, name,
            dataclasses.replace(bd.BENCHMARK_REGISTRY[name],
                                n_val=n_val, n_test=n_test))


def test_train_scot_on_synthetic_kh_with_lr_tiers(kh_dir, tmp_path, capsys,
                                                  monkeypatch):
    """scOT-T trains on a KH container end-to-end: model dims derived from
    the dataset (4 in+time=5, 4 out — NOT the old hardcoded 7/3), main-path
    embedding/time-embedding LR groups active (scOT/trainer.py:77-227)."""
    _shrink_splits(monkeypatch, "eul_kh")
    ckpt = str(tmp_path / "ckpt")
    cli.main([
        "train", "--model", "scot-T", "--dataset", "eul_kh",
        "--data-dir", str(kh_dir), "--epochs", "1", "--batch-size", "8",
        "--ckpt", ckpt, "--warmup", "0.1",
        "--lr-embedding", "1e-4", "--lr-time-embedding", "1e-4",
    ])
    res = _last_json(capsys)
    assert np.isfinite(res["best_mean_val_rel_%"])

    cli.main([
        "evaluate", "--model", "scot-T", "--dataset", "eul_kh",
        "--data-dir", str(kh_dir), "--ckpt", ckpt, "--batch-size", "8",
        "--ar-steps", "2",
    ])
    res = _last_json(capsys)
    assert np.isfinite(res["direct"]["median_rel_%"])
    assert np.isfinite(res["ar_2"]["median_rel_%"])


def test_train_cno_on_synthetic_gauss(ns_dir, tmp_path, capsys, monkeypatch):
    """CNO trains on a gauss.nc container via the `--data name:path`
    grammar; dims derived from the dataset (2+time in, 2 out)."""
    _shrink_splits(monkeypatch, "ns_gauss")
    ckpt = str(tmp_path / "ckpt")
    cli.main([
        "train", "--model", "cno", "--data", f"ns_gauss:{ns_dir}",
        "--num-trajectories", "6",
        "--epochs", "1", "--batch-size", "8", "--ckpt", ckpt,
    ])
    res = _last_json(capsys)
    assert np.isfinite(res["best_mean_val_rel_%"])

    # per-channel-group breakdown (≡ scOT compute_metrics per
    # channel_slice_list, scOT/train.py:439-555)
    cli.main([
        "evaluate", "--model", "cno", "--data", f"ns_gauss:{ns_dir}",
        "--ckpt", ckpt, "--batch-size", "8",
        "--label-description", "[u],[v]",
    ])
    res = _last_json(capsys)
    assert np.isfinite(res["direct"]["all"]["median_rel_%"])
    assert "u" in res["direct"] and "v" in res["direct"]


def test_train_pretraining_mix(ns_dir, capsys):
    """Comma-list --dataset = the multi-dataset pretraining mixture
    (≡ eul_ns_mix1, `CNO_timeModule_CIN.py:1076-1123`)."""
    cli.main([
        "train", "--model", "fno", "--dataset", "ns_gauss,ns_sin",
        "--data-dir", str(ns_dir), "--epochs", "1", "--batch-size", "8",
    ])
    res = _last_json(capsys)
    assert np.isfinite(res["best_mean_val_rel_%"])


def test_lr_tier_flags_rejected_for_non_scot(ns_dir):
    with pytest.raises(SystemExit, match="scOT"):
        cli.main([
            "train", "--model", "fno", "--dataset", "ns_gauss",
            "--data-dir", str(ns_dir), "--epochs", "1",
            "--lr-embedding", "1e-4",
        ])


def test_train_requires_some_data():
    with pytest.raises(SystemExit, match="--data or --dataset"):
        cli.main(["train", "--model", "fno"])


def test_unknown_dataset_clean_error(ns_dir):
    with pytest.raises(SystemExit, match="unknown dataset"):
        cli.main(["train", "--model", "fno", "--dataset", "nope",
                  "--data-dir", str(ns_dir)])


def test_scot_main_tier_assignment():
    """Pin the exact reference param-group assignment quirks
    (`scOT/trainer.py:91-122` + HF get_decay_parameter_names' literal
    '"bias" not in name' filter): the conditional norm's scale-Linear KERNEL
    is a decay param at base lr ("standard"), while its bias and the whole
    bias-Linear are "time_embedding"."""
    from pregen_pde_tpu.training.tiers import scot_main_tier_fn

    cases = {
        ("patch_embed", "kernel"): "embeddings",
        ("embed_norm", "time_scale", "kernel"): "embeddings",
        ("patch_recovery", "bias"): "embeddings",
        ("recovery_mixup", "kernel"): "embeddings",
        ("enc_0_blk_0", "norm1", "time_scale", "kernel"): "standard",
        ("enc_0_blk_0", "norm1", "time_scale", "bias"): "time_embedding",
        ("enc_0_blk_0", "norm1", "time_bias", "kernel"): "time_embedding",
        ("enc_0_blk_0", "norm1", "time_bias", "bias"): "time_embedding",
        ("enc_0_blk_0", "attention", "query", "kernel"): "standard",
        ("enc_0_blk_0", "attention", "query", "bias"): "no_weight_decay",
        # non-kernel decay params under 4.29's literal name test: the
        # attention temperature and the ConvNeXt layer scale (torch names
        # `...self.logit_scale` / `ConvNeXtBlock.weight` — no "bias", not
        # inside an nn.LayerNorm)
        ("enc_0_blk_0", "attention", "logit_scale"): "standard",
        ("res_0_0", "layer_scale"): "standard",
        ("enc_0_blk_0", "norm1", "scale"): "no_weight_decay",
        # torch module `continuous_position_bias_mlp` trips the literal
        # "bias" substring filter — CPB kernels are NOT decay params
        ("enc_0_blk_0", "attention", "cpb_mlp1", "kernel"): "no_weight_decay",
        ("enc_0_blk_0", "attention", "cpb_mlp2", "kernel"): "no_weight_decay",
    }
    for path, want in cases.items():
        assert scot_main_tier_fn(path) == want, (path, want)


def test_tier_decay_semantics():
    """build_optimizer's per-tier decay: 'all' decays biases too, 'none'
    decays nothing (torch sets one decay flag per param group). With zero
    grads the adamw update is pure decay (−lr·wd·p), so nonzero update ⇔
    decay applied."""
    import jax
    import jax.numpy as jnp
    from pregen_pde_tpu.training.trainer import TrainerConfig, build_optimizer

    params = {"emb": {"kernel": jnp.ones((2, 2)), "bias": jnp.ones((2,))},
              "time": {"kernel": jnp.ones((2, 2))}}

    def tier_fn(path):
        return "embeddings" if path[0] == "emb" else "time_embedding"

    cfg = TrainerConfig(weight_decay=0.5, schedule="constant",
                        learning_rate=1.0, grad_clip=1e9,
                        lr_tiers={"embeddings": 1.0, "time_embedding": 1.0})
    tx = build_optimizer(cfg, 1, params, tier_fn,
                         tier_decay={"embeddings": "all",
                                     "time_embedding": "none"})
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.zeros_like, params)
    updates, _ = tx.update(grads, state, params)
    # embeddings tier: every member decayed (bias included)
    assert float(jnp.abs(updates["emb"]["kernel"]).sum()) > 0
    assert float(jnp.abs(updates["emb"]["bias"]).sum()) > 0
    # time_embedding tier: no decay at all
    assert float(jnp.abs(updates["time"]["kernel"]).sum()) == 0.0


def test_train_resume_restores_checkpoint(tmp_path, capsys):
    """`train --resume` restores the newest orbax checkpoint before
    continuing (≡ --resume_training, scOT/train.py:184,566)."""
    rng = np.random.default_rng(3)
    data = rng.normal(size=(10, 4, 16, 16, 6)).astype(np.float32)
    np.save(tmp_path / "d.npy", data)
    ckpt = str(tmp_path / "ckpt")
    cli.main(["train", "--model", "fno", "--data", str(tmp_path / "d.npy"),
              "--epochs", "1", "--batch-size", "4", "--ckpt", ckpt])
    capsys.readouterr()
    cli.main(["train", "--model", "fno", "--data", str(tmp_path / "d.npy"),
              "--epochs", "1", "--batch-size", "4", "--ckpt", ckpt,
              "--resume"])
    out = capsys.readouterr().out.strip().splitlines()
    rec = json.loads(out[0])
    assert rec["resumed_from"] == ckpt and rec["ckpt_step"] is not None

    with pytest.raises(SystemExit, match="--resume requires --ckpt"):
        cli.main(["train", "--model", "fno", "--data",
                  str(tmp_path / "d.npy"), "--epochs", "1", "--resume"])


def test_finetune_on_benchmark_dataset(ns_dir, kh_dir, tmp_path, capsys,
                                       monkeypatch):
    """`finetune` targets a benchmark dataset by name — the reference
    fine-tunes its pretrained FM directly onto benchmark tasks
    (`CNO_FineTune.py:127-152` → load_utils; `fine_tune_lift.py`). Base
    pretrained on ns_gauss (3-in/2-out, res 16); 1×1 adapters bridge to
    Kelvin-Helmholtz (5-in/4-out, res 32)."""
    _shrink_splits(monkeypatch, "ns_gauss", "eul_kh")
    ckpt = str(tmp_path / "ckpt")
    cli.main(["train", "--model", "fno", "--data", f"ns_gauss:{ns_dir}",
              "--num-trajectories", "6", "--epochs", "1",
              "--batch-size", "8", "--ckpt", ckpt])
    capsys.readouterr()
    cli.main(["finetune", "--model", "fno", "--pretrained", ckpt,
              "--dataset", "eul_kh", "--data-dir", str(kh_dir),
              "--num-trajectories", "4",
              "--base-in-channels", "3", "--base-in-size", "16",
              "--base-out-channels", "2",
              "--epochs", "1", "--batch-size", "4"])
    res = _last_json(capsys)
    assert np.isfinite(res["best_mean_val_rel_%"])


def test_finetune_requires_some_data(tmp_path):
    with pytest.raises(SystemExit, match="--data or --dataset"):
        cli.main(["finetune", "--model", "fno",
                  "--pretrained", str(tmp_path)])


def test_resolutions_and_save_samples_on_benchmark(ns_dir, tmp_path, capsys,
                                                   monkeypatch):
    """resolutions / save-samples work on benchmark datasets (sample-based
    path: no raw `.data` array; ≡ `scOT/inference.py` eval_resolutions /
    save_samples on Poseidon datasets)."""
    _shrink_splits(monkeypatch, "ns_gauss")
    ckpt = str(tmp_path / "ckpt")
    cli.main(["train", "--model", "fno", "--data", f"ns_gauss:{ns_dir}",
              "--num-trajectories", "6", "--epochs", "1",
              "--batch-size", "8", "--ckpt", ckpt])
    capsys.readouterr()
    cli.main(["resolutions", "--model", "fno", "--dataset", "ns_gauss",
              "--data-dir", str(ns_dir), "--ckpt", ckpt,
              "--resolutions", "8,16", "--batch-size", "8"])
    res = _last_json(capsys)
    assert set(res) == {"8", "16"}
    assert np.isfinite(res["16"]["median_rel_%"])

    out = str(tmp_path / "samples.npz")
    cli.main(["save-samples", "--model", "fno", "--dataset", "ns_gauss",
              "--data-dir", str(ns_dir), "--ckpt", ckpt, "--out", out,
              "--n-samples", "4"])
    z = np.load(out)
    assert z["prediction"].shape == (4, 16, 16, 2)
    assert z["input"].shape[-1] == 3  # 2 channels + time
