"""Smoke coverage for the headline scripts in `examples/` (VERDICT r3 #8):
each main runs at toy size on CPU in one subprocess, so the scripts that
produce the PERF.md measurements cannot rot. The subprocess pins
`jax_platforms=cpu` post-import (the env var alone does not survive the
tunnel sitecustomize — CLAUDE.md)."""

import json
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

DRIVER = r"""
import json, sys, importlib.util
import jax
jax.config.update("jax_platforms", "cpu")

def run_example(name, argv):
    spec = importlib.util.spec_from_file_location(name, f"{name_dir}/{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    sys.argv = [name] + argv
    mod.main()
    print(f"### {name} OK", flush=True)

name_dir = sys.argv[1]
state = sys.argv[2]

run_example("mixing_experiment",
            ["--fast", "--model", "fno", "--n", "6", "--epochs", "1",
             "--alphas", "0.0,1.0", "--batch-size", "2"])
run_example("savings_factor",
            ["--fast", "--state-dir", state, "--n-gen", "12", "--total", "6",
             "--alphas", "0.0,1.0", "--hard-ladder", "2,4",
             "--trimix", "2:2:2", "--batch-size", "2"])
run_example("measure_tier_error",
            ["1", "--resolution", "128", "--t-end", "0.004",
             "--snapshots", "2"])
run_example("perf_models", ["--fast", "--models", "fno,ffno"])
run_example("fm_finetune_savings",
            ["--fast", "--state-dir", state + "_fm", "--pools-dir",
             state + "_fm", "--n-pre", "6", "--totals", "4",
             "--alphas", "0.0,1.0", "--extra-ladder", "2", "--seeds", "0",
             "--batch-size", "2"])
run_example("measure_tier_costs",
            ["--fast", "--state-dir", state + "_tc", "--n-gen", "4"])
print("### ALL OK", flush=True)
"""


@pytest.mark.slow
def test_examples_smoke(tmp_path):
    state = tmp_path / "savings"
    proc = subprocess.run(
        [sys.executable, "-c", DRIVER, str(REPO / "examples"), str(state)],
        capture_output=True, text=True, timeout=3000, cwd=str(REPO),
    )
    out = proc.stdout
    assert proc.returncode == 0, (out[-3000:], proc.stderr[-3000:])
    for name in ("mixing_experiment", "savings_factor", "measure_tier_error",
                 "perf_models", "fm_finetune_savings", "measure_tier_costs"):
        assert f"### {name} OK" in out, name
    # savings_factor must have produced an analyzable result
    res = json.loads((state / "savings.json").read_text())
    assert "best_savings_x" in res and "alphas" in res
    assert set(res["alphas"]) == {"0", "1"}
    for entry in res["alphas"].values():
        assert entry["savings_x"] > 0
    # 3-tier composition (LOW+MEDIUM+HIGH): medium cost recorded, medium
    # test metric evaluated, iso-error entry produced
    tri = res["trimix"]["2_2_2"]
    assert tri["n_medium"] == 2 and tri["savings_x"] > 0
    assert "test_medium_median_rel_%" in tri
    assert "medium" in res["cost_per_traj"]
    # tier-error output: high/exact ran through the interpreter
    tier_line = [l for l in out.splitlines() if '"tiers"' in l][-1]
    tiers = json.loads(tier_line)["tiers"]
    assert "cn_ab2_pallas_high" in tiers and "cn_ab2_pallas_exact" in tiers
    # FM fine-tune savings (round 5): pretrain + FT grid + analysis ran
    fm = json.loads(
        (Path(str(state) + "_fm") / "fm_savings.json").read_text())
    assert fm["regime"] == "finetune_from_pretrained_fm"
    assert fm["mixes"] and fm["ladder_raw"]
    # per-trajectory-dt tier cost measurement (round 5)
    tc = json.loads(
        (Path(str(state) + "_tc") / "tier_costs.json").read_text())
    assert tc["dt_mode"] == "per_traj"
    for tier in ("hard", "medium", "easy"):
        assert tc[f"cost_per_traj_{tier}_s"] > 0
