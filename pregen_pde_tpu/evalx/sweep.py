"""Sweep-wide evaluation — iterate a family of trained runs and aggregate.

Same capability as the reference `scOT/inference.py` sweep modes
(`eval_sweep` / `save_samples_sweep`, `:394-407`): there, a wandb sweep id is
expanded to its runs and each run's checkpoint is evaluated with the same
protocol. Here a sweep is simply a directory of run directories (each holding
an orbax checkpoint and the run's typed-config JSON) — no tracking-service
dependency; results aggregate to one JSONL file + a returned table.
"""

from __future__ import annotations

import json
import os
from typing import Callable

__all__ = ["discover_runs", "sweep_eval"]


def discover_runs(sweep_dir: str, config_name: str = "config.json") -> list[str]:
    """Run directories = immediate subdirectories containing a config JSON or
    an orbax checkpoint (a numeric step subdir or `best`/`latest` marker)."""
    runs = []
    for name in sorted(os.listdir(sweep_dir)):
        path = os.path.join(sweep_dir, name)
        if not os.path.isdir(path):
            continue
        has_cfg = os.path.exists(os.path.join(path, config_name))
        has_ckpt = any(
            sub.isdigit() or sub in ("best", "latest")
            for sub in os.listdir(path)
            if os.path.isdir(os.path.join(path, sub))
        )
        if has_cfg or has_ckpt:
            runs.append(path)
    return runs


def sweep_eval(
    sweep_dir: str,
    eval_one: Callable[[str], dict],
    out_path: str | None = None,
    skip_failed: bool = True,
) -> dict[str, dict]:
    """Evaluate every run in ``sweep_dir`` with ``eval_one(run_dir) -> dict``
    (e.g. a closure over `evalx.rollout.evaluate_patterns` or
    `evalx.inference.accumulation_error` that restores the run's checkpoint).
    Failures are recorded (and skipped) rather than aborting the sweep —
    matching the reference's per-run fail-soft iteration. Results stream to
    ``out_path`` as JSONL (one line per run) and return as {run_name: result}.
    """
    results: dict[str, dict] = {}
    sink = open(out_path, "w") if out_path else None
    try:
        for run_dir in discover_runs(sweep_dir):
            name = os.path.basename(run_dir)
            try:
                res = eval_one(run_dir)
            except Exception as e:  # fail-soft per run
                if not skip_failed:
                    raise
                res = {"error": f"{type(e).__name__}: {e}"}
            results[name] = res
            if sink is not None:
                sink.write(json.dumps({"run": name, **res}, default=float) + "\n")
                sink.flush()
    finally:
        if sink is not None:
            sink.close()
    return results
