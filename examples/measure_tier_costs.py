"""Measure per-trajectory generation cost of the geometry difficulty tiers
under the round-5 per-trajectory CFL dt path (VERDICT r4 item #4).

Round 4's 3-tier economics table carried an artifact: the per-bucket CFL dt
was taken from the bucket's *fastest* inlet (`datagen/masked_ns.py` round-4
line ~208: ``cfl_dt(cfg, u_max_np[idx_raw].max())``), and whole-horizon
dt/2 retries re-ran a full bucket for one outlier geometry — so the MEDIUM
tier (single hole, `fpo_hole` ≡ the reference's
`dataset_gen/FPO/Hole_Location/main.py`) measured *more* expensive per
trajectory (0.820 s) than HARD (multi-hole, 0.765 s). Round 5's datagen
sub-buckets trajectories by their own CFL dt (``per_traj_dt=True``, the
default) and retries only the offending sub-bucket.

This script regenerates the three tiers into a fresh state dir with the
per-trajectory dt path and records the measured costs; the protocol pools
in `runs/savings_r4/` stay on the legacy bucket-max dt (their cached
training runs are pinned to those exact trajectories). Results feed the
PERF.md "3-tier economics" update.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
from savings_factor import DEFAULT_TIERS, MEDIUM_TIER, generate_sets  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--state-dir", default="runs/tiercost_r5")
    ap.add_argument("--n-gen", type=int, default=320,
                    help="trajectories per tier (== the protocol pools)")
    ap.add_argument("--fast", action="store_true")
    ap.add_argument("--keep-npy", action="store_true",
                    help="keep the generated arrays (default: delete — this "
                    "script measures cost, the pools live in savings_r4)")
    args = ap.parse_args()

    from pregen_pde_tpu.utils.compcache import enable_persistent_cache
    from pregen_pde_tpu.utils.misc import use_best_backend

    use_best_backend()
    enable_persistent_cache()

    state = Path(args.state_dir)
    state.mkdir(parents=True, exist_ok=True)
    tiers = list(DEFAULT_TIERS) + [MEDIUM_TIER]
    meta = generate_sets(state, args.n_gen, args.fast, tiers=tiers)
    if not args.keep_npy:
        for name, *_ in tiers:
            (state / f"{name}.npy").unlink(missing_ok=True)
    out = {k: meta[k] for k in sorted(meta)}
    out["dt_mode"] = "per_traj"
    (state / "tier_costs.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
