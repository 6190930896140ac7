"""Quantify the headline: equal-error data-generation compute savings.

The reference's central claim is a ~8.9x saving in classical-solver compute
at equal test error from mixing cheap easy trajectories into the training
set (`/root/reference/README.md:41,75-79`), produced by the Poseidon/scOT
mixing protocol (`scOT/mixingexp.py:299-384,650-711`: scOT, hole vs no-hole
geometry difficulty, alpha*N hard + (1-alpha)*N easy, shared streaming
stats, dual held-out test sets). This script measures THIS framework's
analog of that number end-to-end on one chip:

1. generate N_gen trajectories per difficulty with the fused Pallas
   projection pipeline (EASY = obstacle-free channel `fpo_regular`,
   HARD = random multi-hole geometry `fpo_multi_hole` ==
   `Multiple_Hole/main.py`), recording the wall-clock generation cost of
   each difficulty;
2. train scOT (the reference's mixing model) at every alpha on alpha*N hard
   + (1-alpha)*N easy with shared stats, early-stopping on the 50/50
   validation plateau (epochs are NOT fixed: runs stop when the val curve
   flattens, `--patience`);
3. train hard-only models at a ladder of dataset sizes -> the hard-only
   error-vs-cost curve;
4. iso-error analysis: for each mixed run, the generation cost of the
   hard-only dataset that reaches the same test-hard error (log-log
   interpolation on the ladder), and

       savings(alpha) = cost_hard_only(iso-error N*) / cost_mixed(alpha)

   -- the framework's measured equivalent of the reference's 8.9x.

Every stage is resumable: generated sets and per-run results are cached in
--state-dir; re-running skips finished work. Training uses the
device-resident pipeline (`training/device_data.py`) -- one HBM upload
serves every run, one jitted program per epoch -- because through this dev
environment's tunnel a host-loader step costs ~0.28 s vs 38 ms of scOT-T
compute (PERF.md).

Results land in --state-dir/savings.json and are summarized in PERF.md.
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np


def _log(msg: str):
    print(f"[savings {time.strftime('%H:%M:%S')}] {msg}", flush=True)


DEFAULT_TIERS = (("hard", "fpo_multi_hole", 0, {}),
                 ("easy", "fpo_regular", 1, {}))
# the reference's protocol is LOW + MEDIUM + HIGH (`README.md:41`); medium =
# single random hole (`Hole_Location/main.py` == `fpo_hole`)
MEDIUM_TIER = ("medium", "fpo_hole", 2, {})

# the reference's SECOND difficulty axis: "Physics complexity (Reynolds
# numbers)" (`README.md:18-21`) on the fixed-cylinder FPO geometry. High Re
# = faster inlet = smaller per-trajectory CFL dt = more solver steps (the
# real cost axis), plus less diffusion. Bands keep the clipped-normal
# sampling law of `Regular/main.py:491-518`, re-centered.
PHYSICS_TIERS = (("hard", "fpo_regular", 0,
                  {"re_mean": 9000.0, "re_std": 1500.0}),
                 ("easy", "fpo_regular", 1,
                  {"re_mean": 2000.0, "re_std": 500.0}))
PHYSICS_MEDIUM_TIER = ("medium", "fpo_regular", 2,
                       {"re_mean": 5000.0, "re_std": 1000.0})


def generate_sets(state: Path, n_gen: int, fast: bool,
                  tiers=DEFAULT_TIERS, legacy_dt: bool = False) -> dict:
    """Generate (or load) the per-tier trajectory sets; returns metadata
    with per-difficulty wall-clock generation cost. Incremental: tiers
    already on disk (with their cost recorded) are kept untouched, so a
    later 3-tier run extends a finished 2-tier state dir."""
    import jax

    from pregen_pde_tpu.datagen.masked_ns import (
        MaskedNSConfig,
        generate_masked_ns_batch,
    )

    meta_path = state / "gen_meta.json"
    meta = json.loads(meta_path.read_text()) if meta_path.exists() else {}
    res = meta.get("resolution", 32 if fast else 128)
    gen_kw = dict(
        resolution=res,
        dt=0.05 if fast else 0.2,
        n_snapshots=4 if fast else 20,
        time_scale=2e-4 if fast else 1.0,
        cg_iters=60 if fast else 150,
        # legacy_dt regenerates a round-4 state dir's pools BIT-IDENTICALLY
        # (the cached run_*.json results are pinned to those trajectories);
        # the per-trajectory-dt cost model is measured separately
        per_traj_dt=not legacy_dt,
    )
    meta.setdefault("n_gen", n_gen)
    meta.setdefault("resolution", res)
    for name, pipeline, seed, extra in tiers:
        if (state / f"{name}.npy").exists() and \
                f"cost_per_traj_{name}_s" in meta:
            continue
        t0 = time.time()
        arr = generate_masked_ns_batch(
            jax.random.key(seed),
            MaskedNSConfig(pipeline=pipeline, **gen_kw, **extra),
            n_gen, storage_dtype="float16",
        )
        wall = time.time() - t0
        # non-finite rows poison the SHARED mixing stats (measured: one bad
        # hard set NaN'd every alpha run) — the generator retries outlier
        # geometries at dt/2; anything still bad must fail loudly here
        finite = np.isfinite(arr.astype(np.float32)).all()
        if not finite:
            raise RuntimeError(f"{name}: non-finite trajectories survived "
                               "the dt/2 retries — investigate before "
                               "training")
        np.save(state / f"{name}.npy", arr)
        meta[f"gen_{name}_s"] = round(wall, 2)
        meta[f"cost_per_traj_{name}_s"] = round(wall / n_gen, 4)
        _log(f"generated {name}: {n_gen} traj in {wall:.1f}s")
        meta_path.write_text(json.dumps(meta, indent=1))
    meta_path.write_text(json.dumps(meta, indent=1))
    return meta


def make_model(size: str, res: int, fast: bool):
    from pregen_pde_tpu.models.scot import MODEL_SIZES, ScOT, ScOTConfig

    kw = dict(MODEL_SIZES[size])
    if fast:
        kw["embed_dim"] = 16
        kw["num_heads"] = (2, 4, 8, 16)  # embed 16 is not divisible by 3
    return ScOT(ScOTConfig(image_size=res, num_channels=7,
                           num_out_channels=3, **kw))


def run_one(name: str, spec: dict, store, mean, std, cfg_time, args,
            state: Path, seed: int = 0) -> dict:
    """Train one configuration (cached as run_<name>.json; seed>0 runs cache
    as run_<name>_s<seed>.json so multi-seed sweeps extend a finished
    single-seed state dir without invalidating it)."""
    out_path = state / (f"run_{name}.json" if seed == 0
                        else f"run_{name}_s{seed}.json")
    if out_path.exists():
        return json.loads(out_path.read_text())
    from pregen_pde_tpu.training.device_data import (
        fit_resident,
        make_device_eval_fn,
    )
    from pregen_pde_tpu.training.trainer import Trainer, TrainerConfig

    tris = []
    for tier in ("hard", "medium", "easy"):
        n = spec.get(f"n_{tier}", 0) or 0
        if n:
            tris.append(store.triples(tier, "train", cfg_time, n))
    train_tri = np.concatenate(tris)
    # val criterion is vh+ve for EVERY run (incl. 3-tier) so early stopping
    # and the iso-error comparison share one plateau definition
    val_tri = {"vh": store.triples("hard", "val", cfg_time),
               "ve": store.triples("easy", "val", cfg_time)}

    model = make_model(args.model_size, store.data.shape[2], args.fast)
    # the seed drives init, shuffling, and dropout; the trajectory subset is
    # fixed (first-n per tier) so seeds measure training noise, not sampling
    trainer = Trainer(model, TrainerConfig(
        learning_rate=5e-5,  # reference configs/mixing.yaml
        epochs=args.epochs, batch_size=args.batch_size,
        early_stop_patience=args.patience, grad_clip=5.0, seed=seed,
    ))
    t0 = time.time()
    res = fit_resident(trainer, store, train_tri, mean, std,
                       val_triples=val_tri,
                       log_fn=lambda r: _log(f"{name} {json.dumps(r)}"))
    trainer.restore_best()
    rec = {
        "spec": spec,
        "seed": seed,
        "epochs_run": len(res["history"]),
        "best_mean_val_rel_%": res["best_metric"],
        "train_wall_s": round(time.time() - t0, 1),
        "history": res["history"],
    }
    for split in store.n:
        fn = make_device_eval_fn(
            trainer, store, store.triples(split, "test", cfg_time), mean, std)
        rec[f"test_{split}"] = fn(trainer.state)
    out_path.write_text(json.dumps(rec, indent=1))
    _log(f"{name}: test_hard {rec['test_hard']['median_rel_%']:.2f}% "
         f"test_easy {rec['test_easy']['median_rel_%']:.2f}% "
         f"({rec['epochs_run']} epochs, {rec['train_wall_s']}s)")
    return rec


def _loglog_interp(x0: float, xs: np.ndarray, ys: np.ndarray) -> float:
    """y at x0 on the (xs, ys) curve, linear in log-log space."""
    lx, ly = np.log(xs), np.log(ys)
    return float(np.exp(np.interp(np.log(x0), lx, ly)))


def _strip_seed(name: str) -> tuple[str, int]:
    """'alpha_0.5_s2' -> ('alpha_0.5', 2); seedless names are seed 0."""
    import re

    m = re.match(r"(.+)_s(\d+)$", name)
    return (m.group(1), int(m.group(2))) if m else (name, 0)


def analyze(runs: dict, gen_meta: dict, total: int) -> dict:
    """Iso-error savings: for each mixed configuration, the hard-only
    generation cost reaching the same test-hard error, over the mixed
    dataset's cost. Multi-seed runs of one configuration are aggregated by
    the MEDIAN error (headline) with per-seed errors/savings kept for the
    spread (VERDICT r4 #2: the single-seed tables lived inside training
    noise)."""
    c_h = gen_meta["cost_per_traj_hard_s"]
    c_e = gen_meta["cost_per_traj_easy_s"]
    c_m = gen_meta.get("cost_per_traj_medium_s", 0.0)

    def _n(r, tier):
        return r["spec"].get(f"n_{tier}", 0) or 0

    # group seeds of one configuration
    groups: dict[str, dict[int, dict]] = {}
    for k, r in runs.items():
        base, seed = _strip_seed(k)
        groups.setdefault(base, {})[r.get("seed", seed)] = r

    # hard-only error-vs-size curve: the dedicated ladder runs plus the
    # alpha=1 mixed run (spec: only n_hard nonzero selects both); the curve
    # point at each n is the MEDIAN over seeds
    ladder_errs: dict[int, list[float]] = {}
    for by_seed in groups.values():
        r0 = next(iter(by_seed.values()))
        if _n(r0, "easy") == 0 and _n(r0, "medium") == 0:
            ladder_errs.setdefault(_n(r0, "hard"), []).extend(
                r["test_hard"]["median_rel_%"] for r in by_seed.values())
    ladder = sorted((n, float(np.median(e)), sorted(round(x, 3) for x in e))
                    for n, e in ladder_errs.items())
    ns = np.array([n for n, _, _ in ladder], float)
    errs = np.array([e for _, e, _ in ladder], float)
    # enforce monotone-nonincreasing error for stable inversion (training
    # noise can locally invert the curve); keep the raw points in the report
    errs_mono = np.minimum.accumulate(errs)

    def _iso(err: float, cost_mix: float) -> tuple[float, float, str | None]:
        if err <= errs_mono[-1]:
            # better than the largest hard-only run: the iso-error hard-only
            # cost exceeds the ladder -> LOWER BOUND, no extrapolation
            return float(ns[-1]), ns[-1] * c_h / cost_mix, "lower"
        if err >= errs_mono[0]:
            # worse than the smallest hard-only run
            return float(ns[0]), ns[0] * c_h / cost_mix, "upper"
        n_iso = _loglog_interp(err, errs_mono[::-1], ns[::-1])
        return round(n_iso, 1), n_iso * c_h / cost_mix, None

    def iso_entry(by_seed: dict[int, dict]):
        r0 = next(iter(by_seed.values()))
        n_hard, n_med, n_easy = (_n(r0, t) for t in ("hard", "medium", "easy"))
        cost_mix = n_hard * c_h + n_med * c_m + n_easy * c_e
        seed_errs = {s: r["test_hard"]["median_rel_%"]
                     for s, r in sorted(by_seed.items())}
        err = float(np.median(list(seed_errs.values())))
        entry = {
            "n_hard": n_hard, "n_easy": n_easy,
            "cost_mixed_s": round(cost_mix, 1),
            "test_hard_median_rel_%": err,
            "test_easy_median_rel_%": float(np.median(
                [r["test_easy"]["median_rel_%"] for r in by_seed.values()])),
        }
        if n_med:
            entry["n_medium"] = n_med
        if "test_medium" in r0:
            entry["test_medium_median_rel_%"] = float(np.median(
                [r["test_medium"]["median_rel_%"] for r in by_seed.values()]))
        iso_n, sav, bound = _iso(err, cost_mix)
        entry["iso_n_hard"] = iso_n
        entry["savings_x"] = round(sav, 2)
        if bound == "lower":
            entry["savings_is_lower_bound"] = True
        elif bound == "upper":
            entry["savings_is_upper_bound"] = True
        if len(by_seed) > 1:
            entry["seed_errs"] = {str(s): round(e, 3)
                                  for s, e in seed_errs.items()}
            per_seed_sav = [round(_iso(e, cost_mix)[1], 2)
                            for e in seed_errs.values()]
            entry["savings_x_per_seed"] = per_seed_sav
            entry["savings_x_range"] = [min(per_seed_sav), max(per_seed_sav)]
        return entry

    out = {"ladder_raw": ladder,
           "cost_per_traj": {"hard": c_h, "easy": c_e},
           "alphas": {}}
    if c_m:
        out["cost_per_traj"]["medium"] = c_m
    for base, by_seed in sorted(groups.items()):
        if base.startswith("alpha_"):
            out["alphas"][f"{float(base.split('_')[1]):g}"] = iso_entry(by_seed)
        elif base.startswith("trimix_"):
            out.setdefault("trimix", {})[base[len("trimix_"):]] = \
                iso_entry(by_seed)

    pool = {**out["alphas"], **out.get("trimix", {})}
    best = max(pool.items(), key=lambda kv: kv[1]["savings_x"])
    out["best_mix"] = best[0]
    out["best_savings_x"] = best[1]["savings_x"]
    out["total_trajectories"] = total
    out["n_seeds"] = max(len(g) for g in groups.values())
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--state-dir", default=None,
                    help="default runs/savings_r4 (geometry axis) / "
                    "runs/physics_savings_r5 (physics axis)")
    ap.add_argument("--axis", default="geometry",
                    choices=("geometry", "physics"),
                    help="difficulty axis (`README.md:18-21`): geometry = "
                    "obstacle count/placement (multi-hole vs free channel), "
                    "physics = Reynolds band on the fixed cylinder")
    ap.add_argument("--fast", action="store_true",
                    help="minutes-scale CPU smoke configuration")
    ap.add_argument("--legacy-dt", action="store_true",
                    help="regenerate pools with the round-4 bucket-max dt "
                    "(bit-identical to a round-4 state dir's data)")
    ap.add_argument("--n-gen", type=int, default=None,
                    help="trajectories generated per difficulty")
    ap.add_argument("--total", type=int, default=None,
                    help="total training trajectories per mixed run")
    ap.add_argument("--alphas", default="0.0,0.25,0.5,0.75,1.0")
    ap.add_argument("--hard-ladder", default="32,64,96,128,192")
    ap.add_argument("--trimix", default="",
                    help="comma list of hard:medium:easy trajectory counts "
                    "(the reference's LOW+MEDIUM+HIGH recipe, README.md:41); "
                    "e.g. 64:128:64,0:256:0. Adds the `fpo_hole` medium "
                    "tier to the state dir on first use.")
    ap.add_argument("--model-size", default="T")
    ap.add_argument("--seeds", default="0",
                    help="comma list of training seeds; every configuration "
                    "in THIS invocation runs once per seed (cached per "
                    "(config, seed)), and the final analysis aggregates "
                    "every cached run in --state-dir by median over seeds")
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--epochs", type=int, default=None,
                    help="epoch CAP; runs early-stop on the val plateau")
    ap.add_argument("--patience", type=int, default=None)
    args = ap.parse_args()

    from pregen_pde_tpu.utils.compcache import enable_persistent_cache
    from pregen_pde_tpu.utils.misc import use_best_backend

    use_best_backend()
    enable_persistent_cache()

    fast = args.fast
    n_gen = args.n_gen or (16 if fast else 320)
    total = args.total or (8 if fast else 256)
    args.epochs = args.epochs or (2 if fast else 120)
    args.patience = args.patience or (None if fast else 12)
    if args.state_dir is None:
        args.state_dir = ("runs/savings_r4" if args.axis == "geometry"
                          else "runs/physics_savings_r5")
    state = Path(args.state_dir)
    state.mkdir(parents=True, exist_ok=True)

    trimix = [s for s in args.trimix.split(",") if s]
    base, med = ((DEFAULT_TIERS, MEDIUM_TIER) if args.axis == "geometry"
                 else (PHYSICS_TIERS, PHYSICS_MEDIUM_TIER))
    tiers = list(base) + ([med] if trimix else [])
    gen_meta = generate_sets(state, n_gen, fast, tiers,
                             legacy_dt=args.legacy_dt)

    from pregen_pde_tpu.training.datasets import TimePairConfig, compute_stats
    from pregen_pde_tpu.training.device_data import DeviceDataStore

    hard = np.load(state / "hard.npy")
    easy = np.load(state / "easy.npy")
    t_steps = hard.shape[1] - 1
    n_tail = max(2, n_gen // 10)
    cfg_time = TimePairConfig(max_num_time_steps=t_steps,
                              allowed_transitions=[1],
                              n_val=n_tail, n_test=n_tail)
    assert total <= n_gen - 2 * n_tail, (total, n_gen)
    # shared streaming stats across BOTH difficulties (== `streaming_stats`,
    # `mixingexp.py:275-296`). Stats stay pinned to the 2-tier pools even
    # when medium is added later, so every cached run (ladder, alpha grid,
    # trimix) shares one normalization and the iso-error inversion is valid.
    mean, std = compute_stats([hard, easy])
    arrays = {"hard": hard, "easy": easy}
    if trimix:
        arrays["medium"] = np.load(state / "medium.npy")
    store = DeviceDataStore(arrays)
    del hard, easy, arrays

    seeds = [int(x) for x in args.seeds.split(",")]
    for seed in seeds:
        for a in [float(x) for x in args.alphas.split(",")]:
            n_hard = int(round(a * total))
            spec = {"n_hard": n_hard, "n_easy": total - n_hard, "alpha": a}
            run_one(f"alpha_{a:g}", spec, store, mean, std, cfg_time, args,
                    state, seed=seed)
        for n in [int(x) for x in args.hard_ladder.split(",") if x]:
            if n >= total:
                continue
            spec = {"n_hard": n, "n_easy": 0, "alpha": None}
            run_one(f"hardonly_{n}", spec, store, mean, std, cfg_time, args,
                    state, seed=seed)
        for comp in trimix:
            nh, nm, ne = (int(x) for x in comp.split(":"))
            name = f"trimix_{nh}_{nm}_{ne}"
            spec = {"n_hard": nh, "n_medium": nm, "n_easy": ne, "alpha": None}
            run_one(name, spec, store, mean, std, cfg_time, args, state,
                    seed=seed)

    # the analysis aggregates EVERY cached run in the state dir (not just
    # this invocation's grid), so seed sweeps can be added incrementally
    runs = {p.stem[len("run_"):]: json.loads(p.read_text())
            for p in sorted(state.glob("run_*.json"))}
    result = analyze(runs, gen_meta, total)
    (state / "savings.json").write_text(json.dumps(result, indent=1))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
