"""Equal-error savings factor in the reference's ACTUAL regime: few-shot
fine-tuning of a pretrained scOT foundation model.

VERDICT r4 item #1: the reference's 8.9x mixing claim is produced by
*fine-tuning* a pretrained model (`/root/reference/Poseidon_mixing_Exp/scOT/
mixingexp.py:184` `--finetune_from`, `:272` "Finetuning dataset:", `:499-501`
`ScOT.from_pretrained`) of a few-shot paper — while round 4's savings
measurement (`examples/savings_factor.py`, savings_x < 1 everywhere) trains
from scratch. A pretrained model that already knows free-flow physics is
exactly the setting where few hard + many easy trajectories could behave
differently. This script runs the protocol in that regime:

1. PRETRAIN a scOT foundation model on cheap data this framework generates
   for free: ``--n-pre`` obstacle-free `fpo_regular` trajectories (a DISJOINT
   seed from the fine-tuning pools), normalized with the SAME shared
   hard+easy stats as the round-4 experiment so every number is comparable.
2. FINE-TUNE from the FM at few-shot sizes (total N in {32, 64, 128} by
   default) over the alpha grid, with the reference's exact fine-tune
   optimizer recipe (`configs/mixing.yaml`: lr 5e-5, lr_embedding_recovery
   5e-4, lr_time_embedding 5e-4, weight_decay 1e-6, cosine, clip 5, bs 16 —
   via `training/tiers.py::scot_main_tier_fn`, the reference's 4-group
   `create_optimizer`), multiple seeds per configuration.
3. The hard-only fine-tune ladder (alpha=1 at each N, plus smaller N) gives
   the error-vs-cost curve; iso-error inversion gives

       savings(N, alpha) = cost_hard_only(iso-error N*) / cost_mixed

   — the fine-tune-regime analog of the reference's 8.9x. The FM's own
   (one-time, cheap-data) pretraining cost is reported separately: the
   reference's protocol treats the pretrained model as given.

Hard/easy pools and their measured generation costs are REUSED from a
finished `savings_factor.py` state dir (``--pools-dir``, default
`runs/savings_r4`) so the fine-tune-regime numbers share data, stats, and
cost model with the from-scratch tables they are compared against.

Everything is cached/resumable in --state-dir; results land in
--state-dir/fm_savings.json and are summarized in PERF.md.
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np

# reuse the round-4 experiment's pieces (ladder math, model factory, tiers)
import sys

sys.path.insert(0, str(Path(__file__).resolve().parent))
from savings_factor import _loglog_interp, _strip_seed, make_model  # noqa: E402


def _log(msg: str):
    print(f"[fm_savings {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def generate_pretrain(state: Path, n_pre: int, res: int, fast: bool) -> dict:
    """The FM's pretraining corpus: obstacle-free channel flow
    (`fpo_regular` == the reference's FPO Regular pipeline with no hole),
    generated at a seed disjoint from the fine-tuning pools (seed 10 vs the
    pools' 0/1/2)."""
    import jax

    from pregen_pde_tpu.datagen.masked_ns import (
        MaskedNSConfig,
        generate_masked_ns_batch,
    )

    meta_path = state / "pretrain_meta.json"
    if (state / "pretrain.npy").exists() and meta_path.exists():
        return json.loads(meta_path.read_text())
    gen_kw = dict(
        resolution=res,
        dt=0.05 if fast else 0.2,
        n_snapshots=4 if fast else 20,
        time_scale=2e-4 if fast else 1.0,
        cg_iters=60 if fast else 150,
    )
    t0 = time.time()
    arr = generate_masked_ns_batch(
        jax.random.key(10), MaskedNSConfig(pipeline="fpo_regular", **gen_kw),
        n_pre, storage_dtype="float16",
    )
    wall = time.time() - t0
    if not np.isfinite(arr.astype(np.float32)).all():
        raise RuntimeError("pretrain corpus has non-finite trajectories")
    np.save(state / "pretrain.npy", arr)
    meta = {"n_pre": n_pre, "gen_pretrain_s": round(wall, 2),
            "cost_per_traj_pretrain_s": round(wall / n_pre, 4)}
    meta_path.write_text(json.dumps(meta, indent=1))
    _log(f"generated pretrain corpus: {n_pre} traj in {wall:.1f}s")
    return meta


def pretrain_fm(state: Path, store, mean, std, cfg_time, args):
    """Train the foundation model on the pretraining corpus (from scratch,
    early-stopped on its own held-out tail); returns (params, record)."""
    from flax import serialization

    from pregen_pde_tpu.training.device_data import fit_resident
    from pregen_pde_tpu.training.trainer import Trainer, TrainerConfig

    fm_path = state / "fm_params.msgpack"
    rec_path = state / "fm.json"
    model = make_model(args.model_size, store.data.shape[2], args.fast)
    if fm_path.exists() and rec_path.exists():
        import jax

        # rebuild the param-tree template with a jitted init (CLAUDE.md:
        # eager flax init dispatches thousands of tiny programs through the
        # tunnel), then overwrite it with the stored FM bytes
        t0 = np.zeros((1,), np.float32)
        x0 = np.zeros((1, *store.data.shape[2:4],
                       store.data.shape[4] + 1), np.float32)
        template = jax.jit(
            lambda r: model.init(r, x0, t0)["params"]
        )(jax.random.key(0))
        template = jax.tree_util.tree_map(np.asarray, template)
        params = serialization.from_bytes(template, fm_path.read_bytes())
        return params, json.loads(rec_path.read_text())

    trainer = Trainer(model, TrainerConfig(
        learning_rate=5e-5, epochs=args.pre_epochs,
        batch_size=args.batch_size,
        early_stop_patience=args.pre_patience, grad_clip=5.0, seed=0,
    ))
    train_tri = store.triples("pretrain", "train", cfg_time)
    val_tri = {"vp": store.triples("pretrain", "val", cfg_time)}
    t0 = time.time()
    res = fit_resident(trainer, store, train_tri, mean, std,
                       val_triples=val_tri,
                       log_fn=lambda r: _log(f"fm {json.dumps(r)}"))
    trainer.restore_best()
    import jax

    params = jax.tree_util.tree_map(np.asarray, trainer.state.params)
    fm_path.write_bytes(serialization.to_bytes(params))
    rec = {"epochs_run": len(res["history"]),
           "best_val_rel_%": res["best_metric"],
           "train_wall_s": round(time.time() - t0, 1),
           "history": res["history"][-3:]}
    rec_path.write_text(json.dumps(rec, indent=1))
    _log(f"FM pretrained: best val {res['best_metric']:.2f}% "
         f"({rec['epochs_run']} epochs, {rec['train_wall_s']}s)")
    return params, rec


def run_ft(name: str, spec: dict, fm_params, store, mean, std, cfg_time,
           args, state: Path, seed: int = 0) -> dict:
    """One fine-tuning run from the FM (cached per (config, seed))."""
    out_path = state / (f"ft_{name}.json" if seed == 0
                        else f"ft_{name}_s{seed}.json")
    if out_path.exists():
        return json.loads(out_path.read_text())
    from pregen_pde_tpu.training.device_data import (
        fit_resident,
        make_device_eval_fn,
    )
    from pregen_pde_tpu.training.tiers import (
        SCOT_TIER_DECAY,
        scot_main_tier_fn,
        scot_main_tiers,
    )
    from pregen_pde_tpu.training.trainer import Trainer, TrainerConfig

    tris = []
    for tier in ("hard", "easy"):
        n = spec.get(f"n_{tier}", 0) or 0
        if n:
            tris.append(store.triples(tier, "train", cfg_time, n))
    train_tri = np.concatenate(tris)
    val_tri = {"vh": store.triples("hard", "val", cfg_time),
               "ve": store.triples("easy", "val", cfg_time)}

    model = make_model(args.model_size, store.data.shape[2], args.fast)
    # the reference fine-tune recipe, `configs/mixing.yaml` + `train.py:372-381`:
    # base lr 5e-5, embedding/recovery and time-embedding groups at 5e-4,
    # weight decay 1e-6, cosine, grad clip 5 — group assignment is the exact
    # reference `create_optimizer` (training/tiers.py)
    trainer = Trainer(
        model,
        TrainerConfig(
            learning_rate=args.ft_lr, weight_decay=1e-6,
            epochs=args.epochs, batch_size=args.batch_size,
            early_stop_patience=args.patience, grad_clip=5.0, seed=seed,
            lr_tiers=scot_main_tiers(args.ft_lr, args.ft_lr_embedding,
                                     args.ft_lr_embedding),
        ),
        tier_fn=scot_main_tier_fn,
        tier_decay=SCOT_TIER_DECAY,
    )
    t0 = time.time()
    # init then graft the FM weights (re-inits optimizer state for them)
    steps = len(train_tri) // args.batch_size
    tri0 = train_tri[: args.batch_size]
    from pregen_pde_tpu.training.device_data import make_gather

    import jax

    gather = make_gather(mean, std)
    tt, inp, lab = jax.jit(gather)(store.data, np.asarray(tri0, np.int32))
    trainer.init_state({"input": inp, "time": tt, "label": lab},
                       steps_per_epoch=max(steps, 1))
    trainer.replace_params(fm_params)
    res = fit_resident(trainer, store, train_tri, mean, std,
                       val_triples=val_tri,
                       log_fn=lambda r: _log(f"{name}_s{seed} "
                                             f"{json.dumps(r)}"))
    trainer.restore_best()
    rec = {
        "spec": spec,
        "seed": seed,
        "epochs_run": len(res["history"]),
        "best_mean_val_rel_%": res["best_metric"],
        "train_wall_s": round(time.time() - t0, 1),
    }
    for split in ("hard", "easy"):
        fn = make_device_eval_fn(
            trainer, store, store.triples(split, "test", cfg_time), mean, std)
        rec[f"test_{split}"] = fn(trainer.state)
    out_path.write_text(json.dumps(rec, indent=1))
    _log(f"{name}_s{seed}: test_hard {rec['test_hard']['median_rel_%']:.2f}% "
         f"test_easy {rec['test_easy']['median_rel_%']:.2f}% "
         f"({rec['epochs_run']} epochs, {rec['train_wall_s']}s)")
    return rec


def analyze_ft(runs: dict, gen_meta: dict, pre_meta: dict, fm_rec: dict):
    """Per-total iso-error savings in the fine-tune regime. The hard-only
    fine-tune ladder (every run with n_easy == 0, ALL totals pooled) is the
    cost curve; savings_x for a mixed run is computed against it. The FM's
    one-time pretraining cost is reported alongside, NOT amortized into
    cost_mixed (the reference protocol treats the pretrained model as
    given)."""
    c_h = gen_meta["cost_per_traj_hard_s"]
    c_e = gen_meta["cost_per_traj_easy_s"]

    groups: dict[str, dict[int, dict]] = {}
    for k, r in runs.items():
        base, seed = _strip_seed(k)
        groups.setdefault(base, {})[r.get("seed", seed)] = r

    def _med(by_seed, split):
        return float(np.median([r[f"test_{split}"]["median_rel_%"]
                                for r in by_seed.values()]))

    ladder_errs: dict[int, list[float]] = {}
    for by_seed in groups.values():
        r0 = next(iter(by_seed.values()))
        if (r0["spec"].get("n_easy") or 0) == 0:
            ladder_errs.setdefault(r0["spec"]["n_hard"], []).extend(
                r["test_hard"]["median_rel_%"] for r in by_seed.values())
    ladder = sorted((n, float(np.median(e)), sorted(round(x, 3) for x in e))
                    for n, e in ladder_errs.items())
    ns = np.array([n for n, _, _ in ladder], float)
    errs = np.minimum.accumulate(np.array([e for _, e, _ in ladder], float))

    def _iso(err, cost_mix):
        if err <= errs[-1]:
            return float(ns[-1]), ns[-1] * c_h / cost_mix, "lower"
        if err >= errs[0]:
            return float(ns[0]), ns[0] * c_h / cost_mix, "upper"
        n_iso = _loglog_interp(err, errs[::-1], ns[::-1])
        return round(n_iso, 1), n_iso * c_h / cost_mix, None

    out = {
        "regime": "finetune_from_pretrained_fm",
        "fm": {"n_pretrain_traj": pre_meta["n_pre"],
               "pretrain_gen_s": pre_meta["gen_pretrain_s"],
               "pretrain_train_s": fm_rec["train_wall_s"],
               "pretrain_best_val_rel_%": fm_rec["best_val_rel_%"]},
        "cost_per_traj": {"hard": c_h, "easy": c_e},
        "ladder_raw": ladder,
        "mixes": {},
    }
    for base, by_seed in sorted(groups.items()):
        r0 = next(iter(by_seed.values()))
        n_hard = r0["spec"]["n_hard"]
        n_easy = r0["spec"].get("n_easy") or 0
        cost_mix = n_hard * c_h + n_easy * c_e
        err = _med(by_seed, "hard")
        entry = {"n_hard": n_hard, "n_easy": n_easy,
                 "cost_mixed_s": round(cost_mix, 1),
                 "test_hard_median_rel_%": round(err, 3),
                 "test_easy_median_rel_%": round(_med(by_seed, "easy"), 3)}
        iso_n, sav, bound = _iso(err, cost_mix)
        entry["iso_n_hard"] = iso_n
        entry["savings_x"] = round(sav, 2)
        if bound:
            entry[f"savings_is_{bound}_bound"] = True
        if len(by_seed) > 1:
            seed_errs = {str(s): round(r["test_hard"]["median_rel_%"], 3)
                         for s, r in sorted(by_seed.items())}
            entry["seed_errs"] = seed_errs
            per_seed = [round(_iso(e, cost_mix)[1], 2)
                        for e in seed_errs.values()]
            entry["savings_x_per_seed"] = per_seed
            entry["savings_x_range"] = [min(per_seed), max(per_seed)]
        out["mixes"][base] = entry

    mixed_only = {k: v for k, v in out["mixes"].items() if v["n_easy"] > 0}
    if mixed_only:
        best = max(mixed_only.items(), key=lambda kv: kv[1]["savings_x"])
        out["best_mix"] = best[0]
        out["best_savings_x"] = best[1]["savings_x"]
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--state-dir", default="runs/fm_savings_r5")
    ap.add_argument("--pools-dir", default="runs/savings_r4",
                    help="finished savings_factor state dir providing the "
                    "hard/easy pools + measured generation costs")
    ap.add_argument("--fast", action="store_true",
                    help="minutes-scale CPU smoke configuration (generates "
                    "tiny pools in --state-dir when --pools-dir is missing)")
    ap.add_argument("--n-pre", type=int, default=None,
                    help="pretraining trajectories (obstacle-free)")
    ap.add_argument("--totals", default="32,64,128",
                    help="few-shot total trajectory counts per mixed run")
    ap.add_argument("--alphas", default="0.0,0.25,0.5,0.75,1.0")
    ap.add_argument("--extra-ladder", default="8,16",
                    help="additional hard-only fine-tune sizes for the curve")
    ap.add_argument("--seeds", default="0,1,2")
    ap.add_argument("--model-size", default="T")
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--epochs", type=int, default=None, help="FT epoch cap")
    ap.add_argument("--patience", type=int, default=None)
    ap.add_argument("--pre-epochs", type=int, default=None)
    ap.add_argument("--pre-patience", type=int, default=None)
    ap.add_argument("--ft-lr", type=float, default=5e-5)
    ap.add_argument("--ft-lr-embedding", type=float, default=5e-4,
                    help="embedding/recovery + time-embedding group lr "
                    "(`configs/mixing.yaml` lr_embedding_recovery)")
    args = ap.parse_args()

    from pregen_pde_tpu.utils.compcache import enable_persistent_cache
    from pregen_pde_tpu.utils.misc import use_best_backend

    use_best_backend()
    enable_persistent_cache()

    fast = args.fast
    args.n_pre = args.n_pre or (12 if fast else 1024)
    args.epochs = args.epochs or (2 if fast else 150)
    args.patience = args.patience or (None if fast else 12)
    args.pre_epochs = args.pre_epochs or (2 if fast else 60)
    args.pre_patience = args.pre_patience or (None if fast else 8)
    state = Path(args.state_dir)
    state.mkdir(parents=True, exist_ok=True)
    pools = Path(args.pools_dir)

    if not (pools / "hard.npy").exists():
        if not fast:
            raise SystemExit(f"--pools-dir {pools} has no hard.npy — run "
                             "examples/savings_factor.py first")
        from savings_factor import generate_sets

        pools = state
        generate_sets(state, 12, fast=True)
    gen_meta = json.loads((pools / "gen_meta.json").read_text())
    hard = np.load(pools / "hard.npy")
    easy = np.load(pools / "easy.npy")
    n_pool = gen_meta["n_gen"]
    res = hard.shape[2]

    pre_meta = generate_pretrain(state, args.n_pre, res, fast)
    # on resume with a cached FM the corpus is only consulted for its SHAPE
    # (pretrain_fm's cached branch) — mmap it and skip the multi-GB HBM
    # upload (~5 min through the tunnel)
    fm_cached = ((state / "fm_params.msgpack").exists()
                 and (state / "fm.json").exists())
    pretrain = np.load(state / "pretrain.npy",
                       mmap_mode="r" if fm_cached else None)

    from pregen_pde_tpu.training.datasets import TimePairConfig, compute_stats
    from pregen_pde_tpu.training.device_data import DeviceDataStore

    t_steps = hard.shape[1] - 1
    n_tail = max(2, n_pool // 10)
    cfg_time = TimePairConfig(max_num_time_steps=t_steps,
                              allowed_transitions=[1],
                              n_val=n_tail, n_test=n_tail)
    pre_tail = max(2, args.n_pre // 16)
    cfg_time_pre = TimePairConfig(max_num_time_steps=t_steps,
                                  allowed_transitions=[1],
                                  n_val=pre_tail, n_test=pre_tail)
    # SAME shared hard+easy stats as the from-scratch experiment — the FM is
    # pretrained under the fine-tuning normalization (== the reference's
    # shared `streaming_stats`, `mixingexp.py:275-296`)
    mean, std = compute_stats([hard, easy])

    # phase 1: FM pretraining (its own store; freed before the FT sweep)
    if fm_cached:
        class _ShapeOnlyStore:  # quacks like DeviceDataStore for .data.shape
            data = pretrain

        pre_store = _ShapeOnlyStore()
    else:
        pre_store = DeviceDataStore({"pretrain": pretrain})
    fm_params, fm_rec = pretrain_fm(state, pre_store, mean, std,
                                    cfg_time_pre, args)
    del pre_store, pretrain

    # phase 2: few-shot fine-tuning sweep
    store = DeviceDataStore({"hard": hard, "easy": easy})
    del hard, easy
    seeds = [int(x) for x in args.seeds.split(",")]
    totals = [int(x) for x in args.totals.split(",")]
    alphas = [float(x) for x in args.alphas.split(",")]
    max_total = max(totals)
    assert max_total <= n_pool - 2 * n_tail, (max_total, n_pool)
    for seed in seeds:
        for total in totals:
            for a in alphas:
                n_hard = int(round(a * total))
                spec = {"total": total, "alpha": a,
                        "n_hard": n_hard, "n_easy": total - n_hard}
                run_ft(f"N{total}_a{a:g}", spec, fm_params, store, mean, std,
                       cfg_time, args, state, seed=seed)
        for n in [int(x) for x in args.extra_ladder.split(",") if x]:
            spec = {"total": n, "alpha": 1.0, "n_hard": n, "n_easy": 0}
            run_ft(f"N{n}_a1", spec, fm_params, store, mean, std,
                   cfg_time, args, state, seed=seed)

    runs = {p.stem[len("ft_"):]: json.loads(p.read_text())
            for p in sorted(state.glob("ft_*.json"))}
    result = analyze_ft(runs, gen_meta, pre_meta, fm_rec)
    (state / "fm_savings.json").write_text(json.dumps(result, indent=1))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
