"""CLI — one entry point per workflow (replacing the reference's scattered
script entry points: `TrainCNO_time_L.py`, `python -m scOT.train`,
`scOT/mixingexp.py`, `scripts/train.py`, `dataset_gen/*/main.py`):

    python -m pregen_pde_tpu generate   --workload ns_spectral --n 256 --out dir/
    python -m pregen_pde_tpu generate   --workload fpo_hole    --n 128 --out dir/
    python -m pregen_pde_tpu train      --model fno --data dir/results_batch_0.npy
    python -m pregen_pde_tpu mix-sweep  --hard hard.npy --easy easy.npy --alphas 0,0.25,1
    python -m pregen_pde_tpu evaluate   --model fno --ckpt ckpt/ --data d.npy
    python -m pregen_pde_tpu preflight  --data d.npy
    python -m pregen_pde_tpu bench
"""

from __future__ import annotations

import argparse
import json
import sys


def _cmd_generate(args):
    import jax
    from pregen_pde_tpu.datagen.writer import ShardWriter, scan_existing_shards

    key = jax.random.key(args.seed)
    start_index = 0
    if args.resume and args.format == "npy":
        start_index, n_done = scan_existing_shards(args.out, args.prefix)
        if n_done >= args.n:
            print(json.dumps({"generated": 0, "already_done": n_done,
                              "out": args.out}))
            return
        # fold the resume point into the key: the continuation draws fresh
        # trajectories rather than replaying the crashed batch's stream
        key = jax.random.fold_in(key, start_index)
        args.n -= n_done
    writer = ShardWriter(args.out, prefix=args.prefix, fmt=args.format,
                         dtype=args.storage_dtype, start_index=start_index)
    if args.workload in ("burgers", "heat", "darcy"):
        done = 0
        while done < args.n:
            take = min(args.batch_size, args.n - done)
            key, sub = jax.random.split(key)
            if args.workload == "burgers":
                from pregen_pde_tpu.core.config import BurgersConfig
                from pregen_pde_tpu.datagen.simple import generate_burgers_batch

                arr = generate_burgers_batch(
                    sub, BurgersConfig(resolution=args.resolution), take,
                    storage_dtype=args.storage_dtype,
                )
            elif args.workload == "heat":
                from pregen_pde_tpu.datagen.simple import generate_heat_batch
                from pregen_pde_tpu.solvers.heat import HeatConfig

                arr = generate_heat_batch(
                    sub, HeatConfig(resolution=args.resolution), take,
                    storage_dtype=args.storage_dtype,
                )
            else:
                from pregen_pde_tpu.datagen.simple import generate_darcy_batch
                from pregen_pde_tpu.solvers.darcy import DarcyConfig

                arr = generate_darcy_batch(
                    sub, DarcyConfig(resolution=args.resolution), take,
                    storage_dtype=args.storage_dtype,
                )
            writer.write_batch(arr)
            done += take
        writer.close()
        print(json.dumps({"generated": args.n, "out": args.out}))
        return
    if args.workload == "ns_spectral":
        from pregen_pde_tpu.core.config import NSVorticityConfig
        from pregen_pde_tpu.datagen.pipeline import (
            GenerationConfig,
            generate_ns_dataset,
        )

        gen = GenerationConfig(
            solver=NSVorticityConfig(
                resolution=args.resolution, forcing=args.forcing,
            ),
            batch_size=args.batch_size,
            vary_difficulty=not args.fixed_difficulty,
            storage_dtype=args.storage_dtype,
        )
        generate_ns_dataset(key, gen, args.n, writer=writer)
    else:
        import jax.numpy as jnp
        from pregen_pde_tpu.datagen.masked_ns import (
            MaskedNSConfig,
            generate_masked_ns_batch,
        )

        cfg = MaskedNSConfig(
            pipeline=args.workload,
            resolution=args.resolution,
            batch_size=args.batch_size,
            time_scale=args.time_scale,
        )
        done = 0
        while done < args.n:
            take = min(args.batch_size, args.n - done)
            key, sub = jax.random.split(key)
            arr = generate_masked_ns_batch(sub, cfg, take,
                                           storage_dtype=args.storage_dtype)
            writer.write_batch(arr)
            done += take
        writer.close()
    print(json.dumps({"generated": args.n, "out": args.out}))


def _make_model(name, in_size):
    if name == "fno":
        from pregen_pde_tpu.models.fno import FNO2d

        return FNO2d(out_channels=3)
    if name == "ffno":
        from pregen_pde_tpu.models.ffno import FFNO2d

        return FFNO2d(out_channels=3)
    if name == "cno":
        from pregen_pde_tpu.models.cno import CNO

        return CNO(in_size=in_size, out_dim=3)
    if name.startswith("scot"):
        from pregen_pde_tpu.models.scot import MODEL_SIZES, ScOT, ScOTConfig

        size = name.split("-")[1].upper() if "-" in name else "T"
        return ScOT(ScOTConfig(image_size=in_size, num_channels=7,
                               num_out_channels=3, **MODEL_SIZES[size]))
    raise SystemExit(f"unknown model {name}")


def _load_data(path):
    import numpy as np

    return np.load(path, mmap_mode="r")


def _cmd_train(args):
    import numpy as np
    from pregen_pde_tpu.training.datasets import (
        BatchLoader,
        TimePairConfig,
        TimePairDataset,
    )
    from pregen_pde_tpu.training.native_loader import make_batch_loader
    from pregen_pde_tpu.training.trainer import Trainer, TrainerConfig

    data = np.asarray(_load_data(args.data))
    t_steps = data.shape[1] - 1
    # transition grammar ≡ `TrainCNO_time_L.py:151-163`
    allowed = {
        "one": [1],
        "one2all": None,  # (0 → t) pairs (TimePairConfig's None semantics)
        "all": list(range(1, t_steps + 1)),
    }[args.transitions]
    cfg = TimePairConfig(
        max_num_time_steps=t_steps,
        allowed_transitions=allowed,
        n_val=max(2, data.shape[0] // 10),
        n_test=max(2, data.shape[0] // 10),
    )
    train = TimePairDataset(data, cfg, "train")
    val = TimePairDataset(data, cfg, "val", mean=train.mean, std=train.std)
    model = _make_model(args.model, data.shape[2])
    tcfg = TrainerConfig(
        learning_rate=args.lr, epochs=args.epochs, batch_size=args.batch_size,
        ckpt_dir=args.ckpt,
    )
    trainer = Trainer(model, tcfg)
    result = trainer.fit(
        make_batch_loader(train, args.batch_size, seed=0),
        val_loaders={"val": BatchLoader(val, args.batch_size, shuffle=False)},
        log_fn=lambda rec: print(json.dumps(rec)),
    )
    print(json.dumps({"best_mean_val_rel_%": result["best_metric"]}))


def _cmd_mix_sweep(args):
    import numpy as np
    from pregen_pde_tpu.training.datasets import (
        BatchLoader,
        TimePairConfig,
        make_mixed_datasets,
    )
    from pregen_pde_tpu.training.native_loader import make_batch_loader
    from pregen_pde_tpu.training.trainer import Trainer, TrainerConfig

    hard = np.asarray(_load_data(args.hard))
    easy = np.asarray(_load_data(args.easy))
    t_steps = hard.shape[1] - 1
    cfg = TimePairConfig(
        max_num_time_steps=t_steps, allowed_transitions=[1, 2],
        n_val=max(2, hard.shape[0] // 10), n_test=max(2, hard.shape[0] // 10),
    )
    results = {}
    for alpha in [float(a) for a in args.alphas.split(",")]:
        train, vh, ve, th, te = make_mixed_datasets(
            hard, easy, alpha, args.total_trajectories, cfg
        )
        model = _make_model(args.model, hard.shape[2])
        trainer = Trainer(model, TrainerConfig(
            learning_rate=args.lr, epochs=args.epochs, batch_size=args.batch_size,
        ))
        trainer.fit(
            make_batch_loader(train, args.batch_size, seed=0),
            val_loaders={
                "val_hard": BatchLoader(vh, args.batch_size, shuffle=False),
                "val_easy": BatchLoader(ve, args.batch_size, shuffle=False),
            },
        )
        trainer.restore_best()
        results[alpha] = {
            "test_hard": trainer.evaluate(BatchLoader(th, args.batch_size, shuffle=False)),
            "test_easy": trainer.evaluate(BatchLoader(te, args.batch_size, shuffle=False)),
        }
        print(json.dumps({"alpha": alpha, **results[alpha]}))
    print(json.dumps(results))


def _evaluate_ckpt(ckpt_dir, model_name, data, patterns_str, batch_size):
    """Rollout-pattern + accumulation-error evaluation of one checkpoint dir
    (shared by the `evaluate` and `sweep-eval` commands)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import orbax.checkpoint as ocp
    from pathlib import Path

    from pregen_pde_tpu.evalx.inference import accumulation_error
    from pregen_pde_tpu.evalx.rollout import evaluate_patterns
    from pregen_pde_tpu.training.datasets import TimePairConfig, TimePairDataset

    t_steps = data.shape[1] - 1
    cfg = TimePairConfig(
        max_num_time_steps=t_steps, allowed_transitions=None,
        n_val=max(2, data.shape[0] // 10), n_test=max(2, data.shape[0] // 10),
    )
    train = TimePairDataset(data, cfg, "train")
    test = TimePairDataset(data, cfg, "test", mean=train.mean, std=train.std)
    model = _make_model(model_name, data.shape[2])
    mgr = ocp.CheckpointManager(Path(ckpt_dir).absolute())
    step = mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoint found in {ckpt_dir}")
    _, inp0, _ = test[0]
    template = jax.jit(
        lambda k: model.init(k, jnp.asarray(inp0)[None], jnp.ones((1,)))["params"]
    )(jax.random.key(0))
    params = mgr.restore(step, args=ocp.args.StandardRestore(
        jax.device_get(template)))
    patterns = [
        [int(x) for x in p.strip("[] ").split(",")]
        for p in patterns_str.split(";")
    ]
    patterns = [p for p in patterns if sum(p) <= t_steps]
    res = evaluate_patterns(model.apply, params, test, patterns,
                            batch_size=batch_size)
    acc = accumulation_error(model.apply, params, test,
                             max_steps=min(7, t_steps),
                             batch_size=batch_size)
    return {"patterns": res, "accumulation": acc}


def _cmd_evaluate(args):
    """Rollout-pattern evaluation (≡ `TestCNO_ALL.py` patterns) + accumulation
    error, from an orbax checkpoint."""
    import numpy as np

    data = np.asarray(_load_data(args.data))
    try:
        res = _evaluate_ckpt(args.ckpt, args.model, data, args.patterns,
                             args.batch_size)
    except FileNotFoundError as e:  # clean CLI error, no traceback
        raise SystemExit(str(e)) from None
    print(json.dumps(res))


def _cmd_sweep_eval(args):
    """Evaluate every run under a sweep directory (≡ `scOT/inference.py`
    eval_sweep `:394-407`, minus the wandb dependency)."""
    import numpy as np

    from pregen_pde_tpu.evalx.sweep import sweep_eval

    data = np.asarray(_load_data(args.data))
    results = sweep_eval(
        args.dir,
        lambda run_dir: _evaluate_ckpt(run_dir, args.model, data,
                                       args.patterns, args.batch_size),
        out_path=args.out,
    )
    print(json.dumps(results))


def _cmd_preflight(args):
    import numpy as np
    from pregen_pde_tpu.utils.preflight import check_contract

    report = check_contract(np.asarray(_load_data(args.data)), args.data)
    print(json.dumps(report))


def _cmd_bench(args):
    import runpy

    runpy.run_path("bench.py", run_name="__main__")


def main(argv=None):
    p = argparse.ArgumentParser(prog="pregen_pde_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("generate")
    g.add_argument("--workload", default="ns_spectral",
                   choices=["ns_spectral", "fpo_regular", "fpo_hole",
                            "fpo_multi_hole", "ldc_regular", "burgers",
                            "heat", "darcy"])
    g.add_argument("--n", type=int, default=128)
    g.add_argument("--out", required=True)
    g.add_argument("--prefix", default="results")
    g.add_argument("--format", default="npy", choices=["npy", "h5"])
    g.add_argument("--storage-dtype", default="float32",
                   choices=["float32", "float16"],
                   help="dataset dtype; float16 halves transfer + shard size")
    g.add_argument("--resume", action="store_true",
                   help="continue an interrupted run: skip trajectories "
                        "already in existing shards, keep numbering (npy)")
    g.add_argument("--resolution", type=int, default=128)
    g.add_argument("--batch-size", type=int, default=128)
    g.add_argument("--seed", type=int, default=0)
    g.add_argument("--fixed-difficulty", action="store_true")
    g.add_argument("--forcing", default="fno",
                   choices=["fno", "kolmogorov", "none"])
    g.add_argument("--time-scale", type=float, default=1.0)
    g.set_defaults(fn=_cmd_generate)

    t = sub.add_parser("train")
    t.add_argument("--model", default="fno")
    t.add_argument("--data", required=True)
    t.add_argument("--epochs", type=int, default=10)
    t.add_argument("--batch-size", type=int, default=16)
    t.add_argument("--lr", type=float, default=5e-5)
    # ≡ reference `TrainCNO_time_L.py:151-163`: one = adjacent single steps,
    # one2all = (0 → t) pairs only, all = every jump size
    t.add_argument("--transitions", default="one",
                   choices=["one", "one2all", "all"])
    t.add_argument("--ckpt", default=None)
    t.set_defaults(fn=_cmd_train)

    m = sub.add_parser("mix-sweep")
    m.add_argument("--model", default="fno")
    m.add_argument("--hard", required=True)
    m.add_argument("--easy", required=True)
    m.add_argument("--alphas", default="0.0,0.25,0.5,0.75,1.0")
    m.add_argument("--total-trajectories", type=int, default=100)
    m.add_argument("--epochs", type=int, default=10)
    m.add_argument("--batch-size", type=int, default=16)
    m.add_argument("--lr", type=float, default=5e-5)
    m.set_defaults(fn=_cmd_mix_sweep)

    e = sub.add_parser("evaluate")
    e.add_argument("--model", default="fno")
    e.add_argument("--data", required=True)
    e.add_argument("--ckpt", required=True)
    e.add_argument("--patterns", default="[7];[2,2,2,1];[1,1,1,1,1,1,1]")
    e.add_argument("--batch-size", type=int, default=16)
    e.set_defaults(fn=_cmd_evaluate)

    se = sub.add_parser("sweep-eval")
    se.add_argument("--dir", required=True, help="directory of run dirs")
    se.add_argument("--model", default="fno")
    se.add_argument("--data", required=True)
    se.add_argument("--patterns", default="[7];[2,2,2,1];[1,1,1,1,1,1,1]")
    se.add_argument("--batch-size", type=int, default=16)
    se.add_argument("--out", default=None, help="JSONL output path")
    se.set_defaults(fn=_cmd_sweep_eval)

    f = sub.add_parser("preflight")
    f.add_argument("--data", required=True)
    f.set_defaults(fn=_cmd_preflight)

    b = sub.add_parser("bench")
    b.set_defaults(fn=_cmd_bench)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
