"""CLI — one entry point per workflow (replacing the reference's scattered
script entry points: `TrainCNO_time_L.py`, `python -m scOT.train`,
`scOT/mixingexp.py`, `scripts/train.py`, `dataset_gen/*/main.py`):

    python -m pregen_pde_tpu generate   --workload ns_spectral --n 256 --out dir/
    python -m pregen_pde_tpu generate   --workload fpo_hole    --n 128 --out dir/
    python -m pregen_pde_tpu train      --model fno --data dir/results_batch_0.npy
    python -m pregen_pde_tpu train      --model scot-B --dataset eul_kh --data-dir d/
    python -m pregen_pde_tpu mix-sweep  --hard hard.npy --easy easy.npy --alphas 0,0.25,1
    python -m pregen_pde_tpu evaluate   --model fno --ckpt ckpt/ --data d.npy
    python -m pregen_pde_tpu evaluate   --model scot-B --dataset eul_kh.out \
                                        --data-dir d/ --ckpt ckpt/ --ar-steps 2
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
    if args.resume:
        if args.format == "npy":
            start_index, n_done = scan_existing_shards(args.out, args.prefix)
            resume_point = start_index
        else:  # h5: one growable dataset, batch-flushed — resume by row count
            from pregen_pde_tpu.datagen.writer import scan_existing_h5

            n_done = scan_existing_h5(args.out, args.prefix)
            resume_point = n_done
        if n_done >= args.n:
            print(json.dumps({"generated": 0, "already_done": n_done,
                              "out": args.out}), flush=True)
            return
        # fold the resume point into the key: the continuation draws fresh
        # trajectories rather than replaying the crashed batch's stream
        key = jax.random.fold_in(key, resume_point)
        args.n -= n_done
    writer = ShardWriter(args.out, prefix=args.prefix, fmt=args.format,
                         dtype=args.storage_dtype, start_index=start_index,
                         resume=args.resume)
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
        print(json.dumps({"generated": args.n, "out": args.out}), flush=True)
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
                viscosity=args.viscosity,
            ),
            batch_size=args.batch_size,
            vary_difficulty=not args.fixed_difficulty,
            storage_dtype=args.storage_dtype,
            method=args.method,
            time_scale=args.time_scale,
            max_steps_per_program=args.max_steps_per_program,
        )
        # shard the batch axis over every local device (pod-scale path:
        # BASELINE.md "10k trajectories shard_mapped over v5e-8"); buckets
        # not divisible by the data axis fall back to single-device inside
        # `generate_ns_batch.place`
        mesh = None
        if len(jax.devices()) > 1:
            from pregen_pde_tpu.parallel.meshes import make_mesh

            mesh = make_mesh()
        generate_ns_dataset(key, gen, args.n, writer=writer, mesh=mesh)
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
    print(json.dumps({"generated": args.n, "out": args.out}), flush=True)


def _make_model(name, in_size, in_channels=7, out_channels=3):
    """Model from dataset-derived dims (≡ `scOT/train.py:329-357` /
    `TrainCNO_time_L.py:127-195`: in/out channels and image size come from
    the dataset, never hardcoded)."""
    if name == "fno":
        from pregen_pde_tpu.models.fno import FNO2d

        return FNO2d(out_channels=out_channels)
    if name == "ffno":
        from pregen_pde_tpu.models.ffno import FFNO2d

        return FFNO2d(out_channels=out_channels)
    if name == "cno":
        from pregen_pde_tpu.models.cno import CNO

        return CNO(in_size=in_size, out_dim=out_channels,
                   expand_input=bool(in_size % 8))
    if name.startswith("scot"):
        from pregen_pde_tpu.models.scot import MODEL_SIZES, ScOT, ScOTConfig

        size = name.split("-")[1].upper() if "-" in name else "T"
        return ScOT(ScOTConfig(image_size=in_size, num_channels=in_channels,
                               num_out_channels=out_channels,
                               **MODEL_SIZES[size]))
    raise SystemExit(f"unknown model {name}")


def _load_data(path):
    import numpy as np

    return np.load(path, mmap_mode="r")


def _model_dims(ds):
    """(in_size, in_channels, out_channels) read off one dataset sample —
    the reference derives model dims from the dataset the same way
    (`scOT/train.py:329-357`, `TrainCNO_time_L.py:127-145`)."""
    item = ds[0]
    _, inp, lab = item[0], item[1], item[2]
    return inp.shape[0], inp.shape[-1], lab.shape[-1]


def _split_name_path(data):
    """`--data <name>:<path>` grammar: a benchmark dataset name (either
    reference grammar) prefixed to the file/dir path. Plain paths (including
    Windows-free POSIX paths with no ':') pass through."""
    import os

    if data and ":" in data and not os.path.exists(data):
        name, path = data.split(":", 1)
        return name, path
    return None, data


def _open_benchmark_split(names, data_dir, which, num_trajectories=None,
                          transitions=None):
    """Benchmark dataset(s) by name (comma list = multi-dataset pretraining
    mix, ≡ `CNO_timeModule_CIN.py:1076-1123` eul_ns_mix1)."""
    from pregen_pde_tpu.training.benchmark_datasets import get_dataset
    from pregen_pde_tpu.training.datasets import make_pretraining_mix

    kw = {}
    if transitions is not None:
        kw["transitions"] = transitions
    if which == "train" and num_trajectories is not None:
        kw["num_trajectories"] = num_trajectories
    try:
        parts = [get_dataset(n.strip(), data_dir, which, **kw)
                 for n in names.split(",")]
    except (KeyError, FileNotFoundError, ValueError) as e:
        raise SystemExit(str(e)) from None
    if len(parts) == 1:
        return parts[0]
    return make_pretraining_mix(parts)


def _resolve_train_data(args, which_val="val"):
    """(train_ds, val_ds) from either `--dataset <names> --data-dir <dir>`,
    `--data <name>:<path>`, or a contract-npy `--data` path (legacy).
    Benchmark names resolve through `get_dataset`/`NAME_ALIASES`
    (≡ `scOT/train.py:219`, `TrainCNO_time_L.py:127-145`)."""
    name, path = (args.dataset, args.data_dir) if args.dataset else \
        _split_name_path(args.data)
    if name is not None:
        if path is None:
            raise SystemExit("--dataset requires --data-dir")
        ntr = getattr(args, "num_trajectories", None)
        tr = getattr(args, "transitions", None)
        train = _open_benchmark_split(name, path, "train",
                                      num_trajectories=ntr, transitions=tr)
        val = _open_benchmark_split(name, path, which_val, transitions=tr)
        return train, val
    return None, None


def _trainer_cfg(args, ckpt=None, lr_tiers=None):
    from pregen_pde_tpu.training.trainer import TrainerConfig

    return TrainerConfig(
        learning_rate=args.lr, epochs=args.epochs, batch_size=args.batch_size,
        ckpt_dir=ckpt,
        warmup_frac=getattr(args, "warmup", 0.0) or 0.0,
        compute_dtype=getattr(args, "compute_dtype", None),
        zero_stage=getattr(args, "zero_stage", None),
        remat=bool(getattr(args, "remat", False)),
        lr_tiers=lr_tiers,
    )


def _build_trainer(args, model, ckpt=None, **trainer_kw):
    """Trainer with the main-path multi-tier LR groups when requested
    (≡ `scOT/trainer.py:77-227` learning_rate_embedding_recovery /
    learning_rate_time_embedding — an scOT-only surface in the reference;
    CNO's tiered LRs exist only in its FT regime → `finetune`)."""
    from pregen_pde_tpu.training.trainer import Trainer

    lr_emb = getattr(args, "lr_embedding", None)
    lr_time = getattr(args, "lr_time_embedding", None)
    lr_tiers = None
    if lr_emb is not None or lr_time is not None:
        if not args.model.startswith("scot"):
            raise SystemExit(
                "--lr-embedding/--lr-time-embedding mirror the scOT "
                "main-path param groups (scOT/trainer.py:77-227); for CNO "
                "use `finetune` (its reference tiers are FT-only, "
                "CNO_timeModule_CIN.py:983-994)")
        from pregen_pde_tpu.training.tiers import (
            SCOT_TIER_DECAY,
            scot_main_tier_fn,
            scot_main_tiers,
        )

        lr_tiers = scot_main_tiers(args.lr, lr_emb, lr_time)
        trainer_kw.setdefault("tier_fn", scot_main_tier_fn)
        trainer_kw.setdefault("tier_decay", SCOT_TIER_DECAY)
    return Trainer(model, _trainer_cfg(args, ckpt=ckpt, lr_tiers=lr_tiers),
                   **trainer_kw)


def _restore_params(ckpt_dir, model, sample_input, sample_time=None):
    """Restore params from the newest orbax checkpoint using a jitted-init
    template (shapes/dtypes for StandardRestore)."""
    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp
    from pathlib import Path

    mgr = ocp.CheckpointManager(Path(ckpt_dir).absolute())
    step = mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoint found in {ckpt_dir}")
    t = sample_time if sample_time is not None else jnp.ones((1,))
    template = jax.jit(
        lambda k: model.init(k, jnp.asarray(sample_input)[None], t)["params"]
    )(jax.random.key(0))
    return mgr.restore(step, args=ocp.args.StandardRestore(
        jax.device_get(template)))


def _parse_ar_steps(spec: str, t_steps: int):
    """`set_ar_steps` grammar (≡ `scOT/trainer.py:229-316`): an int n →
    n homogeneous steps over the full horizon; a comma list → heterogeneous
    step sizes."""
    from pregen_pde_tpu.training.ar import homogeneous_steps

    if "," in spec:
        return [int(x) for x in spec.split(",")]
    return homogeneous_steps(t_steps, int(spec))


def _maybe_resume(args, trainer, loader):
    """`--resume`: restore the newest orbax checkpoint from --ckpt before
    training continues (≡ --resume_training / resume_from_checkpoint,
    `scOT/train.py:184,566`; params-only, epochs restart — the reference's
    load-best semantics)."""
    if not getattr(args, "resume", False):
        return
    if not args.ckpt:
        raise SystemExit("--resume requires --ckpt")
    trainer.init_state(next(iter(loader)), steps_per_epoch=len(loader))
    step = trainer.restore_latest()
    print(json.dumps({"resumed_from": args.ckpt, "ckpt_step": step}),
          flush=True)


def _cmd_train(args):
    import numpy as np
    from pregen_pde_tpu.training.datasets import (
        BatchLoader,
        TimePairConfig,
        TimePairDataset,
    )
    from pregen_pde_tpu.training.native_loader import make_batch_loader
    from pregen_pde_tpu.training.trainer import Trainer, TrainerConfig

    if args.data is None and args.dataset is None:
        raise SystemExit("train needs --data or --dataset/--data-dir")
    train_ds, val_ds = _resolve_train_data(args)
    if train_ds is not None:
        # benchmark-dataset training (≡ the reference's primary workflow:
        # `scOT/train.py:219` get_dataset + model dims from the dataset
        # `:329-357`; `TrainCNO_time_L.py:127-195` registry lookup)
        if args.ar_steps is not None:
            raise SystemExit(
                "--ar-steps training runs on the contract npy (--data); "
                "AR evaluation on benchmark datasets: `evaluate`")
        model = _make_model(args.model, *_model_dims(train_ds))
        trainer = _build_trainer(args, model, ckpt=args.ckpt)
        loader = make_batch_loader(train_ds, args.batch_size, seed=0)
        _maybe_resume(args, trainer, loader)
        result = trainer.fit(
            loader,
            val_loaders={"val": BatchLoader(val_ds, args.batch_size,
                                            shuffle=False)},
            log_fn=lambda rec: print(json.dumps(rec), flush=True),
        )
        print(json.dumps({"best_mean_val_rel_%": result["best_metric"]}),
              flush=True)
        return

    data = np.asarray(_load_data(args.data))
    t_steps = data.shape[1] - 1

    if args.ar_steps is not None:
        # AR-rollout training (≡ scOT set_ar_steps / the baselines' unroll):
        # trajectory batches {seed frame, label sequence}, loss averaged over
        # rollout steps, prediction fed back (teacher forcing optional)
        from pregen_pde_tpu.training.ar import TrajectoryBatcher, make_ar_loss

        steps = _parse_ar_steps(args.ar_steps, t_steps)
        if sum(steps) > t_steps:
            raise SystemExit(
                f"--ar-steps {args.ar_steps} covers {sum(steps)} steps but the "
                f"data has only {t_steps}")
        mean = data[..., :3].mean((0, 1, 2, 3))
        std = data[..., :3].std((0, 1, 2, 3)) + 1e-8
        model = _make_model(args.model, data.shape[2])
        batcher = TrajectoryBatcher(data, steps=steps, mean=mean, std=std)
        loss_fn = make_ar_loss(model.apply, steps,
                               teacher_forcing=args.teacher_forcing,
                               final_label_only=args.ar_final_label_only)
        n = data.shape[0]
        bs = min(args.batch_size, n)

        class ARLoader:
            def __len__(self):
                return max(n // bs, 1)

            def __iter__(self):
                for s in range(len(self)):
                    yield batcher.make_batch(
                        np.arange(s * bs, min((s + 1) * bs, n)))

        trainer = _build_trainer(args, model, ckpt=args.ckpt,
                                 full_loss_fn=loss_fn)
        result = trainer.fit(
            ARLoader(),
            log_fn=lambda rec: print(json.dumps(rec), flush=True),
        )
        print(json.dumps({"final_train_loss":
                          result["history"][-1]["train_loss"]}), flush=True)
        return
    # transition grammar ≡ `TrainCNO_time_L.py:151-163`
    allowed = {
        "one": [1],
        "one2all": None,  # (0 → t) pairs (TimePairConfig's None semantics)
        "all": list(range(1, t_steps + 1)),
    }[args.transitions or "one"]
    cfg = TimePairConfig(
        max_num_time_steps=t_steps,
        allowed_transitions=allowed,
        n_val=max(2, data.shape[0] // 10),
        n_test=max(2, data.shape[0] // 10),
    )
    train = TimePairDataset(data, cfg, "train")
    val = TimePairDataset(data, cfg, "val", mean=train.mean, std=train.std)
    model = _make_model(args.model, data.shape[2],
                        in_channels=train.in_channels,
                        out_channels=train.out_channels)
    trainer = _build_trainer(args, model, ckpt=args.ckpt)
    if args.device_resident:
        # device-resident training: the whole corpus lives in HBM, one
        # jitted scan program per epoch, on-device best-params tracking
        # (per-epoch host traffic = int32 index triples)
        if args.zero_stage is not None:
            raise SystemExit("--device-resident supports plain DP only "
                             "(fit_resident); drop --zero-stage")
        if args.resume:
            raise SystemExit("--device-resident starts fresh; checkpoint "
                             "resume runs on the streaming-loader path")
        from pregen_pde_tpu.training.device_data import (
            DeviceDataStore,
            fit_resident,
        )

        store = DeviceDataStore({"d": data})
        result = fit_resident(
            trainer, store, store.triples("d", "train", cfg),
            train.mean, train.std,
            val_triples={"val": store.triples("d", "val", cfg)},
            out_channels=train.out_channels,
            log_fn=lambda rec: print(json.dumps(rec), flush=True),
        )
        trainer.restore_best()
        if args.ckpt:
            trainer._save_ckpt(len(result["history"]))
        print(json.dumps({"best_mean_val_rel_%": result["best_metric"]}),
              flush=True)
        return
    loader = make_batch_loader(train, args.batch_size, seed=0)
    _maybe_resume(args, trainer, loader)
    result = trainer.fit(
        loader,
        val_loaders={"val": BatchLoader(val, args.batch_size, shuffle=False)},
        log_fn=lambda rec: print(json.dumps(rec), flush=True),
    )
    print(json.dumps({"best_mean_val_rel_%": result["best_metric"]}), flush=True)


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
        print(json.dumps({"alpha": alpha, **results[alpha]}), flush=True)
    print(json.dumps(results), flush=True)


def _evaluate_ckpt(ckpt_dir, model_name, data, patterns_str, batch_size,
                   label_description=None):
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
                            batch_size=batch_size,
                            label_description=label_description)
    acc = accumulation_error(model.apply, params, test,
                             max_steps=min(7, t_steps),
                             batch_size=batch_size)
    return {"patterns": res, "accumulation": acc}


def _direct_eval(model, params, dataset, batch_size, label_description=None):
    """Direct (t1→t2 pair) test metrics on any time-pair-style dataset —
    ≡ the reference's primary post-train test, `trainer.predict` relative-L1
    stats (`scOT/train.py:581-640`); ``label_description`` adds the
    per-channel-group breakdown (`:439-555` per channel_slice_list),
    streamed: only (B, groups) scalars leave the device per batch.
    Rank-aware under multi-process execution (≡ the reference's
    DistributedSampler + gather eval, `scOT/train.py:573-696`): each rank
    evaluates its strided shard, per-sample errors are allgathered, every
    rank reports identical global metrics."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pregen_pde_tpu.parallel import multihost
    from pregen_pde_tpu.training.datasets import BatchLoader, Subset
    from pregen_pde_tpu.training.metrics import summarize_rel_errors

    n_total = len(dataset)
    if jax.process_count() > 1:
        dataset = Subset(dataset, multihost.shard_indices(n_total))

    names, slices = [], []
    if label_description:
        from pregen_pde_tpu.training.metrics import parse_label_description

        names, slices = parse_label_description(label_description)

    @jax.jit
    def step(inp, time, lab):
        pred = model.apply({"params": params}, inp, time).astype(jnp.float32)

        def rel(pr, lb):
            axes = tuple(range(1, pr.ndim))
            return (jnp.abs(pr - lb).sum(axes)
                    / (jnp.abs(lb).sum(axes) + 1e-10) * 100.0)

        cols = [rel(pred, lab)] + [
            rel(pred[..., sl], lab[..., sl]) for sl in slices
        ]
        return jnp.stack(cols, axis=-1)

    rel = []
    for batch in BatchLoader(dataset, batch_size, shuffle=False,
                             drop_last=False):
        rel.append(np.asarray(step(jnp.asarray(batch["input"]),
                                   jnp.asarray(batch["time"]),
                                   jnp.asarray(batch["label"]))))
    rel = multihost.allgather_samplewise(np.concatenate(rel), n_total)
    # rel: (N, 1 + n_groups), full test set on every rank
    if not names:
        return summarize_rel_errors(rel[:, 0])
    out = {"all": summarize_rel_errors(rel[:, 0])}
    for i, name in enumerate(names):
        out[name] = summarize_rel_errors(rel[:, i + 1])
    return out


def _cmd_evaluate(args):
    """Rollout-pattern evaluation (≡ `TestCNO_ALL.py` patterns) + accumulation
    error, from an orbax checkpoint. With --dataset/--data-dir (or
    `--data <name>:<path>`), evaluates the benchmark dataset's test split
    directly (≡ `scOT/train.py:581-640` trainer.predict; use the `.out`
    name modifier for the out-of-distribution horizon)."""
    import numpy as np

    if args.data is None and args.dataset is None:
        raise SystemExit("evaluate needs --data or --dataset/--data-dir")
    name, path = (args.dataset, args.data_dir) if args.dataset else \
        _split_name_path(args.data)
    if name is not None:
        if path is None:
            raise SystemExit("--dataset requires --data-dir")
        test = _open_benchmark_split(name, path, "test")
        model = _make_model(args.model, *_model_dims(test))
        _, inp0, _ = test[0][:3]
        t0 = np.asarray([test[0][0]], np.float32)
        try:
            params = _restore_params(args.ckpt, model, inp0, sample_time=t0)
        except FileNotFoundError as e:
            raise SystemExit(str(e)) from None
        res = {"direct": _direct_eval(model, params, test, args.batch_size,
                                      label_description=args.label_description)}
        if args.ar_steps is not None:
            # AR rollout test (≡ scOT/train.py:666-695 set_ar_steps(k)):
            # roll each test pair's horizon in k homogeneous sub-steps (or a
            # comma list of fractions), feed predictions back, score the end
            from pregen_pde_tpu.evalx.inference import ar_eval

            steps = ([int(v) for v in args.ar_steps.split(",")]
                     if "," in args.ar_steps else int(args.ar_steps))
            res[f"ar_{args.ar_steps}"] = ar_eval(
                model.apply, params, test, steps, args.batch_size)
        print(json.dumps(res), flush=True)
        return
    data = np.asarray(_load_data(args.data))
    try:
        res = _evaluate_ckpt(args.ckpt, args.model, data, args.patterns,
                             args.batch_size,
                             label_description=args.label_description)
    except FileNotFoundError as e:  # clean CLI error, no traceback
        raise SystemExit(str(e)) from None
    print(json.dumps(res), flush=True)


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
    print(json.dumps(results), flush=True)



def _cmd_import_ckpt(args):
    """Migrate a TRAINED reference torch checkpoint into an orbax checkpoint
    this framework's `evaluate` / `finetune` commands can restore
    (`pregen_pde_tpu.compat`; mappings pinned by the cross-implementation
    oracle tests)."""
    from pathlib import Path

    import numpy as np

    try:
        import torch
    except ImportError:  # torch is only needed to READ the .pt container
        raise SystemExit("importing a torch checkpoint requires torch")

    raw = torch.load(args.torch_ckpt, map_location="cpu", weights_only=True)
    if isinstance(raw, dict) and "state_dict" in raw:  # Lightning container
        raw = raw["state_dict"]
    sd = {}
    for k, v in raw.items():
        if not hasattr(v, "numpy"):
            continue
        # Lightning prefixes ("model."), DDP prefixes ("module.")
        for pre in ("model.", "module."):
            if k.startswith(pre):
                k = k[len(pre):]
        sd[k] = v.detach().cpu().numpy()

    from pregen_pde_tpu import compat

    if args.model == "fno":
        params = compat.import_fno_state_dict(sd, n_layers=args.n_layers)
    elif args.model == "ffno":
        params = compat.import_ffno_state_dict(sd, n_layers=args.n_layers)
    elif args.model == "cno":
        params = compat.import_cno_state_dict(
            sd, n_layers=args.n_layers, n_res=args.n_res,
            n_res_neck=args.n_res_neck)
    elif args.model.startswith("scot"):
        from pregen_pde_tpu.models.scot import MODEL_SIZES, ScOTConfig

        size = args.model.split("-")[1].upper() if "-" in args.model else "T"
        cfg = ScOTConfig(image_size=args.in_size, num_channels=args.in_dim,
                         num_out_channels=3, **MODEL_SIZES[size])
        params = compat.import_scot_state_dict(sd, cfg)
    else:
        raise SystemExit(f"unknown model {args.model}")

    import jax
    import orbax.checkpoint as ocp

    mgr = ocp.CheckpointManager(
        Path(args.out).absolute(),
        options=ocp.CheckpointManagerOptions(max_to_keep=1),
    )
    mgr.save(0, args=ocp.args.StandardSave(jax.device_get(params)))
    mgr.wait_until_finished()
    n_leaves = len(jax.tree_util.tree_leaves(params))
    print(json.dumps({"imported": args.torch_ckpt, "model": args.model,
                      "params_leaves": n_leaves, "out": args.out}),
          flush=True)


def _cmd_finetune(args):
    """Foundation-model fine-tuning (≡ `CNO_FineTune.py` + `fine_tune_lift.py`):
    wrap a pretrained checkpoint with 1×1-conv dimension adapters when the
    target task's channel counts differ, train with the reference's 3-tier
    learning rates (base / norm / adapter)."""
    import jax
    import numpy as np
    from pregen_pde_tpu.training.datasets import (
        BatchLoader,
        TimePairConfig,
        TimePairDataset,
    )
    from pregen_pde_tpu.training.finetune import (
        AdapterWrapper,
        DEFAULT_FT_TIERS,
        finetune_tier_fn,
    )
    from pregen_pde_tpu.training.native_loader import make_batch_loader
    from pregen_pde_tpu.training.trainer import Trainer, TrainerConfig

    if args.data is None and args.dataset is None:
        raise SystemExit("finetune needs --data or --dataset/--data-dir")
    train, val = _resolve_train_data(args)
    if train is None:  # contract-npy target task
        data = np.asarray(_load_data(args.data))
        t_steps = data.shape[1] - 1
        cfg = TimePairConfig(
            max_num_time_steps=t_steps, allowed_transitions=[1],
            n_val=max(2, data.shape[0] // 10),
            n_test=max(2, data.shape[0] // 10),
        )
        train = TimePairDataset(data, cfg, "train")
        val = TimePairDataset(data, cfg, "val", mean=train.mean, std=train.std)

    # the pretrained base keeps ITS OWN geometry (--base-in-size); the
    # adapters bridge the target task's channel counts (the reference
    # fine-tunes its FM onto the benchmark datasets this way,
    # `CNO_FineTune.py:127-152` → `load_utils`)
    base = _make_model(args.model, args.base_in_size,
                       in_channels=args.base_in_channels,
                       out_channels=args.base_out_channels)
    # restore the pretrained base on ITS OWN input signature
    base_inp = np.zeros((args.base_in_size, args.base_in_size,
                         args.base_in_channels), np.float32)
    try:
        base_params = _restore_params(args.pretrained, base, base_inp)
    except FileNotFoundError as e:
        raise SystemExit(str(e)) from None

    _, inp0, lab0 = train[0]
    model = AdapterWrapper(base=base, base_in_channels=args.base_in_channels,
                           out_channels=lab0.shape[-1])
    import jax.numpy as jnp

    params = jax.jit(
        lambda k: model.init(k, jnp.asarray(inp0)[None], jnp.ones((1,)))["params"]
    )(jax.random.key(args_seed(args)))
    if "base" in params:
        params = dict(params)
        params["base"] = base_params  # graft the pretrained backbone in

    tcfg = TrainerConfig(
        learning_rate=DEFAULT_FT_TIERS["base"], epochs=args.epochs,
        batch_size=args.batch_size, ckpt_dir=args.ckpt,
        lr_tiers=DEFAULT_FT_TIERS,
    )
    trainer = Trainer(model, tcfg, tier_fn=finetune_tier_fn)
    first = next(iter(make_batch_loader(train, args.batch_size, seed=0)))
    trainer.init_state(first, steps_per_epoch=max(len(train) // args.batch_size, 1))
    trainer.replace_params(params)
    result = trainer.fit(
        make_batch_loader(train, args.batch_size, seed=0),
        val_loaders={"val": BatchLoader(val, args.batch_size, shuffle=False)},
        log_fn=lambda rec: print(json.dumps(rec), flush=True),
    )
    print(json.dumps({"best_mean_val_rel_%": result["best_metric"]}), flush=True)


def args_seed(args):
    return getattr(args, "seed", 0)


def _test_dataset(data, model_name):
    """(model, test TimePairDataset normalized with train stats)."""
    from pregen_pde_tpu.training.datasets import TimePairConfig, TimePairDataset

    t_steps = data.shape[1] - 1
    cfg = TimePairConfig(
        max_num_time_steps=t_steps, allowed_transitions=None,
        n_val=max(2, data.shape[0] // 10), n_test=max(2, data.shape[0] // 10),
    )
    train = TimePairDataset(data, cfg, "train")
    test = TimePairDataset(data, cfg, "test", mean=train.mean, std=train.std)
    return _make_model(model_name, data.shape[2]), test


def _test_dataset_from_args(args):
    """(model, test dataset) from --dataset/--data-dir, `--data name:path`,
    or a contract npy --data (shared by save-samples / resolutions)."""
    import numpy as np

    if args.data is None and getattr(args, "dataset", None) is None:
        raise SystemExit("need --data or --dataset/--data-dir")
    name, path = (args.dataset, args.data_dir) if getattr(
        args, "dataset", None) else _split_name_path(args.data)
    if name is not None:
        if path is None:
            raise SystemExit("--dataset requires --data-dir")
        test = _open_benchmark_split(name, path, "test")
        return _make_model(args.model, *_model_dims(test)), test
    data = np.asarray(_load_data(args.data))
    return _test_dataset(data, args.model)


def _cmd_save_samples(args):
    """Dump (input, prediction, label) samples to NPZ (≡ `scOT/inference.py`
    save_samples) and optionally render a prediction grid PNG."""
    from pregen_pde_tpu.evalx.inference import save_samples

    model, test = _test_dataset_from_args(args)
    _, inp0, _ = test[0]
    try:
        params = _restore_params(args.ckpt, model, inp0)
    except FileNotFoundError as e:
        raise SystemExit(str(e)) from None
    path = save_samples(model.apply, params, test, args.out,
                        n_samples=args.n_samples)
    out = {"samples": path}
    if args.plot:
        from pregen_pde_tpu.evalx.plots import plot_from_samples

        out["plot"] = plot_from_samples(path, args.plot)
    print(json.dumps(out), flush=True)


def _cmd_resolutions(args):
    """Resolution-transfer evaluation (≡ `scOT/inference.py`
    eval_resolutions): FFT-resample inputs to each resolution, predict,
    FFT-resample back, measure error."""
    from pregen_pde_tpu.evalx.inference import resolution_eval

    model, test = _test_dataset_from_args(args)
    _, inp0, _ = test[0]
    try:
        params = _restore_params(args.ckpt, model, inp0)
    except FileNotFoundError as e:
        raise SystemExit(str(e)) from None
    res = resolution_eval(
        model.apply, params, test,
        resolutions=[int(r) for r in args.resolutions.split(",")],
        batch_size=args.batch_size,
    )
    print(json.dumps(res), flush=True)


def _cmd_preflight(args):
    import numpy as np
    from pregen_pde_tpu.utils.preflight import check_contract

    report = check_contract(np.asarray(_load_data(args.data)), args.data)
    print(json.dumps(report), flush=True)


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
    g.add_argument("--viscosity", type=float, default=1e-4,
                   help="ns_spectral viscosity with --fixed-difficulty "
                        "(physics difficulty: lower nu = harder)")
    g.add_argument("--forcing", default="fno",
                   choices=["fno", "kolmogorov", "none"])
    g.add_argument("--time-scale", type=float, default=5e-4,
                   help="multiplies the Re->horizon difficulty schedule. The "
                        "default 5e-4 reproduces the reference's actual "
                        "5,500-13,500-step workload (its 1100-2700 OpenFOAM "
                        "seconds at its dt); 1.0 = horizons literally in "
                        "solver time units (1M-27M steps/trajectory — needs "
                        "--max-steps-per-program through the dev tunnel, "
                        "whose worker kills single programs running longer "
                        "than ~1 min)")
    g.add_argument("--max-steps-per-program", type=int, default=None,
                   help="ns_spectral Pallas path: bound each device "
                        "program to this many solver steps (the integrator "
                        "state rounds through HBM between programs; "
                        "bit-identical trajectories). Set e.g. 200000 for "
                        "huge horizons (--time-scale 1.0) — the dev "
                        "tunnel's worker kills single programs running "
                        "longer than ~1 min")
    g.add_argument("--method", default="auto",
                   choices=["auto", "cn_ab2_pallas", "cn_ab2_pallas_high",
                            "cn_ab2_pallas_exact", "cn_ab2_packed",
                            "cn_heun_packed"],
                   help="ns_spectral stepper: auto = fused Pallas CN+AB2 "
                        "kernel on TPU (~10x; 'high' = rtol-1e-6-grade "
                        "3-pass matmuls, 'exact' = f32-exact), XLA-FFT "
                        "packed steppers otherwise")
    g.set_defaults(fn=_cmd_generate)

    t = sub.add_parser("train")
    t.add_argument("--model", default="fno")
    t.add_argument("--data", default=None,
                   help="contract .npy path, or '<name>:<path>' for a "
                        "benchmark dataset (either reference name grammar)")
    t.add_argument("--dataset", default=None,
                   help="benchmark dataset name(s) (≡ scOT/train.py:219 "
                        "get_dataset; both reference grammars via "
                        "NAME_ALIASES); comma list = multi-dataset "
                        "pretraining mix (≡ eul_ns_mix1, "
                        "CNO_timeModule_CIN.py:1076-1123)")
    t.add_argument("--data-dir", default=None,
                   help="directory holding the benchmark container files")
    t.add_argument("--num-trajectories", type=int, default=None,
                   help="train trajectories; -1/-2/-8 = all/half/eighth "
                        "(scOT/problems/base.py:242-247)")
    t.add_argument("--epochs", type=int, default=10)
    t.add_argument("--batch-size", type=int, default=16)
    t.add_argument("--lr", type=float, default=5e-5)
    t.add_argument("--warmup", type=float, default=0.0,
                   help="LR warmup fraction of total steps "
                        "(≡ TrainingArguments warmup_ratio, scOT main path)")
    t.add_argument("--lr-embedding", type=float, default=None,
                   help="embedding/patch-recovery LR group (scOT only; "
                        "≡ learning_rate_embedding_recovery, "
                        "scOT/trainer.py:82-122)")
    t.add_argument("--lr-time-embedding", type=float, default=None,
                   help="conditional-norm time-embedding LR group (scOT "
                        "only; ≡ learning_rate_time_embedding)")
    # ≡ reference `TrainCNO_time_L.py:151-163`: one = adjacent single steps,
    # one2all = (0 → t) pairs only, all = every jump size; default: "one"
    # for contract npy, the loader's own default for benchmark datasets
    t.add_argument("--transitions", default=None,
                   choices=["one", "one2all", "all"])
    t.add_argument("--ckpt", default=None)
    t.add_argument("--resume", action="store_true",
                   help="restore the newest checkpoint in --ckpt before "
                        "training (≡ --resume_training, scOT/train.py:184)")
    t.add_argument("--ar-steps", default=None,
                   help="AR-rollout training (≡ scOT set_ar_steps): int n = "
                        "n homogeneous steps, comma list = heterogeneous")
    t.add_argument("--teacher-forcing", action="store_true",
                   help="feed ground truth back in AR training (baselines' "
                        "unroll) instead of the detached prediction")
    t.add_argument("--ar-final-label-only", action="store_true",
                   help="penalize every rollout step toward the final label "
                        "(scOT trainer._model_forward's exact semantics: "
                        "labels never updated in the loop) instead of "
                        "per-step ground truth")
    t.add_argument("--compute-dtype", default=None,
                   choices=["bfloat16", "float32"],
                   help="mixed precision: bf16 compute, f32 master weights")
    t.add_argument("--zero-stage", type=int, default=None, choices=[1, 3],
                   help="FSDP/ZeRO: 1 = shard optimizer state, 3 = shard "
                        "params + optimizer state over the data axis")
    t.add_argument("--remat", action="store_true",
                   help="rematerialize forward in backward (saves HBM)")
    t.add_argument("--device-resident", action="store_true",
                   help="upload the whole contract tensor to HBM once and "
                        "train with one jitted lax.scan program per epoch "
                        "(training/device_data.py) — removes the host input "
                        "pipeline entirely for corpora that fit HBM; plain "
                        "DP only (contract --data path, not --dataset)")
    t.set_defaults(fn=_cmd_train)

    ic = sub.add_parser("import-ckpt", help="migrate a reference torch "
                        "checkpoint (state_dict .pt) into an orbax ckpt")
    ic.add_argument("--model", required=True,
                    help="fno | ffno | cno | scot-T/S/B/L")
    ic.add_argument("--torch-ckpt", required=True)
    ic.add_argument("--out", required=True)
    ic.add_argument("--n-layers", type=int, default=4)
    ic.add_argument("--n-res", type=int, default=1)
    ic.add_argument("--n-res-neck", type=int, default=6)
    ic.add_argument("--in-size", type=int, default=128)
    ic.add_argument("--in-dim", type=int, default=7)
    ic.set_defaults(fn=_cmd_import_ckpt)

    ft = sub.add_parser("finetune")
    ft.add_argument("--model", default="cno",
                    help="base (pretrained) model family")
    ft.add_argument("--pretrained", required=True,
                    help="orbax checkpoint dir of the pretrained base")
    ft.add_argument("--data", default=None,
                    help="contract .npy path or '<benchmark-name>:<path>'")
    ft.add_argument("--dataset", default=None,
                    help="benchmark dataset name(s), comma list = "
                         "pretraining mix (needs --data-dir)")
    ft.add_argument("--data-dir", default=None,
                    help="root directory holding the benchmark files")
    ft.add_argument("--num-trajectories", type=int, default=None,
                    help="cap the train split (reference -1/-2/-8 grammar)")
    ft.add_argument("--base-in-channels", type=int, default=7,
                    help="input channels the pretrained base expects")
    ft.add_argument("--base-in-size", type=int, default=128,
                    help="grid size the pretrained base was built for")
    ft.add_argument("--base-out-channels", type=int, default=3,
                    help="output channels the pretrained base produces")
    ft.add_argument("--epochs", type=int, default=10)
    ft.add_argument("--batch-size", type=int, default=16)
    ft.add_argument("--ckpt", default=None)
    ft.add_argument("--seed", type=int, default=0)
    ft.set_defaults(fn=_cmd_finetune)

    ss = sub.add_parser("save-samples")
    ss.add_argument("--model", default="fno")
    ss.add_argument("--data", default=None)
    ss.add_argument("--dataset", default=None,
                    help="benchmark dataset name (test split)")
    ss.add_argument("--data-dir", default=None)
    ss.add_argument("--ckpt", required=True)
    ss.add_argument("--out", required=True, help="output .npz path")
    ss.add_argument("--n-samples", type=int, default=8)
    ss.add_argument("--plot", default=None,
                    help="also render a prediction-grid PNG to this path")
    ss.set_defaults(fn=_cmd_save_samples)

    rz = sub.add_parser("resolutions")
    rz.add_argument("--model", default="fno")
    rz.add_argument("--data", default=None)
    rz.add_argument("--dataset", default=None,
                    help="benchmark dataset name (test split)")
    rz.add_argument("--data-dir", default=None)
    rz.add_argument("--ckpt", required=True)
    rz.add_argument("--resolutions", default="64,128,256")
    rz.add_argument("--batch-size", type=int, default=16)
    rz.set_defaults(fn=_cmd_resolutions)

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
    e.add_argument("--data", default=None,
                   help="contract .npy path, or '<name>:<path>' for a "
                        "benchmark dataset test split")
    e.add_argument("--dataset", default=None,
                   help="benchmark dataset name (supports the .out "
                        "out-of-distribution horizon modifier)")
    e.add_argument("--data-dir", default=None)
    e.add_argument("--ckpt", required=True)
    e.add_argument("--patterns", default="[7];[2,2,2,1];[1,1,1,1,1,1,1]")
    e.add_argument("--ar-steps", default=None,
                   help="benchmark-dataset AR rollout test (≡ scOT "
                        "set_ar_steps): int k = k homogeneous sub-steps per "
                        "test pair, comma list = heterogeneous fractions")
    e.add_argument("--label-description", default=None,
                   help="per-variable-group error reporting, reference "
                        "grammar: e.g. '[Ux,Uy],[p]' (scOT "
                        "channel_slice_list / CNO separate_dim)")
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
    # persistent XLA/Mosaic compilation cache: the 896²/1024² Pallas kernels
    # cost ~5 min of Mosaic compile per shape — pay it once per machine, not
    # per process (PERF.md compile-time table)
    from pregen_pde_tpu.utils.compcache import enable_persistent_cache
    from pregen_pde_tpu.utils.misc import use_best_backend

    # tolerate the tunnel's shifting PJRT platform name ("axon"/"tpu" across
    # server-side updates); respects an explicit cpu pin (tests)
    use_best_backend()
    enable_persistent_cache()
    args.fn(args)


if __name__ == "__main__":
    main()
