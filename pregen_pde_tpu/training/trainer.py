"""One training harness for every model family.

Replaces the reference's three stacks — Lightning (`TrainCNO_time_L.py`),
customized HF Trainer (`scOT/trainer.py`), hand-rolled loop
(`scripts/train.py`) — with a single functional JAX loop:

- AdamW + cosine (or constant) schedule + global-norm clipping, with
  multi-tier learning rates via optax parameter partitioning (≡ the reference
  FT param groups, `CNO_timeModule_CIN.py:983-994`, `scOT/trainer.py:77-227`);
- data parallelism = batch-axis NamedSharding over the mesh `data` axis;
  gradient all-reduce is inserted by XLA (≡ DDP/NCCL);
- median/mean relative-L1 validation tracking with best-checkpoint selection
  (≡ ModelCheckpoint(monitor="mean_val_l"), `TrainCNO_time_L.py:204`) and
  early stopping;
- checkpoint/resume via orbax.
"""

from __future__ import annotations

import dataclasses
import time as _time
from functools import partial
from pathlib import Path
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state

from pregen_pde_tpu.parallel.meshes import batch_sharding, make_mesh, replicated
from pregen_pde_tpu.training.losses import relative_lp_loss
from pregen_pde_tpu.training.metrics import summarize_rel_errors


@dataclasses.dataclass(frozen=True)
class TrainerConfig:
    learning_rate: float = 5e-5
    weight_decay: float = 1e-10
    epochs: int = 10
    batch_size: int = 16
    schedule: str = "cosine"  # "cosine" | "constant" | "step"
    warmup_frac: float = 0.0
    grad_clip: float = 5.0  # scOT's max_grad_norm (`configs/mixing.yaml`)
    early_stop_patience: int | None = 100  # reference EarlyStopping(patience=100)
    loss_p: int = 1
    seed: int = 0
    ckpt_dir: str | None = None
    # multi-tier learning rates: map from tier name → lr; params are assigned
    # to tiers by `lr_tier_fn(path) -> name` (None → single tier)
    lr_tiers: dict[str, float] | None = None
    # single-tier weight-decay placement: "matrix" decays only ndim≥2 leaves
    # (≡ HF's no-decay split for scOT), "all" decays every param (≡ the
    # reference CNO's ungrouped AdamW, `CNO_timeModule_CIN.py:996`),
    # "none" disables decay
    decay_mask_mode: str = "matrix"
    # mixed precision: compute forward/backward in this dtype while the
    # optimizer keeps float32 master weights (measured 1.65x on CNO/v5e);
    # None → full f32. Loss is always reduced in f32.
    compute_dtype: str | None = None  # e.g. "bfloat16"
    # rematerialize the forward pass in backward (jax.checkpoint) — trades
    # FLOPs for HBM on big scOT configs
    remat: bool = False
    # FSDP/ZeRO over the mesh "data" axis (beyond-reference; SURVEY §2.6 lists
    # FSDP as absent upstream): 1 = shard optimizer state only (ZeRO-1),
    # 3 = shard params + optimizer state (ZeRO-3/full FSDP). None = replicate
    # (plain DP, ≡ DDP).
    zero_stage: int | None = None
    # bucketed single-kernel AdamW (training/fused_optim.py), bit-identical
    # to optax.adamw. MEASURED at scOT-B on v5e (PERF.md round 4): the
    # bucketing wins in isolation (update alone 35.0 → 25.3 ms) but LOSES
    # inside the jitted train step (46.8 → 60.4 ms/step) — XLA already
    # fuses each leaf's optimizer chain into the backward, while the bucket
    # concat forces every gradient to materialize and serializes a
    # gather→update→scatter mega-chain. Default stays per-leaf optax.
    fused_optimizer: bool = False


class TrainState(train_state.TrainState):
    pass


def _label_params(params, tier_fn: Callable[[tuple], str]):
    def label(path, _leaf):
        # raw key names ("patch_embed", "kernel"), NOT str(DictKey(...))
        # (= "['patch_embed']") — tier functions match path elements exactly
        return tier_fn(tuple(getattr(p, "key", str(p)) for p in path))

    return jax.tree_util.tree_map_with_path(label, params)


def build_optimizer(cfg: TrainerConfig, steps_per_epoch: int,
                    params=None, tier_fn=None, tier_decay=None):
    """``tier_decay`` (optional, used with ``cfg.lr_tiers``): tier name →
    weight-decay semantics for that group, mirroring torch param groups
    (one decay flag per group, `scOT/trainer.py:103-122`): "all" decays
    every member (biases too), "none" decays nothing, "matrix" (default)
    decays only ndim≥2 leaves."""
    total_steps = max(cfg.epochs * steps_per_epoch, 1)

    def make_sched(lr):
        if cfg.schedule == "cosine":
            warmup = int(cfg.warmup_frac * total_steps)
            if warmup > 0:
                return optax.warmup_cosine_decay_schedule(
                    0.0, lr, warmup, total_steps
                )
            return optax.cosine_decay_schedule(lr, total_steps)
        if cfg.schedule == "step":
            return optax.exponential_decay(
                lr, max(total_steps // 3, 1), 0.1, staircase=True
            )
        return optax.constant_schedule(lr)

    # no-decay group ≡ the reference's standard/no-decay param split
    # (`scOT/trainer.py:77-227`: biases + all LayerNorm params excluded from
    # weight decay): decay only matrix-shaped leaves (kernels, spectral
    # weights); vectors/scalars (biases, norm scales, FILM affines) skip it.
    def decay_mask(tree):
        return jax.tree_util.tree_map(
            lambda l: getattr(l, "ndim", 0) >= 2, tree
        )

    def make_tx(lr, decay: str = "matrix"):
        wd = 0.0 if decay == "none" else cfg.weight_decay
        mask = decay_mask if decay == "matrix" else None
        if getattr(cfg, "fused_optimizer", False):
            from pregen_pde_tpu.training.fused_optim import fused_adamw

            return fused_adamw(make_sched(lr), weight_decay=wd, mask=mask)
        return optax.adamw(make_sched(lr), weight_decay=wd, mask=mask)

    if cfg.lr_tiers and tier_fn is not None and params is not None:
        labels = _label_params(params, tier_fn)
        txs = {
            name: make_tx(lr, (tier_decay or {}).get(name, "matrix"))
            for name, lr in cfg.lr_tiers.items()
        }
        inner = optax.multi_transform(txs, labels)
    else:
        inner = make_tx(cfg.learning_rate, cfg.decay_mask_mode)
    # clip OUTSIDE the (possibly tiered) optimizer: the reference clips the
    # GLOBAL gradient norm across all param groups (HF max_grad_norm /
    # Lightning gradient_clip_val), never per-group
    return optax.chain(optax.clip_by_global_norm(cfg.grad_clip), inner)


class Trainer:
    def __init__(
        self,
        model,
        cfg: TrainerConfig,
        mesh=None,
        loss_fn: Callable | None = None,
        tier_fn: Callable | None = None,
        full_loss_fn: Callable | None = None,
        tier_decay: dict[str, str] | None = None,
    ):
        """``loss_fn(pred, label)`` customizes the pointwise loss;
        ``full_loss_fn(params, batch)`` replaces the whole objective (used for
        AR-rollout training via `training.ar.make_ar_loss` — batches then
        carry {"input", "labels", ...} instead of a single "label");
        ``tier_decay`` maps tier name → per-group weight-decay semantics
        (see `build_optimizer`)."""
        self.model = model
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else make_mesh()
        # models with stochastic regularization (scOT drop-path/dropout) take
        # a `train` flag; detect once and plumb a per-step "dropout" rng —
        # eval stays deterministic (train defaults to False)
        import inspect

        try:
            self._model_takes_train = "train" in inspect.signature(
                type(model).__call__
            ).parameters
        except (TypeError, ValueError):
            self._model_takes_train = False
        self.loss_fn = loss_fn or (
            lambda pred, lab: relative_lp_loss(pred, lab, p=cfg.loss_p)
        )
        self.full_loss_fn = full_loss_fn
        self.tier_fn = tier_fn
        self.tier_decay = tier_decay
        self.state: TrainState | None = None
        self.history: list[dict] = []
        self.best_metric = float("inf")
        self.best_params = None
        self._ckpt_mgr = None
        if cfg.ckpt_dir is not None:
            import orbax.checkpoint as ocp

            self._ckpt_mgr = ocp.CheckpointManager(
                Path(cfg.ckpt_dir).absolute(),
                options=ocp.CheckpointManagerOptions(max_to_keep=1),
            )

    # -- setup ---------------------------------------------------------------

    def init_state(self, sample_batch: dict, steps_per_epoch: int) -> TrainState:
        rng = jax.random.key(self.cfg.seed)
        inp = jnp.asarray(sample_batch["input"][:1])
        if "time" in sample_batch:
            t = jnp.asarray(sample_batch["time"][:1])
        else:
            t = jnp.ones((1,), inp.dtype)
        # jit the init: eager flax init dispatches thousands of tiny device
        # programs (minutes through the TPU tunnel); jitted it is one program
        params = jax.jit(
            lambda r, i, tt: self.model.init(r, i, tt)["params"]
        )(rng, inp, t)
        # canonicalize away weak types: a weak-typed param (e.g. from a
        # python-float jnp.full initializer) flips to strong after one
        # optimizer update, changing the train step's input avals and forcing
        # TWO full retraces/recompiles (params, then optimizer state) —
        # minutes per recompile through the TPU tunnel.
        params = jax.tree_util.tree_map(
            lambda l: jax.lax.convert_element_type(l, l.dtype), params
        )
        tx = build_optimizer(self.cfg, steps_per_epoch, params, self.tier_fn,
                             self.tier_decay)
        state = TrainState.create(
            apply_fn=self.model.apply, params=params, tx=tx
        )
        # `step` is a Python int; materialize it as a device array — some
        # backends (the axon TPU tunnel) don't implement device_put of typed
        # host scalars during jit arg sharding
        state = state.replace(step=jnp.zeros((), jnp.int32))
        # place model state over the mesh (replicated for plain DP, sharded
        # under ZeRO); batches get the data axis
        self._state_sh, self._params_sh = self._make_state_sharding(state)
        state = jax.device_put(state, self._state_sh)
        self.state = state
        return state

    def replace_params(self, params) -> TrainState:
        """Swap a new parameter tree into the train state (e.g. pretrained
        weights grafted at the start of fine-tuning), RE-INITIALIZING the
        optimizer state for it. Moments restart at zero — correct for a
        fresh training/fine-tuning run — and the optimizer state's
        dtype/bucket layout follows the NEW tree (required for the fused
        bucketed optimizer, whose state layout is fixed at init; also what
        per-leaf optax semantics want when dtypes change)."""
        params = jax.tree_util.tree_map(
            lambda l: jax.lax.convert_element_type(
                jnp.asarray(l), jnp.asarray(l).dtype), params)
        state = self.state.replace(params=params,
                                   opt_state=self.state.tx.init(params))
        self._state_sh, self._params_sh = self._make_state_sharding(state)
        self.state = jax.device_put(state, self._state_sh)
        return self.state

    def _make_state_sharding(self, state):
        """(state sharding pytree, params sharding pytree) per cfg.zero_stage."""
        if self.cfg.zero_stage is None:
            return replicated(self.mesh), replicated(self.mesh)
        from pregen_pde_tpu.parallel.fsdp import (
            fsdp_sharding,
            replicated_sharding,
        )

        if self.cfg.zero_stage == 3:
            params_sh = fsdp_sharding(state.params, self.mesh)
        elif self.cfg.zero_stage == 1:
            params_sh = replicated_sharding(state.params, self.mesh)
        else:
            raise ValueError(f"zero_stage must be None, 1 or 3, got "
                             f"{self.cfg.zero_stage}")
        state_sh = state.replace(
            step=replicated(self.mesh),
            params=params_sh,
            opt_state=fsdp_sharding(state.opt_state, self.mesh),
        )
        return state_sh, params_sh

    # -- steps ---------------------------------------------------------------

    def _cast_compute(self, tree):
        if self.cfg.compute_dtype is None:
            return tree
        dt = jnp.dtype(self.cfg.compute_dtype)
        return jax.tree_util.tree_map(
            lambda a: a.astype(dt)
            if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating) else a,
            tree,
        )

    def _make_train_step_raw(self):
        """The pure (state, batch) -> (state, loss) step, unjitted — reused by
        the per-step jit below and by the device-resident per-EPOCH scan
        (`training/device_data.py::fit_resident`)."""
        loss_fn = self.loss_fn
        full_loss_fn = self.full_loss_fn
        cast = self._cast_compute
        remat = self.cfg.remat
        takes_train = self._model_takes_train
        dropout_base = jax.random.key(self.cfg.seed + 1)

        def forward(params, inp, time, apply_fn, rng):
            if takes_train:
                return apply_fn({"params": cast(params)}, cast(inp), time,
                                train=True, rngs={"dropout": rng})
            return apply_fn({"params": cast(params)}, cast(inp), time)

        if remat:
            forward = jax.checkpoint(forward, static_argnums=(3,))

        def train_step(state: TrainState, batch: dict):
            step_rng = jax.random.fold_in(dropout_base, state.step)

            def compute(params):
                if full_loss_fn is not None:
                    # compute_dtype applies to the params handed to the custom
                    # objective; remat does NOT wrap custom objectives (wrap
                    # your apply_fn with jax.checkpoint yourself if needed)
                    return full_loss_fn(cast(params), batch)
                pred = forward(params, batch["input"], batch["time"],
                               state.apply_fn, step_rng)
                return loss_fn(pred.astype(jnp.float32), batch["label"])

            loss, grads = jax.value_and_grad(compute)(state.params)
            return state.apply_gradients(grads=grads), loss

        return train_step

    def _make_train_step(self):
        # donate the state: outputs alias inputs in place (halves peak param
        # memory and avoids per-step buffer churn through the TPU tunnel);
        # the fit loop reassigns self.state every step so the donated
        # buffers are never reused
        # under ZeRO, pin the output state to its sharded layout — without
        # the pin XLA may re-replicate the updated params and silently
        # forfeit the memory savings
        out_sh = (
            (self._state_sh, None)
            if self.cfg.zero_stage is not None and hasattr(self, "_state_sh")
            else None
        )
        return partial(jax.jit, donate_argnums=(0,), out_shardings=out_sh)(
            self._make_train_step_raw()
        )

    def _make_eval_step(self):
        p = self.cfg.loss_p

        @jax.jit
        def eval_step(state: TrainState, batch: dict):
            """→ per-sample relative-Lp errors (%), shape (B,). Reducing on
            device keeps evaluate() streaming: only B scalars cross the
            host boundary per batch, never full prediction fields."""
            pred = state.apply_fn(
                {"params": state.params}, batch["input"], batch["time"]
            ).astype(jnp.float32)
            lab = batch["label"].astype(jnp.float32)
            axes = tuple(range(1, pred.ndim))
            num = (jnp.abs(pred - lab) ** p).sum(axes) ** (1.0 / p)
            den = (jnp.abs(lab) ** p).sum(axes) ** (1.0 / p) + 1e-10
            return num / den * 100.0

        return eval_step

    def _shard_batch(self, batch: dict) -> dict:
        n_data = int(self.mesh.shape.get("data", 1))
        n_proc = jax.process_count()
        out = {}
        for k, v in batch.items():
            if n_proc > 1:
                # true multi-process DP (≡ torchrun DDP with a per-rank
                # sampler, `scOT/train.py:123`): each process's loader yields
                # only its LOCAL batch shard; the global array is assembled
                # from per-process local data — no host ever materializes the
                # full batch
                v = np.asarray(v)
                assert (v.shape[0] * n_proc) % n_data == 0, (
                    f"local batch {v.shape[0]} x {n_proc} processes must "
                    f"divide the mesh data axis {n_data}")
                out[k] = jax.make_array_from_process_local_data(
                    batch_sharding(self.mesh, v.ndim), v)
                continue
            v = jnp.asarray(v)
            if v.shape[0] % n_data == 0:
                out[k] = jax.device_put(v, batch_sharding(self.mesh, v.ndim))
            else:  # ragged tail batch: replicate rather than fail
                out[k] = jax.device_put(v, replicated(self.mesh))
        return out

    # -- loops ---------------------------------------------------------------

    def evaluate(self, loader) -> dict:
        # build (and jit) the eval step once — a fresh jit wrapper per call
        # would retrace+recompile on every validation pass
        if not hasattr(self, "_eval_step"):
            self._eval_step = self._make_eval_step()
        eval_step = self._eval_step
        # streamed: only the (B,) per-sample relative errors leave the device
        # per batch — no host concatenation of prediction fields (survives
        # the 10k-trajectory sweeps the CLI advertises)
        rel = []
        for batch in loader:
            sb = self._shard_batch(batch)
            r = eval_step(self.state, sb)
            if jax.process_count() > 1:
                # the (B,) errors are globally sharded; gather so every
                # process reports identical global metrics (≡ Lightning's
                # sync_dist=True, `CNO_timeModule_CIN.py:968`)
                from jax.experimental import multihost_utils

                r = multihost_utils.process_allgather(r, tiled=True)
            rel.append(np.asarray(r))
        return summarize_rel_errors(np.concatenate(rel))

    def fit(self, train_loader, val_loaders: dict[str, Any] | None = None,
            log_fn: Callable[[dict], None] | None = None) -> dict:
        cfg = self.cfg
        if self.state is None:
            first = next(iter(train_loader))
            self.init_state(first, steps_per_epoch=len(train_loader))
        train_step = self._make_train_step()
        patience_left = cfg.early_stop_patience or np.inf

        for epoch in range(cfg.epochs):
            t0 = _time.time()
            losses = []
            for batch in train_loader:
                self.state, loss = train_step(self.state, self._shard_batch(batch))
                losses.append(loss)
            train_loss = float(jnp.mean(jnp.stack(losses))) if losses else np.nan

            rec = {"epoch": epoch, "train_loss": train_loss,
                   "time_s": _time.time() - t0}
            if val_loaders:
                vals = []
                for name, vl in val_loaders.items():
                    s = self.evaluate(vl)
                    rec[f"{name}_median_rel_%"] = s["median_rel_%"]
                    rec[f"{name}_mean_rel_%"] = s["mean_rel_%"]
                    vals.append(s["mean_rel_%"])
                mean_val = float(np.mean(vals))
                rec["mean_val_rel_%"] = mean_val
                if mean_val < self.best_metric:
                    self.best_metric = mean_val
                    self.best_params = jax.device_get(self.state.params)
                    patience_left = cfg.early_stop_patience or np.inf
                    self._save_ckpt(epoch)
                else:
                    patience_left -= 1
            self.history.append(rec)
            if log_fn:
                log_fn(rec)
            if patience_left <= 0:
                break
        return {"best_metric": self.best_metric, "history": self.history}

    # -- checkpointing -------------------------------------------------------

    def _save_ckpt(self, step: int):
        if self._ckpt_mgr is None:
            return
        import orbax.checkpoint as ocp

        self._ckpt_mgr.save(
            step, args=ocp.args.StandardSave(jax.device_get(self.state.params))
        )
        self._ckpt_mgr.wait_until_finished()

    def restore_best(self):
        if self.best_params is not None:
            self.state = self.state.replace(
                params=jax.device_put(
                    self.best_params,
                    getattr(self, "_params_sh", replicated(self.mesh)),
                )
            )
        return self.state

    def restore_latest(self):
        """Resume from the newest orbax checkpoint in cfg.ckpt_dir
        (≡ --resume_training / resume_from_checkpoint, `scOT/train.py:184,566`)."""
        if self._ckpt_mgr is None:
            raise RuntimeError("no ckpt_dir configured")
        import orbax.checkpoint as ocp

        step = self._ckpt_mgr.latest_step()
        if step is None:
            return None
        template = jax.device_get(self.state.params)
        params = self._ckpt_mgr.restore(
            step, args=ocp.args.StandardRestore(template)
        )
        self.state = self.state.replace(
            params=jax.device_put(
                params, getattr(self, "_params_sh", replicated(self.mesh))
            )
        )
        return step
