"""Rank worker for `tests/test_multiprocess.py` — runs the true
multi-process legs (2 processes x 4 virtual CPU devices each):
`jax.distributed.initialize`, cross-process broadcast/psum, a DP train step
through the Trainer with per-process local batches, batch-sharded datagen
with per-process host shard writes, scratch staging, and an orbax
save/restore under multihost. Writes a JSON result per rank.

(Not a test module itself — invoked as `python mp_worker.py <rank> <port>
<outdir>` by the pytest harness.)
"""

import json
import os
import sys

rank = int(sys.argv[1])
port = sys.argv[2]
outdir = sys.argv[3]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ.setdefault("SCRATCH", os.path.join(outdir, f"scratch{rank}"))
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=2, process_id=rank)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

res = {"rank": rank, "n_local": len(jax.local_devices()),
       "n_global": len(jax.devices()),
       "process_count": jax.process_count()}

# --- control-plane broadcast (== accelerate broadcast_object_list) ----------
from pregen_pde_tpu.parallel import multihost  # noqa: E402

res["bcast"] = float(np.asarray(
    multihost.broadcast_from_host0(jnp.asarray([123.0 if rank == 0 else -1.0]))
)[0])
res["is_host0"] = multihost.is_host0()

# --- node-local scratch staging (== move_to_local_scratch) ------------------
src = os.path.join(outdir, "shared_dataset.bin")
if rank == 0:
    os.makedirs(outdir, exist_ok=True)
    with open(src, "wb") as f:
        f.write(b"x" * 128)
multihost.sync_hosts("staging-src")
staged = multihost.stage_to_local_scratch(src)
res["staged_local"] = staged != src and os.path.exists(staged)

# --- DP train step through the Trainer: per-process LOCAL batches ------------
from pregen_pde_tpu.models.fno import FNO2d  # noqa: E402
from pregen_pde_tpu.training.trainer import Trainer, TrainerConfig  # noqa: E402

rng = np.random.default_rng(0)
xg = rng.normal(size=(8, 16, 16, 6)).astype(np.float32)
tg = rng.uniform(0.1, 1.0, (8,)).astype(np.float32)
yg = rng.normal(size=(8, 16, 16, 3)).astype(np.float32)
sl = slice(rank * 4, (rank + 1) * 4)

model = FNO2d(out_channels=3, modes=2, width=4, n_layers=1)
trainer = Trainer(model, TrainerConfig(
    learning_rate=1e-3, epochs=2, batch_size=8, early_stop_patience=None,
    seed=0))
local = {"input": xg[sl], "time": tg[sl], "label": yg[sl]}
trainer.init_state(local, steps_per_epoch=1)
step = trainer._make_train_step()
losses = []
for _ in range(2):
    trainer.state, loss = step(trainer.state, trainer._shard_batch(local))
    losses.append(float(loss))
res["dp_losses"] = losses

# --- evaluate(): global metrics identical on every process ------------------
class _OneBatch:
    def __iter__(self):
        yield local

res["eval"] = trainer.evaluate(_OneBatch())["mean_rel_%"]

# --- orbax save/restore under multihost --------------------------------------
import orbax.checkpoint as ocp  # noqa: E402

ckpt_dir = os.path.join(outdir, "ckpt")
mgr = ocp.CheckpointManager(ckpt_dir)
params_host = jax.device_get(trainer.state.params)
mgr.save(0, args=ocp.args.StandardSave(params_host))
mgr.wait_until_finished()
multihost.sync_hosts("ckpt-saved")
restored = mgr.restore(0, args=ocp.args.StandardRestore(params_host))
leaves_a = jax.tree_util.tree_leaves(params_host)
leaves_b = jax.tree_util.tree_leaves(restored)
res["ckpt_roundtrip"] = all(
    np.array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(leaves_a, leaves_b))

# --- rank-aware benchmark-style eval (VERDICT r4 #6): _direct_eval + ar_eval
# shard the test samples rank-strided and allgather per-sample errors, so
# every rank reports the identical GLOBAL metric --------------------------------
from pregen_pde_tpu.__main__ import _direct_eval  # noqa: E402
from pregen_pde_tpu.evalx.inference import ar_eval  # noqa: E402


class _EvalDS:
    """Sample-style test dataset (time, input, label) with an odd length so
    the rank shards are ragged (4 vs 3 samples)."""

    class cfg:
        time_input = False

    def __init__(self):
        r = np.random.default_rng(42)
        self.t = r.uniform(0.1, 1.0, (7,)).astype(np.float32)
        self.x = r.normal(size=(7, 16, 16, 6)).astype(np.float32)
        self.y = r.normal(size=(7, 16, 16, 3)).astype(np.float32)

    def __len__(self):
        return 7

    def __getitem__(self, i):
        return self.t[i], self.x[i], self.y[i]


_eds = _EvalDS()
res["bench_direct"] = _direct_eval(model, trainer.state.params, _eds,
                                   batch_size=2)["median_rel_%"]
res["bench_ar"] = ar_eval(model.apply, trainer.state.params, _eds, 2,
                          batch_size=2)["median_rel_%"]

# --- batch-sharded datagen with per-process host writes ----------------------
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from pregen_pde_tpu.core.config import NSVorticityConfig  # noqa: E402
from pregen_pde_tpu.solvers.spectral_ns import NSVorticitySolver  # noqa: E402

cfg = NSVorticityConfig(resolution=32, viscosity=1e-3, dt=1e-3, t_end=4e-3,
                        n_snapshots=2, include_initial=True, forcing="fno")
sol = NSVorticitySolver(cfg)
mesh = multihost.global_mesh()
sh = NamedSharding(mesh, P("data"))
w0_local = rng.normal(size=(8, 32, 32)).astype(np.float32)[sl]
w0 = jax.make_array_from_process_local_data(sh, w0_local)
traj = jax.jit(jax.vmap(sol.make_trajectory_fn()), in_shardings=sh,
               out_shardings=sh)
frames = traj(w0)
# each process writes ONLY its addressable rows (streamed pod-scale writes)
rows = sorted(frames.addressable_shards, key=lambda s: s.index[0].start)
my_rows = np.concatenate([np.asarray(s.data) for s in rows])
np.save(os.path.join(outdir, f"gen_shard_{rank}.npy"), my_rows)
res["gen_rows"] = [int(s.index[0].start) for s in rows]

with open(os.path.join(outdir, f"result_{rank}.json"), "w") as f:
    json.dump(res, f)
print(json.dumps(res), flush=True)
