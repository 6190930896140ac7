"""Multi-host (multi-slice / pod) setup helpers.

The reference's cross-rank plumbing (`LOCAL_RANK` env, rank-0
`broadcast_object_list` at `scOT/train.py:123,169`) maps to:

- `initialize()` — `jax.distributed.initialize` (controller discovery from
  TPU metadata / env; no-op when single-process);
- `broadcast_from_host0` — `multihost_utils.broadcast_one_to_all`;
- `is_host0` — rank-0 gating for logging/checkpoint writes;
- `global_mesh` — Mesh over ALL processes' devices (ICI within a slice, DCN
  across; XLA routes collectives accordingly).

Single-host environments (including tests) exercise the same code paths with
`jax.process_count() == 1`.
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np


def initialize(**kwargs) -> None:
    """`jax.distributed.initialize`, tolerant ONLY of the benign cases —
    already initialized, or single-process with no coordinator configured.
    A real init failure (coordinator unreachable, rank mismatch, ...) in a
    configured multi-process launch is re-raised: swallowing it would let a
    pod job silently proceed as N disconnected single-host runs."""
    if jax.process_count() > 1:
        return  # already initialized
    import os

    configured = bool(
        kwargs.get("coordinator_address")
        or os.environ.get("JAX_COORDINATOR_ADDRESS")
        or os.environ.get("COORDINATOR_ADDRESS")
        or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
    )
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        # "already initialized" is fine; anything else only when unconfigured
        if "already initialized" in str(e).lower():
            return
        if configured:
            raise
    except Exception:
        if configured:
            raise
        # single-process, nothing configured: auto-detection found no
        # coordinator — fine, run single-host.


def is_host0() -> bool:
    return jax.process_index() == 0


def broadcast_from_host0(value):
    """≡ accelerate's broadcast_object_list for array-like control-plane values."""
    from jax.experimental import multihost_utils

    return multihost_utils.broadcast_one_to_all(value)


def sync_hosts(name: str = "barrier"):
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def global_mesh(axis_names: Sequence[str] = ("data",), shape=None):
    """Mesh over every device of every process."""
    from pregen_pde_tpu.parallel.meshes import make_mesh

    return make_mesh(shape=shape, axis_names=axis_names, devices=jax.devices())


def stage_to_local_scratch(path, scratch_dir=None, timeout_s: float = 600.0) -> str:
    """Rank-aware dataset staging ≡ `move_to_local_scratch`
    (`scOT/problems/base.py:215-231`): copy `path` onto node-local scratch
    ONCE PER NODE, so all local workers read fast local disk instead of the
    shared filesystem. Node-local election is filesystem-based (an O_EXCL
    lock on the scratch dir itself), not rank-based — scratch is per-node,
    so gating on global rank 0 would leave every other node's scratch empty.
    The elected copier writes tmp + atomic rename; co-located processes poll
    for the rename; then all processes sync at a global barrier. Returns the
    local path; identity when no scratch dir is configured."""
    import os
    import shutil
    import time

    scratch_dir = scratch_dir or os.environ.get("SCRATCH") or os.environ.get(
        "LOCAL_SCRATCH"
    )
    if not scratch_dir:
        return str(path)
    dst = os.path.join(scratch_dir, os.path.basename(str(path)))
    if not os.path.exists(dst):
        os.makedirs(scratch_dir, exist_ok=True)
        lock = f"{dst}.lock"
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            elected = True
        except FileExistsError:
            elected = False
        if elected:
            try:
                tmp = f"{dst}.{os.getpid()}.tmp"
                shutil.copy(str(path), tmp)
                os.replace(tmp, dst)  # atomic vs concurrent readers
            finally:
                os.close(fd)
                os.unlink(lock)
        else:  # another local process is copying: poll for the rename
            t0 = time.monotonic()
            while not os.path.exists(dst):
                if time.monotonic() - t0 > timeout_s:
                    raise TimeoutError(
                        f"stage_to_local_scratch: {dst} not staged after "
                        f"{timeout_s}s (copier crashed? stale {lock}?)"
                    )
                time.sleep(0.2)
    if jax.process_count() > 1:
        sync_hosts("stage_to_local_scratch")
    return dst


def shard_indices(n: int) -> "np.ndarray":
    """This process's rank-strided sample subset of ``range(n)`` — the JAX
    twin of torch's DistributedSampler, backing the rank-aware evaluation
    the reference runs end-to-end (`scOT/train.py:573-696`: every rank
    predicts its sampler shard, metrics are gathered). Single-process: the
    full range."""
    import numpy as np

    return np.arange(jax.process_index(), n, jax.process_count())


def allgather_samplewise(local, n_total: int):
    """Gather per-sample metric rows computed on `shard_indices` subsets
    back into the full ``(n_total, ...)`` array in ORIGINAL sample order.

    Each rank's block is padded to the common ceil(n/p) length (the Gloo
    allgather needs equal shapes across ranks), gathered tiled, then
    re-interleaved (row i of the output came from rank i % p) and trimmed.
    Single-process: returns ``local`` unchanged."""
    import numpy as np

    nproc = jax.process_count()
    local = np.asarray(local)
    if nproc <= 1:
        return local
    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    m_pad = -(-n_total // nproc)
    pad_rows = m_pad - local.shape[0]
    if pad_rows:
        filler = (local[-1:] if len(local)
                  else np.zeros((1, *local.shape[1:]), local.dtype))
        local = np.concatenate([local, np.repeat(filler, pad_rows, axis=0)])
    g = np.asarray(
        multihost_utils.process_allgather(jnp.asarray(local), tiled=True)
    ).reshape(nproc, m_pad, *local.shape[1:])
    out = np.empty((n_total, *local.shape[1:]), local.dtype)
    for r in range(nproc):
        take = len(range(r, n_total, nproc))
        out[r::nproc] = g[r, :take]
    return out
