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
    """Best-effort `jax.distributed.initialize`; silently a no-op when single
    process or already initialized."""
    try:
        if jax.process_count() > 1:
            return  # already initialized
    except Exception:
        pass
    try:
        jax.distributed.initialize(**kwargs)
    except Exception:
        pass  # single-process / no coordinator: fine


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


def stage_to_local_scratch(path, scratch_dir=None) -> str:
    """Rank-aware dataset staging ≡ `move_to_local_scratch`
    (`scOT/problems/base.py:215-231`): copy `path` onto node-local scratch
    once per host (process-0-per-host copies, everyone else waits at a
    barrier), so all local workers read from fast local disk instead of the
    shared filesystem. Returns the local path. No-op if already staged or
    no scratch dir is configured/available."""
    import os
    import shutil

    scratch_dir = scratch_dir or os.environ.get("SCRATCH") or os.environ.get(
        "LOCAL_SCRATCH"
    )
    if not scratch_dir:
        return str(path)
    dst = os.path.join(scratch_dir, os.path.basename(str(path)))
    if not os.path.exists(dst):
        if is_host0() or jax.process_count() == 1:
            os.makedirs(scratch_dir, exist_ok=True)
            tmp = f"{dst}.{os.getpid()}.tmp"
            shutil.copy(str(path), tmp)
            os.replace(tmp, dst)  # atomic vs concurrent readers
    if jax.process_count() > 1:
        sync_hosts("stage_to_local_scratch")
    return dst
