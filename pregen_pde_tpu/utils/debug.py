"""NaN/Inf detection & profiling utilities.

The TPU counterpart of the reference's opt-in sanitizer layer (SURVEY.md §5):
`DEBUG_NAN`-gated anomaly detection (`scripts/train.py:49-55`), per-stage
finite-ratio stats (`models/FFNO.py:53-59,163-168`), gradient finiteness sweep
(`scripts/train.py:275-289`), and the torch profiler wrappers
(`torch_utils/misc.py:92-100`, `debug_tools.py`).

Enable with env var DEBUG_NAN=1 (same flag name as the reference).
"""

from __future__ import annotations

import contextlib
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def debug_nan_enabled() -> bool:
    return os.environ.get("DEBUG_NAN", "0") not in ("0", "", "false")


def finite_ratio(tree: Any) -> dict[str, float]:
    """Fraction of finite entries per leaf (host-side; call on concrete arrays)."""
    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        a = np.asarray(leaf)
        name = "/".join(str(p) for p in path)
        out[name] = float(np.isfinite(a).mean()) if a.size else 1.0
    return out


def assert_tree_finite(tree: Any, name: str = "tree") -> None:
    """Raise with the offending leaf paths if any entry is non-finite."""
    bad = [k for k, v in finite_ratio(tree).items() if v < 1.0]
    if bad:
        raise FloatingPointError(f"non-finite values in {name}: {bad[:10]}")


def grad_finiteness_sweep(grads: Any) -> dict[str, float]:
    """≡ the baselines' per-parameter gradient finiteness report
    (`scripts/train.py:275-289`). Returns only the non-finite leaves."""
    return {k: v for k, v in finite_ratio(grads).items() if v < 1.0}


def sanitize_contract(arr: np.ndarray, clip: float | None = None) -> np.ndarray:
    """Loader-level sanitization ≡ `utils/data_loader.py:62-95`:
    nan_to_num + zero physical channels inside obstacles + optional clip."""
    arr = np.nan_to_num(arr, nan=0.0, posinf=0.0, neginf=0.0)
    mask = arr[..., 4:5] > 0.5
    arr[..., 0:3] = np.where(mask, 0.0, arr[..., 0:3])
    if clip is not None:
        arr[..., 0:3] = np.clip(arr[..., 0:3], -clip, clip)
    return arr


@contextlib.contextmanager
def jax_nan_debug():
    """Context manager ≡ torch.autograd.set_detect_anomaly under DEBUG_NAN."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """jax.profiler trace ≡ `misc.profiled_function` / CudaMemoryDebugger."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> list[dict]:
    """Per-device memory snapshot (≡ `CudaMemoryDebugger`); empty off-TPU."""
    stats = []
    for d in jax.devices():
        try:
            s = d.memory_stats()
        except Exception:
            s = None
        if s:
            stats.append({"device": str(d), **{k: s[k] for k in sorted(s)}})
    return stats


def dump_hlo(fn, *args, path: str | None = None, optimized: bool = False,
             **jit_kwargs) -> str:
    """Lower ``fn(*args)`` and return its HLO text (≡ the "XLA dumps" debug
    surface, SURVEY §5; the reference had no compiler-level introspection).
    ``optimized=True`` returns the post-optimization module (requires a
    compile — slow through the TPU tunnel). If ``path`` is given the text is
    also written there."""
    import jax

    lowered = jax.jit(fn, **jit_kwargs).lower(*args)
    text = (
        lowered.compile().as_text() if optimized else lowered.as_text()
    )
    if path is not None:
        with open(path, "w") as f:
            f.write(text)
    return text
