"""Persistent XLA/Mosaic compilation cache.

The 896²/1024² Pallas steppers cost ~5 min of Mosaic compile per shape —
per *process* without a disk cache (`solvers/spectral_ns_pallas.py::supported`
docstring, PERF.md compile-time table). Wiring `jax_compilation_cache_dir`
makes every fresh generation/bench process after the first pay a warm
deserialize instead of a recompile.

Called from the CLI entry point (`__main__.py::main`) and the bench worker;
opt out with PREGEN_PDE_NO_COMP_CACHE=1 (e.g. for compile-time measurements).
The reference has no analog — its CUDA ops use torch's build-dir cache for
*extension builds* (`torch_utils/custom_ops.py:53-151`) but recompile nothing
at this cost.
"""

from __future__ import annotations

import os

DEFAULT_CACHE_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "pregen_pde_tpu", "xla_cache"
)


def enable_persistent_cache(cache_dir: str | None = None) -> str | None:
    """Enable JAX's persistent compilation cache. Returns the cache dir, or
    None if disabled via env. Safe to call multiple times / before backend
    init; never raises (an unwritable dir just disables caching)."""
    if os.environ.get("PREGEN_PDE_NO_COMP_CACHE"):
        return None
    cache_dir = cache_dir or os.environ.get(
        "PREGEN_PDE_COMP_CACHE_DIR", DEFAULT_CACHE_DIR
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache anything that took >5s to compile (the Mosaic kernels are
        # 6s-5min; trivial programs stay out of the cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
        # cache regardless of how long tracing took
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - best effort
        return None
    return cache_dir
