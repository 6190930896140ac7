"""Small shared utilities — counterparts of `torch_utils/misc.py`.

- `assert_shape` ≡ `misc.assert_shape :74` (None = wildcard dim);
- `count_params` / `count_trainable` ≡ `scOT/utils.py:91-97`;
- `module_summary` ≡ `misc.print_module_summary :188` (tabulated via flax);
- `infinite_batches` ≡ `misc.InfiniteSampler :103`;
- model-code persistence (`torch_utils/persistence.py`) is replaced by the
  config-as-data principle: orbax checkpoints + the typed config round-trip
  (`core.config`), no source pickling.
"""

from __future__ import annotations

from typing import Iterable, Sequence

import jax
import numpy as np


def assert_shape(x, ref_shape: Sequence[int | None]) -> None:
    """Raise AssertionError unless x.shape matches (None = any)."""
    if len(x.shape) != len(ref_shape):
        raise AssertionError(f"rank mismatch: {x.shape} vs {ref_shape}")
    for i, (a, b) in enumerate(zip(x.shape, ref_shape)):
        if b is not None and a != b:
            raise AssertionError(f"dim {i}: {a} != {b} (shape {x.shape} vs {ref_shape})")


def count_params(params) -> int:
    return sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(params))


def param_breakdown(params, depth: int = 1) -> dict[str, int]:
    """Parameter counts grouped by the first `depth` path components."""
    out: dict[str, int] = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "/".join(str(p).strip(".[]'\"") for p in path[:depth])
        out[key] = out.get(key, 0) + int(np.prod(leaf.shape))
    return out


def module_summary(model, *init_args, rngs=None) -> str:
    """Tabulated module summary (≡ print_module_summary)."""
    import flax.linen as nn

    rngs = rngs or jax.random.key(0)
    return nn.tabulate(model, rngs, console_kwargs={"width": 120})(*init_args)


def infinite_batches(loader) -> Iterable:
    """Endless iteration over a BatchLoader (≡ InfiniteSampler)."""
    while True:
        yield from loader
