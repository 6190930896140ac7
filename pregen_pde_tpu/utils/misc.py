"""Small shared utilities — counterparts of `torch_utils/misc.py` + `dnnlib/util.py`.

- `assert_shape` ≡ `misc.assert_shape :74` (None = wildcard dim);
- `count_params` / `count_trainable` ≡ `scOT/utils.py:91-97`;
- `module_summary` ≡ `misc.print_module_summary :188` (tabulated via flax);
- `infinite_batches` ≡ `misc.InfiniteSampler :103`;
- `EasyDict` / `TeeLogger` / `format_time` / `open_url` ≡ `dnnlib/util.py`
  (`:29`, `:43`, `:122`, `:343`); `open_url` is gated to local paths / cache
  hits — this environment has zero network egress, so remote fetches raise
  with a clear message instead of hanging;
- model-code persistence (`torch_utils/persistence.py`) is replaced by the
  config-as-data principle: orbax checkpoints + the typed config round-trip
  (`core.config`), no source pickling.
"""

from __future__ import annotations

import hashlib
import os
import sys
from typing import IO, Any, Iterable, Sequence

import jax
import numpy as np


def use_best_backend(retries: int = 3, backoff_s: float = 20.0) -> str:
    """Un-pin `jax_platforms` so JAX auto-chooses the best registered backend.

    The dev environment reaches the TPU through a tunnel whose PJRT plugin
    has registered under DIFFERENT platform names across server-side updates
    ("axon", then "tpu", then "axon" again). The interpreter's sitecustomize
    pins `jax_platforms` to a specific name at import time; when the pinned
    name goes stale every dispatch raises "Backend 'axon' is not in the list
    of known backends". Clearing the pin lets JAX pick whatever accelerator
    plugin actually registered. The tunnel's init is also transiently flaky
    (a lingering previous client can make it fail), and under an un-pinned
    config a failed accelerator init SILENTLY selects CPU — so when the
    first choice lands on CPU we clear the backend cache and retry with
    backoff before accepting the CPU fallback. Returns the chosen backend
    name. Call before the first dispatch.

    An explicit CPU pin (`jax_platforms == "cpu"`, e.g. tests/conftest.py or
    `bench.py --worker cpu`) is respected and left alone.
    """
    import time

    if jax.config.jax_platforms == "cpu":
        return "cpu"
    from jax.extend import backend as _jexb

    for attempt in range(max(1, retries)):
        try:
            jax.config.update("jax_platforms", "")
            chosen = jax.default_backend()
        except Exception:
            chosen = "cpu"
        if chosen != "cpu":
            return chosen
        if attempt < retries - 1:
            try:  # drop the cached failed-init state and re-probe
                _jexb.clear_backends()
            except Exception:
                pass
            time.sleep(backoff_s * (attempt + 1))
    jax.config.update("jax_platforms", "cpu")
    return "cpu"


def is_tunnel_backend() -> bool:
    """True when the active backend is the dev environment's `axon` TPU
    tunnel (its PJRT `platform_version` carries the plugin name even though
    the platform registers as "tpu"). The tunnel has known behavioral gaps
    vs real TPU hosts — `block_until_ready` is a no-op, `copy_to_host_async`
    and fetch-during-execution crash its worker — so hot paths use this to
    pick the conservative schedule there."""
    try:
        from jax.extend import backend as _jexb

        return "axon" in getattr(
            _jexb.get_backend(), "platform_version", ""
        ).lower()
    except Exception:
        return False


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


class EasyDict(dict):
    """dict with attribute access (≡ `dnnlib/util.py:29`). Used for ad-hoc
    experiment records; durable configs use `core.config` dataclasses."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name) from None

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def __delattr__(self, name: str) -> None:
        del self[name]


class TeeLogger:
    """Tee stdout (and optionally stderr) to a log file
    (≡ `dnnlib/util.py:43` Logger). Use as a context manager."""

    def __init__(self, file_name: str, mode: str = "a", should_flush: bool = True,
                 tee_stderr: bool = False):
        self.file: IO = open(file_name, mode)
        self.should_flush = should_flush
        self.tee_stderr = tee_stderr
        self._stdout = None
        self._stderr = None

    def write(self, text: str) -> None:
        self.file.write(text)
        (self._stdout or sys.__stdout__).write(text)
        if self.should_flush:
            self.flush()

    def flush(self) -> None:
        self.file.flush()
        (self._stdout or sys.__stdout__).flush()

    def __enter__(self) -> "TeeLogger":
        self._stdout, sys.stdout = sys.stdout, self
        if self.tee_stderr:
            self._stderr, sys.stderr = sys.stderr, self
        return self

    def __exit__(self, *exc) -> None:
        sys.stdout = self._stdout
        if self.tee_stderr:
            sys.stderr = self._stderr
        self.file.close()


def format_time(seconds: float) -> str:
    """Human-readable elapsed time (≡ `dnnlib/util.py:122`)."""
    s = int(round(seconds))
    if s < 60:
        return f"{s}s"
    if s < 3600:
        return f"{s // 60}m {s % 60:02d}s"
    if s < 86400:
        return f"{s // 3600}h {(s // 60) % 60:02d}m {s % 60:02d}s"
    return f"{s // 86400}d {(s // 3600) % 24:02d}h {(s // 60) % 60:02d}m"


def open_url(url: str, cache_dir: str | None = None, return_filename: bool = False):
    """Resolve a URL to a local file (≡ `dnnlib/util.py:343`), gated for this
    zero-egress environment: `file://` URLs and plain paths open directly;
    `http(s)://` URLs are served from `cache_dir` if previously cached there
    (keyed by URL hash, as the reference does), otherwise raise RuntimeError —
    we never attempt a network fetch."""
    if url.startswith("file://"):
        url = url[len("file://"):]
    if os.path.exists(url):
        return url if return_filename else open(url, "rb")
    if "://" not in url:
        raise FileNotFoundError(url)
    cache_dir = cache_dir or os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "pregen_pde_tpu",
    )
    url_md5 = hashlib.md5(url.encode("utf-8")).hexdigest()
    if os.path.isdir(cache_dir):
        for name in os.listdir(cache_dir):
            if name.startswith(url_md5):
                path = os.path.join(cache_dir, name)
                return path if return_filename else open(path, "rb")
    raise RuntimeError(
        f"open_url({url!r}): no network egress in this environment and no "
        f"cached copy under {cache_dir}; place the file there named "
        f"'{url_md5}_<basename>' or pass a local path."
    )
