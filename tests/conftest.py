"""Test bootstrap: virtual 8-device CPU mesh + float64.

This is the fake-distributed-backend the reference never had (SURVEY.md §4):
multi-chip sharding logic is exercised on 8 virtual CPU devices via
``--xla_force_host_platform_device_count``, and solver oracles run in float64.
Must run before the first ``import jax`` in any test module — pytest imports
conftest first.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment's TPU bootstrap (sitecustomize) force-registers its backend by
# rewriting the jax_platforms config at import time, so the env var alone is not
# enough — override the config back to CPU after import.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
