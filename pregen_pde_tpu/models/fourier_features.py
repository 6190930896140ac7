"""Gaussian Fourier feature mapping for coordinate inputs.

Same capability as the reference `CNO_Experiments/training/FourierFeatures.py`
(random Gaussian projection B ~ scale * N(0,1), features
[sin(2*pi*x@B^T), cos(2*pi*x@B^T)]; scale=0 -> identity). Reference keeps B
as an eagerly-sampled buffer on a device argument; here B is a fixed
(non-trainable) flax "constants" variable drawn from the init PRNG, so the
mapping is reproducible, checkpointable, and shardable like any parameter.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class FourierFeatures(nn.Module):
    """x: (..., coord_dim) coordinates -> (..., 2*mapping_size) features
    (or x unchanged when scale == 0)."""

    scale: float
    mapping_size: int
    coord_dim: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.scale == 0:
            return x
        B = self.variable(
            "constants",
            "B",
            lambda: self.scale
            * jax.random.normal(
                self.make_rng("params"),
                (self.mapping_size, self.coord_dim),
                jnp.float32,
            ),
        )
        proj = (2.0 * jnp.pi * x) @ B.value.T.astype(x.dtype)
        return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)
