"""Gaussian Fourier feature mapping for coordinate inputs.

Same capability as the reference `CNO_Experiments/training/FourierFeatures.py`
(random Gaussian projection B ~ scale * N(0,1), features
[sin(2*pi*x@B^T), cos(2*pi*x@B^T)]; scale=0 -> identity). Reference keeps B
as an eagerly-sampled device buffer; here B follows this repo's constants
convention (solvers/__init__ docstring): built host-side in numpy from a
static seed and closed over — reproducible, and nothing extra to thread
through `apply({"params": ...})` / checkpoints / the Trainer.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


class FourierFeatures(nn.Module):
    """x: (..., coord_dim) coordinates -> (..., 2*mapping_size) features
    (or x unchanged when scale == 0). B is a fixed (non-trainable) constant
    determined by `seed`."""

    scale: float
    mapping_size: int
    coord_dim: int = 2
    seed: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.scale == 0:
            return x
        B = self.scale * np.random.default_rng(self.seed).standard_normal(
            (self.mapping_size, self.coord_dim)
        ).astype(np.float32)
        proj = (2.0 * jnp.pi * x) @ jnp.asarray(B.T, x.dtype)
        return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)
