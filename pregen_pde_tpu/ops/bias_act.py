"""Fused bias + activation + gain + clamp.

Same op contract and activation table as the reference CUDA op
(`torch_utils/ops/bias_act.{cu,py}`, table at `bias_act.py:13-24`, reference
impl `_bias_act_ref :83`). On TPU there is nothing to hand-fuse: under ``jit``
XLA folds the bias-add, activation, gain and clamp into the neighboring op's
epilogue, and autodiff provides arbitrary-order gradients (the reference
needed a two-kernel custom autograd graph for that).

Layout: channel axis configurable, default -1 (NHWC).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class _Act:
    func: Callable
    def_alpha: float
    def_gain: float


activation_funcs: dict[str, _Act] = {
    "linear": _Act(lambda x, alpha: x, 0.0, 1.0),
    "relu": _Act(lambda x, alpha: jax.nn.relu(x), 0.0, float(np.sqrt(2))),
    "lrelu": _Act(lambda x, alpha: jax.nn.leaky_relu(x, alpha), 0.2, float(np.sqrt(2))),
    "tanh": _Act(lambda x, alpha: jnp.tanh(x), 0.0, 1.0),
    "sigmoid": _Act(lambda x, alpha: jax.nn.sigmoid(x), 0.0, 1.0),
    "elu": _Act(lambda x, alpha: jax.nn.elu(x), 0.0, 1.0),
    "selu": _Act(lambda x, alpha: jax.nn.selu(x), 0.0, 1.0),
    "softplus": _Act(lambda x, alpha: jax.nn.softplus(x), 0.0, 1.0),
    "swish": _Act(lambda x, alpha: jax.nn.sigmoid(x) * x, 0.0, float(np.sqrt(2))),
}


def bias_act(
    x: jax.Array,
    b: jax.Array | None = None,
    dim: int = -1,
    act: str = "linear",
    alpha: float | None = None,
    gain: float | None = None,
    clamp: float | None = None,
) -> jax.Array:
    """act(x + b broadcast along `dim`) * gain, then clamp to ±clamp."""
    spec = activation_funcs[act]
    alpha = float(alpha if alpha is not None else spec.def_alpha)
    gain = float(gain if gain is not None else spec.def_gain)
    if b is not None:
        assert b.ndim == 1 and b.shape[0] == x.shape[dim]
        shape = [1] * x.ndim
        shape[dim] = -1
        x = x + b.reshape(shape).astype(x.dtype)
    x = spec.func(x, alpha)
    if gain != 1.0:
        x = x * gain
    if clamp is not None:
        assert clamp >= 0
        x = jnp.clip(x, -clamp, clamp)
    return x
