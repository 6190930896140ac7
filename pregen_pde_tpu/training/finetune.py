"""Foundation-model fine-tuning: dimension adapters + tiered learning rates.

Mirrors the reference FT machinery (`CNO_Experiments/CNO_FineTune.py`,
`test_and_fine_tune_utils/fine_tune_lift.py`): when a pretrained model's
in/out channel counts don't match the target task, wrap it with 1×1-conv
adapters (`FT_Lift :12-47`, `FT_Project :49-82`, chosen by dim mismatch in
`initialize_FT :86-113`), and train with 3-tier learning rates
(base / norm-conditioning / adapters ≡ `CNO_FineTune.py:31-33` →
`configure_optimizers` FT branch `CNO_timeModule_CIN.py:983-994`).

In JAX the "frozen backbone" is just a zero (or tiny) learning-rate tier via
`TrainerConfig.lr_tiers` + the `finetune_tier_fn` below — no parameter
surgery needed.
"""

from __future__ import annotations

import flax.linen as nn
import jax


class AdapterWrapper(nn.Module):
    """[1×1 conv in-adapter] → base model → [1×1 conv out-adapter].

    in_adapter: maps new input channels → base's expected input channels
    (≡ FT_Lift's 1×1 convs before the frozen lift);
    out_adapter: maps base output → new output channels (≡ FT_Project)."""

    base: nn.Module
    base_in_channels: int
    out_channels: int | None = None  # None → keep base output
    hidden: int = 64

    @nn.compact
    def __call__(self, x: jax.Array, time: jax.Array | None = None) -> jax.Array:
        if x.shape[-1] != self.base_in_channels:
            h = nn.Conv(self.hidden, (1, 1), name="in_adapter_1")(x)
            h = nn.gelu(h)
            x = nn.Conv(self.base_in_channels, (1, 1), name="in_adapter_2")(h)
        x = self.base(x, time)
        if self.out_channels is not None and x.shape[-1] != self.out_channels:
            h = nn.Conv(self.hidden, (1, 1), name="out_adapter_1")(x)
            h = nn.gelu(h)
            x = nn.Conv(self.out_channels, (1, 1), name="out_adapter_2")(h)
        return x


def finetune_tier_fn(path: tuple[str, ...]) -> str:
    """Assign params to the reference's 3 FT tiers:
    'adapter' (new lift/project), 'norm' (FILM / conditional norms), 'base'."""
    joined = "/".join(path)
    if "in_adapter" in joined or "out_adapter" in joined:
        return "adapter"
    if "FILM" in joined or "time_scale" in joined or "time_bias" in joined or \
            "norm" in joined.lower():
        return "norm"
    return "base"


DEFAULT_FT_TIERS = {
    # `CNO_FineTune.py:31-33`: lr (base) / lr_norms / lr_embeddings
    "base": 1e-5,
    "norm": 1e-4,
    "adapter": 1e-3,
}
