"""Main-path multi-tier learning-rate groups.

Mirrors the reference scOT trainer's `create_optimizer`
(`Poseidon_mixing_Exp/scOT/trainer.py:77-227`), which builds up to four
param groups:

- ``embeddings``      — any param whose torch name contains "embeddings" or
  "patch_recovery" → ``learning_rate_embedding_recovery``, weight decay ON
  for every member (biases included);
- ``standard``        — HF decay params (everything except LayerNorm params
  and names containing the substring "bias") → base lr, decay ON;
- ``time_embedding``  — ConditionalLayerNorm params that are NOT decay params
  → ``learning_rate_time_embedding``, decay OFF;
- ``no_weight_decay`` — the rest → base lr, decay OFF.

Two reference quirks preserved deliberately (pinned by
`tests/test_reference_oracle.py`'s optimizer-step oracle):

1. The decay filter is the literal substring test ``"bias" not in name``
   (`transformers.Trainer.get_decay_parameter_names`). The conditional
   norm's *scale* Linear (`ConditionalLayerNorm.weight`, our ``time_scale``)
   therefore has its kernel in **standard** (base lr!), while its bias and
   the whole *bias* Linear (torch name contains ".bias.") land in
   **time_embedding** — the "time-embedding LR" never touches the scale
   kernels.
2. The ``embeddings`` group applies weight decay to its biases too (torch
   groups set one decay per group).
"""

from __future__ import annotations

# flax param paths whose torch names contain "embeddings" (HF
# `swinv2.embeddings`: patch conv + its norm + abs-pos embed + mask token)
# or "patch_recovery" (ConvTranspose + 5×5 mixup, `scOT/model.py:534-597`)
_EMBEDDING_KEYS = (
    "patch_embed",
    "embed_norm",
    "pos_embed",
    "mask_token",
    "patch_recovery",
    "recovery_mixup",
)


def scot_main_tier_fn(path: tuple[str, ...]) -> str:
    """Param path → tier name, exact `scOT/trainer.py:91-122` order under
    the reference's PINNED transformers==4.29.2 (`pyproject.toml`), whose
    decay filter is class-LayerNorm + the literal ``"bias" not in name``
    test only. (Transformers ≥4.44 added name-pattern filters — layernorm/
    rmsnorm/.norm. — that silently move the conditional-norm scale kernels
    into the time-embedding group; the published experiments ran 4.29.)"""
    joined = "/".join(path)
    if any(k in joined for k in _EMBEDDING_KEYS):
        return "embeddings"
    # 4.29 decay params: kernels whose torch name has no "bias" substring
    # (our `time_bias` module is torch `ConditionalLayerNorm.bias` — its
    # kernel's torch name contains ".bias." and is NOT a decay param), plus
    # the non-kernel matrix/vector params outside LayerNorm modules: the
    # attention temperature (torch `...self.logit_scale`) and the ConvNeXt
    # layer scale (torch `ConvNeXtBlock.weight`, `scOT/model.py:161-165`).
    # ... and the CPB MLP kernels are NOT decay params: their torch module
    # is `continuous_position_bias_mlp` — the literal substring test trips
    # on "bias" in the MODULE name
    if "cpb_mlp1" in path or "cpb_mlp2" in path:
        return "no_weight_decay"
    if (path[-1] == "kernel" and "time_bias" not in path) or \
            path[-1] in ("logit_scale", "layer_scale"):
        return "standard"
    if "time_scale" in path or "time_bias" in path:
        return "time_embedding"
    return "no_weight_decay"


# per-tier weight-decay semantics for `build_optimizer` (torch sets one
# decay flag per param group)
SCOT_TIER_DECAY = {
    "standard": "all",  # members are all kernels; decay applies to each
    "no_weight_decay": "none",
    "embeddings": "all",  # torch decays this group's biases too
    "time_embedding": "none",
}


def scot_main_tiers(lr: float, lr_embedding: float | None,
                    lr_time_embedding: float | None) -> dict[str, float]:
    """lr→tier map matching which groups the reference actually creates for
    a given flag combination (`trainer.py:82-199`)."""
    tiers = {"standard": lr, "no_weight_decay": lr}
    tiers["embeddings"] = lr_embedding if lr_embedding is not None else lr
    tiers["time_embedding"] = (
        lr_time_embedding if lr_time_embedding is not None else lr
    )
    return tiers
