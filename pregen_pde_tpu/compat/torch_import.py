"""torch state_dict → flax params converters for the four model families.

Each converter takes a ``Mapping[str, np.ndarray]`` (a torch ``state_dict``
with tensors converted to numpy — complex tensors as complex numpy) keyed by
the REFERENCE's parameter names, and returns the nested flax params dict for
the corresponding model in this framework. Layout conventions converted:

- ``nn.Linear`` weight (out, in)            → Dense kernel (in, out)
- ``nn.Conv2d`` weight (out, in, kh, kw)    → Conv kernel (kh, kw, in, out)
- depthwise Conv2d (out, 1, kh, kw)         → kernel (kh, kw, 1, out)
- ``nn.ConvTranspose2d`` (in, out, kh, kw)  → ConvTranspose kernel
  (kh, kw, in, out) **spatially flipped** (torch's op is the conv gradient;
  flax's treats the kernel as a convolution kernel)
- reference ``WNLinear`` weight_v (out, in), weight_g (out, 1)
                                            → WNDense v (in, out), g (out,)
- complex spectral weights (I, O, m1, m2)   → split re/im (I, m1, m2, O)

Wiring-order facts the mappings encode (pinned by the oracle tests):
- CNO executes its NECK res blocks in reverse creation order
  (`CNO_timeModule_CIN.py:866-867`) — block j here ← torch block
  n_res_neck−1−j.
- scOT decode stages are constructed ``for i in reversed(range(depth))``
  (`scOT/model.py:841-851`) — `decoder.layers.{j}.blocks.{d}` is already the
  execution order, which is what this framework's `dec_{i}_blk_{d}` names.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np

__all__ = [
    "import_fno_state_dict",
    "import_ffno_state_dict",
    "import_cno_state_dict",
    "import_scot_state_dict",
]


def _lin(sd, prefix, bias=True):
    out = {"kernel": np.asarray(sd[f"{prefix}.weight"]).T.astype(np.float32)}
    if bias:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"]).astype(np.float32)
    return out


def _conv(sd, prefix, bias=True):
    w = np.asarray(sd[f"{prefix}.weight"])
    if w.ndim == 4:
        k = np.transpose(w, (2, 3, 1, 0)).astype(np.float32)
    else:  # 1x1 conv stored as Linear
        k = w.T.astype(np.float32)
    out = {"kernel": k}
    if bias:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"]).astype(np.float32)
    return out


def _conv_transpose(sd, prefix, bias=True):
    w = np.asarray(sd[f"{prefix}.weight"])  # (in, out, kh, kw)
    k = np.ascontiguousarray(
        np.transpose(w, (2, 3, 0, 1))[::-1, ::-1]
    ).astype(np.float32)
    out = {"kernel": k}
    if bias:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"]).astype(np.float32)
    return out


def _wn(sd, prefix):
    return {
        "v": np.asarray(sd[f"{prefix}.weight_v"]).T.astype(np.float32),
        "g": np.asarray(sd[f"{prefix}.weight_g"])[:, 0].astype(np.float32),
        "bias": np.asarray(sd[f"{prefix}.bias"]).astype(np.float32),
    }


def _cplx_pair(w):  # (I, O, m1, m2) complex -> re/im (I, m1, m2, O)
    w = np.transpose(np.asarray(w), (0, 2, 3, 1))
    return w.real.astype(np.float32), w.imag.astype(np.float32)


# ---------------------------------------------------------------------------
# FNO (`Autoregressive_Baseline_Scripts/models/FNO.py`) → models/fno.py::FNO2d
# ---------------------------------------------------------------------------


def _conv1x1_as_dense(sd, prefix):
    w = np.asarray(sd[f"{prefix}.weight"])[:, :, 0, 0]  # (O, I, 1, 1)
    return {"kernel": w.T.astype(np.float32),
            "bias": np.asarray(sd[f"{prefix}.bias"]).astype(np.float32)}


def import_fno_state_dict(sd: Mapping[str, np.ndarray], n_layers: int) -> dict:
    """fc0/conv_list/spectral_list/fc1/fc2 → FNO2d params (head_width=128)."""
    params: dict = {"Dense_0": _lin(sd, "fc0")}
    for k in range(n_layers):
        w1r, w1i = _cplx_pair(sd[f"spectral_list.{k}.weights1"])
        w2r, w2i = _cplx_pair(sd[f"spectral_list.{k}.weights2"])
        params[f"SpectralConv2d_{k}"] = {
            "w_pos_re": w1r, "w_pos_im": w1i,
            "w_neg_re": w2r, "w_neg_im": w2i,
        }
        params[f"Dense_{k + 1}"] = _conv1x1_as_dense(sd, f"conv_list.{k}")
    params[f"Dense_{n_layers + 1}"] = _lin(sd, "fc1")
    params[f"Dense_{n_layers + 2}"] = _lin(sd, "fc2")
    return params


# ---------------------------------------------------------------------------
# FFNO (`models/FFNO.py`) → models/ffno.py::FFNO2d
# ---------------------------------------------------------------------------


def _ffno_cplx(sd, key):  # fourier_weight (I, O, m, 2) -> re/im (I, m, O)
    w = np.asarray(sd[key])
    c = w[..., 0] + 1j * w[..., 1]
    c = np.transpose(c, (0, 2, 1))
    return c.real.astype(np.float32), c.imag.astype(np.float32)


def import_ffno_state_dict(sd: Mapping[str, np.ndarray], n_layers: int) -> dict:
    """in_proj/fourier_weight/backcast FFs/out head → FFNO2d params
    (share_weight=True layout; fourier_weight.0 acts on the H axis ≡ w_y,
    .1 on the W axis ≡ w_x)."""
    params: dict = {"in_proj": _wn(sd, "in_proj")}
    params["w_y_re"], params["w_y_im"] = _ffno_cplx(sd, "fourier_weight.0")
    params["w_x_re"], params["w_x_im"] = _ffno_cplx(sd, "fourier_weight.1")
    for i in range(n_layers):
        base = f"spectral_layers.{i}.backcast_ff.net"
        params[f"ff_{i}_0"] = _wn(sd, f"{base}.0")
        params[f"ff_{i}_1"] = _wn(sd, f"{base}.3")
    params["head_0"] = _wn(sd, "out.0")
    params["head_1"] = _wn(sd, "out.1")
    return params


# ---------------------------------------------------------------------------
# CNO (`CNO_timeModule_CIN.py`) → models/cno.py::CNO
# ---------------------------------------------------------------------------


def _film(sd, prefix):
    return {
        "GroupNorm_0": {
            "scale": np.asarray(sd[f"{prefix}.norm.weight"]).astype(np.float32),
            "bias": np.asarray(sd[f"{prefix}.norm.bias"]).astype(np.float32),
        },
        "Dense_0": _lin(sd, f"{prefix}.inp2lat_sacale"),
        "Dense_1": _lin(sd, f"{prefix}.lat2scale"),
        "Dense_2": _lin(sd, f"{prefix}.inp2lat_bias"),
        "Dense_3": _lin(sd, f"{prefix}.lat2bias"),
    }


def _cno_block(sd, prefix):
    return {
        "Conv_0": _conv(sd, f"{prefix}.convolution"),
        "FILM_0": _film(sd, f"{prefix}.in_norm_conditiner"),
        "AntiAliasedLReLu_0": {
            "bias": np.asarray(sd[f"{prefix}.activation.bias"]).astype(np.float32)
        },
    }


def _cno_lift(sd, prefix):
    return {
        "CNOBlock_0": {
            "Conv_0": _conv(sd, f"{prefix}.inter_CNOBlock.convolution"),
            "AntiAliasedLReLu_0": {
                "bias": np.asarray(
                    sd[f"{prefix}.inter_CNOBlock.activation.bias"]
                ).astype(np.float32)
            },
        },
        "Conv_0": _conv(sd, f"{prefix}.convolution"),
    }


def _cno_res(sd, prefix):
    return {
        "Conv_0": _conv(sd, f"{prefix}.convolution1"),
        "FILM_0": _film(sd, f"{prefix}.in_norm_conditiner1"),
        "AntiAliasedLReLu_0": {
            "bias": np.asarray(sd[f"{prefix}.activation.bias"]).astype(np.float32)
        },
        "Conv_1": _conv(sd, f"{prefix}.convolution2"),
        "FILM_1": _film(sd, f"{prefix}.in_norm_conditiner2"),
    }


def import_cno_state_dict(
    sd: Mapping[str, np.ndarray],
    n_layers: int,
    n_res: int = 1,
    n_res_neck: int = 6,
    add_inv: bool = True,
) -> dict:
    """lift/encoder/ED_expansion/decoder(_inv)/res_nets/project → CNO params.

    Handles the reference's reverse-order neck execution and its
    created-but-unused last `decoder_inv` block.
    """
    nl = n_layers
    params: dict = {
        "LiftProjectBlock_0": _cno_lift(sd, "lift"),
        "LiftProjectBlock_1": _cno_lift(sd, "project"),
    }
    ridx = 0
    for l in range(nl):
        for r in range(n_res):
            params[f"ResidualBlock_{ridx}"] = _cno_res(
                sd, f"res_nets.{l * n_res + r}")
            ridx += 1
    for j in range(n_res_neck):
        params[f"ResidualBlock_{ridx}"] = _cno_res(
            sd, f"res_nets.{nl * n_res + (n_res_neck - 1 - j)}")
        ridx += 1
    cidx = 0
    for i in range(nl):
        params[f"CNOBlock_{cidx}"] = _cno_block(sd, f"encoder.{i}")
        cidx += 1
    for i in range(nl):
        params[f"CNOBlock_{cidx}"] = _cno_block(sd, f"ED_expansion.{nl - i}")
        cidx += 1
        if add_inv:
            params[f"CNOBlock_{cidx}"] = _cno_block(sd, f"decoder_inv.{i}")
            cidx += 1
        params[f"CNOBlock_{cidx}"] = _cno_block(sd, f"decoder.{i}")
        cidx += 1
    params[f"CNOBlock_{cidx}"] = _cno_block(sd, "ED_expansion.0")
    return params


# ---------------------------------------------------------------------------
# scOT (`Poseidon_mixing_Exp/scOT/model.py`) → models/scot.py::ScOT
# ---------------------------------------------------------------------------


def _cln(sd, prefix):
    return {
        "time_scale": _lin(sd, f"{prefix}.weight"),
        "time_bias": _lin(sd, f"{prefix}.bias"),
    }


def _swin(sd, prefix):
    a = f"{prefix}.attention"
    return {
        "attention": {
            "query": _lin(sd, f"{a}.self.query"),
            "key": _lin(sd, f"{a}.self.key", bias=False),
            "value": _lin(sd, f"{a}.self.value"),
            "proj": _lin(sd, f"{a}.output.dense"),
            "logit_scale": np.asarray(sd[f"{a}.self.logit_scale"]).astype(
                np.float32),
            "cpb_mlp1": _lin(sd, f"{a}.self.continuous_position_bias_mlp.0"),
            "cpb_mlp2": _lin(sd, f"{a}.self.continuous_position_bias_mlp.2",
                             bias=False),
        },
        "norm1": _cln(sd, f"{prefix}.layernorm_before"),
        "mlp1": _lin(sd, f"{prefix}.intermediate.dense"),
        "mlp2": _lin(sd, f"{prefix}.output.dense"),
        "norm2": _cln(sd, f"{prefix}.layernorm_after"),
    }


def _convnext(sd, prefix):
    w = np.asarray(sd[f"{prefix}.dwconv.weight"])  # (dim, 1, 7, 7)
    return {
        "dwconv": {
            "kernel": np.transpose(w, (2, 3, 1, 0)).astype(np.float32),
            "bias": np.asarray(sd[f"{prefix}.dwconv.bias"]).astype(np.float32),
        },
        "norm": _cln(sd, f"{prefix}.norm"),
        "pwconv1": _lin(sd, f"{prefix}.pwconv1"),
        "pwconv2": _lin(sd, f"{prefix}.pwconv2"),
        "layer_scale": np.asarray(sd[f"{prefix}.weight"]).astype(np.float32),
    }


def import_scot_state_dict(sd: Mapping[str, np.ndarray], config) -> dict:
    """Reference ScOT state_dict → our ScOT params for a matching
    `ScOTConfig` (depths/skip_connections drive the traversal)."""
    depths = list(config.depths)
    L = len(depths)
    params: dict = {
        "patch_embed": _conv(sd, "embeddings.patch_embeddings.projection"),
        "embed_norm": _cln(sd, "embeddings.norm"),
        "patch_recovery": _conv_transpose(sd, "patch_recovery.projection"),
        "recovery_mixup": _conv(sd, "patch_recovery.mixup", bias=False),
    }
    if config.use_mask_token and "embeddings.mask_token" in sd:
        params["mask_token"] = np.asarray(
            sd["embeddings.mask_token"]).reshape(1, 1, 1, -1).astype(np.float32)
    if config.use_absolute_embeddings and "embeddings.position_embeddings" in sd:
        g = config.image_size // config.patch_size
        params["pos_embed"] = np.asarray(
            sd["embeddings.position_embeddings"]
        ).reshape(1, g, g, -1).astype(np.float32)
    for i in range(L):
        for d in range(depths[i]):
            params[f"enc_{i}_blk_{d}"] = _swin(
                sd, f"encoder.layers.{i}.blocks.{d}")
        if i < L - 1:
            params[f"enc_{i}_merge"] = {
                "reduction": _lin(sd, f"encoder.layers.{i}.downsample.reduction",
                                  bias=False),
                "norm": _cln(sd, f"encoder.layers.{i}.downsample.norm"),
            }
    for i, depth in enumerate(config.skip_connections):
        for d in range(depth):
            params[f"skip_{i}_blk_{d}"] = _convnext(
                sd, f"residual_blocks.{i}.{d}")
    for j in range(L):  # decoder.layers.{j} covers dim level i = L-1-j
        i = L - 1 - j
        for d in range(depths[i]):
            params[f"dec_{i}_blk_{d}"] = _swin(
                sd, f"decoder.layers.{j}.blocks.{d}")
        if i > 0:
            up = f"decoder.layers.{j}.upsample"
            params[f"dec_{i}_unmerge"] = {
                "upsample": _lin(sd, f"{up}.upsample", bias=False),
                "norm": _cln(sd, f"{up}.norm"),
                "mixup": _lin(sd, f"{up}.mixup", bias=False),
            }
    return params
