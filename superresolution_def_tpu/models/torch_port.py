"""torch state_dict -> flax params converters + architecture shape-sniffing.

Gives this framework the reference's checkpoint-consuming capability:
inference loads any reference .pth (nested-key unwrap, ``module.`` strip,
hyperparameter auto-detection from weight shapes — infer_swin.py:39-55,87-99
and infer_hat.py:52-112) and our trainers can start from torch weights for
the <=0.01 dB parity gate.

Works on plain numpy dicts, so no torch import is required unless the caller
loads a .pth themselves (see :func:`load_torch_state_dict`).
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

Array = np.ndarray
StateDict = Mapping[str, Any]


# --------------------------------------------------------------------------- #
# generic helpers
# --------------------------------------------------------------------------- #
def load_torch_state_dict(path: str) -> dict[str, np.ndarray]:
    """Load a .pth file into a numpy state dict (CPU torch required)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    sd = unwrap_state_dict(obj)
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}


def unwrap_state_dict(obj: Any) -> dict[str, Any]:
    """Reference checkpoint-key search order: net_g -> model_state_dict -> raw,
    then strip ``module.`` prefixes (infer_swin.py:88-89, infer_hat.py:157-166).
    """
    if hasattr(obj, "items"):
        for key in ("net_g", "model_state_dict"):
            if key in obj and hasattr(obj[key], "items"):
                obj = obj[key]
                break
    return {k[len("module."):] if k.startswith("module.") else k: v for k, v in obj.items()}


def _np(v) -> np.ndarray:
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    # copy: torch .numpy() aliases live tensor memory — in-place updates
    # (e.g. spectral-norm power iteration) would silently mutate the port
    return np.array(v)


def conv_w(sd: StateDict, key: str) -> np.ndarray:
    """torch conv (O, I, kh, kw) -> flax (kh, kw, I, O)."""
    return _np(sd[key]).transpose(2, 3, 1, 0)


def linear_w(sd: StateDict, key: str) -> np.ndarray:
    """torch linear (O, I) -> flax (I, O)."""
    return _np(sd[key]).T


def vec(sd: StateDict, key: str) -> np.ndarray:
    return _np(sd[key])


def _conv(sd, prefix, bias=True):
    p = {"kernel": conv_w(sd, prefix + ".weight")}
    if bias and prefix + ".bias" in sd:
        p["bias"] = vec(sd, prefix + ".bias")
    return {"conv": p}


def _dense(sd, prefix, bias=True):
    p = {"kernel": linear_w(sd, prefix + ".weight")}
    if bias and prefix + ".bias" in sd:
        p["bias"] = vec(sd, prefix + ".bias")
    return {"linear": p}


def _ln(sd, prefix):
    return {"ln": {"scale": vec(sd, prefix + ".weight"), "bias": vec(sd, prefix + ".bias")}}


def _mlp(sd, prefix):
    return {"fc1": _dense(sd, prefix + ".fc1"), "fc2": _dense(sd, prefix + ".fc2")}


# --------------------------------------------------------------------------- #
# SwinIR
# --------------------------------------------------------------------------- #
def detect_swinir_params(sd: StateDict) -> dict:
    """Shape-sniff SwinIR hyperparameters (reference infer_swin.py:39-55,
    extended: exact per-layer depths and head counts instead of the
    reference's [6]*n assumption)."""
    params = {"embed_dim": 96, "depths": [6, 6, 6, 6], "num_heads": [6, 6, 6, 6]}
    if "conv_first.weight" in sd:
        params["embed_dim"] = int(_np(sd["conv_first.weight"]).shape[0])
    layer_depth: dict[int, int] = {}
    for k in sd:
        if k.startswith("layers."):
            parts = k.split(".")
            try:
                li, bj = int(parts[1]), int(parts[2])
            except (ValueError, IndexError):
                continue
            layer_depth[li] = max(layer_depth.get(li, 0), bj + 1)
    if layer_depth:
        n = max(layer_depth) + 1
        params["depths"] = [layer_depth.get(i, 6) for i in range(n)]
        heads = []
        for i in range(n):
            key = f"layers.{i}.0.attn.relative_position_bias_table"
            heads.append(int(_np(sd[key]).shape[-1]) if key in sd else 6)
        params["num_heads"] = heads
    # the reference constructor swallows mlp_ratio (always 4 in its
    # checkpoints); sniff the actual ratio from fc1's output width
    fc1 = "layers.0.0.mlp.fc1.weight"
    if fc1 in sd and params["embed_dim"]:
        params["mlp_ratio"] = float(_np(sd[fc1]).shape[0]) / params["embed_dim"]
    else:
        params["mlp_ratio"] = 4.0
    return params


def swinir_from_torch(sd: StateDict, depths) -> dict:
    """Build the flax params tree for models.swinir.SwinIR."""
    out: dict[str, Any] = {
        "conv_first": _conv(sd, "conv_first"),
        "norm": _ln(sd, "norm"),
        "conv_after_body": _conv(sd, "conv_after_body"),
        "conv_before_upsample": _conv(sd, "conv_before_upsample.0"),
        "conv_last": _conv(sd, "conv_last"),
    }
    # Upsample Sequential: conv at even indices (0, 2, ...)
    s = 0
    while f"upsample.{2 * s}.weight" in sd:
        out[f"upsample_{s}"] = _conv(sd, f"upsample.{2 * s}")
        s += 1
    for i, depth in enumerate(depths):
        for j in range(depth):
            p = f"layers.{i}.{j}"
            out[f"layers_{i}_{j}"] = {
                "norm1": _ln(sd, p + ".norm1"),
                "norm2": _ln(sd, p + ".norm2"),
                "mlp": _mlp(sd, p + ".mlp"),
                "attn": {
                    "relative_position_bias_table": vec(
                        sd, p + ".attn.relative_position_bias_table"
                    ),
                    "qkv": _dense(sd, p + ".attn.qkv"),
                    "proj": _dense(sd, p + ".attn.proj"),
                },
            }
    return out


# --------------------------------------------------------------------------- #
# HAT / Hybrid
# --------------------------------------------------------------------------- #
def detect_hybrid_params(sd: StateDict) -> dict:
    """Shape-sniff HybridHATRealESRGAN config (reference infer_hat.py:52-112).

    Defaults to the 'Soft' train config when keys are missing.
    """
    params = {
        "embed_dim": 90,
        "depths": (6, 6, 6, 6),
        "num_heads": (6, 6, 6, 6),
        "window_size": 8,
        "num_rrdb": 12,
        "num_feat": 48,
        "num_grow_ch": 24,
    }
    if "hat.conv_first.weight" in sd:
        params["embed_dim"] = int(_np(sd["hat.conv_first.weight"]).shape[0])
    if "conv_adapt.weight" in sd:
        params["num_feat"] = int(_np(sd["conv_adapt.weight"]).shape[0])
    if "rrdb_trunk.0.rdb1.conv1.weight" in sd:
        params["num_grow_ch"] = int(_np(sd["rrdb_trunk.0.rdb1.conv1.weight"]).shape[0])
    n_rrdb = -1
    n_stages = -1
    for k in sd:
        if k.startswith("rrdb_trunk."):
            try:
                n_rrdb = max(n_rrdb, int(k.split(".")[1]))
            except ValueError:
                pass
        if k.startswith("hat.layers."):
            try:
                n_stages = max(n_stages, int(k.split(".")[2]))
            except ValueError:
                pass
    if n_rrdb >= 0:
        params["num_rrdb"] = n_rrdb + 1
    if n_stages >= 0:
        params["depths"] = tuple([6] * (n_stages + 1))
        params["num_heads"] = tuple([6] * (n_stages + 1))
    return params


def _cab(sd, prefix):
    # torch CAB Sequential: 0 conv, 1 GELU, 2 conv, 3 ChannelAttention
    return {
        "conv1": _conv(sd, prefix + ".cab.0"),
        "conv2": _conv(sd, prefix + ".cab.2"),
        "ca": {
            "ca_fc1": _conv(sd, prefix + ".cab.3.attention.1"),
            "ca_fc2": _conv(sd, prefix + ".cab.3.attention.3"),
        },
    }


def _hab(sd, p):
    return {
        "norm1": _ln(sd, p + ".norm1"),
        "norm2": _ln(sd, p + ".norm2"),
        "mlp": _mlp(sd, p + ".mlp"),
        "attn": {
            "relative_position_bias_table": vec(sd, p + ".attn.relative_position_bias_table"),
            "qkv": _dense(sd, p + ".attn.qkv"),
            "proj": _dense(sd, p + ".attn.proj"),
        },
        "conv_block": _cab(sd, p + ".conv_block"),
    }


def _ocab(sd, p):
    return {
        "norm1": _ln(sd, p + ".norm1"),
        "norm2": _ln(sd, p + ".norm2"),
        "mlp": _mlp(sd, p + ".mlp"),
        "qkv": _dense(sd, p + ".qkv"),
        "proj": _dense(sd, p + ".proj"),
        "relative_position_bias_table": vec(sd, p + ".relative_position_bias_table"),
    }


def hat_from_torch(sd: StateDict, depths, prefix: str = "") -> dict:
    """Build flax params for models.hat.HAT from a torch HAT state_dict."""
    g = lambda k: prefix + k  # noqa: E731
    out: dict[str, Any] = {
        "conv_first": _conv(sd, g("conv_first")),
        "norm": _ln(sd, g("norm")),
        "conv_after_body": _conv(sd, g("conv_after_body")),
    }
    if g("patch_embed.norm.weight") in sd:
        out["patch_norm"] = _ln(sd, g("patch_embed.norm"))
    if g("conv_before_upsample.0.weight") in sd:
        out["conv_before_upsample"] = _conv(sd, g("conv_before_upsample.0"))
        out["conv_last"] = _conv(sd, g("conv_last"))
        s = 0
        while g(f"upsample.{2 * s}.weight") in sd:
            out[f"upsample_{s}"] = _conv(sd, g(f"upsample.{2 * s}"))
            s += 1
    for i, depth in enumerate(depths):
        rg = g(f"layers.{i}.residual_group")
        layer: dict[str, Any] = {"conv": _conv(sd, g(f"layers.{i}.conv"))}
        for j in range(depth):
            layer[f"blocks_{j}"] = _hab(sd, f"{rg}.blocks.{j}")
        layer["overlap_attn"] = _ocab(sd, f"{rg}.overlap_attn")
        out[f"layers_{i}"] = layer
    return out


def hybrid_from_torch(sd: StateDict, params: dict) -> dict:
    """Build flax params for models.hybrid.HybridHATRealESRGAN."""
    out: dict[str, Any] = {
        "hat": hat_from_torch(sd, params["depths"], prefix="hat."),
        "conv_adapt": _conv(sd, "conv_adapt"),
        "conv_body": _conv(sd, "conv_body"),
        "conv_up": _conv(sd, "conv_up"),
        "conv_hr": _conv(sd, "conv_hr"),
        "conv_last": _conv(sd, "conv_last"),
    }
    for r in range(params["num_rrdb"]):
        rrdb = {}
        for b in range(1, 4):
            rdb = {}
            for cidx in range(1, 6):
                rdb[f"conv{cidx}"] = _conv(sd, f"rrdb_trunk.{r}.rdb{b}.conv{cidx}")
            rrdb[f"rdb{b}"] = rdb
        out[f"rrdb_trunk_{r}"] = rrdb
    return out


# --------------------------------------------------------------------------- #
# SRVGGNetCompact
# --------------------------------------------------------------------------- #
def srvgg_from_torch(sd: StateDict, num_conv: int = 16) -> dict:
    """torch body.{2i}=conv, body.{2i+1}=act(prelu weight) -> flax params."""
    out: dict[str, Any] = {"body_0": _conv(sd, "body.0")}
    if "body.1.weight" in sd:
        out["prelu_0"] = vec(sd, "body.1.weight")
    for i in range(1, num_conv + 1):
        out[f"body_{i}"] = _conv(sd, f"body.{2 * i}")
        if f"body.{2 * i + 1}.weight" in sd:
            out[f"prelu_{i}"] = vec(sd, f"body.{2 * i + 1}.weight")
    out["body_last"] = _conv(sd, f"body.{2 * (num_conv + 1)}")
    return out


# --------------------------------------------------------------------------- #
# Discriminators (spectral norm)
# --------------------------------------------------------------------------- #
def _sn_conv(sd, prefix, transpose=False):
    """Spectral-normed conv: torch stores weight_orig + weight_u/v."""
    wkey = prefix + ".weight_orig" if prefix + ".weight_orig" in sd else prefix + ".weight"
    w = _np(sd[wkey])
    if transpose:
        # torch ConvTranspose2d weight: (I, O, kh, kw)
        kernel = w.transpose(2, 3, 0, 1)  # -> (kh, kw, I, O)
    else:
        kernel = w.transpose(2, 3, 1, 0)
    p: dict[str, Any] = {"kernel": kernel}
    if prefix + ".bias" in sd:
        p["bias"] = vec(sd, prefix + ".bias")
    if prefix + ".weight_u" in sd:
        p["u"] = vec(sd, prefix + ".weight_u")
    if prefix + ".weight_v" in sd:
        p["v"] = vec(sd, prefix + ".weight_v")
    return p


def discriminator_swin_from_torch(sd: StateDict) -> tuple[dict, dict]:
    """Returns (params, spectral state u-vectors) for UNetDiscriminatorSNSwin."""
    params: dict[str, Any] = {}
    sn_state: dict[str, Any] = {}

    def put(name, prefix, transpose=False):
        # SNConv2d keeps kernel/bias directly on the module (no nn.Conv child)
        p = _sn_conv(sd, prefix, transpose)
        u = p.pop("u", None)
        v = p.pop("v", None)
        params[name] = p
        if u is not None:
            sn_state[name] = {"u": u}
            if v is not None:
                sn_state[name]["v"] = v

    put("conv0_0", "conv0.0")
    put("conv0_1", "conv0.2")
    for i in range(1, 5):
        put(f"conv{i}", f"conv{i}.model.0")
    for i in range(1, 5):
        put(f"up{i}", f"up{i}.model.0", transpose=True)
    put("final_0", "final_conv.0")
    put("final_1", "final_conv.2")
    return params, sn_state


def discriminator_hat_from_torch(sd: StateDict) -> tuple[dict, dict]:
    """Returns (params, spectral state) for UNetDiscriminatorSNHAT."""
    params: dict[str, Any] = {}
    sn_state: dict[str, Any] = {}
    # conv0 and conv9 are NOT spectral-normed in the reference
    # conv0/conv9 are plain Conv2d modules (inner nn.Conv named 'conv');
    # conv1..conv8 are SNConv2d with direct kernel params.
    params["conv0"] = {"conv": _sn_conv(sd, "conv0")}
    params["conv0"]["conv"].pop("u", None)
    params["conv0"]["conv"].pop("v", None)
    for i in range(1, 9):
        p = _sn_conv(sd, f"conv{i}")
        u = p.pop("u", None)
        v = p.pop("v", None)
        params[f"conv{i}"] = p
        if u is not None:
            sn_state[f"conv{i}"] = {"u": u}
            if v is not None:
                sn_state[f"conv{i}"]["v"] = v
    params["conv9"] = {"conv": _sn_conv(sd, "conv9")}
    params["conv9"]["conv"].pop("u", None)
    params["conv9"]["conv"].pop("v", None)
    return params, sn_state
