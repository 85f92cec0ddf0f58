"""Torch checkpoint → flax parameter conversion.

The published PharmacoNet weights ship as a torch tar
(/root/reference/src/pmnet/module.py:82-93: keys 'config', 'model',
'score_distributions'). This module maps that state dict onto the flax
parameter tree of ``network.model.PharmacoNetModel``, and can synthesize a
random torch-format state dict for converter/architecture tests when the
real checkpoint is unavailable.

Torch → flax layout rules:
  * Linear weight [out, in]        -> Dense kernel [in, out] (transpose)
  * Conv3d weight [o, i, kd,kh,kw] -> Conv kernel [kd,kh,kw, i, o]
  * LayerNorm weight/bias          -> scale/bias
  * BatchNorm3d weight/bias/running_mean/running_var
                                   -> FrozenBatchNorm scale/bias/mean/var
"""

from __future__ import annotations

import io
from pathlib import Path
from typing import Any

import numpy as np

DEPTHS = (2, 6, 2, 2)
NUM_STAGES = 4
EMBED_DIM = 96
NUM_HEADS = (3, 6, 12, 24)
IN_CHANNELS = 33
TOKEN_DIM = 192
NUM_LEVELS = 5
FPN_NUM_CONVS = (1, 2, 2, 2, 2)
EMBED_FPN_CHANNELS = (33, 96, 192, 384, 768)
MASK_FPN_CHANNELS = (96,) * 5


def _dense(state: dict, prefix: str, bias: bool = True) -> dict:
    out = {"kernel": np.ascontiguousarray(np.asarray(state[f"{prefix}.weight"]).T)}
    if bias:
        out["bias"] = np.asarray(state[f"{prefix}.bias"])
    return out


def _conv(state: dict, prefix: str, bias: bool) -> dict:
    w = np.asarray(state[f"{prefix}.weight"])
    out = {"kernel": np.ascontiguousarray(np.transpose(w, (2, 3, 4, 1, 0)))}
    if bias:
        out["bias"] = np.asarray(state[f"{prefix}.bias"])
    return out


def _layernorm(state: dict, prefix: str) -> dict:
    return {
        "scale": np.asarray(state[f"{prefix}.weight"]),
        "bias": np.asarray(state[f"{prefix}.bias"]),
    }


def _batchnorm(state: dict, prefix: str) -> dict:
    return {
        "scale": np.asarray(state[f"{prefix}.weight"]),
        "bias": np.asarray(state[f"{prefix}.bias"]),
        "mean": np.asarray(state[f"{prefix}.running_mean"]),
        "var": np.asarray(state[f"{prefix}.running_var"]),
    }


def _base_conv(state: dict, prefix: str, has_norm: bool) -> dict:
    out = {"conv": _conv(state, f"{prefix}._conv", bias=not has_norm)}
    if has_norm:
        out["norm"] = _batchnorm(state, f"{prefix}._norm")
    return out


def _fpn_decoder(state: dict, prefix: str, num_levels: int = NUM_LEVELS) -> dict:
    out: dict[str, Any] = {}
    for level in range(num_levels - 1):
        out[f"lateral_{level}"] = _base_conv(
            state, f"{prefix}.lateral_conv_list.{level}", has_norm=True
        )
    for level in range(num_levels):
        for j in range(FPN_NUM_CONVS[level]):
            out[f"fpn_{level}_{j}"] = _base_conv(
                state, f"{prefix}.fpn_convs_list.{level}.{j}", has_norm=True
            )
    return out


def _attention(state: dict, prefix: str) -> dict:
    return {
        "logit_scale": np.asarray(state[f"{prefix}.logit_scale"]),
        "qkv_kernel": np.ascontiguousarray(np.asarray(state[f"{prefix}.qkv.weight"]).T),
        "q_bias": np.asarray(state[f"{prefix}.q_bias"]),
        "v_bias": np.asarray(state[f"{prefix}.v_bias"]),
        "cpb_fc1": _dense(state, f"{prefix}.cpb_mlp.0"),
        "cpb_fc2": _dense(state, f"{prefix}.cpb_mlp.2", bias=False),
        "proj": _dense(state, f"{prefix}.proj"),
    }


def convert_torch_state_dict(state: dict[str, np.ndarray]) -> dict:
    """Map the reference 'model' state dict onto the flax param tree."""
    backbone: dict[str, Any] = {
        "patch_embed_proj": _conv(state, "embedding.backbone.patch_embed.proj", bias=True),
        "patch_embed_norm": _layernorm(state, "embedding.backbone.patch_embed.norm"),
    }
    for i in range(NUM_STAGES):
        stage: dict[str, Any] = {}
        for j in range(DEPTHS[i]):
            p = f"embedding.backbone.layers.{i}.blocks.{j}"
            stage[f"blocks_{j}"] = {
                "norm1": _layernorm(state, f"{p}.norm1"),
                "norm2": _layernorm(state, f"{p}.norm2"),
                "attn": _attention(state, f"{p}.attn"),
                "mlp": {
                    "fc1": _dense(state, f"{p}.mlp.fc1"),
                    "fc2": _dense(state, f"{p}.mlp.fc2"),
                },
            }
        if i < NUM_STAGES - 1:
            p = f"embedding.backbone.layers.{i}.downsample"
            stage["downsample"] = {
                "reduction": _dense(state, f"{p}.reduction", bias=False),
                "norm": _layernorm(state, f"{p}.norm"),
            }
        backbone[f"layers_{i}"] = stage
    for i in range(NUM_STAGES):
        backbone[f"norm{i}"] = _layernorm(state, f"embedding.backbone.norm{i}")

    token_head: dict[str, Any] = {
        "interaction_embedding": {
            "embedding": np.asarray(state["token_head.interaction_embedding.weight"])
        }
    }
    for i in range(3):
        token_head[f"feature_mlp_{i}"] = _dense(state, f"token_head.feature_mlp.{2 * i}")
        token_head[f"score_mlp_{i}"] = _dense(state, f"token_head.score_mlp.{2 * i}")

    mask_head: dict[str, Any] = {
        "decoder": _fpn_decoder(state, "mask_head.decoder"),
        "conv_logits": _conv(state, "mask_head.conv_logits", bias=True),
    }
    for level in range(NUM_LEVELS):
        mask_head[f"background_mlp_{level}"] = _dense(
            state, f"mask_head.background_mlp_list.{level}"
        )
        mask_head[f"point_mlp_{level}"] = _dense(state, f"mask_head.point_mlp_list.{level}")

    params = {
        "backbone": backbone,
        "decoder": _fpn_decoder(state, "embedding.decoder"),
        "cavity_head": {
            "short_conv": _base_conv(state, "cavity_head.short_head.0", has_norm=True),
            "short_logit": _base_conv(state, "cavity_head.short_head.1", has_norm=False),
            "long_conv": _base_conv(state, "cavity_head.long_head.0", has_norm=True),
            "long_logit": _base_conv(state, "cavity_head.long_head.1", has_norm=False),
        },
        "token_head": token_head,
        "mask_head": mask_head,
    }
    return {"params": _to_f32(params)}


def _to_f32(tree):
    if isinstance(tree, dict):
        return {k: _to_f32(v) for k, v in tree.items()}
    return np.asarray(tree, dtype=np.float32)


# --------------------------------------------------------------------------
# Synthetic torch-format state dict (shape-exact) for tests without weights
# --------------------------------------------------------------------------
def synthesize_torch_state_dict(
    seed: int = 0, weight_scale: float = 1.0
) -> dict[str, np.ndarray]:
    """weight_scale multiplies every learned weight's init std (base 0.05).
    The default amplifies activations ~4x per conv (logits reach ~8e4,
    sigmoids saturate to exact 0/1 — good for activation-diff parity
    tests). The deep trunk sits on a razor's edge: 0.5x COLLAPSES logits
    to ~0 while 1.0x saturates; measured round 3, ~0.7x lands in between
    (token logits spread over a few units) — used with a scanned seed by
    the real-NN modeling parity harness."""
    rng = np.random.default_rng(seed)
    state: dict[str, np.ndarray] = {}

    def add(name: str, *shape: int, scale: float = 0.05) -> None:
        state[name] = rng.normal(0.0, scale * weight_scale, size=shape).astype(
            np.float32
        )

    def add_linear(prefix: str, din: int, dout: int, bias: bool = True) -> None:
        add(f"{prefix}.weight", dout, din)
        if bias:
            add(f"{prefix}.bias", dout)

    def add_conv(prefix: str, cin: int, cout: int, k: int, bias: bool) -> None:
        add(f"{prefix}.weight", cout, cin, k, k, k)
        if bias:
            add(f"{prefix}.bias", cout)

    def add_ln(prefix: str, dim: int) -> None:
        state[f"{prefix}.weight"] = np.ones(dim, dtype=np.float32)
        add(f"{prefix}.bias", dim)

    def add_bn(prefix: str, dim: int) -> None:
        state[f"{prefix}.weight"] = rng.uniform(0.5, 1.5, dim).astype(np.float32)
        add(f"{prefix}.bias", dim)
        add(f"{prefix}.running_mean", dim)
        state[f"{prefix}.running_var"] = rng.uniform(0.5, 1.5, dim).astype(np.float32)

    def add_base_conv(prefix: str, cin: int, cout: int, k: int, norm: bool) -> None:
        add_conv(f"{prefix}._conv", cin, cout, k, bias=not norm)
        if norm:
            add_bn(f"{prefix}._norm", cout)

    def add_fpn(prefix: str, channels: tuple[int, ...]) -> None:
        for level in range(NUM_LEVELS - 1):
            add_base_conv(f"{prefix}.lateral_conv_list.{level}", channels[level], 96, 1, True)
        for level in range(NUM_LEVELS):
            cin = channels[level] if level == NUM_LEVELS - 1 else 96
            for j in range(FPN_NUM_CONVS[level]):
                add_base_conv(
                    f"{prefix}.fpn_convs_list.{level}.{j}", cin if j == 0 else 96, 96, 3, True
                )

    # backbone
    add_conv("embedding.backbone.patch_embed.proj", IN_CHANNELS, EMBED_DIM, 2, bias=True)
    add_ln("embedding.backbone.patch_embed.norm", EMBED_DIM)
    for i in range(NUM_STAGES):
        dim = EMBED_DIM * 2**i
        for j in range(DEPTHS[i]):
            p = f"embedding.backbone.layers.{i}.blocks.{j}"
            add_ln(f"{p}.norm1", dim)
            add_ln(f"{p}.norm2", dim)
            state[f"{p}.attn.logit_scale"] = np.full(
                (NUM_HEADS[i], 1, 1), np.log(10.0), dtype=np.float32
            )
            add_linear(f"{p}.attn.qkv", dim, 3 * dim, bias=False)
            add(f"{p}.attn.q_bias", dim)
            add(f"{p}.attn.v_bias", dim)
            add_linear(f"{p}.attn.cpb_mlp.0", 3, 512)
            add_linear(f"{p}.attn.cpb_mlp.2", 512, NUM_HEADS[i], bias=False)
            add_linear(f"{p}.attn.proj", dim, dim)
            add_linear(f"{p}.mlp.fc1", dim, 4 * dim)
            add_linear(f"{p}.mlp.fc2", 4 * dim, dim)
        if i < NUM_STAGES - 1:
            add_linear(f"embedding.backbone.layers.{i}.downsample.reduction", 8 * dim, 2 * dim, bias=False)
            add_ln(f"embedding.backbone.layers.{i}.downsample.norm", 2 * dim)
        add_ln(f"embedding.backbone.norm{i}", EMBED_DIM * 2**i)

    add_fpn("embedding.decoder", EMBED_FPN_CHANNELS)

    add_base_conv("cavity_head.short_head.0", 96, 96, 3, True)
    add_base_conv("cavity_head.short_head.1", 96, 1, 1, False)
    add_base_conv("cavity_head.long_head.0", 96, 96, 3, True)
    add_base_conv("cavity_head.long_head.1", 96, 1, 1, False)

    add("token_head.interaction_embedding.weight", 10, EMBED_DIM, scale=0.5)
    for i in range(3):
        add_linear(f"token_head.feature_mlp.{2 * i}", 192 if i == 0 else TOKEN_DIM, TOKEN_DIM)
        add_linear(
            f"token_head.score_mlp.{2 * i}", TOKEN_DIM, TOKEN_DIM if i < 2 else 1
        )

    add_fpn("mask_head.decoder", MASK_FPN_CHANNELS)
    add_conv("mask_head.conv_logits", 96, 1, 1, bias=True)
    for level in range(NUM_LEVELS):
        add_linear(f"mask_head.background_mlp_list.{level}", TOKEN_DIM, 96)
        add_linear(f"mask_head.point_mlp_list.{level}", TOKEN_DIM, 96)

    return state


# --------------------------------------------------------------------------
# Checkpoint IO
# --------------------------------------------------------------------------
def load_reference_checkpoint(path: str | Path) -> tuple[dict, dict[str, np.ndarray], Any]:
    """Load the reference model.tar (torch serialization) and convert.

    Returns (flax_params, score_distributions, config). Requires torch.
    """
    import torch

    checkpoint = torch.load(path, map_location="cpu", weights_only=False)
    state = {k: v.numpy() for k, v in checkpoint["model"].items()}
    params = convert_torch_state_dict(state)
    score_distributions = {
        typ: np.asarray(dist["focus"], dtype=np.float32)
        for typ, dist in checkpoint["score_distributions"].items()
    }
    return params, score_distributions, checkpoint.get("config")


def save_npz_checkpoint(
    path: str | Path, params: dict, score_distributions: dict[str, np.ndarray]
) -> None:
    """Native checkpoint format: flat npz of params + score distributions."""
    flat: dict[str, np.ndarray] = {}

    def walk(tree, prefix):
        for key, value in tree.items():
            name = f"{prefix}/{key}" if prefix else key
            if isinstance(value, dict):
                walk(value, name)
            else:
                flat[f"P:{name}"] = np.asarray(value)

    walk(params, "")
    for typ, dist in score_distributions.items():
        flat[f"D:{typ}"] = np.asarray(dist)
    buffer = io.BytesIO()
    np.savez_compressed(buffer, **flat)
    Path(path).write_bytes(buffer.getvalue())


def load_npz_checkpoint(path: str | Path) -> tuple[dict, dict[str, np.ndarray]]:
    data = np.load(path)
    params: dict[str, Any] = {}
    score_distributions: dict[str, np.ndarray] = {}
    for key in data.files:
        if key.startswith("D:"):
            score_distributions[key[2:]] = data[key]
            continue
        parts = key[2:].split("/")
        node = params
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = data[key]
    return params, score_distributions

