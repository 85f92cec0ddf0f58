"""Proxy checkpoint converters: synthesized torch state dicts -> flax trees.

Validates that convert_tacogfn_checkpoint / convert_sbddreward_checkpoint
produce exactly the parameter trees the flax modules expect (keys + shapes),
so the published .pth artifacts load without surprises.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pharmaconet_tpu.proxy.data import NUM_ATOM_FEATURES, NUM_BOND_FEATURES
from pharmaconet_tpu.proxy.proxies import SBDDReward_Proxy, TacoGFN_Proxy
from pharmaconet_tpu.proxy.sbddreward import convert_sbddreward_checkpoint
from pharmaconet_tpu.proxy.tacogfn import convert_tacogfn_checkpoint


def _flatten(tree, prefix=""):
    out = {}
    for key, value in tree.items():
        name = f"{prefix}/{key}" if prefix else key
        if isinstance(value, dict):
            out.update(_flatten(value, name))
        else:
            out[name] = tuple(np.shape(value))
    return out


def _synth_tacogfn_state(rng):
    state = {}

    def lin(prefix, din, dout, bias=True):
        state[f"{prefix}.weight"] = rng.normal(0, 0.02, (dout, din)).astype(np.float32)
        if bias:
            state[f"{prefix}.bias"] = np.zeros(dout, np.float32)

    def conv(prefix, cin, cout, k=3):
        state[f"{prefix}.weight"] = rng.normal(0, 0.02, (cout, cin, k, k, k)).astype(np.float32)
        state[f"{prefix}.bias"] = np.zeros(cout, np.float32)

    h = 256
    lin("token_mlp.1", 192, h)
    for i in range(5):
        conv(f"pocket_mlp_list.{i}.1", 96, h)
    lin("pocket_mlp.1", 5 * h, h)
    lin("concat_layer", 3 * h, h)
    lin("concat_gate.0", 3 * h, h)
    state["ligand_encoder.node_layer.weight"] = rng.normal(0, 0.1, (10, 128)).astype(np.float32)
    state["ligand_encoder.edge_layer.weight"] = rng.normal(0, 0.1, (5, 128)).astype(np.float32)
    for i in range(4):
        lin(f"ligand_encoder.conv_list.{i}.nn.0", 128, 128)
        lin(f"ligand_encoder.conv_list.{i}.lin", 128, 128)
        state[f"ligand_encoder.conv_list.{i}.eps"] = np.zeros(1, np.float32)
    lin("ligand_encoder.head.0", 128, 256)
    state["ligand_encoder.head.1.weight"] = np.ones(256, np.float32)
    state["ligand_encoder.head.1.bias"] = np.zeros(256, np.float32)
    lin("ligand_encoder.readout_layer", 256, 256)
    lin("ligand_encoder.readout_gate", 256, 256)
    lin("energy_bias_mlp.0", 2 * h, h)
    lin("energy_bias_mlp.2", h, 1)
    lin("interaction_mlp.0", h, h)
    lin("pair_energy_layer", h, 1)
    lin("pair_energy_gate.0", h, 1)
    return state


def _synth_sbdd_state(rng):
    state = {}

    def lin(prefix, din, dout, bias=True):
        state[f"{prefix}.weight"] = rng.normal(0, 0.02, (dout, din)).astype(np.float32)
        if bias:
            state[f"{prefix}.bias"] = np.zeros(dout, np.float32)

    def ln(prefix, dim):
        state[f"{prefix}.weight"] = np.ones(dim, np.float32)
        state[f"{prefix}.bias"] = np.zeros(dim, np.float32)

    def conv(prefix, cin, cout, k=3):
        state[f"{prefix}.weight"] = rng.normal(0, 0.02, (cout, cin, k, k, k)).astype(np.float32)
        state[f"{prefix}.bias"] = np.zeros(cout, np.float32)

    h = 128
    lin("pharmacophore_encoder.hotspot_mlp.1", 192, h)
    for i in range(5):
        conv(f"pharmacophore_encoder.pocket_mlp_list.{i}.1", 96, h)
    lin("pharmacophore_encoder.pocket_layer.1", 5 * h, h)
    lin("pharmacophore_encoder.pocket_layer.3", h, h)
    lin("ligand_encoder.node_layer", NUM_ATOM_FEATURES, h)
    lin("ligand_encoder.edge_layer", NUM_BOND_FEATURES, h)
    for i in range(4):
        lin(f"ligand_encoder.conv_list.{i}.nn.0", h, h)
        lin(f"ligand_encoder.conv_list.{i}.lin", h, h)
        state[f"ligand_encoder.conv_list.{i}.eps"] = np.zeros(1, np.float32)
    lin("ligand_encoder.head.0", h, h)
    ln("ligand_encoder.head.1", h)
    lin("ligand_encoder.readout_layer", 2 * h, h)
    lin("ligand_encoder.readout_gate", 2 * h, h)
    lin("head.interaction_mlp.0", h, h)
    lin("head.protein_pair_embedding", 16, h)
    for i in range(3):
        p = f"head.blocks.{i}"
        lin(f"{p}.tri_mul_update.linear_b", h, h)
        lin(f"{p}.tri_mul_update.linear_b_g.0", h, h)
        ln(f"{p}.tri_mul_update.layernorm_z", h)
        lin(f"{p}.tri_mul_update.linear_z", h, h)
        lin(f"{p}.tri_mul_update.linear_z_g.0", h, h)
        lin(f"{p}.tri_mul_update.linear_o", h, h)
        lin(f"{p}.tri_mul_update.linear_o_g.0", h, h)
        ln(f"{p}.tri_attention.layer_norm", h)
        lin(f"{p}.tri_attention.mha.linear_q", h, (h // 4) * 4, bias=False)
        lin(f"{p}.tri_attention.mha.linear_k", h, (h // 4) * 4, bias=False)
        lin(f"{p}.tri_attention.mha.linear_v", h, (h // 4) * 4, bias=False)
        lin(f"{p}.tri_attention.mha.linear_o", (h // 4) * 4, h)
        lin(f"{p}.tri_attention.mha.linear_g", h, (h // 4) * 4)
        ln(f"{p}.transition.layer_norm", h)
        lin(f"{p}.transition.linear_1", h, 4 * h)
        lin(f"{p}.transition.linear_2", 4 * h, h)
    lin("head.mlp_mu.0", h, h)
    lin("head.mlp_mu.2", h, 1)
    lin("head.mlp_std.0", h, h)
    lin("head.mlp_std.2", h, 1)
    lin("head.mlp_sigma_bias.0", 2 * h, h)
    lin("head.mlp_sigma_bias.2", h, 1)
    lin("head.mlp_sigma", h, 1)
    lin("head.gate_sigma.0", h, 1)
    # present in the reference but unused at inference: ignored by converter
    lin("head.linear_distance", h, 1)
    return state


def test_tacogfn_converter_structure():
    rng = np.random.default_rng(0)
    converted = convert_tacogfn_checkpoint(_synth_tacogfn_state(rng))
    proxy = TacoGFN_Proxy()
    proxy._init_random()
    init_flat = _flatten(jax.tree.map(np.asarray, proxy.params)["params"])
    conv_flat = _flatten(converted["params"])
    assert set(init_flat) == set(conv_flat), sorted(set(init_flat) ^ set(conv_flat))[:8]
    for key in init_flat:
        assert init_flat[key] == conv_flat[key], (key, init_flat[key], conv_flat[key])
    # converted params run
    proxy.params = jax.tree.map(jnp.asarray, converted)
    features = [jnp.zeros((1, d, d, d, 96)) for d in (4, 8, 16, 32, 64)]
    infos = [
        {"hotspot_feature": np.ones(192, np.float32), "hotspot_position": (0.0, 0.0, 0.0)}
    ]
    cache = proxy._get_cache(features, infos)
    scores = proxy._scoring_list(cache, ["CCO", "c1ccccc1"])
    assert np.isfinite(scores).all()


def test_sbdd_converter_structure():
    rng = np.random.default_rng(1)
    converted = convert_sbddreward_checkpoint(_synth_sbdd_state(rng))
    proxy = SBDDReward_Proxy()
    proxy._init_random()
    init_flat = _flatten(jax.tree.map(np.asarray, proxy.params)["params"])
    conv_flat = _flatten(converted["params"])
    assert set(init_flat) == set(conv_flat), sorted(set(init_flat) ^ set(conv_flat))[:8]
    for key in init_flat:
        assert init_flat[key] == conv_flat[key], (key, init_flat[key], conv_flat[key])
    proxy.params = jax.tree.map(jnp.asarray, converted)
    features = [jnp.zeros((1, d, d, d, 96)) for d in (4, 8, 16, 32, 64)]
    infos = [
        {"hotspot_feature": np.ones(192, np.float32), "hotspot_position": (1.0, 2.0, 3.0)}
    ]
    cache = proxy._get_cache(features, infos)
    scores = proxy._scoring_list(cache, ["CCO", "c1ccccc1"])
    assert np.isfinite(scores).all()
