"""TacoGFN docking-score proxy (flax).

Rebuilds /root/reference/src/pmnet_appl/tacogfn_reward/proxy.py:39-334:
per-scale SiLU+Conv3d(3, VALID) pools + token MLP produce a pocket cache;
a GINE ligand encoder and an atom x hotspot interaction map with gated pair
energies + a graph-level bias produce affinities. Channel-last features.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .data import GraphBatch
from .gnn import GraphEncoder

HIDDEN = 256
TOKEN_DIM = 192
NUM_SCALES = 5


class TacoAffinityHead(nn.Module):
    """Pocket conditioning + ligand scoring (tacogfn proxy.py:108-274)."""

    hidden_dim: int = HIDDEN

    def setup(self):
        self.token_mlp = nn.Dense(self.hidden_dim, name="token_mlp")
        self.pocket_convs = [
            nn.Conv(self.hidden_dim, kernel_size=(3, 3, 3), padding="VALID", name=f"pocket_conv_{i}")
            for i in range(NUM_SCALES)
        ]
        self.pocket_mlp = nn.Dense(self.hidden_dim, name="pocket_mlp")
        self.concat_layer = nn.Dense(self.hidden_dim, name="concat_layer")
        self.concat_gate = nn.Dense(self.hidden_dim, name="concat_gate")
        self.ligand_encoder = GraphEncoder(
            hidden_dim=128, out_dim=256, num_convs=4, categorical=True, name="ligand_encoder"
        )
        self.ligand_layer_atom = (
            nn.Dense(self.hidden_dim, name="ligand_layer_atom") if 256 != self.hidden_dim else None
        )
        self.ligand_layer_graph = (
            nn.Dense(self.hidden_dim, name="ligand_layer_graph") if 256 != self.hidden_dim else None
        )
        self.energy_bias_fc1 = nn.Dense(self.hidden_dim, name="energy_bias_fc1")
        self.energy_bias_fc2 = nn.Dense(1, name="energy_bias_fc2")
        self.interaction_fc = nn.Dense(self.hidden_dim, name="interaction_fc")
        self.pair_energy_layer = nn.Dense(1, name="pair_energy_layer")
        self.pair_energy_gate = nn.Dense(1, name="pair_energy_gate")

    def ready_to_calculate(self, multi_scale_features, hotspot_features):
        """multi_scale_features: top-down [[1, d, h, w, 96] x5] channel-last;
        hotspot_features: [K, 192].

        Returns (pocket_features [hidden], hotspot_features [K, hidden]).
        """
        bottom_up = multi_scale_features[::-1]
        pooled = []
        for conv, feature in zip(self.pocket_convs, bottom_up):
            h = conv(jax.nn.silu(feature))  # [1, d-2, h-2, w-2, hidden]
            pooled.append(jnp.mean(h, axis=(1, 2, 3))[0])  # [hidden]
        pocket = self.pocket_mlp(jax.nn.silu(jnp.concatenate(pooled, axis=-1)))

        token = self.token_mlp(jax.nn.silu(hotspot_features))  # [K, hidden]
        if token.shape[0] == 0:
            token_summary = jnp.zeros((2 * self.hidden_dim,), dtype=pocket.dtype)
        else:
            token_summary = jnp.concatenate([token.sum(0), token.mean(0)])
        concat = jnp.concatenate([pocket, token_summary], axis=-1)  # [3*hidden]
        pocket = self.concat_layer(concat) * jax.nn.sigmoid(self.concat_gate(concat))
        return pocket, token

    def ready_to_calculate_masked(self, multi_scale_features, hotspot_features, valid):
        """`ready_to_calculate` on a PADDED hotspot axis: hotspot_features is
        [T, 192] for all candidate tokens and `valid` [T] marks the kept ones.
        The token summary sums/means over valid rows only, so the result
        equals the exact path on the kept subset (callers select the valid
        token rows host-side). This is the shard_map-friendly form used by
        the mesh cache builder (parallel/proxy.py) — static shapes, no
        boolean gather on device."""
        bottom_up = multi_scale_features[::-1]
        pooled = []
        for conv, feature in zip(self.pocket_convs, bottom_up):
            h = conv(jax.nn.silu(feature))
            pooled.append(jnp.mean(h, axis=(1, 2, 3))[0])
        pocket = self.pocket_mlp(jax.nn.silu(jnp.concatenate(pooled, axis=-1)))

        token = self.token_mlp(jax.nn.silu(hotspot_features))  # [T, hidden]
        w = valid.astype(token.dtype)[:, None]
        total = (token * w).sum(0)
        count = jnp.maximum(w.sum(), 1.0)  # count==0 -> zeros, the K=0 branch
        token_summary = jnp.concatenate([total, total / count])
        concat = jnp.concatenate([pocket, token_summary], axis=-1)
        pocket = self.concat_layer(concat) * jax.nn.sigmoid(self.concat_gate(concat))
        return pocket, token

    def calculate_affinity(self, pocket_features, hotspot_features, batch: tuple):
        """pocket_features [hidden]; hotspot_features [K, hidden]; batch =
        (atom_class, atom_graph, atom_valid, edge_src, edge_dst, edge_class,
        edge_valid, num_graphs). Returns affinity [N]."""
        x_atoms, z_graphs = self.ligand_encoder(batch)
        return self.affinity_from_encodings(
            pocket_features, hotspot_features, x_atoms, z_graphs,
            batch[1], batch[2], batch[7],
        )

    def affinity_from_encodings(
        self, pocket_features, hotspot_features, x_atoms, z_graphs,
        atom_graph, atom_valid, num_graphs,
    ):
        """Post-encoder affinity math (proxy.py:256-274), split out so it can
        be parity-tested against the reference with injected encodings."""
        if self.ligand_layer_atom is not None:
            x_atoms = self.ligand_layer_atom(x_atoms)
        if self.ligand_layer_graph is not None:
            z_graphs = self.ligand_layer_graph(z_graphs)

        # atom x hotspot interaction map (proxy.py:256-267)
        interaction = jnp.einsum("ik,jk->ijk", x_atoms, hotspot_features)
        interaction = jax.nn.leaky_relu(self.interaction_fc(interaction), negative_slope=0.01)
        pair = self.pair_energy_layer(interaction) * jax.nn.sigmoid(
            self.pair_energy_gate(interaction)
        )  # [V, K, 1]
        pair = jnp.where(atom_valid[:, None, None], pair, 0.0)
        per_atom = pair.sum((1, 2))  # [V]
        pair_energy = jax.ops.segment_sum(per_atom, atom_graph, num_segments=num_graphs + 1)[:-1]

        pocket_rep = jnp.broadcast_to(pocket_features[None], (z_graphs.shape[0], self.hidden_dim))
        bias_in = jnp.concatenate([pocket_rep, z_graphs], axis=-1)
        bias = self.energy_bias_fc2(
            jax.nn.leaky_relu(self.energy_bias_fc1(bias_in), negative_slope=0.01)
        )
        return pair_energy + bias[:, 0]

    def __call__(self, multi_scale_features, hotspot_features, batch):
        pocket, token = self.ready_to_calculate(multi_scale_features, hotspot_features)
        return self.calculate_affinity(pocket, token, batch)


def graph_batch_to_arrays(batch: GraphBatch, categorical: bool = True) -> tuple:
    atom_in = batch.atom_class if categorical else batch.atom_features
    edge_in = batch.edge_class if categorical else batch.edge_features
    return (
        jnp.asarray(atom_in),
        jnp.asarray(batch.atom_graph),
        jnp.asarray(batch.atom_valid),
        jnp.asarray(batch.edge_src),
        jnp.asarray(batch.edge_dst),
        jnp.asarray(edge_in),
        jnp.asarray(batch.edge_valid),
        batch.num_graphs,
    )


def convert_tacogfn_checkpoint(state: dict[str, np.ndarray]) -> dict:
    """Map the reference TacoGFN AffinityHead state dict to flax params."""

    def dense(prefix, bias=True):
        out = {"kernel": np.ascontiguousarray(np.asarray(state[f"{prefix}.weight"]).T)}
        if bias:
            out["bias"] = np.asarray(state[f"{prefix}.bias"])
        return out

    def conv3d(prefix):
        w = np.asarray(state[f"{prefix}.weight"])
        return {
            "kernel": np.ascontiguousarray(np.transpose(w, (2, 3, 4, 1, 0))),
            "bias": np.asarray(state[f"{prefix}.bias"]),
        }

    encoder = {
        "node_layer": {"embedding": np.asarray(state["ligand_encoder.node_layer.weight"])},
        "edge_layer": {"embedding": np.asarray(state["ligand_encoder.edge_layer.weight"])},
        "head_dense": dense("ligand_encoder.head.0"),
        "head_norm": {
            "scale": np.asarray(state["ligand_encoder.head.1.weight"]),
            "bias": np.asarray(state["ligand_encoder.head.1.bias"]),
        },
        "readout_layer": dense("ligand_encoder.readout_layer"),
        "readout_gate": dense("ligand_encoder.readout_gate"),
    }
    for i in range(4):
        encoder[f"conv_{i}"] = {
            "nn_dense": dense(f"ligand_encoder.conv_list.{i}.nn.0"),
            "lin": dense(f"ligand_encoder.conv_list.{i}.lin"),
            "eps": np.asarray(state[f"ligand_encoder.conv_list.{i}.eps"]).reshape(1),
        }

    params = {
        "token_mlp": dense("token_mlp.1"),
        "pocket_mlp": dense("pocket_mlp.1"),
        "concat_layer": dense("concat_layer"),
        "concat_gate": dense("concat_gate.0"),
        "ligand_encoder": encoder,
        "energy_bias_fc1": dense("energy_bias_mlp.0"),
        "energy_bias_fc2": dense("energy_bias_mlp.2"),
        "interaction_fc": dense("interaction_mlp.0"),
        "pair_energy_layer": dense("pair_energy_layer"),
        "pair_energy_gate": dense("pair_energy_gate.0"),
    }
    for i in range(NUM_SCALES):
        params[f"pocket_conv_{i}"] = conv3d(f"pocket_mlp_list.{i}.1")
    return {"params": params}
