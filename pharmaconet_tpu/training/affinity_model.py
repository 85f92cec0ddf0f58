"""Trainable affinity model on frozen PharmacoNet features.

Rebuilds developer/src/model.py:15-61 + developer/src/network/: the frozen
trunk's run_extraction feeds a trainable PharmacophoreEncoder + GraphEncoder
+ simple interaction-sum AffinityHead; the loss is per-pocket MSE over the
ligand batch against capped affinities (dataset.py:49: min(affinity, 0)).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..proxy.gnn import GraphEncoder
from ..proxy.sbddreward import PharmacophoreEncoder


class DevAffinityHead(nn.Module):
    """Interaction-sum head (developer/src/network/head.py:6-43).

    FLAT-ATOM layout: the reference densifies to [N, Amax, K, h] only to
    mask and sum; every op is per-atom-row independent, so this build
    computes on the flat [V, K, h] batch and reduces with one segment sum
    (padded atoms carry atom_graph == num_graphs, the dropped sentinel) —
    no Amax padding traffic, and max_atoms disappears as a compile key.
    Same rationale as the SBDD ComplexFormer flat rewrite (PERF_NOTES)."""

    hidden_dim: int = 128

    @nn.compact
    def __call__(self, x_protein, x_ligand, atom_graph, atom_valid, num_graphs):
        z = jnp.einsum("ik,jk->ijk", x_ligand, x_protein)  # [V, K, h]
        z = jax.nn.leaky_relu(nn.Dense(self.hidden_dim, name="interaction_fc")(z), 0.01)
        z = nn.Dense(self.hidden_dim, name="affinity_fc1")(z)
        z = jax.nn.leaky_relu(z, 0.01)
        pair = nn.Dense(1, name="affinity_fc2")(z)[..., 0]  # [V, K]
        per_atom = (pair * atom_valid.astype(pair.dtype)[:, None]).sum(-1)  # [V]
        return jax.ops.segment_sum(
            per_atom, atom_graph, num_segments=num_graphs + 1
        )[:num_graphs]


class DevAffinityModel(nn.Module):
    """Trainable modules only — PharmacoNet features arrive precomputed."""

    hidden_dim: int = 128
    ligand_num_convs: int = 4

    def setup(self):
        self.pharmacophore_encoder = PharmacophoreEncoder(
            self.hidden_dim, name="pharmacophore_encoder"
        )
        self.ligand_encoder = GraphEncoder(
            hidden_dim=self.hidden_dim,
            out_dim=self.hidden_dim,
            num_convs=self.ligand_num_convs,
            categorical=False,
            name="ligand_encoder",
        )
        self.head = DevAffinityHead(self.hidden_dim, name="head")

    def __call__(self, multi_scale_features, hotspot_features, hotspot_positions,
                 batch_arrays, hotspot_valid=None):
        """Returns predicted affinities [N_ligand]. hotspot_valid ([K] bool,
        optional) masks padded hotspot rows EXACTLY: the encoder is
        row-independent over K and the head sums over K, so zeroing a
        padded row's protein embedding removes its contribution entirely —
        this is what lets the trainer bucket K and jit one program per
        shape bucket instead of running eagerly."""
        x_protein, _, _ = self.pharmacophore_encoder(
            multi_scale_features, hotspot_features, hotspot_positions
        )
        if hotspot_valid is not None:
            x_protein = jnp.where(hotspot_valid[:, None], x_protein, 0.0)
        x_ligand, _ = self.ligand_encoder(batch_arrays)
        atom_graph, atom_valid, num_graphs = batch_arrays[1], batch_arrays[2], batch_arrays[7]
        return self.head(x_protein, x_ligand, atom_graph, atom_valid, num_graphs)

    def loss(self, multi_scale_features, hotspot_features, hotspot_positions,
             batch_arrays, affinities, ligand_valid, hotspot_valid=None):
        pred = self(
            multi_scale_features, hotspot_features, hotspot_positions, batch_arrays,
            hotspot_valid,
        )
        err = (pred - affinities) ** 2
        denom = jnp.maximum(jnp.sum(ligand_valid), 1.0)
        return jnp.sum(err * ligand_valid) / denom
