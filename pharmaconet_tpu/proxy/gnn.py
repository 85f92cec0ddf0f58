"""Graph neural network blocks via segment ops (jraph-style).

Rebuilds the torch-geometric GINEConv stacks used by both proxies
(tacogfn_reward/proxy.py:277-334, sbddreward/network/ligand_encoder.py:10-84)
as segment-sum message passing on flat padded arrays — no torch-geometric.

GINEConv (pyg semantics): x_i' = nn((1+eps)*x_i + sum_{j->i} relu(x_j + lin(e_ji)))
with the reference's single-direction edges and nn = Linear + LeakyReLU.
Because the reference passes edge_dim=hidden_dim, pyg ALWAYS creates the
internal edge projection `lin` (Linear(edge_dim, in_channels)) and registers
the scalar `eps` buffer — both are present in the published checkpoints and
are mapped by the converters.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .data import NUM_ATOM_CLASSES, NUM_BOND_CLASSES


class GINEConv(nn.Module):
    hidden_dim: int

    @nn.compact
    def __call__(self, x, edge_src, edge_dst, edge_attr, edge_valid):
        eps = self.param("eps", nn.initializers.zeros, (1,))
        e = nn.Dense(self.hidden_dim, name="lin")(edge_attr)  # pyg internal lin
        messages = jax.nn.relu(x[edge_src] + e)  # [E, F]
        messages = jnp.where(edge_valid[:, None], messages, 0.0)
        agg = jax.ops.segment_sum(messages, edge_dst, num_segments=x.shape[0])
        h = nn.Dense(self.hidden_dim, name="nn_dense")((1.0 + eps[0]) * x + agg)
        return jax.nn.leaky_relu(h, negative_slope=0.01)


class GraphEncoder(nn.Module):
    """Shared GINE encoder: categorical (tacogfn) or dense (sbdd) inputs.

    Returns (X [V, out_dim] atom features, Z [N, out_dim] graph features)
    with gated sum/mean readout (ligand_encoder.py:74-84).
    """

    hidden_dim: int = 128
    out_dim: int = 256
    num_convs: int = 4
    categorical: bool = True  # Embedding inputs (tacogfn) vs Linear (sbdd)
    node_input_dim: int = NUM_ATOM_CLASSES
    edge_input_dim: int = NUM_BOND_CLASSES

    @nn.compact
    def __call__(self, batch_arrays):
        (atom_in, atom_graph, atom_valid, edge_src, edge_dst, edge_in, edge_valid,
         num_graphs) = batch_arrays
        if self.categorical:
            x = nn.Embed(self.node_input_dim, self.hidden_dim, name="node_layer")(atom_in)
            e = nn.Embed(self.edge_input_dim, self.hidden_dim, name="edge_layer")(edge_in)
        else:
            x = nn.Dense(self.hidden_dim, name="node_layer")(atom_in)
            e = nn.Dense(self.hidden_dim, name="edge_layer")(edge_in)
        x = jnp.where(atom_valid[:, None], x, 0.0)

        skip = x
        for i in range(self.num_convs):
            x = GINEConv(self.hidden_dim, name=f"conv_{i}")(x, edge_src, edge_dst, e, edge_valid)
            x = jnp.where(atom_valid[:, None], x, 0.0)
        x = skip + x

        atom_out = nn.Dense(self.out_dim, name="head_dense")(x)
        atom_out = nn.LayerNorm(epsilon=1e-5, name="head_norm")(atom_out)

        # gated sum/mean readout per graph
        z_sum = jax.ops.segment_sum(x, atom_graph, num_segments=num_graphs + 1)[:-1]
        counts = jax.ops.segment_sum(
            atom_valid.astype(jnp.float32), atom_graph, num_segments=num_graphs + 1
        )[:-1]
        z_mean = z_sum / jnp.maximum(counts, 1.0)[:, None]
        z = jnp.concatenate([z_sum, z_mean], axis=-1)
        z = nn.Dense(self.out_dim, name="readout_gate")(z) * nn.Dense(
            self.out_dim, name="readout_layer"
        )(z)
        return atom_out, z
