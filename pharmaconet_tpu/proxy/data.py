"""Ligand graph featurization for the docking proxies.

Rebuilds /root/reference/src/pmnet_appl/tacogfn_reward/data.py:28-51 and
sbddreward/data.py:10-94 on the in-house SMILES parser, producing padded
jraph-style batches (concatenated nodes/edges + graph ids) instead of
torch-geometric Batch objects.

Edge direction note: the reference emits ONE directed edge per bond
(begin -> end, as OBMolBondIter yields them) and torch-geometric GINEConv
aggregates at the target only. That asymmetric message flow is reproduced.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..chem.smallmol import Molecule
from ..chem.smiles import parse_smiles

ATOM_CLASS = {6: 0, 7: 1, 8: 2, 9: 3, 15: 4, 16: 5, 17: 6, 35: 7, 53: 8}
UNKNOWN_ATOM = 9
NUM_ATOM_CLASSES = 10
NUM_BOND_CLASSES = 5  # single, double, triple, aromatic, unknown

# sbddreward 14-d atom features: 10 type + 2 chirality + 2 charge
NUM_ATOM_FEATURES = NUM_ATOM_CLASSES + 2 + 2
NUM_BOND_FEATURES = NUM_BOND_CLASSES


def _bond_class(order: int, aromatic: bool) -> int:
    if aromatic or order == 4:
        return 3
    return {1: 0, 2: 1, 3: 2}.get(order, 4)


@dataclass
class LigandGraphArrays:
    """One molecular graph as flat arrays (H-stripped)."""

    atom_class: np.ndarray  # [V] int32
    atom_features: np.ndarray  # [V, 14] float32 (sbdd featurization)
    edge_src: np.ndarray  # [E] int32 (directed: bond begin)
    edge_dst: np.ndarray  # [E] int32 (bond end)
    edge_class: np.ndarray  # [E] int32
    edge_features: np.ndarray  # [E, 5] float32

    @property
    def num_atoms(self) -> int:
        return len(self.atom_class)


def mol_to_graph(mol: Molecule) -> LigandGraphArrays:
    mol = mol.strip_hydrogens() if any(a.atomic_num == 1 for a in mol.atoms) else mol
    v = mol.num_atoms
    atom_class = np.full(v, UNKNOWN_ATOM, dtype=np.int32)
    atom_features = np.zeros((v, NUM_ATOM_FEATURES), dtype=np.float32)
    for i, atom in enumerate(mol.atoms):
        cls = ATOM_CLASS.get(atom.atomic_num, UNKNOWN_ATOM)
        atom_class[i] = cls
        atom_features[i, cls] = 1.0
        chirality = getattr(atom, "chirality", 0)
        if chirality == 2:  # @@ = clockwise (sbdd data.py:50-54)
            atom_features[i, NUM_ATOM_CLASSES + 0] = 1.0
        elif chirality == 1:
            atom_features[i, NUM_ATOM_CLASSES + 1] = 1.0
        if atom.charge > 0:
            atom_features[i, NUM_ATOM_CLASSES + 2] = 1.0
        elif atom.charge < 0:
            atom_features[i, NUM_ATOM_CLASSES + 3] = 1.0

    e = len(mol.bonds)
    edge_src = np.zeros(e, dtype=np.int32)
    edge_dst = np.zeros(e, dtype=np.int32)
    edge_class = np.zeros(e, dtype=np.int32)
    edge_features = np.zeros((e, NUM_BOND_FEATURES), dtype=np.float32)
    for k, bond in enumerate(mol.bonds):
        edge_src[k] = bond.a
        edge_dst[k] = bond.b
        cls = _bond_class(bond.order, bond.aromatic)
        edge_class[k] = cls
        edge_features[k, cls] = 1.0
    return LigandGraphArrays(
        atom_class, atom_features, edge_src, edge_dst, edge_class, edge_features
    )


def smi2graph(smiles: str) -> LigandGraphArrays:
    return mol_to_graph(parse_smiles(smiles))


@dataclass
class GraphBatch:
    """Concatenated padded batch: jraph-style segment layout."""

    atom_class: np.ndarray  # [Vp]
    atom_features: np.ndarray  # [Vp, 14]
    atom_graph: np.ndarray  # [Vp] graph id (num_graphs for padding)
    atom_valid: np.ndarray  # [Vp] bool
    edge_src: np.ndarray  # [Ep]
    edge_dst: np.ndarray  # [Ep]
    edge_class: np.ndarray  # [Ep]
    edge_features: np.ndarray  # [Ep, 5]
    edge_valid: np.ndarray  # [Ep] bool
    num_graphs: int
    num_atoms: np.ndarray  # [N] real atom counts


def _round_up(n: int, multiple: int = 128) -> int:
    return max(multiple, (n + multiple - 1) // multiple * multiple)


def half_octave(n: int, minimum: int = 8) -> int:
    """Shape bucket: powers of two plus midpoints (8, 12, 16, 24, 32, ...).
    Bounds the number of distinct compiled program shapes to O(log n)."""
    b = minimum
    while b < n:
        b2 = b + b // 2
        if n <= b2:
            return b2
        b *= 2
    return b


def batch_graphs(
    graphs: list[LigandGraphArrays],
    pad_multiple: int = 128,
    num_graphs_pad: int | None = None,
) -> GraphBatch:
    """num_graphs_pad pads the GRAPH axis (fake empty graphs beyond the real
    ones): segment ops see empty segments, dense batching gives them empty
    masks, and callers slice results to the real count. Together with
    half_octave atom/edge padding this keeps the per-call compiled-shape
    signature (num_graphs, Vp, Ep) to a handful of buckets instead of one
    program per distinct batch composition (an RL loop scoring variable
    batches would otherwise recompile nearly every call)."""
    ng = num_graphs_pad if num_graphs_pad is not None else len(graphs)
    assert ng >= len(graphs)
    total_v = sum(g.num_atoms for g in graphs)
    total_e = sum(len(g.edge_src) for g in graphs)
    vp = _round_up(total_v, pad_multiple)
    ep = _round_up(max(total_e, 1), pad_multiple)

    atom_class = np.full(vp, 0, dtype=np.int32)
    atom_features = np.zeros((vp, NUM_ATOM_FEATURES), dtype=np.float32)
    atom_graph = np.full(vp, ng, dtype=np.int32)
    atom_valid = np.zeros(vp, dtype=bool)
    edge_src = np.full(ep, vp - 1, dtype=np.int32)
    edge_dst = np.full(ep, vp - 1, dtype=np.int32)
    edge_class = np.zeros(ep, dtype=np.int32)
    edge_features = np.zeros((ep, NUM_BOND_FEATURES), dtype=np.float32)
    edge_valid = np.zeros(ep, dtype=bool)

    v_off = e_off = 0
    for gi, g in enumerate(graphs):
        v, e = g.num_atoms, len(g.edge_src)
        atom_class[v_off : v_off + v] = g.atom_class
        atom_features[v_off : v_off + v] = g.atom_features
        atom_graph[v_off : v_off + v] = gi
        atom_valid[v_off : v_off + v] = True
        edge_src[e_off : e_off + e] = g.edge_src + v_off
        edge_dst[e_off : e_off + e] = g.edge_dst + v_off
        edge_class[e_off : e_off + e] = g.edge_class
        edge_features[e_off : e_off + e] = g.edge_features
        edge_valid[e_off : e_off + e] = True
        v_off += v
        e_off += e

    return GraphBatch(
        atom_class, atom_features, atom_graph, atom_valid,
        edge_src, edge_dst, edge_class, edge_features, edge_valid,
        num_graphs=ng,
        num_atoms=np.array([g.num_atoms for g in graphs], dtype=np.int32),
    )
