"""Scoring tests: ligand graph construction + graph matching math."""

import math

import numpy as np
import pytest

from pharmaconet_tpu.chem.smallmol import parse_sdf
from pharmaconet_tpu.pharmacophore.model import PharmacophoreModel
from pharmaconet_tpu.scoring.graph_match import GraphMatcher
from pharmaconet_tpu.scoring.ligand import Ligand

ETHANOL_SDF = """ethanol
  test

  3  2  0  0  0  0  0  0  0  0999 V2000
    0.0000    0.0000    0.0000 C   0  0
    1.5000    0.0000    0.0000 C   0  0
    2.2000    1.2000    0.0000 O   0  0
  1  2  1  0
  2  3  1  0
M  END
$$$$
"""


def _model_state(nodes, clusters):
    """Build a PharmacophoreModel state dict from simple node/cluster specs.

    nodes: [(pharmacophore_type, interaction_type, center, radius)]
    clusters: [(cluster_type, [node indices])]
    """
    n = len(nodes)
    edges = []
    edge_index = {}
    for i in range(n):
        for j in range(i, n):
            ci = np.array(nodes[i][2])
            cj = np.array(nodes[j][2])
            mean = float(np.linalg.norm(ci - cj))
            std = math.sqrt(nodes[i][3] ** 2 + nodes[j][3] ** 2)
            edge_index[(i, j)] = len(edges)
            edge_index[(j, i)] = len(edges)
            edges.append(
                dict(
                    index=len(edges),
                    node_indices=(i, j),
                    edge_type=(nodes[i][0], nodes[j][0]),
                    distance_mean=mean,
                    distance_std=std,
                )
            )
    node_dicts = []
    for i, (ptype, itype, center, radius) in enumerate(nodes):
        node_dicts.append(
            dict(
                index=i,
                type=ptype,
                interaction_type=itype,
                hotspot_position=(0.0, 0.0, 0.0),
                score=1.0,
                center=tuple(center),
                radius=radius,
                neighbor_edge_dict={j: edge_index[(i, j)] for j in range(n)},
                overlapped_nodes=[],
            )
        )
    cluster_dict = {k: [] for k in ["Cation", "Anion", "HBond", "Aromatic", "Hydrophobic", "Halogen"]}
    for ctype, idxs in clusters:
        centers = np.array([nodes[i][2] for i in idxs])
        center = centers.mean(axis=0)
        radii = np.array([nodes[i][3] * 2 for i in idxs])
        size = float(np.max(np.linalg.norm(centers - center, axis=-1) + radii))
        cluster_dict[ctype].append(
            dict(
                cluster_type=ctype,
                node_indices=tuple(idxs),
                node_types=tuple({nodes[i][0] for i in idxs}),
                center=tuple(center.tolist()),
                size=size,
            )
        )
    interaction_types = {
        "Hydrophobic": "Hydrophobic", "Aromatic": "PiStacking_P", "Cation": "PiCation_pring",
        "Anion": "SaltBridge_lneg", "HBond_donor": "HBond_ldon",
        "HBond_acceptor": "HBond_pdon", "Halogen": "XBond",
    }
    node_dict = {t: [] for t in interaction_types.values()}
    for i, (ptype, itype, _, _) in enumerate(nodes):
        node_dict.setdefault(itype, []).append(i)
    return dict(
        pdbblock="",
        nodes=node_dicts,
        edges=edges,
        node_cluster_dict=cluster_dict,
        node_dict=node_dict,
    )


def test_ligand_graph_ethanol():
    mol = parse_sdf(ETHANOL_SDF)[0]
    ligand = Ligand(mol)
    graph = ligand.graph
    # nodes: C1 hydrophobic; O donor+acceptor (merged into one node)
    types = {tuple(sorted(n.types)) for n in graph.nodes}
    assert ("Hydrophobic",) in types
    assert ("HBond_acceptor", "HBond_donor") in types
    # clusters: one Hydrophobic, one HBond
    cluster_types = sorted(c.type for c in graph.node_clusters)
    assert cluster_types == ["HBond", "Hydrophobic"]
    assert graph.num_conformers == 1


def test_graph_match_exact_score():
    """Two 1-node clusters matching at the exact model distance."""
    mol = parse_sdf(ETHANOL_SDF)[0]
    ligand = Ligand(mol)
    # ligand distance between C1 (0,0,0) and O (2.2,1.2,0)
    d_lig = float(np.linalg.norm([2.2, 1.2, 0.0]))

    radius = 1.0
    state = _model_state(
        nodes=[
            ("Hydrophobic", "Hydrophobic", (0.0, 0.0, 0.0), radius),
            ("HBond_donor", "HBond_ldon", (d_lig, 0.0, 0.0), radius),
        ],
        clusters=[("Hydrophobic", [0]), ("HBond", [1])],
    )
    model = PharmacophoreModel()
    model.__setstate__(state)

    score = GraphMatcher(model, ligand).run()
    # expected: single cross-pair block, M=N=1, mu == d -> exp(0)
    std = math.sqrt(2.0) * radius
    expected = 4.0 * 1.0 / std  # w_HBond_donor * w_Hydrophobic / std
    assert score == pytest.approx(expected, rel=1e-5)


def test_graph_match_distance_penalty():
    """Score decays with the Gaussian of distance mismatch."""
    mol = parse_sdf(ETHANOL_SDF)[0]
    ligand = Ligand(mol)
    d_lig = float(np.linalg.norm([2.2, 1.2, 0.0]))
    radius = 1.0
    offset = 1.0
    state = _model_state(
        nodes=[
            ("Hydrophobic", "Hydrophobic", (0.0, 0.0, 0.0), radius),
            ("HBond_donor", "HBond_ldon", (d_lig + offset, 0.0, 0.0), radius),
        ],
        clusters=[("Hydrophobic", [0]), ("HBond", [1])],
    )
    model = PharmacophoreModel()
    model.__setstate__(state)
    score = GraphMatcher(model, ligand).run()
    std = math.sqrt(2.0) * radius
    expected = 4.0 / std * math.exp(-0.5 * (offset / std) ** 2)
    assert score == pytest.approx(expected, rel=1e-5)


def test_graph_match_no_geometric_match():
    """A model far beyond ligand geometry scores 0 (pruned or failed)."""
    mol = parse_sdf(ETHANOL_SDF)[0]
    ligand = Ligand(mol)
    state = _model_state(
        nodes=[
            ("Hydrophobic", "Hydrophobic", (0.0, 0.0, 0.0), 0.5),
            ("HBond_donor", "HBond_ldon", (40.0, 0.0, 0.0), 0.5),
        ],
        clusters=[("Hydrophobic", [0]), ("HBond", [1])],
    )
    model = PharmacophoreModel()
    model.__setstate__(state)
    assert GraphMatcher(model, ligand).run() == 0.0


def test_model_pm_roundtrip(tmp_path):
    state = _model_state(
        nodes=[
            ("Hydrophobic", "Hydrophobic", (0.0, 0.0, 0.0), 1.0),
            ("HBond_donor", "HBond_ldon", (3.0, 0.0, 0.0), 1.0),
        ],
        clusters=[("Hydrophobic", [0]), ("HBond", [1])],
    )
    model = PharmacophoreModel()
    model.__setstate__(state)
    for suffix in (".pm", ".json"):
        path = tmp_path / f"model{suffix}"
        model.save(path)
        loaded = PharmacophoreModel.load(path)
        assert len(loaded.nodes) == 2
        assert len(loaded.edges) == 3
        assert {c.type for c in loaded.node_clusters} == {"Hydrophobic", "HBond"}
        mol = parse_sdf(ETHANOL_SDF)[0]
        s1 = model.scoring_mol(mol)
        s2 = loaded.scoring_mol(mol)
        assert s1 == pytest.approx(s2, rel=1e-6)
