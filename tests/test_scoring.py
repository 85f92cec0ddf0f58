"""Scoring tests: ligand graph construction + graph matching math."""

import math

import numpy as np
import pytest

from pharmaconet_tpu.chem.smallmol import parse_sdf
from pharmaconet_tpu.pharmacophore.model import PharmacophoreModel
from pharmaconet_tpu.scoring.graph_match import GraphMatcher
from pharmaconet_tpu.scoring.ligand import Ligand

from helpers import ETHANOL_SDF, _model_state

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


def test_scoring_smiles_default_engine_no_rdkit():
    """scoring_smiles no longer hard-requires RDKit: the default engine
    falls back to in-house distance geometry (chem/embed.py) when RDKit
    is absent. The rdkit-specific gate lives in test_embed.py."""
    lig = Ligand.load_from_smiles("CCO", num_conformers=3)
    assert lig.num_conformers == 3
    assert lig.num_atoms == 3
