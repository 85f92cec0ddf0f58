"""Golden pharmacophore-perception corpus: drug-like molecules with
hand-derived expected node inventories.

Each expectation below was derived BY HAND from the reference rule
semantics (/root/reference/src/pmnet/scoring/ligand_utils.py:25-184) applied
to the molecule's actual chemistry — quantifying the in-house perception
against ground truth instead of only 3 tiny molecules (VERDICT round-1
item 7; OpenBabel itself is unavailable in this image, so the oracle is the
rule specification + chemistry, not an OpenBabel run).

Covered predicates: hydrophobic carbon, aromatic SSSR (incl. fused),
quaternary/tertiary amine, sulfonium, guanidine, sulfonic/sulfate/
phosphate/carboxylate anions (incl. the reference's ester-counts-as-
carboxylate quirk), halocarbon, donor (polar H), acceptor (amide/pyrrole/
charge exclusions).

Atom indices refer to heavy atoms in SMILES order.
"""

from __future__ import annotations

import pytest

from pharmaconet_tpu.chem.ligand_perception import get_pharmacophore_nodes
from pharmaconet_tpu.chem.smiles import parse_smiles

# name: (smiles, {type: count}, extra index-level checks)
CORPUS = {
    "aspirin": (
        "CC(=O)Oc1ccccc1C(=O)O",
        # NOTE: the acetyl ESTER carbon C1 (neighbors O,O,C) satisfies the
        # reference's carboxylate rule (ligand_utils.py:166-175) — both it
        # and the real acid carbon count as Anion. Rule-faithful, documented.
        dict(Hydrophobic=6, Aromatic=1, Cation=0, Anion=2,
             HBond_donor=1, HBond_acceptor=4, Halogen=0),
    ),
    "ibuprofen": (
        "CC(C)Cc1ccc(cc1)C(C)C(=O)O",
        dict(Hydrophobic=12, Aromatic=1, Cation=0, Anion=1,
             HBond_donor=1, HBond_acceptor=2, Halogen=0),
    ),
    "paracetamol": (
        "CC(=O)Nc1ccc(O)cc1",
        # amide N donates but does not accept (IsHbondAcceptor excludes it)
        dict(Hydrophobic=5, Aromatic=1, Cation=0, Anion=0,
             HBond_donor=2, HBond_acceptor=2, Halogen=0),
    ),
    "caffeine": (
        "Cn1cnc2c1c(=O)n(C)c(=O)n2C",
        # acceptors: both carbonyl O + the pyridine-type ring N (degree 2);
        # the three substituted ring N (degree 3) do not accept
        dict(Hydrophobic=0, Aromatic=2, Cation=0, Anion=0,
             HBond_donor=0, HBond_acceptor=3, Halogen=0),
    ),
    "metformin": (
        "CN(C)C(=N)NC(=N)N",
        # two guanidine carbons + the sp3 tertiary amine N
        dict(Hydrophobic=0, Aromatic=0, Cation=3, Anion=0,
             HBond_donor=4, HBond_acceptor=5, Halogen=0),
    ),
    "tetramethylammonium": (
        "C[N+](C)(C)C",
        dict(Hydrophobic=0, Aromatic=0, Cation=1, Anion=0,
             HBond_donor=0, HBond_acceptor=0, Halogen=0),
    ),
    "trimethylsulfonium": (
        "C[S+](C)C",
        dict(Hydrophobic=0, Aromatic=0, Cation=1, Anion=0,
             HBond_donor=0, HBond_acceptor=0, Halogen=0),
    ),
    "methanesulfonate": (
        "CS(=O)(=O)[O-]",
        dict(Hydrophobic=0, Aromatic=0, Cation=0, Anion=1,
             HBond_donor=0, HBond_acceptor=3, Halogen=0),
    ),
    "methyl_sulfate": (
        "COS(=O)(=O)O",
        dict(Hydrophobic=0, Aromatic=0, Cation=0, Anion=1,
             HBond_donor=1, HBond_acceptor=4, Halogen=0),
    ),
    "methyl_phosphate": (
        "COP(=O)(O)O",
        dict(Hydrophobic=0, Aromatic=0, Cation=0, Anion=1,
             HBond_donor=2, HBond_acceptor=4, Halogen=0),
    ),
    "chlorobenzene": (
        "Clc1ccccc1",
        dict(Hydrophobic=5, Aromatic=1, Cation=0, Anion=0,
             HBond_donor=0, HBond_acceptor=0, Halogen=1),
    ),
    "trifluorotoluene": (
        "FC(F)(F)c1ccccc1",
        dict(Hydrophobic=6, Aromatic=1, Cation=0, Anion=0,
             HBond_donor=0, HBond_acceptor=0, Halogen=3),
    ),
    "pyrrole": (
        "c1cc[nH]c1",
        # pyrrole N: donor yes, acceptor no (aromatic N with 3 connections)
        dict(Hydrophobic=2, Aromatic=1, Cation=0, Anion=0,
             HBond_donor=1, HBond_acceptor=0, Halogen=0),
    ),
    "imidazole": (
        "c1c[nH]cn1",
        dict(Hydrophobic=0, Aromatic=1, Cation=0, Anion=0,
             HBond_donor=1, HBond_acceptor=1, Halogen=0),
    ),
    "aniline": (
        "Nc1ccccc1",
        dict(Hydrophobic=5, Aromatic=1, Cation=0, Anion=0,
             HBond_donor=1, HBond_acceptor=1, Halogen=0),
    ),
    "benzamide": (
        "NC(=O)c1ccccc1",
        dict(Hydrophobic=6, Aromatic=1, Cation=0, Anion=0,
             HBond_donor=1, HBond_acceptor=1, Halogen=0),
    ),
    "naphthalene": (
        "c1ccc2ccccc2c1",
        dict(Hydrophobic=10, Aromatic=2, Cation=0, Anion=0,
             HBond_donor=0, HBond_acceptor=0, Halogen=0),
    ),
    "butylamine": (
        "CCCCN",
        dict(Hydrophobic=3, Aromatic=0, Cation=0, Anion=0,
             HBond_donor=1, HBond_acceptor=1, Halogen=0),
    ),
    "triethylamine": (
        "CCN(CC)CC",
        dict(Hydrophobic=3, Aromatic=0, Cation=1, Anion=0,
             HBond_donor=0, HBond_acceptor=1, Halogen=0),
    ),
    "phenol": (
        "Oc1ccccc1",
        dict(Hydrophobic=5, Aromatic=1, Cation=0, Anion=0,
             HBond_donor=1, HBond_acceptor=1, Halogen=0),
    ),
    "nitrobenzene": (
        "O=[N+]([O-])c1ccccc1",
        # N+ excluded from both cation rules (sp2) and acceptors (charge)
        dict(Hydrophobic=5, Aromatic=1, Cation=0, Anion=0,
             HBond_donor=0, HBond_acceptor=2, Halogen=0),
    ),
    "sulfanilamide": (
        "NS(=O)(=O)c1ccc(N)cc1",
        # 2 O + sulfonamide N + aniline N accept per the documented
        # approximation (the amide exclusion only looks at C neighbors)
        dict(Hydrophobic=4, Aromatic=1, Cation=0, Anion=0,
             HBond_donor=2, HBond_acceptor=4, Halogen=0),
    ),
    "acetylcholine": (
        "CC(=O)OCC[N+](C)(C)C",
        dict(Hydrophobic=1, Aromatic=0, Cation=1, Anion=1,
             HBond_donor=0, HBond_acceptor=2, Halogen=0),
    ),
    "tryptamine": (
        "NCCc1c[nH]c2ccccc12",
        dict(Hydrophobic=7, Aromatic=2, Cation=0, Anion=0,
             HBond_donor=2, HBond_acceptor=1, Halogen=0),
    ),
}


@pytest.mark.parametrize("name", sorted(CORPUS))
def test_golden_perception_counts(name):
    smiles, expected = CORPUS[name]
    mol = parse_smiles(smiles).strip_hydrogens()
    nodes = get_pharmacophore_nodes(mol)
    got = {k: len(v) for k, v in nodes.items()}
    assert got == expected, f"{name} ({smiles}): {got} != {expected}"


def test_golden_perception_indices():
    """Index-level spot checks on representative functional groups."""
    # aspirin: acid carboxylate centers on the O pair, ring is atoms 4-9
    nodes = get_pharmacophore_nodes(parse_smiles("CC(=O)Oc1ccccc1C(=O)O").strip_hydrogens())
    assert nodes["Aromatic"][0].atom_indices == (4, 5, 6, 7, 8, 9)
    acid = [n for n in nodes["Anion"] if 10 in (n.atom_indices if isinstance(n.atom_indices, tuple) else (n.atom_indices,))]
    assert len(acid) == 1 and set(acid[0].center_indices) == {11, 12}

    # metformin: both guanidine carbons center on the carbon atom
    nodes = get_pharmacophore_nodes(parse_smiles("CN(C)C(=N)NC(=N)N").strip_hydrogens())
    guan = [n for n in nodes["Cation"] if isinstance(n.atom_indices, tuple)]
    assert sorted(n.center_indices for n in guan) == [3, 6]

    # methyl sulfate: anion centered on S with all four O in the atom set
    nodes = get_pharmacophore_nodes(parse_smiles("COS(=O)(=O)O").strip_hydrogens())
    anion = nodes["Anion"][0]
    assert anion.center_indices == 2
    assert set(anion.atom_indices) == {1, 2, 3, 4, 5}

    # trifluorotoluene: each F is its own halogen node
    nodes = get_pharmacophore_nodes(parse_smiles("FC(F)(F)c1ccccc1").strip_hydrogens())
    assert sorted(n.atom_indices for n in nodes["Halogen"]) == [0, 2, 3]
