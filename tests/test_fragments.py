"""Fragment-enumerated SMILES libraries (chem/fragments.py)."""

from __future__ import annotations

from collections import Counter

from pharmaconet_tpu.chem.fragments import (
    PALINDROMIC_LINKERS,
    enumerate_fragment_smiles,
    fragment_space_size,
    iter_fragment_space,
)
from pharmaconet_tpu.chem.ligand_perception import get_pharmacophore_nodes
from pharmaconet_tpu.chem.smiles import parse_smiles


def test_space_size_matches_walk():
    n = sum(1 for _ in iter_fragment_space())
    assert n == fragment_space_size()
    assert n >= 250_000  # the SCALE_REAL floor


def test_deterministic_and_distinct():
    a = enumerate_fragment_smiles(500, seed=11)
    b = enumerate_fragment_smiles(500, seed=11)
    assert a == b
    smis = [s for _, s in a]
    assert len(set(smis)) == 500
    assert enumerate_fragment_smiles(500, seed=12) != a


def test_sample_parses_and_covers_all_types():
    got = Counter()
    for _name, smi in enumerate_fragment_smiles(1500, seed=3):
        mol = parse_smiles(smi).strip_hydrogens()
        nodes = get_pharmacophore_nodes(mol)
        got.update({k: 1 for k, v in nodes.items() if v})
    for t in ("Hydrophobic", "Aromatic", "HBond_donor", "HBond_acceptor",
              "Cation", "Anion", "Halogen"):
        assert got[t] > 0, t


def test_swap_dedup_rule():
    # palindromic linkers only emit end1 <= end2
    for c1, s1, lk, c2, s2 in iter_fragment_space():
        from pharmaconet_tpu.chem.fragments import LINKERS

        if LINKERS[lk] in PALINDROMIC_LINKERS:
            assert (c1, s1) <= (c2, s2)
            break
