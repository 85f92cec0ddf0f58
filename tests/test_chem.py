"""Host chemistry layer tests: PDB parsing, perception, featurization."""

import numpy as np
import pytest

from pharmaconet_tpu import constants as C
from pharmaconet_tpu.chem import (
    Protein,
    extract_pocket,
    load_molecules,
    load_pdb,
    parse_sdf,
)
from pharmaconet_tpu.chem.ligand_perception import get_pharmacophore_nodes
from pharmaconet_tpu.data.featurizer import (
    get_box_area_host,
    get_protein_pointcloud,
    get_token_and_filter,
    get_token_informations,
)


@pytest.fixture(scope="module")
def pocket_protein(protein_pdb, ref_ligand_pdb):
    lig = load_molecules(ref_ligand_pdb)[0].strip_hydrogens()
    center = lig.coords.mean(axis=0)
    residues = extract_pocket(protein_pdb, center)
    return Protein.from_residues(residues), center


def test_pdb_parse_counts(protein_pdb):
    residues = load_pdb(protein_pdb)
    assert len(residues) > 100
    atoms = [a for r in residues for a in r.atoms]
    assert all(len(a.element) >= 1 for a in atoms)


def test_ref_ligand_center(ref_ligand_pdb):
    lig = load_molecules(ref_ligand_pdb)[0].strip_hydrogens()
    assert lig.num_atoms > 10
    center = lig.coords.mean(axis=0)
    assert center.shape == (3,)


def test_protein_perception(pocket_protein):
    protein, _ = pocket_protein
    assert protein.num_heavy_atoms > 500
    assert len(protein.hydrophobic_atoms) > 0
    assert len(protein.rings) > 0
    assert len(protein.hbond_donors) > 0
    assert len(protein.hbond_acceptors) > 0
    # every ring belongs to TYR/TRP/HIS/PHE and has 5 or 6 atoms
    for ring in protein.rings:
        assert len(ring.indices) in (5, 6)
        resnames = {protein.atoms[i].resname for i in ring.indices}
        assert len(resnames) == 1
        assert resnames.pop() in ("TYR", "TRP", "HIS", "PHE")
    # charged groups only on the right residues
    for group in protein.pos_charged:
        assert protein.atoms[group.indices[0]].resname in ("ARG", "HIS", "LYS")
        assert all(protein.atoms[i].atomic_num == 7 for i in group.indices)
    for group in protein.neg_charged:
        assert protein.atoms[group.indices[0]].resname in ("GLU", "ASP")
        assert all(protein.atoms[i].atomic_num == 8 for i in group.indices)


def test_hydrophobic_rule(pocket_protein):
    protein, _ = pocket_protein
    for h in protein.hydrophobic_atoms:
        assert protein.atoms[h.index].atomic_num == 6
        for j in protein.adjacency[h.index]:
            assert protein.atoms[j].atomic_num == 6


def test_xbond_acceptor_rule(pocket_protein):
    protein, _ = pocket_protein
    for x in protein.xbond_acceptors:
        assert protein.atoms[x.O_index].atomic_num in (7, 8, 16)
        neighbors = [
            j for j in protein.adjacency[x.O_index]
            if protein.atoms[j].atomic_num in (6, 7, 16)
        ]
        assert len(neighbors) == 1 and neighbors[0] == x.Y_index


def test_tokens(pocket_protein):
    protein, center = pocket_protein
    positions, classes = get_token_informations(protein)
    expected = (
        len(protein.hydrophobic_atoms)
        + len(protein.rings) * 3
        + len(protein.hbond_donors)
        + len(protein.hbond_acceptors)
        + len(protein.pos_charged) * 2
        + len(protein.neg_charged)
        + len(protein.xbond_acceptors)
    )
    assert len(classes) == expected
    tokens, keep = get_token_and_filter(positions, classes, center)
    assert tokens.shape[1] == 4
    assert len(tokens) == len(keep) > 0
    assert tokens[:, :3].min() >= 0 and tokens[:, :3].max() < C.GRID_DIM


def test_pointcloud_channels(pocket_protein):
    protein, _ = pocket_protein
    positions, channels = get_protein_pointcloud(protein)
    assert channels.shape == (protein.num_heavy_atoms, 33)
    # exactly one atom-type channel and one residue channel per atom
    assert np.all(channels[:, :5].sum(axis=1) == 1)
    assert np.all(channels[:, 5:26].sum(axis=1) == 1)


def test_box_area():
    tokens = np.array([[32, 32, 32, C.HYDROPHOBIC], [0, 0, 0, C.PISTACKING_P]], dtype=np.int16)
    areas = get_box_area_host(tokens)
    assert areas.shape == (2, 64, 64, 64)
    # hydrophobic: radius ceil((4.5+1)/0.5) = 11 voxels
    assert areas[0, 32, 32, 32]
    assert areas[0, 32, 32, 32 + 10]
    assert not areas[0, 32, 32, 32 + 11]


BENZENE_SDF = """benzene
  test

  6  6  0  0  0  0  0  0  0  0999 V2000
    0.0000    1.3960    0.0000 C   0  0
    1.2090    0.6980    0.0000 C   0  0
    1.2090   -0.6980    0.0000 C   0  0
    0.0000   -1.3960    0.0000 C   0  0
   -1.2090   -0.6980    0.0000 C   0  0
   -1.2090    0.6980    0.0000 C   0  0
  1  2  2  0
  2  3  1  0
  3  4  2  0
  4  5  1  0
  5  6  2  0
  6  1  1  0
M  END
$$$$
"""

PYRIDINE_SDF = """pyridine
  test

  6  6  0  0  0  0  0  0  0  0999 V2000
    0.0000    1.3960    0.0000 N   0  0
    1.2090    0.6980    0.0000 C   0  0
    1.2090   -0.6980    0.0000 C   0  0
    0.0000   -1.3960    0.0000 C   0  0
   -1.2090   -0.6980    0.0000 C   0  0
   -1.2090    0.6980    0.0000 C   0  0
  1  2  2  0
  2  3  1  0
  3  4  2  0
  4  5  1  0
  5  6  2  0
  6  1  1  0
M  END
$$$$
"""

ACETATE_SDF = """acetate
  test

  4  3  0  0  0  0  0  0  0  0999 V2000
    0.0000    0.0000    0.0000 C   0  0
    1.5000    0.0000    0.0000 C   0  0
    2.1000    1.1000    0.0000 O   0  0
    2.1000   -1.1000    0.0000 O   0  0
  1  2  1  0
  2  3  2  0
  2  4  1  0
M  CHG  1   4  -1
M  END
$$$$
"""


def test_benzene_perception():
    mol = parse_sdf(BENZENE_SDF)[0].strip_hydrogens()
    nodes = get_pharmacophore_nodes(mol)
    assert len(nodes["Aromatic"]) == 1
    assert len(nodes["Aromatic"][0].atom_indices) == 6
    assert len(nodes["Hydrophobic"]) == 6
    assert len(nodes["HBond_acceptor"]) == 0
    assert len(nodes["Cation"]) == 0


def test_pyridine_perception():
    mol = parse_sdf(PYRIDINE_SDF)[0].strip_hydrogens()
    nodes = get_pharmacophore_nodes(mol)
    assert len(nodes["Aromatic"]) == 1
    # pyridine N accepts H-bonds, no N-H donor
    acceptor_atoms = {n.atom_indices for n in nodes["HBond_acceptor"]}
    assert 0 in acceptor_atoms
    assert len(nodes["HBond_donor"]) == 0


def test_acetate_perception():
    mol = parse_sdf(ACETATE_SDF)[0].strip_hydrogens()
    nodes = get_pharmacophore_nodes(mol)
    assert len(nodes["Anion"]) == 1
    anion = nodes["Anion"][0]
    assert set(anion.atom_indices) == {1, 2, 3}
    assert set(anion.center_indices) == {2, 3}
    # methyl carbon is hydrophobic
    hydro = {n.atom_indices for n in nodes["Hydrophobic"]}
    assert 0 in hydro


def test_sdf_roundtrip_counts():
    mols = parse_sdf(BENZENE_SDF + PYRIDINE_SDF)
    assert len(mols) == 2


MOL2_BLOCK = """@<TRIPOS>MOLECULE
ethanol
 3 2 0 0 0
SMALL
GASTEIGER

@<TRIPOS>ATOM
      1 C1          0.0000    0.0000    0.0000 C.3     1  LIG1       -0.0600
      2 C2          1.5000    0.0000    0.0000 C.3     1  LIG1        0.0300
      3 O1          2.2000    1.2000    0.0000 O.3     1  LIG1       -0.3800
@<TRIPOS>BOND
     1    1    2 1
     2    2    3 1
"""


def test_mol2_parsing():
    from pharmaconet_tpu.chem.smallmol import parse_mol2

    mols = parse_mol2(MOL2_BLOCK)
    assert len(mols) == 1
    mol = mols[0]
    assert mol.num_atoms == 3
    assert len(mol.bonds) == 2
    assert [a.atomic_num for a in mol.atoms] == [6, 6, 8]
    assert mol.coords.shape == (3, 3)


def test_mol2_aromatic_bonds():
    from pharmaconet_tpu.chem.smallmol import parse_mol2

    block = MOL2_BLOCK.replace("     1    1    2 1", "     1    1    2 ar")
    mol = parse_mol2(block)[0]
    assert mol.bonds[0].aromatic


def test_smiles_parser_fuzz_exception_hygiene():
    """Random garbage must fail ONLY with SmilesError (a user-facing,
    catchable contract the tolerant library paths rely on), and whatever
    parses must survive perception — 5k seeded trials."""
    import random

    from pharmaconet_tpu.chem.ligand_perception import get_pharmacophore_nodes
    from pharmaconet_tpu.chem.smiles import SmilesError, parse_smiles

    rng = random.Random(0)
    alphabet = list("CcNnOoSsPpBFIl()[]=#-+@H123456789%./\\rb")
    parsed = 0
    for _ in range(5000):
        s = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 14)))
        try:
            mol = parse_smiles(s)
        except SmilesError:
            continue
        parsed += 1
        get_pharmacophore_nodes(mol.strip_hydrogens())
    assert parsed > 100  # the corpus actually exercises the success path
