"""Parser robustness: malformed inputs raise clean errors or yield empty
results — never crash, hang, or silently produce garbage structures."""

import numpy as np
import pytest

from pharmaconet_tpu.chem import load_molecules, load_pdb
from pharmaconet_tpu.chem.smiles import parse_smiles


GARBAGE = [
    "", "\x00\x01\x02", "not a molecule at all\n" * 3,
]


@pytest.mark.parametrize("text", GARBAGE)
def test_pdb_garbage(tmp_path, text):
    p = tmp_path / "g.pdb"
    p.write_text(text)
    residues = load_pdb(p)  # no ATOM records -> empty
    assert residues == [] or all(hasattr(r, "atoms") for r in residues)


def test_pdb_malformed_atom_lines(tmp_path):
    """Malformed ATOM records are skipped (tolerant, like Biopython's
    permissive parser); well-formed records in the same file survive."""
    p = tmp_path / "bad.pdb"
    p.write_text(
        "ATOM  short\n"
        "ATOM      1  CA  ALA A   1      xx.xxx   0.000   0.000  1.00  0.00           C\n"
        "ATOM      2  CB  ALA A   1       1.000   2.000   3.000  1.00  0.00           C\n"
    )
    residues = load_pdb(p)
    assert len(residues) == 1
    assert [a.name for a in residues[0].atoms] == ["CB"]
    np.testing.assert_allclose(
        (residues[0].atoms[0].x, residues[0].atoms[0].y, residues[0].atoms[0].z),
        (1.0, 2.0, 3.0),
    )


@pytest.mark.parametrize("suffix", [".sdf", ".mol2"])
@pytest.mark.parametrize("text", GARBAGE)
def test_molfile_garbage(tmp_path, suffix, text):
    p = tmp_path / ("g" + suffix)
    p.write_text(text)
    try:
        mols = load_molecules(p)
    except ValueError:
        return  # clean error is acceptable
    assert mols == []


def test_sdf_truncated_counts(tmp_path):
    """An SDF whose header promises more atoms than it provides yields no
    molecules (the screening CLI logs and skips such files)."""
    p = tmp_path / "t.sdf"
    p.write_text(
        "mol\n  prog\n\n  5  0  0  0  0  0  0  0  0  0999 V2000\n"
        "    0.0000    0.0000    0.0000 C   0  0\nM  END\n$$$$\n"
    )
    assert load_molecules(p) == []


@pytest.mark.parametrize("smi", ["c1cc", "C((C)", "C1CC2", "[Xx]", "%%%", "C)("])
def test_smiles_malformed(smi):
    with pytest.raises(ValueError):
        parse_smiles(smi)


def test_smiles_valid_after_errors():
    mol = parse_smiles("c1ccccc1O")
    assert len(mol.atoms) == 7
