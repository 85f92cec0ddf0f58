"""Reference-code oracle for the pure-graph perception predicates.

The reference's functional-group predicates (/root/reference/src/pmnet/
scoring/ligand_utils.py:94-184) need nothing from OpenBabel but atom
queries answerable from a molecular graph: GetAtomicNum, GetHvyDegree,
GetExplicitDegree, GetHyb and neighbor iteration. This test imports the
REFERENCE FILE ITSELF and runs its predicates duck-typed over OUR parsed
Molecule, atom by atom, against our in-house predicates
(pharmaconet_tpu/chem/ligand_perception.py) — over the full golden corpus
plus a seeded fuzz corpus. Zero disagreements allowed.

Duck semantics (documented deviations / residual surface):

* AddPolarHydrogens (ligand_utils.py:38-44) adds explicit H only to polar
  atoms, so the duck gives N/O/S atoms `total_h(i)` synthetic H neighbors
  and everything else none; GetExplicitDegree = heavy degree + those H.
* GetHyb is OB-internal perception, NOT a pure graph fact; the duck
  answers 3 iff our `Molecule.is_sp3` (no multiple/aromatic bonds). The
  oracle therefore proves the reference FORMULA (z==7 ∧ hyb==3 ∧
  hvydeg==3) composes identically with our graph facts — hybridization
  perception itself stays golden-corpus-verified (test_chem_golden.py).
* IsHbondAcceptor / IsHbondDonor / SSSR aromaticity remain OB-internal
  (C++), covered only by the golden corpus — see PARITY.md.
"""

from __future__ import annotations

import importlib.util
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

from pharmaconet_tpu.chem import ligand_perception as ours
from pharmaconet_tpu.chem.smallmol import Molecule, parse_sdf
from pharmaconet_tpu.chem.smiles import parse_smiles

REF_FILE = "/root/reference/src/pmnet/scoring/ligand_utils.py"


class _OracleAtom:
    """Answers the OBAtom queries made by ligand_utils predicates."""

    def __init__(self, z: int, hvy_degree: int, explicit_degree: int, hyb: int):
        self._z = z
        self._hvy = hvy_degree
        self._explicit = explicit_degree
        self._hyb = hyb
        self.neighbors: list["_OracleAtom"] = []

    def GetAtomicNum(self) -> int:  # noqa: N802 - openbabel API
        return self._z

    def GetHvyDegree(self) -> int:  # noqa: N802
        return self._hvy

    def GetExplicitDegree(self) -> int:  # noqa: N802
        return self._explicit

    def GetHyb(self) -> int:  # noqa: N802
        return self._hyb


def _load_reference_predicates():
    """Import ligand_utils.py directly with `openbabel` stubbed.

    Uses the shared upgrading installer: a narrower stub registered
    earlier in the same process is upgraded, and this module's stub is
    safe for later importers (dunder lookups raise, so inspect/getmodule
    never see a non-string __file__).
    """
    from pharmaconet_tpu.utils.crosscheck import install_openbabel_stub

    install_openbabel_stub()
    spec = importlib.util.spec_from_file_location("_ref_ligand_utils", REF_FILE)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


REF = _load_reference_predicates()

POLAR = (7, 8, 16)  # AddPolarHydrogens targets (N, O, S)


def _oracle_atoms(mol: Molecule) -> list[_OracleAtom]:
    atoms = []
    for i, a in enumerate(mol.atoms):
        polar_h = mol.total_h(i) if a.atomic_num in POLAR else 0
        atoms.append(
            _OracleAtom(
                a.atomic_num,
                hvy_degree=mol.heavy_degree(i),
                explicit_degree=mol.heavy_degree(i) + polar_h,
                hyb=3 if mol.is_sp3(i) else 2,
            )
        )
    for b in mol.bonds:
        atoms[b.a].neighbors.append(atoms[b.b])
        atoms[b.b].neighbors.append(atoms[b.a])
    for i, a in enumerate(mol.atoms):
        if a.atomic_num in POLAR:
            for _ in range(mol.total_h(i)):
                h = _OracleAtom(1, hvy_degree=1, explicit_degree=1, hyb=0)
                h.neighbors.append(atoms[i])
                atoms[i].neighbors.append(h)
    return atoms


# (reference predicate, ours) — the full pure-graph surface
PREDICATES = [
    ("is_quartamine_N", ours.is_quaternary_amine),
    ("is_tertamine_N", ours.is_tertiary_amine),
    ("is_sulfonium_S", ours.is_sulfonium),
    ("is_guanidine_C", ours.is_guanidine_carbon),
    ("is_sulfonicacid_S", ours.is_sulfonic_sulfur),
    ("is_sulfate_S", ours.is_sulfate_sulfur),
    ("is_phosphate_P", ours.is_phosphate_phosphorus),
    ("is_carboxylate_C", ours.is_carboxylate_carbon),
    ("is_halocarbon_X", ours.is_halocarbon),
]


def _assert_predicate_equality(mol: Molecule, label: str) -> None:
    oracle = _oracle_atoms(mol)
    for ref_name, our_fn in PREDICATES:
        ref_fn = getattr(REF, ref_name)
        for i in range(len(mol.atoms)):
            got_ref = bool(ref_fn(oracle[i]))
            got_ours = bool(our_fn(mol, i))
            assert got_ref == got_ours, (
                f"{label}: atom {i} (Z={mol.atoms[i].atomic_num}) "
                f"{ref_name} reference={got_ref} ours={got_ours}"
            )


def _golden_corpus() -> list[tuple[str, str]]:
    from test_chem_golden import CORPUS

    return [(name, smiles) for name, (smiles, *_rest) in CORPUS.items()]


@pytest.mark.parametrize("name,smiles", _golden_corpus())
def test_golden_corpus_predicates_match_reference(name, smiles):
    mol = parse_smiles(smiles).strip_hydrogens()
    _assert_predicate_equality(mol, name)


# hand-picked edge cases targeting each predicate's boundary conditions
EDGE_SMILES = [
    "C[N+](C)(C)C",          # quaternary ammonium
    "C[NH+](C)C",            # protonated tertiary amine (NOT quartamine)
    "CN(C)C",                # tertiary amine
    "CN(C)C=O",              # amide-adjacent tertiary N (sp2 via C=O? no - N sp3)
    "C[S+](C)C",             # sulfonium
    "CS(C)=O",               # sulfoxide (S degree 3 but has O, not sulfonium? has no H)
    "NC(N)=N",               # guanidine
    "CNC(=N)NC",             # substituted guanidine (no terminal N)
    "CS(=O)(=O)O",           # sulfonic acid
    "COS(=O)(=O)OC",         # sulfate diester
    "OP(=O)(O)O",            # phosphate
    "CP(=O)(O)O",            # phosphonate (C neighbor -> not phosphate)
    "CC(=O)O",               # carboxylic acid
    "CC(=O)OC",              # ester (reference quirk: counts as carboxylate)
    "O=C(O)C(F)(Cl)Br",      # halocarbons on acid
    "FC(F)(F)F",             # CF4
    "F[Si](F)(F)F",          # halogen on Si (not halocarbon)
    "ClCl",                  # Cl2 - no carbon neighbor
]


@pytest.mark.parametrize("smiles", EDGE_SMILES)
def test_edge_cases_predicates_match_reference(smiles):
    mol = parse_smiles(smiles).strip_hydrogens()
    _assert_predicate_equality(mol, smiles)


def test_fragment_library_predicates_match_reference():
    """A 2,000-molecule deterministic sample of the 476k fragment space
    (chem/fragments.py — built to exercise all 7 pharmacophore types,
    reference ligand_utils.py:94-184): every atom, every predicate,
    reference == ours. This is the same chemistry SCALE_REAL screens at
    scale, so predicate drift here would corrupt that record silently."""
    from pharmaconet_tpu.chem.fragments import enumerate_fragment_smiles

    seen_true: set[str] = set()
    for name, smiles in enumerate_fragment_smiles(2000, seed=40):
        mol = parse_smiles(smiles).strip_hydrogens()
        oracle = _oracle_atoms(mol)
        for ref_name, our_fn in PREDICATES:
            ref_fn = getattr(REF, ref_name)
            for i in range(len(mol.atoms)):
                got_ref = bool(ref_fn(oracle[i]))
                assert got_ref == bool(our_fn(mol, i)), (
                    f"{name} ({smiles}): atom {i} "
                    f"(Z={mol.atoms[i].atomic_num}) {ref_name} disagrees"
                )
                if got_ref:
                    seen_true.add(ref_name)
    # the sample must actually exercise the predicate surface, not just
    # agree on all-False. The space contains quaternary ammonium,
    # tert-amine (piperidine/N-methyl linkers), carboxylate, sulfonate
    # and halocarbon chemistry by construction; sulfonium, guanidine,
    # sulfate-ester and phosphate are NOT in the substituent table —
    # those stay covered by the golden + edge corpora above.
    assert seen_true == {
        "is_quartamine_N", "is_tertamine_N", "is_carboxylate_C",
        "is_sulfonicacid_S", "is_halocarbon_X",
    }, f"fragment sample fired {sorted(seen_true)}"


def test_fuzz_corpus_predicates_match_reference():
    """Seeded random SDF molecules (the CLI-scale generator) — every atom,
    every predicate, reference == ours."""
    from test_cli_scale import _random_molecule, _to_sdf

    rng = np.random.default_rng(0xDECAF)
    for i in range(150):
        elements, coords, bonds = _random_molecule(rng)
        mols = parse_sdf(_to_sdf(f"f{i}", elements, coords, bonds))
        _assert_predicate_equality(mols[0].strip_hydrogens(), f"fuzz-{i}")
