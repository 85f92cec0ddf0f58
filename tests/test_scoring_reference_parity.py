"""Score parity vs the reference scoring implementation, run DIRECTLY.

The network parity harness (test_reference_parity.py) proves the NN; this
proves the other half of the pipeline: the reference's own GraphMatcher +
assignment tree + (pure-python) match kernels, imported from
/root/reference/src/pmnet/scoring/, must produce the SAME score as our
host matcher and our device batch screener for the same pharmacophore
model and ligands.

Feasibility: graph_match.py imports its Ligand types only under
TYPE_CHECKING and falls back to scoring/match_utils.py when numba is
absent, so the scoring stack runs here with openbabel stubbed. Our
in-house `Ligand` (scoring/ligand.py) deliberately mirrors the reference
duck interface — pharmacophore_list of (type, node-with-atom_indices/
center_indices), atom_positions [N_atoms, N_conf, 3] — so the reference
LigandGraph can be built directly from our parsed molecules; openbabel
atom queries (GetAtomicNum / neighbor iteration in __group_nodes) are
answered from our Molecule's bond table.

Also proves the `.pm` format contract end-to-end: the model is written by
OUR PharmacophoreModel.save and read by THEIR PharmacophoreModel.load.
"""

from __future__ import annotations

import sys
import types
from types import SimpleNamespace

import numpy as np
import pytest

REF_SRC = "/root/reference/src"


class _DuckAtom:
    """Answers the OBAtom queries the reference scoring path makes."""

    def __init__(self, idx0: int, atomic_num: int):
        self._idx0 = idx0
        self._z = atomic_num
        self.neighbors: list[_DuckAtom] = []

    def GetIdx(self) -> int:  # noqa: N802 - openbabel API
        return self._idx0 + 1  # OB uses 1-based indices

    def GetAtomicNum(self) -> int:  # noqa: N802
        return self._z


def _install_openbabel_stub():
    # Shared upgrading installer (order-independent across test modules).
    from pharmaconet_tpu.utils.crosscheck import install_openbabel_stub

    install_openbabel_stub()


def _import_reference_scoring():
    _install_openbabel_stub()
    if "pmnet" not in sys.modules:
        pkg = types.ModuleType("pmnet")
        pkg.__path__ = [f"{REF_SRC}/pmnet"]
        sys.modules["pmnet"] = pkg
    from pmnet.scoring import graph_match as ref_graph_match  # noqa: PLC0415
    from pmnet.scoring import ligand as ref_ligand  # noqa: PLC0415

    import pmnet.pharmacophore_model as ref_model_mod  # noqa: PLC0415

    return ref_graph_match, ref_ligand, ref_model_mod


def _duck_reference_ligand(our_ligand, ref_ligand_mod):
    """Build the reference LigandGraph from our parsed Ligand."""
    mol = our_ligand.mol
    obatoms = [_DuckAtom(i, a.atomic_num) for i, a in enumerate(mol.atoms)]
    for bond in mol.bonds:
        obatoms[bond.a].neighbors.append(obatoms[bond.b])
        obatoms[bond.b].neighbors.append(obatoms[bond.a])

    duck = SimpleNamespace(
        pharmacophore_list=our_ligand.pharmacophore_list,
        atom_positions=np.asarray(our_ligand.atom_positions, dtype=np.float32),
        num_conformers=our_ligand.num_conformers,
        num_atoms=our_ligand.num_atoms,
        num_rotatable_bonds=our_ligand.num_rotatable_bonds,
        obatoms=obatoms,
    )
    graph = ref_ligand_mod.LigandGraph(duck)
    return SimpleNamespace(
        graph=graph,
        num_atoms=duck.num_atoms,
        num_rotatable_bonds=duck.num_rotatable_bonds,
    )


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """Synthetic pocket model (saved as .pm by OUR side) + mixed ligands."""
    sys.path.insert(0, "/root/repo")
    from bench import make_synthetic_model
    from test_cli_scale import _random_molecule, _to_sdf

    from pharmaconet_tpu.scoring.ligand import Ligand

    root = tmp_path_factory.mktemp("refscore")
    model = make_synthetic_model(num_clusters=14, seed=11)
    pm_path = root / "model.pm"
    model.save(str(pm_path))

    rng = np.random.default_rng(13)
    ligands = []
    for i in range(30):
        elements, coords, bonds = _random_molecule(rng)
        path = root / f"m{i:02d}.sdf"
        path.write_text(_to_sdf(f"m{i:02d}", elements, coords, bonds))
        lig = Ligand.load_from_file(path)
        if i % 3 == 0:
            # multi-conformer: 3 perturbed copies of the base geometry
            base = np.asarray(lig.mol.coords, dtype=np.float32)
            confs = [base + rng.normal(0, 0.4, base.shape).astype(np.float32)
                     for _ in range(3)]
            lig = Ligand(lig.mol, atom_positions=confs)
        ligands.append(lig)
    return model, pm_path, ligands


def test_reference_scoring_parity(corpus):
    ref_graph_match, ref_ligand_mod, ref_model_mod = _import_reference_scoring()
    from pharmaconet_tpu.scoring.graph_match import GraphMatcher

    our_model, pm_path, ligands = corpus
    # .pm contract: written by our save, read by the REFERENCE loader
    ref_model = ref_model_mod.PharmacophoreModel.load(str(pm_path))
    assert len(ref_model.nodes) == len(our_model.nodes)

    n_scored = 0
    for lig in ligands:
        ours = GraphMatcher(our_model, lig).run()
        theirs = ref_graph_match.GraphMatcher(
            ref_model, _duck_reference_ligand(lig, ref_ligand_mod)
        ).run()
        assert abs(ours - theirs) <= 1e-4 + 2e-5 * abs(theirs), (
            f"score mismatch: ours={ours} reference={theirs}"
        )
        if theirs > 0:
            n_scored += 1
    assert n_scored >= 10, f"corpus too easy: only {n_scored} nonzero scores"


def test_reference_scoring_parity_device_engine(corpus):
    """The device batch screener agrees with the reference implementation
    end-to-end (transitively proven via the host matcher, asserted here
    directly for the full batch)."""
    _, pm_path, ligands = corpus
    ref_graph_match, ref_ligand_mod, ref_model_mod = _import_reference_scoring()
    from pharmaconet_tpu.scoring.batch_screen import BatchScreener

    from pharmaconet_tpu.pharmacophore.model import PharmacophoreModel

    ref_model = ref_model_mod.PharmacophoreModel.load(str(pm_path))
    screener = BatchScreener(
        PharmacophoreModel.load(str(pm_path)),
        engine="pallas",
        pallas_interpret=True,
    )
    batch_scores = screener.score_ligands(ligands)
    for lig, got in zip(ligands, batch_scores):
        want = ref_graph_match.GraphMatcher(
            ref_model, _duck_reference_ligand(lig, ref_ligand_mod)
        ).run()
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-4)


def test_reference_scoring_parity_custom_weights(corpus):
    """Non-default per-type weights flow identically through both stacks
    (the screening CLI exposes them: --cation 8 --hbd 4 ...)."""
    ref_graph_match, ref_ligand_mod, ref_model_mod = _import_reference_scoring()
    from pharmaconet_tpu.scoring.graph_match import GraphMatcher

    our_model, pm_path, ligands = corpus
    ref_model = ref_model_mod.PharmacophoreModel.load(str(pm_path))
    weights = dict(
        Cation=2.5, Anion=3.5, Aromatic=6.0, HBond_donor=1.5,
        HBond_acceptor=7.0, Halogen=0.5, Hydrophobic=2.0,
    )
    checked = 0
    for lig in ligands[:12]:
        ours = GraphMatcher(our_model, lig, weights=weights).run()
        theirs = ref_graph_match.GraphMatcher(
            ref_model, _duck_reference_ligand(lig, ref_ligand_mod),
            weights=weights,
        ).run()
        assert abs(ours - theirs) <= 1e-4 + 2e-5 * abs(theirs)
        checked += theirs > 0
    assert checked >= 4
