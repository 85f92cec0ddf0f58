"""In-house distance-geometry conformer embedding (chem/embed.py).

The reference embeds SMILES conformers with RDKit srETKDGv3
(/root/reference/src/pmnet/scoring/ligand.py:87-107); RDKit is optional
here, so chem/embed.py must produce chemically sane heavy-atom geometry
on its own: correct bond lengths, no steric clashes, near-planar
aromatic rings, real torsional diversity — and the resulting scores must
be reflection-invariant (the argument that makes ignoring tetrahedral
chirality exact, not approximate).
"""

import numpy as np
import pytest

from pharmaconet_tpu.chem.embed import _bond_length, embed_conformers
from pharmaconet_tpu.chem.smiles import parse_smiles
from pharmaconet_tpu.pharmacophore.model import PharmacophoreModel
from pharmaconet_tpu.scoring.graph_match import GraphMatcher
from pharmaconet_tpu.scoring.ligand import Ligand

from helpers import _model_state

PANEL = {
    "benzene": "c1ccccc1",
    "hexane": "CCCCCC",
    "aspirin": "CC(=O)Oc1ccccc1C(=O)O",
    "caffeine": "Cn1cnc2c1c(=O)n(C)c(=O)n2C",
    "naphthalene": "c1ccc2ccccc2c1",
    "atp-frag": "Nc1ncnc2c1ncn2C1OC(COP(=O)(O)O)C(O)C1O",
    # hypervalent regression: sulfonamide S / phosphate P must be pinned
    # tetrahedral or the bounds matrix is frustrated (four neighbors at
    # pairwise 120 deg cannot exist in 3-D)
    "sildenafil": "CCCc1nn(C)c2c1nc(nc2=O)-c1cc(ccc1OCC)S(=O)(=O)N1CCN(C)CC1",
    "celecoxib": "Cc1ccc(cc1)-c1cc(nn1-c1ccc(cc1)S(N)(=O)=O)C(F)(F)F",
}


def _excluded_pairs(mol):
    """Bonded + 1-3 pairs (no distance-geometry clash expectation)."""
    out = {(b.a, b.b) for b in mol.bonds} | {(b.b, b.a) for b in mol.bonds}
    for i in range(mol.num_atoms):
        nbrs = mol.neighbors(i)
        for a in nbrs:
            for b in nbrs:
                if a != b:
                    out.add((a, b))
    return out


@pytest.mark.parametrize("name", sorted(PANEL))
def test_geometry_quality(name):
    mol = parse_smiles(PANEL[name])
    confs = embed_conformers(mol, 4, seed=11)
    assert confs.shape == (4, mol.num_atoms, 3)
    assert np.isfinite(confs).all()

    for bond in mol.bonds:
        d = np.linalg.norm(confs[:, bond.a] - confs[:, bond.b], axis=-1)
        target = _bond_length(mol, bond.a, bond.b, bond.order)
        assert np.abs(d - target).max() < 0.08, f"bond {bond.a}-{bond.b}"

    skip = _excluded_pairs(mol)
    n = mol.num_atoms
    for i in range(n):
        for j in range(i + 1, n):
            if (i, j) in skip:
                continue
            d = np.linalg.norm(confs[:, i] - confs[:, j], axis=-1).min()
            assert d > 2.0, f"clash {i}-{j}: {d:.2f} A"

    for ring in mol.aromatic_rings():
        for c in range(confs.shape[0]):
            pts = confs[c, list(ring)].astype(np.float64)
            pts -= pts.mean(0)
            rms_out_of_plane = np.linalg.svd(pts, compute_uv=False)[-1] / np.sqrt(
                len(ring)
            )
            assert rms_out_of_plane < 0.35


def test_embed_full_golden_corpus():
    """Every golden-corpus molecule (incl. triphosphate, sulfonium,
    fused/charged heterocycles) must embed without bound frustration:
    no rejection, bond errors bounded."""
    from test_chem_golden import CORPUS

    for name in sorted(CORPUS):
        smiles = CORPUS[name][0]
        mol = parse_smiles(smiles).strip_hydrogens()
        confs = embed_conformers(mol, 2, seed=1)
        for bond in mol.bonds:
            d = np.linalg.norm(confs[:, bond.a] - confs[:, bond.b], axis=-1)
            target = _bond_length(mol, bond.a, bond.b, bond.order)
            assert np.abs(d - target).max() < 0.12, (name, bond.a, bond.b)


def test_determinism_and_seed_sensitivity():
    mol = parse_smiles(PANEL["aspirin"])
    a = embed_conformers(mol, 3, seed=5)
    b = embed_conformers(mol, 3, seed=5)
    c = embed_conformers(mol, 3, seed=6)
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - c).max() > 1e-3


def test_batch_equals_single_and_chunk_invariance():
    """embed_conformers_many is the implementation: each molecule's
    result is bit-identical to its solo embed and independent of batch
    composition / chunk boundaries (per-molecule rng streams)."""
    from pharmaconet_tpu.chem import embed as E

    mols = [parse_smiles(PANEL[k]) for k in sorted(PANEL)]
    seeds = list(range(100, 100 + len(mols)))
    batch = E.embed_conformers_many(mols, 3, seeds=seeds)
    for mol, seed, got in zip(mols, seeds, batch):
        np.testing.assert_array_equal(got, embed_conformers(mol, 3, seed=seed))
    old = E._CHUNK_ROWS
    try:
        E._CHUNK_ROWS = 6  # 2 molecules per chunk at count=3
        rechunked = E.embed_conformers_many(mols, 3, seeds=seeds)
    finally:
        E._CHUNK_ROWS = old
    for a, b in zip(batch, rechunked):
        np.testing.assert_array_equal(a, b)


def test_batch_tolerates_per_molecule_failure():
    """One bad molecule yields its Exception in place without sinking
    the rest of the batch."""
    from pharmaconet_tpu.chem import embed as E
    from pharmaconet_tpu.chem.smallmol import Molecule

    good = parse_smiles(PANEL["aspirin"])
    out = E.embed_conformers_many([good, Molecule(), good], 2, seed=3)
    assert isinstance(out[1], Exception)
    assert not isinstance(out[0], Exception)
    assert not isinstance(out[2], Exception)
    assert out[0].shape == out[2].shape == (2, good.num_atoms, 3)


def test_jax_backend_gates_and_determinism():
    """The device pipeline (smooth+sample+MDS+refine in one program) must
    satisfy the same geometry gates and be deterministic per seed. Runs
    on whatever jax backend the test session pins (CPU here; the same
    program serves the TPU)."""
    pytest.importorskip("jax")
    from pharmaconet_tpu.chem import embed as E

    mols = [parse_smiles(PANEL[k]) for k in ("benzene", "aspirin", "caffeine")]
    old = E._CHUNK_ROWS
    try:
        E._CHUNK_ROWS = 8  # small fixed chunks: cheap CPU compile
        a = E.embed_conformers_many(mols, 2, seed=7, backend="jax")
        b = E.embed_conformers_many(mols, 2, seed=7, backend="jax")
    finally:
        E._CHUNK_ROWS = old
    for mol, x1, x2 in zip(mols, a, b):
        assert not isinstance(x1, Exception)
        np.testing.assert_array_equal(x1, x2)
        assert x1.shape == (2, mol.num_atoms, 3)
        for bond in mol.bonds:
            d = np.linalg.norm(x1[:, bond.a] - x1[:, bond.b], axis=-1)
            target = _bond_length(mol, bond.a, bond.b, bond.order)
            assert np.abs(d - target).max() < 0.12
        for ring in mol.aromatic_rings():
            for c in range(x1.shape[0]):
                pts = x1[c, list(ring)].astype(np.float64)
                pts -= pts.mean(0)
                rms = np.linalg.svd(pts, compute_uv=False)[-1] / np.sqrt(
                    len(ring)
                )
                assert rms < 0.35


def test_conformer_diversity_flexible_chain():
    """Different draws must sample different torsions, not one frozen pose."""
    mol = parse_smiles("CCCCCCCCO")
    confs = embed_conformers(mol, 6, seed=3)
    dm = np.linalg.norm(confs[:, :, None, :] - confs[:, None, :, :], axis=-1)
    spread = np.abs(dm[0] - dm[1:]).max()
    assert spread > 1.0


def test_edge_cases():
    one = embed_conformers(parse_smiles("C"), 2)
    assert one.shape == (2, 1, 3)
    two = embed_conformers(parse_smiles("C=O"), 2)
    d = np.linalg.norm(two[:, 0] - two[:, 1], axis=-1)
    assert np.all(np.abs(d - 1.27) < 0.1)  # C=O ~ 0.87*(0.77+0.66)
    # disconnected fragments stay apart
    frag = embed_conformers(parse_smiles("CC.O"), 1)
    d = min(
        np.linalg.norm(frag[0, 2] - frag[0, 0]),
        np.linalg.norm(frag[0, 2] - frag[0, 1]),
    )
    assert d > 2.0
    with pytest.raises(ValueError):
        embed_conformers(parse_smiles("CC"), 0)


def _toy_model():
    state = _model_state(
        nodes=[
            ("Hydrophobic", "Hydrophobic", (0.0, 0.0, 0.0), 1.5),
            ("HBond_acceptor", "HBond_pdon", (4.0, 0.0, 0.0), 1.5),
            ("Aromatic", "Aromatic", (2.0, 3.0, 0.0), 2.0),
        ],
        clusters=[("Hydrophobic", [0]), ("HBond", [1]), ("Aromatic", [2])],
    )
    model = PharmacophoreModel()
    model.__setstate__(state)
    return model


def test_scoring_smiles_dg_end_to_end():
    """scoring_smiles works WITHOUT RDKit via the dg engine, and the
    convenience path equals scoring the explicitly built Ligand."""
    model = _toy_model()
    smiles = "Cc1ccc(O)cc1"  # p-cresol: hydrophobic + aromatic + donor
    score = model.scoring_smiles(smiles, num_conformers=4, conformer_engine="dg")
    assert np.isfinite(score) and score > 0.0

    mol = parse_smiles(smiles)
    confs = embed_conformers(mol, 4)
    mol.coords = confs[0]
    ligand = Ligand(mol, confs, conformer_axis=0)
    assert score == pytest.approx(GraphMatcher(model, ligand).run(), rel=1e-6)


def test_score_reflection_invariance():
    """Mirror-image conformers score identically: the matcher consumes
    only pairwise distances, so tetrahedral chirality cannot matter."""
    model = _toy_model()
    mol = parse_smiles("CC(N)C(=O)Oc1ccccc1")  # has a stereocenter
    confs = embed_conformers(mol, 3, seed=9)
    mirrored = confs * np.array([-1.0, 1.0, 1.0], dtype=np.float32)
    lig = Ligand(mol, confs, conformer_axis=0)
    lig_m = Ligand(mol, mirrored, conformer_axis=0)
    s = GraphMatcher(model, lig).run()
    s_m = GraphMatcher(model, lig_m).run()
    assert s == pytest.approx(s_m, rel=1e-6)
    assert s > 0.0


def test_dg_bounds_vs_rdkit_geometry():
    """Cross-validate the bounds matrix against RDKit's own ETKDG
    geometry: every bonded/1-3 distance of an RDKit conformer must fall
    inside our raw bounds (with slack). Skipped when RDKit is absent —
    it arms automatically in any environment that has it (same pattern
    as verify_checkpoint for real weights)."""
    pytest.importorskip("rdkit")
    from rdkit import Chem
    from rdkit.Chem import rdDistGeom

    from pharmaconet_tpu.chem.embed import _bounds

    for name in ("aspirin", "caffeine", "sildenafil"):
        rdmol = Chem.MolFromSmiles(PANEL[name])
        rdmol = Chem.AddHs(rdmol)
        rdDistGeom.EmbedMultipleConfs(rdmol, 4, params=rdDistGeom.srETKDGv3())
        rdmol = Chem.RemoveHs(rdmol)
        mol = parse_smiles(PANEL[name])
        assert mol.num_atoms == rdmol.GetNumAtoms()
        lo, up = _bounds(mol)
        pairs = {(b.a, b.b) for b in mol.bonds}
        for i in range(mol.num_atoms):
            nbrs = mol.neighbors(i)
            for a in nbrs:
                for b in nbrs:
                    if a < b:
                        pairs.add((a, b))
        for conf in rdmol.GetConformers():
            pos = conf.GetPositions()
            for i, j in pairs:
                d = float(np.linalg.norm(pos[i] - pos[j]))
                assert lo[i, j] - 0.3 < d < up[i, j] + 0.3, (name, i, j, d)


def test_rdkit_engine_gate():
    """engine='rdkit' still demands RDKit explicitly (the reference's
    exact path); 'auto' must NOT raise in an RDKit-less environment."""
    import importlib.util

    if importlib.util.find_spec("rdkit") is not None:  # pragma: no cover
        pytest.skip("rdkit present: gate unobservable")
    with pytest.raises(ImportError):
        Ligand.load_from_smiles("c1ccccc1", 2, engine="rdkit")
    lig = Ligand.load_from_smiles("c1ccccc1", 2)
    assert lig.num_conformers == 2
    with pytest.raises(ValueError):
        Ligand.load_from_smiles("c1ccccc1", 2, engine="nope")
