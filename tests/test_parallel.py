"""Mesh-sharded screening on the 8-device virtual CPU mesh."""

import jax
import numpy as np
import pytest

from pharmaconet_tpu.parallel.mesh import data_mesh
from pharmaconet_tpu.parallel.screening import ShardedScreener
from pharmaconet_tpu.scoring.batch_screen import BatchScreener
from pharmaconet_tpu.scoring.ligand import Ligand
from pharmaconet_tpu.chem.smallmol import parse_sdf
from pharmaconet_tpu.pharmacophore.model import PharmacophoreModel

from helpers import ACETATE_SDF, BENZENE_SDF, ETHANOL_SDF, _model_state


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


@pytest.fixture(scope="module")
def model():
    nodes = [
        ("Hydrophobic", "Hydrophobic", (0.0, 0.0, 0.0), 0.9),
        ("Aromatic", "PiStacking_P", (4.0, 1.0, 0.5), 1.4),
        ("HBond_donor", "HBond_ldon", (2.5, 3.0, 1.0), 0.8),
        ("HBond_acceptor", "HBond_pdon", (5.5, 3.5, -1.0), 0.8),
        ("Anion", "SaltBridge_lneg", (6.5, 0.0, 2.0), 1.2),
    ]
    clusters = [
        ("Hydrophobic", [0]),
        ("Aromatic", [1]),
        ("HBond", [2]),
        ("HBond", [3]),
        ("Anion", [4]),
    ]
    m = PharmacophoreModel()
    m.__setstate__(_model_state(nodes, clusters))
    return m


def _ligand_batch(n: int) -> list[Ligand]:
    rng = np.random.default_rng(0)
    templates = [ETHANOL_SDF, BENZENE_SDF, ACETATE_SDF]
    out = []
    for i in range(n):
        mol = parse_sdf(templates[i % 3])[0].strip_hydrogens()
        shift = rng.uniform(-3, 3, size=(1, 3)).astype(np.float32)
        confs = [mol.coords + shift + rng.normal(0, 0.2, mol.coords.shape).astype(np.float32)
                 for _ in range(1 + i % 3)]
        out.append(Ligand(mol, confs))
    return out


def test_sharded_matches_single(model):
    ligands = _ligand_batch(25)
    single = BatchScreener(model).score_ligands(ligands)
    sharded = ShardedScreener(model, mesh=data_mesh()).score_ligands(ligands)
    np.testing.assert_allclose(sharded, single, rtol=2e-5, atol=1e-6)
    assert max(single) > 0.0


def test_sharded_modeler_matches_single(protein_pdb, ref_ligand_pdb):
    """Multi-pocket shard_map modeling must reproduce the per-pocket path."""
    from pharmaconet_tpu.module import PharmacoNet
    from pharmaconet_tpu.parallel.modeling import ShardedModeler

    pmnet = PharmacoNet(
        weight_path=None,
        score_threshold=0.0,
        verbose=False,
        max_hotspots=8,
        segmentation_chunk=4,
        grid_dim=16,
        model_kwargs=dict(
            embed_dim=8, depths=(1, 1), num_heads=(1, 2), window=2,
            token_feature_dim=16,
        ),
    )
    data1 = pmnet.parse(protein_pdb, ref_ligand_pdb)
    data2 = pmnet.parse(protein_pdb, center=np.asarray(data1.center) + 1.0)
    single = [pmnet.create_density_maps(d) for d in (data1, data2)]
    modeler = ShardedModeler(pmnet, mesh=data_mesh())
    batch = modeler.create_density_maps_batch([data1, data2])
    assert len(batch) == 2
    for infos_s, infos_b in zip(single, batch):
        assert len(infos_s) == len(infos_b)
        for a, b in zip(infos_s, infos_b):
            assert a["nci_type"] == b["nci_type"]
            assert a["hotspot_position"] == b["hotspot_position"]
            np.testing.assert_allclose(a["hotspot_score"], b["hotspot_score"], atol=1e-5)
            np.testing.assert_allclose(a["point_map"], b["point_map"], atol=1e-4)


def test_sharded_modeler_run_batch(protein_pdb, ref_ligand_pdb):
    from pharmaconet_tpu.module import PharmacoNet
    from pharmaconet_tpu.parallel.modeling import ShardedModeler

    pmnet = PharmacoNet(
        weight_path=None, score_threshold=0.0, verbose=False, max_hotspots=8,
        segmentation_chunk=4, grid_dim=16,
        model_kwargs=dict(embed_dim=8, depths=(1, 1), num_heads=(1, 2),
                          window=2, token_feature_dim=16),
    )
    modeler = ShardedModeler(pmnet, mesh=data_mesh())
    models = modeler.run_batch(
        [(protein_pdb, ref_ligand_pdb, None)] * 3
    )
    assert len(models) == 3
    assert all(isinstance(m, PharmacophoreModel) for m in models)
    # identical jobs -> identical graphs
    assert len(models[0].nodes) == len(models[1].nodes) == len(models[2].nodes)


def test_sharded_screener_pallas_engine(rich_model=None):
    """Pallas engine under shard_map on the 8-device CPU mesh (interpret)."""
    import numpy as np

    from bench import make_synthetic_ligands, make_synthetic_model
    from pharmaconet_tpu.parallel.screening import ShardedScreener
    from pharmaconet_tpu.scoring.batch_screen import BatchScreener

    model = make_synthetic_model(num_clusters=10, seed=3)
    packed = make_synthetic_ligands(48, seed=4)
    ref = BatchScreener(model, engine="xla").score_packed(packed)
    sharded = ShardedScreener(
        model, engine="pallas", pallas_interpret=True
    ).score_packed(packed)
    np.testing.assert_allclose(sharded, ref, rtol=2e-5, atol=1e-6)
    assert max(ref) > 0.0


def test_sharded_segmenter_matches_single(protein_pdb, ref_ligand_pdb):
    """Single-pocket segmentation sharded along the hotspot axis must
    reproduce the single-device dynamic-chunk path exactly (pyramid and
    params replicated, hotspots scattered over the mesh)."""
    from pharmaconet_tpu.module import PharmacoNet
    from pharmaconet_tpu.parallel.modeling import ShardedSegmenter

    pmnet = PharmacoNet(
        weight_path=None,
        score_threshold=0.0,
        verbose=False,
        max_hotspots=8,
        segmentation_chunk=4,
        grid_dim=16,
        model_kwargs=dict(
            embed_dim=8, depths=(1, 1), num_heads=(1, 2), window=2,
            token_feature_dim=16,
        ),
    )
    pmnet.focus_threshold = 0.0  # open the cavity gate (random micro net)
    data = pmnet.parse(protein_pdb, ref_ligand_pdb)
    single = pmnet.create_density_maps(data)
    assert len(single) > 4, "fixture should keep more than one chunk"

    seg = ShardedSegmenter(pmnet, mesh=data_mesh())
    sharded = seg.create_density_maps(data)
    assert len(sharded) == len(single)
    for a, b in zip(single, sharded):
        assert a["nci_type"] == b["nci_type"]
        assert a["hotspot_position"] == b["hotspot_position"]
        np.testing.assert_allclose(a["hotspot_score"], b["hotspot_score"], atol=1e-5)
        np.testing.assert_allclose(a["point_map"], b["point_map"], atol=1e-4)
