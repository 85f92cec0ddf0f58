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


def test_sharded_proxy_matches_single():
    """ShardedProxyScorer over the 8-device mesh equals the proxy's
    single-device _scoring_list (padding differs per shard, so equality is
    float-associativity-tolerant), including invalid-SMILES masking and the
    small-batch fallback."""
    import jax.numpy as jnp
    from pharmaconet_tpu.parallel.proxy import ShardedProxyScorer
    from pharmaconet_tpu.proxy.proxies import SBDDReward_Proxy

    rng = np.random.default_rng(3)
    features = [
        jnp.asarray(rng.normal(0, 1, (1, d, d, d, 96)).astype(np.float32))
        for d in (4, 8, 16, 32, 64)
    ]
    hotspot_infos = [
        {
            "hotspot_feature": rng.normal(0, 1, 192).astype(np.float32),
            "hotspot_position": tuple(rng.uniform(-5, 5, 3).tolist()),
        }
        for _ in range(5)
    ]
    proxy = SBDDReward_Proxy()
    proxy._init_random()
    cache = proxy._get_cache(features, hotspot_infos)

    pool = ["c1ccccc1O", "CCO", "CC(=O)O", "c1ccncc1", "CCN(CC)CC",
            "CC(C)Cc1ccc(cc1)C(C)C(=O)O", "O=C(C)Oc1ccccc1C(=O)O"]
    smiles = [pool[i % len(pool)] for i in range(37)]
    smiles[5] = "not_a_smiles("  # invalid -> masked to 0.0

    sharded = ShardedProxyScorer(proxy, mesh=data_mesh())
    got = sharded._scoring_list(cache, smiles)
    want = proxy._scoring_list(cache, smiles)
    assert got[5] == 0.0
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    # sigma path
    got_s = sharded._scoring_list(cache, smiles, return_sigma=True)
    want_s = proxy._scoring_list(cache, smiles, return_sigma=True)
    np.testing.assert_allclose(got_s, want_s, rtol=1e-4, atol=1e-5)

    # small batch -> single-device fallback, same contract
    got_small = sharded._scoring_list(cache, smiles[:3])
    want_small = proxy._scoring_list(cache, smiles[:3])
    np.testing.assert_allclose(got_small, want_small, rtol=1e-6)

    # streaming iterator (prefetch overlap) == per-batch scoring_list,
    # including the trailing sub-2*n_dev batch that takes the fallback
    proxy.put_cache("t", cache)
    chunks = list(sharded.scoring_iter("t", iter(smiles), batch_size=16))
    assert [len(c) for c in chunks] == [16, 16, 5]
    np.testing.assert_allclose(np.concatenate(chunks), want, rtol=1e-4, atol=1e-5)


def test_sharded_proxy_tacogfn():
    """The sharded scorer also wraps TacoGFN proxies (different cache
    structure, categorical features, raise-on-invalid contract)."""
    import jax.numpy as jnp
    import pytest
    from pharmaconet_tpu.parallel.proxy import ShardedProxyScorer
    from pharmaconet_tpu.proxy.proxies import TacoGFN_Proxy

    rng = np.random.default_rng(7)
    features = [
        jnp.asarray(rng.normal(0, 1, (1, d, d, d, 96)).astype(np.float32))
        for d in (4, 8, 16, 32, 64)
    ]
    hotspot_infos = [
        {
            "hotspot_feature": rng.normal(0, 1, 192).astype(np.float32),
            "hotspot_position": tuple(rng.uniform(-5, 5, 3).tolist()),
        }
        for _ in range(4)
    ]
    proxy = TacoGFN_Proxy()
    proxy._init_random()
    cache = proxy._get_cache(features, hotspot_infos)

    pool = ["c1ccccc1O", "CCO", "CC(=O)O", "c1ccncc1", "CCN(CC)CC"]
    smiles = [pool[i % len(pool)] for i in range(29)]

    sharded = ShardedProxyScorer(proxy, mesh=data_mesh())
    got = sharded._scoring_list(cache, smiles)
    want = proxy._scoring_list(cache, smiles)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    # invalid SMILES raises (the TacoGFN contract), sigma is rejected
    with pytest.raises(ValueError):
        sharded._scoring_list(cache, smiles[:-1] + ["not_a_smiles("])
    with pytest.raises(TypeError):
        sharded._scoring_list(cache, smiles, return_sigma=True)


def test_sharded_cache_builder_matches_serial(protein_pdb, ref_ligand_pdb):
    """The fused trunk+encoder cache builder over the 8-device mesh equals
    the serial per-pocket get_cache_database for BOTH proxy families,
    including the tolerant-skip contract for unparseable pockets."""
    import jax.numpy as jnp
    from pharmaconet_tpu.module import PharmacoNet
    from pharmaconet_tpu.parallel.proxy import ShardedCacheBuilder
    from pharmaconet_tpu.proxy.data import batch_graphs, smi2graph
    from pharmaconet_tpu.proxy.proxies import SBDDReward_Proxy, TacoGFN_Proxy
    from pharmaconet_tpu.proxy.tacogfn import graph_batch_to_arrays

    pmnet = PharmacoNet(
        weight_path=None, score_threshold=0.0, verbose=False, max_hotspots=8,
        segmentation_chunk=4, grid_dim=16,
        model_kwargs=dict(embed_dim=8, depths=(1, 1), num_heads=(1, 2),
                          window=2, token_feature_dim=16),
    )
    pmnet.focus_threshold = 0.0  # random weights: keep the cavity gates open
    center = np.asarray(pmnet.get_center(ref_ligand_pdb))
    # 9 good pockets = 2 chunks on the 8-device mesh, exercising the lazy
    # parse generator + parse/compute prefetch across chunk boundaries
    pocket_info = {"p0": (protein_pdb, ref_ligand_pdb)}
    pocket_info.update({
        f"p{i}": (protein_pdb, tuple(center + 0.5 * i)) for i in range(1, 9)
    })
    pocket_info["bad"] = ("/nonexistent/protein.pdb", (0.0, 0.0, 0.0))
    good_keys = {f"p{i}" for i in range(9)}

    features, _ = pmnet.feature_extraction(protein_pdb, ref_ligand_pdb)
    feats = [jnp.asarray(f) for f in features]
    for cls in (SBDDReward_Proxy, TacoGFN_Proxy):
        proxy = cls()
        proxy.pmnet = pmnet
        graphs = [smi2graph("CCO")]
        if cls is SBDDReward_Proxy:
            batch = graph_batch_to_arrays(
                batch_graphs(graphs, pad_multiple=8), categorical=False)
            proxy.params = proxy.model.init(
                jax.random.PRNGKey(0), feats, jnp.zeros((2, 16)),
                jnp.zeros((2, 3)), batch)
        else:
            batch = graph_batch_to_arrays(
                batch_graphs(graphs, pad_multiple=8), categorical=True)
            proxy.params = proxy.model.init(
                jax.random.PRNGKey(0), feats, jnp.zeros((2, 16)), batch)

        serial = proxy.get_cache_database(dict(pocket_info), verbose=False)
        sharded = ShardedCacheBuilder(proxy, mesh=data_mesh()).get_cache_database(
            dict(pocket_info), verbose=False)
        assert set(serial) == set(sharded) == good_keys
        for key in serial:
            assert len(serial[key]) == len(sharded[key])
            for a, b in zip(serial[key], sharded[key]):
                a, b = np.asarray(a), np.asarray(b)
                assert a.shape == b.shape
                np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
