"""Proxy zoo tests: SMILES graphs, GINE encoder, TacoGFN + SBDD heads."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pharmaconet_tpu.chem.smiles import parse_smiles
from pharmaconet_tpu.proxy.data import batch_graphs, smi2graph
from pharmaconet_tpu.proxy.proxies import SBDDReward_Proxy, TacoGFN_Proxy
from pharmaconet_tpu.proxy.tacogfn import graph_batch_to_arrays


def test_smi2graph():
    g = smi2graph("c1ccccc1O")  # phenol
    assert g.num_atoms == 7
    assert len(g.edge_src) == 7
    # aromatic bonds are class 3
    assert (g.edge_class == 3).sum() == 6
    # oxygen class is 2
    assert (g.atom_class == 2).sum() == 1


def test_smiles_charges_and_chirality():
    g = smi2graph("N[C@@H](C)C(=O)[O-]")
    feats = g.atom_features
    # one negatively charged atom
    assert feats[:, 13].sum() == 1
    # one clockwise chiral center
    assert feats[:, 10].sum() == 1


def test_batch_graphs_layout():
    graphs = [smi2graph(s) for s in ["CCO", "c1ccccc1", "CC(=O)O"]]
    batch = batch_graphs(graphs, pad_multiple=8)
    assert batch.num_graphs == 3
    assert batch.atom_valid.sum() == sum(g.num_atoms for g in graphs)
    # padding atoms map to graph id == num_graphs
    assert (batch.atom_graph[~batch.atom_valid] == 3).all()


@pytest.fixture(scope="module")
def fake_features():
    rng = np.random.default_rng(0)
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
    return features, hotspot_infos


def test_tacogfn_proxy_random(fake_features):
    features, hotspot_infos = fake_features
    proxy = TacoGFN_Proxy()
    proxy._init_random()
    cache = proxy._get_cache(features, hotspot_infos)
    assert cache[0].shape == (256,)
    assert cache[1].shape == (5, 256)
    scores = proxy._scoring_list(cache, ["c1ccccc1", "C1CCCCC1", "CCO"])
    assert scores.shape == (3,)
    assert np.isfinite(scores).all()
    # batch scoring equals one-by-one scoring (padding invariance)
    single = np.concatenate([proxy._scoring_list(cache, [s]) for s in ["c1ccccc1", "C1CCCCC1", "CCO"]])
    np.testing.assert_allclose(scores, single, rtol=2e-4, atol=1e-5)


def test_sbdd_proxy_random(fake_features):
    features, hotspot_infos = fake_features
    proxy = SBDDReward_Proxy()
    proxy._init_random()
    cache = proxy._get_cache(features, hotspot_infos)
    x, pos, z, mu, std = cache
    assert x.shape == (5, 128) and pos.shape == (5, 3) and z.shape == (128,)
    assert -15.0 <= mu <= 0.0 and 0.0 <= std <= 5.0
    scores = proxy._scoring_list(cache, ["c1ccccc1", "C1CCCCC1"])
    assert scores.shape == (2,)
    assert np.isfinite(scores).all()
    # invalid-SMILES masking (sbddreward/proxy.py:54-72)
    scores3 = proxy._scoring_list(cache, ["c1ccccc1", "c11", "C1CCCCC1"])
    assert scores3[1] == 0.0
    np.testing.assert_allclose(scores3[[0, 2]], scores, rtol=2e-4, atol=1e-5)


def test_sbdd_proxy_precision_opt_in(fake_features):
    """precision='tensorfloat32' is a serving opt-in (the ComplexFormer is
    device-FLOP-bound, PERF_NOTES round-3): same params, scores close to
    the float32 default. (On the CPU backend all precisions lower to the
    same f32 ops — this pins the API and trace plumbing; the numeric
    deviation is measured on the real chip in probe_proxy_split.py.)"""
    features, hotspot_infos = fake_features
    proxy = SBDDReward_Proxy()
    proxy._init_random()
    cache = proxy._get_cache(features, hotspot_infos)
    want = proxy._scoring_list(cache, ["c1ccccc1", "CCO"])
    tf = SBDDReward_Proxy(precision="tensorfloat32")
    tf.params = proxy.params
    got = tf._scoring_list(cache, ["c1ccccc1", "CCO"])
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=1e-3)
    with pytest.raises(AssertionError):
        SBDDReward_Proxy(precision="float16")
    # bfloat16 is a true compute-dtype opt-in (params + activations cast
    # inside the trace): scores land within bf16's ~8-mantissa-bit budget
    # of the f32 path and come back as float32
    bf = SBDDReward_Proxy(precision="bfloat16")
    bf.params = proxy.params
    got_bf = bf._scoring_list(cache, ["c1ccccc1", "CCO"])
    assert got_bf.dtype == np.float32
    np.testing.assert_allclose(got_bf, want, rtol=5e-2, atol=0.3)
    # the affine tail mu + sigma*std keeps scores in the reference's
    # score regime even at bf16
    assert np.isfinite(got_bf).all()


def test_sigma_statistics(fake_features):
    features, hotspot_infos = fake_features
    proxy = SBDDReward_Proxy()
    proxy._init_random()
    cache = proxy._get_cache(features, hotspot_infos)
    proxy.put_cache("tgt", cache)
    mu, std = proxy.get_statistic("tgt")
    sigma = proxy.scoring("tgt", "CCO", return_sigma=True)
    score = proxy.scoring("tgt", "CCO")
    np.testing.assert_allclose(score, sigma * std + mu, rtol=1e-5)


def test_cache_key_lists():
    """Vendored CrossDocked2020 key lists match the reference artifacts
    (pmnet_appl/keys/{train,test}.txt, tacogfn_reward/db_keys/)."""
    from pharmaconet_tpu.proxy import load_cache_keys

    train = load_cache_keys("train")
    test = load_cache_keys("test")
    assert len(train) == 15201 and len(test) == 100
    assert train[0] == "4xe6_X" and len(set(train)) == len(train)
    taco_train = load_cache_keys("train", variant="tacogfn")
    taco_test = load_cache_keys("test", variant="tacogfn")
    assert len(taco_train) == 15207 and len(taco_test) == 100


def test_scoring_batch_size_bucketing(fake_features):
    """Variable batch sizes inside one bucket must reuse ONE compiled
    program (RL loops vary sizes every call; unbucketed shapes recompiled
    nearly every time)."""
    features, hotspot_infos = fake_features
    proxy = SBDDReward_Proxy()
    proxy._init_random()
    cache = proxy._get_cache(features, hotspot_infos)
    smiles = ["c1ccccc1", "CCO", "CC(=O)O", "CCN", "c1ccncc1", "CCC", "CCCC"]
    base = type(proxy)._apply_scoring._cache_size()
    for n in (3, 4, 5):  # all bucket to num_graphs_pad=8 with similar Vp
        proxy._scoring_list(cache, smiles[:n])
    grown = type(proxy)._apply_scoring._cache_size() - base
    assert grown <= 1, f"expected one shared program, compiled {grown}"
    # scores remain position-correct under graph-axis padding
    import numpy as np
    s3 = proxy._scoring_list(cache, smiles[:3])
    one = np.concatenate([proxy._scoring_list(cache, [s]) for s in smiles[:3]])
    np.testing.assert_allclose(s3, one, rtol=2e-4, atol=1e-5)


def test_get_cache_fused_matches_unfused(protein_pdb, ref_ligand_pdb):
    """get_cache(fused=True) keeps the pyramid device-resident; it must
    equal the reference-shaped two-step path (feature_extraction ->
    _get_cache) for both proxy families."""
    import jax
    import jax.numpy as jnp

    from pharmaconet_tpu.module import PharmacoNet
    from pharmaconet_tpu.proxy.data import batch_graphs, smi2graph
    from pharmaconet_tpu.proxy.proxies import SBDDReward_Proxy, TacoGFN_Proxy
    from pharmaconet_tpu.proxy.tacogfn import graph_batch_to_arrays

    pmnet = PharmacoNet(
        weight_path=None, score_threshold=0.0, verbose=False, max_hotspots=8,
        segmentation_chunk=4, grid_dim=16,
        model_kwargs=dict(embed_dim=8, depths=(1, 1), num_heads=(1, 2),
                          window=2, token_feature_dim=16),
    )
    pmnet.focus_threshold = 0.0
    features, _ = pmnet.feature_extraction(protein_pdb, ref_ligand_pdb)
    feats = [jnp.asarray(f) for f in features]
    for cls in (SBDDReward_Proxy, TacoGFN_Proxy):
        proxy = cls()
        proxy.pmnet = pmnet
        graphs = [smi2graph("CCO")]
        cat = cls is TacoGFN_Proxy
        batch = graph_batch_to_arrays(
            batch_graphs(graphs, pad_multiple=8), categorical=cat)
        if cat:
            proxy.params = proxy.model.init(
                jax.random.PRNGKey(0), feats, jnp.zeros((2, 16)), batch)
        else:
            proxy.params = proxy.model.init(
                jax.random.PRNGKey(0), feats, jnp.zeros((2, 16)),
                jnp.zeros((2, 3)), batch)
        fused = proxy.get_cache(protein_pdb, ref_ligand_pdb)
        two_step = proxy.get_cache(protein_pdb, ref_ligand_pdb, fused=False)
        assert len(fused) == len(two_step)
        for a, b in zip(fused, two_step):
            a, b = np.asarray(a), np.asarray(b)
            assert a.shape == b.shape
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
