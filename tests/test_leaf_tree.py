"""Prepack-baked leaf evaluation (scoring/leaf_tree.py): the device leaf
path must score EXACTLY like the assignment-tree DFS it replaces
(reference semantics: /root/reference/src/pmnet/scoring/tree.py:55-104).

Covers: native vs Python leaf enumeration equality, device/host leaf
evaluation vs _dfs_scores on small and large models (the 40-cluster model
exercises deep trees where the <5-match None gate actually closes), v3
store roundtrips, and edge cases (cluster-less ligands, short conformer
counts, empty pairs, pruned pairs).
"""

from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

from bench import make_synthetic_ligands, make_synthetic_model
from pharmaconet_tpu.scoring import leaf_tree as lt
from pharmaconet_tpu.scoring.batch_screen import (
    BatchScreener,
    PackedModel,
    _dfs_scores,
    build_batch,
    compact_pair_table,
    host_prune_mask,
)

RTOL, ATOL = 2e-5, 1e-4


def _batch_and_table(model, packed):
    scr = BatchScreener(model, engine="xla")
    batch = build_batch(scr.packed_model, packed)
    expanded = np.asarray(scr.run_device(batch))
    table = compact_pair_table(batch, expanded)
    prune = host_prune_mask(batch, scr.packed_model)
    final = table.copy()
    final[: len(prune)][prune] = -1.0
    return batch, table, prune, final


@pytest.fixture(scope="module")
def small_case():
    model = make_synthetic_model(num_clusters=20, seed=0)
    packed = make_synthetic_ligands(192, seed=1)
    return (model,) + _batch_and_table(model, packed)


@pytest.fixture(scope="module")
def big_case():
    """40-cluster model: deeper trees, closed None gates, mn > 8."""
    model = make_synthetic_model(num_clusters=40, seed=7)
    packed = make_synthetic_ligands(96, seed=3)
    return (model,) + _batch_and_table(model, packed)


def test_native_matches_python_enumeration(small_case):
    _model, batch, _table, _prune, final = small_case
    a_py, o_py = lt.enumerate_leaves(batch, final, native=False)
    a_nat, o_nat = lt.enumerate_leaves(batch, final, native=True)
    assert np.array_equal(o_py, o_nat)
    assert np.array_equal(a_py, a_nat)
    assert o_nat[-1] > 0


@pytest.mark.parametrize("case", ["small_case", "big_case"])
def test_leaf_scores_equal_dfs(case, request):
    _model, batch, table, prune, final = request.getfixturevalue(case)
    ref = np.asarray(_dfs_scores(batch, final))
    assign, offsets = lt.enumerate_leaves(batch, final)
    lb = lt.build_leaf_arrays(
        batch, assign, offsets, np_total=table.shape[0], prune=prune
    )
    host = lt.leaf_scores_host(lb, table)
    np.testing.assert_allclose(host, ref, rtol=RTOL, atol=ATOL)
    dev = np.asarray(
        lt.leaf_scores_device(
            jnp.asarray(table), jnp.asarray(lb.rows), jnp.asarray(lb.cross),
            jnp.asarray(lb.lig), jnp.asarray(lb.conformers), lb.n_lig,
        )
    )
    np.testing.assert_allclose(dev, ref, rtol=RTOL, atol=ATOL)


def test_gate_actually_closes(big_case):
    """The <5-match None gate must be exercised: some ligand reaches 5+
    matches (otherwise the gate never closes and this suite would not
    cover the reference's skip rule, tree.py:98-101)."""
    _model, batch, _table, _prune, final = big_case
    assign, offsets = lt.enumerate_leaves(batch, final)
    matched = (assign >= 0).sum(axis=1)
    assert matched.max() >= lt.MIN_MATCHES_FOR_SKIP


def test_short_conformer_counts(small_case):
    """Ligands with fewer conformers than cmax: padded conformers must not
    leak into the mean."""
    import dataclasses

    model, *_ = small_case
    packed = make_synthetic_ligands(64, seed=11)
    # truncate conformers on a third of the pool
    cut = []
    for i, p in enumerate(packed):
        if i % 3 == 0 and p.node_pos.shape[1] > 2:
            cut.append(
                dataclasses.replace(
                    p,
                    node_pos=p.node_pos[:, :2],
                    cluster_center=p.cluster_center[:, :2],
                    cluster_size=p.cluster_size[:, :2],
                    num_conformers=2,
                )
            )
        else:
            cut.append(p)
    batch, table, prune, final = _batch_and_table(model, cut)
    assert int(batch.num_conformers.min()) < int(batch.num_conformers.max())
    ref = np.asarray(_dfs_scores(batch, final))
    assign, offsets = lt.enumerate_leaves(batch, final)
    lb = lt.build_leaf_arrays(
        batch, assign, offsets, np_total=table.shape[0], prune=prune
    )
    dev = np.asarray(
        lt.leaf_scores_device(
            jnp.asarray(table), jnp.asarray(lb.rows), jnp.asarray(lb.cross),
            jnp.asarray(lb.lig), jnp.asarray(lb.conformers), lb.n_lig,
        )
    )
    np.testing.assert_allclose(dev, ref, rtol=RTOL, atol=ATOL)


def test_store_roundtrip_leaf_vs_dfs(tmp_path):
    """write_v3_store bakes leaves by default; scores through the baked
    path equal the DFS path on the same store, including the last
    (short) batch and cluster-less ligands."""
    from pharmaconet_tpu.scoring.tiled_store import TiledStore, write_v3_store

    model = make_synthetic_model(num_clusters=14, seed=4)
    pm = PackedModel.from_model(model, None)
    packed = make_synthetic_ligands(150, seed=9)
    names = [f"l{i}" for i in range(len(packed))]
    meta = write_v3_store(
        tmp_path, pm, packed, names, batch_size=64, verbose=False
    )
    assert "leaf_nl" in meta and "leaf_r" in meta
    store = TiledStore(tmp_path, pm)
    scr = BatchScreener(model, engine="v3", pallas_interpret=True)
    leaf, dfs = [], []
    for bi in range(store.n_batches):
        sb = store.load(bi)
        assert sb.leaf_rows is not None
        assert sb.leaf_rows.shape == (meta["leaf_nl"], meta["leaf_r"])
        leaf.extend(scr.score_stored(sb))
        sb2 = store.load(bi)
        sb2.leaf_rows = sb2.leaf_cross = sb2.leaf_lig = sb2.leaf_conf = None
        dfs.extend(scr.score_stored(sb2))
    np.testing.assert_allclose(leaf, dfs, rtol=RTOL, atol=ATOL)


def test_store_without_leaves_still_works(tmp_path):
    from pharmaconet_tpu.scoring.tiled_store import TiledStore, write_v3_store

    model = make_synthetic_model(num_clusters=10, seed=2)
    pm = PackedModel.from_model(model, None)
    packed = make_synthetic_ligands(40, seed=13)
    meta = write_v3_store(
        tmp_path, pm, packed, [f"l{i}" for i in range(len(packed))],
        batch_size=32, verbose=False, bake_leaves=False,
    )
    assert "leaf_nl" not in meta
    store = TiledStore(tmp_path, pm)
    scr = BatchScreener(model, engine="v3", pallas_interpret=True)
    sb = store.load(0)
    assert sb.leaf_rows is None
    scores = scr.score_stored(sb)
    assert len(scores) == sb.batch_len
