"""Prepack-baked leaf evaluation (scoring/leaf_tree.py): the device leaf
path must score EXACTLY like the assignment-tree DFS it replaces
(reference semantics: /root/reference/src/pmnet/scoring/tree.py:55-104).

Covers: native vs Python leaf enumeration equality, the dense-window MXU
evaluation (device + numpy mirror) vs _dfs_scores on small and large
models (the 40-cluster model exercises deep trees where the <5-match None
gate actually closes), the heavy-tail outlier demotion (tight caps force
host-DFS ligands), v3 store roundtrips, and edge cases (cluster-less
ligands, short conformer counts, empty pairs, pruned pairs).
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


def _dense_from_batch(batch, table, prune, l_cap=None, w_cap=None, nbt=None):
    """Bake a DenseLeafBatch against an in-memory ScreenBatch: the window
    maps to a synthetic [NP(+1), C] 'kernel rows' table whose row i holds
    pair i (plus a zero row for empty pairs), so the dense evaluation can
    be checked without a real v3 kernel layout. Caps default to the data
    maxima (no outliers) — fixed huge caps would allocate [B, L, W] bool
    planes in the GB range."""
    final = table.copy()
    final[: len(prune)][prune] = -1.0
    assign, offsets = lt.enumerate_leaves(batch, final)
    ps, conf, ao, cc = lt._dfs_arrays(batch)
    np_total = table.shape[0]
    rnd8 = lambda n: max(8, ((int(n) + 7) // 8) * 8)  # noqa: E731
    if l_cap is None:
        l_cap = rnd8(np.diff(offsets).max(initial=1))
    if w_cap is None:
        w_cap = rnd8(np.diff(np.append(ps, np_total)).max(initial=1))
    # pair-end rows in the synthetic layout: pair i ends at row i; empty
    # pairs (all-zero table rows AND not covered by any candidate...) are
    # not distinguished here, so every pair is 'real' — the zero-sentinel
    # path is exercised by the store roundtrip tests instead
    pair_end_rows = np.arange(np_total, dtype=np.int64)
    lb = lt.build_leaf_dense(
        assign, offsets, ps, conf, ao, cc, pair_end_rows, prune,
        l_cap=l_cap, w_cap=w_cap, nbt=np_total,
        batch_size=len(conf),
    )
    rows = np.ascontiguousarray(table, np.float32)  # prune folds on device
    return lb, rows, conf, offsets


def test_native_matches_python_enumeration(small_case):
    _model, batch, _table, _prune, final = small_case
    a_py, o_py = lt.enumerate_leaves(batch, final, native=False)
    a_nat, o_nat = lt.enumerate_leaves(batch, final, native=True)
    assert np.array_equal(o_py, o_nat)
    assert np.array_equal(a_py, a_nat)
    assert o_nat[-1] > 0


@pytest.mark.parametrize("case", ["small_case", "big_case"])
def test_dense_leaf_scores_equal_dfs(case, request):
    _model, batch, table, prune, final = request.getfixturevalue(case)
    ref = np.asarray(_dfs_scores(batch, final))
    lb, rows, conf, offsets = _dense_from_batch(
        batch, table, prune
    )
    assert len(lb.out_live) == 0  # caps cover everything here
    host, _ = lt.leaf2_scores_host(rows, lb, conf)
    np.testing.assert_allclose(host, ref, rtol=RTOL, atol=ATOL)
    dev, _out = lt.leaf2_scores_device(
        jnp.asarray(rows), jnp.asarray(lb.ends2),
        jnp.asarray(lb.plane_score), jnp.asarray(lb.plane_cross),
        jnp.asarray(lb.prune_w), jnp.asarray(conf),
        jnp.asarray(lb.out_ends), w_cap=lb.prune_w.shape[1],
    )
    np.testing.assert_allclose(np.asarray(dev), ref, rtol=RTOL, atol=ATOL)


def test_outlier_demotion_equals_dfs(small_case):
    """Tight caps force heavy ligands into the outlier set; the dense
    scores for the rest plus the outlier sub-table DFS must reproduce the
    full DFS exactly."""
    import types

    _model, batch, table, prune, final = small_case
    ref = np.asarray(_dfs_scores(batch, final))
    lb, rows, conf, offsets = _dense_from_batch(
        batch, table, prune, l_cap=32, w_cap=128
    )
    assert len(lb.out_live) > 0  # the point of this test
    host, out_rows = lt.leaf2_scores_host(rows, lb, conf)
    tbl = np.asarray(out_rows, np.float32)[: lb.n_out_rows].copy()
    tbl[lb.out_prune[: lb.n_out_rows]] = -1.0
    duck = types.SimpleNamespace(
        dfs_arrays=(
            lb.out_pair_starts, lb.out_conformers,
            lb.out_active_offsets, lb.out_cand_counts,
        )
    )
    out_scores = _dfs_scores(duck, tbl)
    merged = host.copy()
    for k, li in enumerate(lb.out_live):
        merged[int(li)] = out_scores[k]
    np.testing.assert_allclose(merged, ref, rtol=RTOL, atol=ATOL)


def test_near_zero_gate_flags(small_case):
    """Ligands whose gate-relevant (cross, real, unpruned) pair scores sit
    within SIGN_EPS of zero are flagged for host-DFS demotion (ADVICE r4:
    cross-backend f32 rounding can flip a near-zero sign and change the
    baked leaf set)."""
    _model, batch, table, prune, final = small_case
    ps, conf, ao, cc = lt._dfs_arrays(batch)
    pair_end_rows = np.arange(table.shape[0], dtype=np.int64)
    base = lt.near_zero_gate_flags(batch, final, pair_end_rows, prune)
    assert not base.any()  # real tables don't sit at 1e-30

    # inject a tiny value into one ligand's first UNPRUNED cross row
    bounds = np.append(ps, table.shape[0]).astype(np.int64)

    def first_real_cross(i):
        lo = int(bounds[i]) + int(cc[ao[i]:ao[i + 1]].sum())
        hi = int(bounds[i + 1])
        for r in range(lo, hi):
            if not prune[r]:
                return r
        return None

    li, row = next(
        (i, r) for i in range(len(conf))
        if conf[i] > 0 and ao[i + 1] - ao[i] >= 2
        and (r := first_real_cross(i)) is not None
    )
    n_self = int(cc[ao[li]:ao[li + 1]].sum())
    poked = final.copy()
    poked[row, 0] = 1e-33
    flags = lt.near_zero_gate_flags(batch, poked, pair_end_rows, prune)
    assert flags[li] and flags.sum() == 1

    # the same value on a PRUNED row must not flag (sign-exact -1.0 forced)
    poked2 = final.copy()
    pr2 = prune.copy()
    pr2[row] = True
    poked2[row, 0] = 1e-33
    flags2 = lt.near_zero_gate_flags(batch, poked2, pair_end_rows, pr2)
    assert not flags2[li]

    # a tiny SELF row (not gate-relevant) must not flag
    poked3 = final.copy()
    poked3[int(ps[li]), 0] = 1e-33
    flags3 = lt.near_zero_gate_flags(batch, poked3, pair_end_rows, prune)
    assert not flags3[li]


def test_force_demote_equals_dfs(small_case):
    """force_demote sends a ligand to the outlier host-DFS set regardless
    of caps, and merged scores still equal the full DFS."""
    import types

    _model, batch, table, prune, final = small_case
    ref = np.asarray(_dfs_scores(batch, final))
    assign, offsets = lt.enumerate_leaves(batch, final)
    ps, conf, ao, cc = lt._dfs_arrays(batch)
    np_total = table.shape[0]
    rnd8 = lambda n: max(8, ((int(n) + 7) // 8) * 8)  # noqa: E731
    demote = np.zeros(len(conf), bool)
    demote[[3, 17, 42]] = True
    lb = lt.build_leaf_dense(
        assign, offsets, ps, conf, ao, cc,
        np.arange(np_total, dtype=np.int64), prune,
        l_cap=rnd8(np.diff(offsets).max(initial=1)),
        w_cap=rnd8(np.diff(np.append(ps, np_total)).max(initial=1)),
        nbt=np_total, batch_size=len(conf), force_demote=demote,
    )
    assert set(np.asarray(lb.out_live)) >= {3, 17, 42}
    rows = np.ascontiguousarray(table, np.float32)
    host, out_rows = lt.leaf2_scores_host(rows, lb, conf)
    tbl = np.asarray(out_rows, np.float32)[: lb.n_out_rows].copy()
    tbl[lb.out_prune[: lb.n_out_rows]] = -1.0
    duck = types.SimpleNamespace(
        dfs_arrays=(
            lb.out_pair_starts, lb.out_conformers,
            lb.out_active_offsets, lb.out_cand_counts,
        )
    )
    out_scores = _dfs_scores(duck, tbl)
    merged = host.copy()
    for k, li in enumerate(lb.out_live):
        merged[int(li)] = out_scores[k]
    np.testing.assert_allclose(merged, ref, rtol=RTOL, atol=ATOL)


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
    lb, rows, conf, _ = _dense_from_batch(
        batch, table, prune
    )
    dev, _ = lt.leaf2_scores_device(
        jnp.asarray(rows), jnp.asarray(lb.ends2),
        jnp.asarray(lb.plane_score), jnp.asarray(lb.plane_cross),
        jnp.asarray(lb.prune_w), jnp.asarray(conf),
        jnp.asarray(lb.out_ends), w_cap=lb.prune_w.shape[1],
    )
    np.testing.assert_allclose(np.asarray(dev), ref, rtol=RTOL, atol=ATOL)


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
        tmp_path, pm, packed, names, batch_size=64, verbose=False,
        leaf_layout="single",
    )
    assert "leaf2_l" in meta and "leaf2_w" in meta
    store = TiledStore(tmp_path, pm)
    scr = BatchScreener(model, engine="v3", pallas_interpret=True)
    leaf, dfs = [], []
    for bi in range(store.n_batches):
        sb = store.load(bi)
        assert sb.leaf2_ps is not None
        assert sb.leaf2_ps.shape == (
            64, meta["leaf2_l"], meta["leaf2_w"] // 8
        )
        leaf.extend(scr.score_stored(sb))
        sb2 = store.load(bi)
        sb2.leaf2_ps = sb2.leaf2_pc = sb2.leaf2_pw = None
        sb2.leaf2_ends = sb2.leaf2_out_ends = sb2.leaf2_out = None
        dfs.extend(scr.score_stored(sb2))
    np.testing.assert_allclose(leaf, dfs, rtol=RTOL, atol=ATOL)


def test_store_roundtrip_with_forced_outliers(tmp_path):
    """Stores whose cap selection demotes ligands to the host DFS must
    still match the pure-DFS scores (exercises the zero-sentinel empty
    pairs and the outlier sub-table end to end)."""
    from pharmaconet_tpu.scoring import tiled_store as ts

    model = make_synthetic_model(num_clusters=20, seed=5)
    pm = PackedModel.from_model(model, None)
    packed = make_synthetic_ligands(96, seed=21)
    ts.write_v3_store(
        tmp_path, pm, packed, [f"l{i}" for i in range(len(packed))],
        batch_size=96, verbose=False, leaf_caps=(24, 128),
        leaf_layout="single",
    )
    store = ts.TiledStore(tmp_path, pm)
    scr = BatchScreener(model, engine="v3", pallas_interpret=True)
    sb = store.load(0)
    assert sb.leaf2_ps is not None
    assert len(sb.leaf2_out["live"]) > 0
    leaf = scr.score_stored(sb)
    sb2 = store.load(0)
    sb2.leaf2_ps = sb2.leaf2_pc = sb2.leaf2_pw = None
    sb2.leaf2_ends = sb2.leaf2_out_ends = sb2.leaf2_out = None
    dfs = scr.score_stored(sb2)
    np.testing.assert_allclose(leaf, dfs, rtol=RTOL, atol=ATOL)


def test_bucketed_store_roundtrip_vs_dfs(tmp_path):
    """The DEFAULT store layout is now width-class buckets: baked-leaf
    scores through the bucketed device path equal the host-DFS path on
    the same store, last short batch and cluster-less ligands included."""
    from pharmaconet_tpu.scoring.tiled_store import TiledStore, write_v3_store

    model = make_synthetic_model(num_clusters=14, seed=4)
    pm = PackedModel.from_model(model, None)
    packed = make_synthetic_ligands(150, seed=9)
    meta = write_v3_store(
        tmp_path, pm, packed, [f"l{i}" for i in range(len(packed))],
        batch_size=64, verbose=False,
    )
    assert "leaf2_buckets" in meta and "leaf2_l" not in meta
    specs = meta["leaf2_buckets"]
    assert all(w % 64 == 0 for _b, _l, w in specs)
    store = TiledStore(tmp_path, pm)
    scr = BatchScreener(model, engine="v3", pallas_interpret=True)
    leaf, dfs = [], []
    for bi in range(store.n_batches):
        sb = store.load(bi)
        assert sb.leaf_buckets is not None and sb.leaf_nb == 64
        assert len(sb.leaf_buckets) == len(specs)
        leaf.extend(scr.score_stored(sb))
        sb2 = store.load(bi)
        sb2.leaf_buckets = None
        sb2.leaf2_ends = sb2.leaf2_out_ends = sb2.leaf2_out = None
        dfs.extend(scr.score_stored(sb2))
    np.testing.assert_allclose(leaf, dfs, rtol=RTOL, atol=ATOL)


def test_bucketed_matches_single_layout(tmp_path):
    """Bucketed and single-cap layouts of the SAME library score
    identically (they evaluate the same baked leaves)."""
    from pharmaconet_tpu.scoring.tiled_store import TiledStore, write_v3_store

    model = make_synthetic_model(num_clusters=20, seed=5)
    pm = PackedModel.from_model(model, None)
    packed = make_synthetic_ligands(96, seed=21)
    scr = BatchScreener(model, engine="v3", pallas_interpret=True)
    scores = {}
    for layout in ("buckets", "single"):
        d = tmp_path / layout
        write_v3_store(
            d, pm, packed, [f"l{i}" for i in range(len(packed))],
            batch_size=96, verbose=False, leaf_layout=layout,
        )
        sb = TiledStore(d, pm).load(0)
        scores[layout] = np.asarray(scr.score_stored(sb))
    np.testing.assert_allclose(
        scores["buckets"], scores["single"], rtol=1e-6, atol=1e-7
    )


def test_sparse_wire_matches_dense(tmp_path):
    """The sparse leaf wire (set-bit flat indices, device-side scatter
    densify) scores BIT-identically to the dense bit-plane wire on CPU —
    the einsums see the same one-hot planes (on TPU the two programs tile
    differently: chip-measured max 7.6e-6 abs) — and the store is
    smaller."""
    from pharmaconet_tpu.scoring.tiled_store import TiledStore, write_v3_store

    model = make_synthetic_model(num_clusters=20, seed=5)
    pm = PackedModel.from_model(model, None)
    packed = make_synthetic_ligands(96, seed=21)
    scr = BatchScreener(model, engine="v3", pallas_interpret=True)
    scores, bytes_ = {}, {}
    for wire in ("dense", "sparse"):
        d = tmp_path / wire
        write_v3_store(
            d, pm, packed, [f"l{i}" for i in range(len(packed))],
            batch_size=96, verbose=False, leaf_wire=wire,
        )
        sb = TiledStore(d, pm).load(0)
        if wire == "sparse":
            assert len(sb.leaf_buckets[0]) == 7  # sparse tuple shape
            assert sb.leaf_buckets[0][1].dtype == np.int32
        scores[wire] = np.asarray(scr.score_stored(sb))
        bytes_[wire] = sum(
            f.stat().st_size
            for f in (d / "batches" / "00000").glob("leafb*")
        )
    np.testing.assert_array_equal(scores["sparse"], scores["dense"])
    assert bytes_["sparse"] < bytes_["dense"]


def test_sparse_wire_cli_roundtrip(tmp_path):
    """prepack --leaf_wire sparse -> screening CLI == dense-wire CSV."""
    import os
    import subprocess
    import sys as _sys

    from pharmaconet_tpu.scoring.library import save_library

    model = make_synthetic_model(num_clusters=20, seed=5)
    mp = tmp_path / "model.pm"
    model.save(str(mp))
    packed = make_synthetic_ligands(64, seed=3)
    lib = tmp_path / "lib.npz"
    save_library(lib, packed, [f"l{i}" for i in range(len(packed))])
    csvs = {}
    for wire in ("dense", "sparse"):
        tiles = tmp_path / f"tiles_{wire}"
        r = subprocess.run(
            [_sys.executable, "prepack.py", "--library", str(lib),
             "-p", str(mp), "--tiles_out", str(tiles),
             "--batch_size", "64", "--leaf_wire", wire],
            cwd="/root/repo", capture_output=True, text=True,
            env={**os.environ, "JAX_PLATFORMS": "cpu"},
        )
        assert r.returncode == 0, r.stderr[-2000:]
        out = tmp_path / f"scores_{wire}.csv"
        r = subprocess.run(
            [_sys.executable, "screening.py", "-p", str(mp),
             "--library_tiles", str(tiles), "-o", str(out)],
            cwd="/root/repo", capture_output=True, text=True,
            env={**os.environ, "JAX_PLATFORMS": "cpu"},
        )
        assert r.returncode == 0, r.stderr[-2000:]
        csvs[wire] = out.read_text()
    assert csvs["sparse"] == csvs["dense"]


def test_bucketed_forced_outliers(tmp_path):
    """Tight demotion caps on a bucketed store still route heavy ligands
    through the host-DFS outlier set with exact scores."""
    from pharmaconet_tpu.scoring import tiled_store as ts

    model = make_synthetic_model(num_clusters=20, seed=5)
    pm = PackedModel.from_model(model, None)
    packed = make_synthetic_ligands(96, seed=21)
    ts.write_v3_store(
        tmp_path, pm, packed, [f"l{i}" for i in range(len(packed))],
        batch_size=96, verbose=False, leaf_caps=(24, 128),
    )
    store = ts.TiledStore(tmp_path, pm)
    scr = BatchScreener(model, engine="v3", pallas_interpret=True)
    sb = store.load(0)
    assert sb.leaf_buckets is not None
    assert len(sb.leaf2_out["live"]) > 0
    leaf = scr.score_stored(sb)
    sb2 = store.load(0)
    sb2.leaf_buckets = None
    sb2.leaf2_ends = sb2.leaf2_out_ends = sb2.leaf2_out = None
    dfs = scr.score_stored(sb2)
    np.testing.assert_allclose(leaf, dfs, rtol=RTOL, atol=ATOL)


def test_multi_host_mirror_matches_device(tmp_path):
    """leaf2_scores_multi_host (numpy) == leaf2_scores_multi (device) on
    a real bucketed store batch — the chip-CI einsum-precision contract."""
    import types

    from pharmaconet_tpu.ops.screen_pallas import score_tiles_v3_rows
    from pharmaconet_tpu.scoring.tiled_store import TiledStore, write_v3_store

    model = make_synthetic_model(num_clusters=14, seed=4)
    pm = PackedModel.from_model(model, None)
    packed = make_synthetic_ligands(80, seed=31)
    write_v3_store(
        tmp_path, pm, packed, [f"l{i}" for i in range(len(packed))],
        batch_size=80, verbose=False,
    )
    sb = TiledStore(tmp_path, pm).load(0)
    rows = np.asarray(score_tiles_v3_rows(
        jnp.asarray(sb.dt), jnp.asarray(sb.gid), jnp.asarray(sb.tab),
        jnp.asarray(sb.aux), depth=sb.depth, mn_cap=sb.mn_cap,
        g_cap=sb.g_cap, interpret=True,
    ), np.float32)
    bake = types.SimpleNamespace(
        buckets=[
            types.SimpleNamespace(
                **dict(zip(
                    ("ends2", "plane_score", "plane_cross", "prune_w",
                     "conf", "lig_idx"),
                    lt.store_bucket_planes(b),
                ))
            )
            for b in sb.leaf_buckets
        ],
        out_ends=np.asarray(sb.leaf2_out_ends),
    )
    host, out_h = lt.leaf2_scores_multi_host(rows, bake, sb.leaf_nb)
    buckets = tuple(
        tuple(jnp.asarray(np.asarray(a)) for a in b)
        for b in sb.leaf_buckets
    )
    dev, out_d = lt.leaf2_scores_multi(
        jnp.asarray(rows), jnp.asarray(np.asarray(sb.leaf2_out_ends)),
        buckets, nb=sb.leaf_nb,
    )
    np.testing.assert_allclose(np.asarray(dev), host, rtol=2e-6, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(out_d), np.asarray(out_h))


def test_split_s_einsum_within_score_tolerance(tmp_path):
    """The opt-in split-S evaluation (2 default-precision bf16 passes on
    the hi/lo value split instead of one HIGHEST f32 matmul) must stay
    inside the repo score tolerance vs the HIGHEST path."""
    from pharmaconet_tpu.ops.screen_pallas import score_tiles_v3_rows
    from pharmaconet_tpu.scoring.tiled_store import TiledStore, write_v3_store

    model = make_synthetic_model(num_clusters=14, seed=4)
    pm = PackedModel.from_model(model, None)
    packed = make_synthetic_ligands(80, seed=31)
    write_v3_store(
        tmp_path, pm, packed, [f"l{i}" for i in range(len(packed))],
        batch_size=80, verbose=False,
    )
    sb = TiledStore(tmp_path, pm).load(0)
    rows = score_tiles_v3_rows(
        jnp.asarray(sb.dt), jnp.asarray(sb.gid), jnp.asarray(sb.tab),
        jnp.asarray(sb.aux), depth=sb.depth, mn_cap=sb.mn_cap,
        g_cap=sb.g_cap, interpret=True,
    )
    buckets = tuple(
        tuple(jnp.asarray(np.asarray(a)) for a in b)
        for b in sb.leaf_buckets
    )
    oends = jnp.asarray(np.asarray(sb.leaf2_out_ends))
    base, _ = lt.leaf2_scores_multi(rows, oends, buckets, nb=sb.leaf_nb)
    split, _ = lt.leaf2_scores_multi(
        rows, oends, buckets, nb=sb.leaf_nb, split_s=True
    )
    np.testing.assert_allclose(
        np.asarray(split), np.asarray(base), rtol=RTOL, atol=ATOL
    )


def test_store_without_leaves_still_works(tmp_path):
    from pharmaconet_tpu.scoring.tiled_store import TiledStore, write_v3_store

    model = make_synthetic_model(num_clusters=10, seed=2)
    pm = PackedModel.from_model(model, None)
    packed = make_synthetic_ligands(40, seed=13)
    meta = write_v3_store(
        tmp_path, pm, packed, [f"l{i}" for i in range(len(packed))],
        batch_size=32, verbose=False, bake_leaves=False,
    )
    assert "leaf2_l" not in meta
    store = TiledStore(tmp_path, pm)
    scr = BatchScreener(model, engine="v3", pallas_interpret=True)
    sb = store.load(0)
    assert sb.leaf2_ps is None
    scores = scr.score_stored(sb)
    assert len(scores) == sb.batch_len
