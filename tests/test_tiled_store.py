"""Tile store (prepack-time device layout) correctness.

The store moves the per-batch host pack to prepack time
(scoring/tiled_store.py). These tests pin: score equality against the
live pack-at-screen-time path (which is itself reference-parity-tested in
test_scoring_reference_parity.py), the single-program-shape guarantee,
fingerprint validation, and the CLI round trip.
"""

from __future__ import annotations

import numpy as np
import pytest

from pharmaconet_tpu.scoring.batch_screen import BatchScreener, PackedLigand
from pharmaconet_tpu.scoring.ligand import Ligand


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    import sys

    sys.path.insert(0, "/root/repo")
    from bench import make_synthetic_model
    from test_cli_scale import _random_molecule, _to_sdf

    root = tmp_path_factory.mktemp("tilestore")
    model = make_synthetic_model(num_clusters=12, seed=5)

    rng = np.random.default_rng(21)
    packed: list[PackedLigand] = []
    names: list[str] = []
    for i in range(70):
        elements, coords, bonds = _random_molecule(rng)
        path = root / f"m{i:02d}.sdf"
        path.write_text(_to_sdf(f"m{i:02d}", elements, coords, bonds))
        lig = Ligand.load_from_file(path)
        if i % 5 == 0:
            base = np.asarray(lig.mol.coords, dtype=np.float32)
            confs = [base + rng.normal(0, 0.3, base.shape).astype(np.float32)
                     for _ in range(2 + i % 3)]
            lig = Ligand(lig.mol, atom_positions=confs)
        packed.append(PackedLigand.from_ligand(lig))
        names.append(f"m{i:02d}")
    return model, packed, names, root


def test_stored_scores_equal_live_path(corpus, tmp_path):
    from pharmaconet_tpu.scoring.tiled_store import TiledStore, write_tiled_store

    model, packed, names, _ = corpus
    screener = BatchScreener(model, engine="pallas", pallas_interpret=True)
    meta = write_tiled_store(
        tmp_path / "store", screener.packed_model, packed, names,
        batch_size=16, verbose=False,
    )
    assert meta["n_batches"] == 5  # 70 ligands / 16 (last batch partial)

    store = TiledStore(tmp_path / "store", screener.packed_model)
    got: list[float] = []
    for bi in range(store.n_batches):
        sb = store.load(bi)
        # single program shape: every non-empty batch shares the store width
        if sb.gtab is not None:
            assert sb.gtab.shape[0] * sb.gtab.shape[3] == meta["width"]
            assert sb.pos_blocks.shape[1] == 3 * meta["cmax"]
        got.extend(screener.score_stored(sb))

    reference = BatchScreener(model, engine="xla")
    want = reference.score_packed(packed)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-4)
    assert sum(1 for v in want if v > 0) >= 20, "corpus too easy"


def test_iter_loaded_matches_load(corpus, tmp_path):
    """The prefetching iterator yields exactly what per-index load does,
    in order, for both store layouts (and survives early termination)."""
    from pharmaconet_tpu.scoring.tiled_store import (
        TiledStore, write_tiled_store, write_v3_store,
    )

    model, packed, names, _ = corpus
    screener = BatchScreener(model, engine="pallas", pallas_interpret=True)
    for label, writer in (("v2", write_tiled_store), ("v3", write_v3_store)):
        writer(tmp_path / label, screener.packed_model, packed, names,
               batch_size=16, verbose=False)
        store = TiledStore(tmp_path / label, screener.packed_model)
        order = list(range(store.n_batches))
        seen = []
        for bi, sb in store.iter_loaded(order, prefetch=2):
            seen.append(bi)
            want = store.load(bi)
            assert sb.empty == want.empty
            if not sb.empty:
                np.testing.assert_array_equal(
                    np.asarray(sb.dt if label == "v3" else sb.gtab),
                    np.asarray(want.dt if label == "v3" else want.gtab),
                )
                np.testing.assert_array_equal(sb.prune, want.prune)
                np.testing.assert_array_equal(sb.live_index, want.live_index)
        assert seen == order
        # subset + early break: the producer thread must be reaped cleanly
        it = store.iter_loaded(order[1:], prefetch=1)
        bi, _ = next(it)
        assert bi == order[1]
        it.close()


def test_store_v2_dt_and_v1_fallback(corpus, tmp_path):
    """v2 stores carry prepack-time conformer distances (dt.npy) and score
    through the dt kernel; a v1 store (no dt, version=1) still loads and
    scores identically via the in-kernel one-hot fallback."""
    import json
    import shutil

    from pharmaconet_tpu.scoring.tiled_store import (
        STORE_VERSION, TiledStore, write_tiled_store,
    )

    model, packed, names, _ = corpus
    screener = BatchScreener(model, engine="pallas", pallas_interpret=True)
    meta = write_tiled_store(
        tmp_path / "v2", screener.packed_model, packed[:32], names[:32],
        batch_size=16, verbose=False,
    )
    assert meta["version"] == STORE_VERSION == 2

    store = TiledStore(tmp_path / "v2", screener.packed_model)
    v2_scores: list[float] = []
    for bi in range(store.n_batches):
        sb = store.load(bi)
        if sb.gtab is not None:
            assert sb.dt is not None
            assert sb.dt.shape == (sb.gtab.shape[0], sb.pos_blocks.shape[1] // 3,
                                   sb.gtab.shape[3])
        v2_scores.extend(screener.score_stored(sb))

    # dt matches the in-kernel derivation on the same batch (host oracle)
    from pharmaconet_tpu.scoring.screen_tiles import tile_distances

    sb0 = store.load(0)
    np.testing.assert_array_equal(
        np.asarray(sb0.dt),
        tile_distances(np.asarray(sb0.pos_blocks), np.asarray(sb0.uv)),
    )

    # downgrade to v1: strip dt.npy, rewrite meta version
    shutil.copytree(tmp_path / "v2", tmp_path / "v1")
    for p in (tmp_path / "v1" / "batches").rglob("dt.npy"):
        p.unlink()
    mpath = tmp_path / "v1" / "meta.json"
    m = json.loads(mpath.read_text())
    m["version"] = 1
    mpath.write_text(json.dumps(m))

    v1_store = TiledStore(tmp_path / "v1", screener.packed_model)
    v1_scores: list[float] = []
    for bi in range(v1_store.n_batches):
        sb = v1_store.load(bi)
        if sb.gtab is not None:
            assert sb.dt is None
        v1_scores.extend(screener.score_stored(sb))
    np.testing.assert_allclose(v1_scores, v2_scores, rtol=2e-5, atol=1e-4)


def test_tile_dt_native_matches_numpy(corpus, monkeypatch):
    """The C++ tile_dt (-ffp-contract=off) is BIT-identical to the numpy
    fallback — store contents don't depend on which implementation packed
    them."""
    import pharmaconet_tpu.native as native
    from pharmaconet_tpu.scoring.screen_tiles import tile_distances
    from pharmaconet_tpu.scoring.tiled_pack import build_tiled_batch

    model, packed, _, _ = corpus
    screener = BatchScreener(model)
    tb = build_tiled_batch(screener.packed_model, packed[:24], threads=1)
    assert tb is not None
    assert native.get_tile_dt() is not None, "native toolchain expected in CI"
    got = tile_distances(tb.pos_blocks, tb.uv)
    monkeypatch.setattr(native, "get_tile_dt", lambda: None)
    want = tile_distances(tb.pos_blocks, tb.uv)
    np.testing.assert_array_equal(got, want)


def test_store_fingerprint_rejects_other_model(corpus, tmp_path):
    from bench import make_synthetic_model

    from pharmaconet_tpu.scoring.batch_screen import PackedModel
    from pharmaconet_tpu.scoring.tiled_store import TiledStore, write_tiled_store

    model, packed, names, _ = corpus
    screener = BatchScreener(model, engine="pallas", pallas_interpret=True)
    write_tiled_store(
        tmp_path / "store", screener.packed_model, packed[:8], names[:8],
        batch_size=8, verbose=False,
    )
    other = PackedModel.from_model(make_synthetic_model(num_clusters=9, seed=99))
    with pytest.raises(ValueError, match="different pharmacophore"):
        TiledStore(tmp_path / "store", other)
    # different weights change the baked-in tables too (pick a type the
    # synthetic model actually contains so the weight vector changes)
    present = model.nodes[0].type
    same_nodes = PackedModel.from_model(model, {present: 123.0})
    with pytest.raises(ValueError, match="different pharmacophore"):
        TiledStore(tmp_path / "store", same_nodes)


def test_cli_tiles_roundtrip(corpus, tmp_path):
    from pharmaconet_tpu.cli.prepack import build_parser as prepack_parser
    from pharmaconet_tpu.cli.prepack import main as prepack_main
    from pharmaconet_tpu.cli.screening import build_parser as screening_parser
    from pharmaconet_tpu.cli.screening import main as screening_main
    from pharmaconet_tpu.scoring.library import save_library

    model, packed, names, root = corpus
    pm_path = tmp_path / "model.pm"
    model.save(str(pm_path))
    lib_path = tmp_path / "lib.npz"
    save_library(lib_path, packed, names)

    assert prepack_main(prepack_parser().parse_args([
        "--library", str(lib_path), "-p", str(pm_path),
        "--tiles_out", str(tmp_path / "tiles"), "--batch_size", "32",
    ])) == 0

    out_npz = tmp_path / "npz.csv"
    assert screening_main(screening_parser().parse_args([
        "-p", str(pm_path), "--library", str(lib_path), "-o", str(out_npz),
    ])) == 0
    out_tiles = tmp_path / "tiles.csv"
    assert screening_main(screening_parser().parse_args([
        "-p", str(pm_path), "--library_tiles", str(tmp_path / "tiles"),
        "-o", str(out_tiles),
    ])) == 0

    rows_npz = dict(l.rsplit(",", 1) for l in out_npz.read_text().strip().splitlines()[1:])
    rows_tiles = dict(l.rsplit(",", 1) for l in out_tiles.read_text().strip().splitlines()[1:])
    assert set(rows_npz) == set(rows_tiles)
    for n in rows_npz:
        assert abs(float(rows_npz[n]) - float(rows_tiles[n])) <= 1e-4 + 2e-5 * abs(float(rows_npz[n]))


def test_cli_tiles_resume(corpus, tmp_path):
    """Resume works at ligand granularity on the tiles path: done entries
    keep their recorded scores, missing ligands are (re)scored."""
    from pharmaconet_tpu.cli.prepack import build_parser as prepack_parser
    from pharmaconet_tpu.cli.prepack import main as prepack_main
    from pharmaconet_tpu.cli.screening import build_parser as screening_parser
    from pharmaconet_tpu.cli.screening import main as screening_main
    from pharmaconet_tpu.scoring.library import save_library

    model, packed, names, _ = corpus
    pm_path = tmp_path / "model.pm"
    model.save(str(pm_path))
    lib_path = tmp_path / "lib.npz"
    save_library(lib_path, packed, names)
    assert prepack_main(prepack_parser().parse_args([
        "--library", str(lib_path), "-p", str(pm_path),
        "--tiles_out", str(tmp_path / "tiles"), "--batch_size", "32",
    ])) == 0

    out = tmp_path / "res.csv"
    (tmp_path / "res.csv.partial").write_text(
        f"0,{names[0]},321.5\n3,{names[3]},322.5\n"
    )
    assert screening_main(screening_parser().parse_args([
        "-p", str(pm_path), "--library_tiles", str(tmp_path / "tiles"),
        "-o", str(out),
    ])) == 0
    rows = dict(l.rsplit(",", 1) for l in out.read_text().strip().splitlines()[1:])
    assert len(rows) == len(names)
    assert float(rows[names[0]]) == 321.5
    assert float(rows[names[3]]) == 322.5
    assert not (tmp_path / "res.csv.partial").exists()


def test_stored_group_mesh_equality(corpus, tmp_path):
    """score_stored_group (one stored batch per mesh device, single
    shard_map program) equals per-batch single-device scoring."""
    from pharmaconet_tpu.parallel.screening import ShardedScreener
    from pharmaconet_tpu.scoring.tiled_store import TiledStore, write_tiled_store

    model, packed, names, _ = corpus
    screener = ShardedScreener(model, engine="pallas", pallas_interpret=True)
    n_dev = screener.mesh.devices.size
    assert n_dev == 8
    write_tiled_store(
        tmp_path / "store", screener.packed_model, packed, names,
        batch_size=8, verbose=False,
    )
    store = TiledStore(tmp_path / "store", screener.packed_model)
    sbs = [store.load(i) for i in range(n_dev)]
    assert all(sb.gtab is not None for sb in sbs)
    grouped = screener.score_stored_group(sbs)
    for k, sb in enumerate(sbs):
        single = screener.score_stored(store.load(k))
        np.testing.assert_allclose(grouped[k], single, rtol=2e-5, atol=1e-4)
