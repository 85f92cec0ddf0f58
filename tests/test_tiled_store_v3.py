"""Version-3 (block-major) tile store correctness.

The v3 store writes the screen_v3 layout at prepack time — ~4x smaller
on disk than v2 (scoring/tiled_store.write_v3_store). These tests pin:
score equality against the live path, the single-program-shape guarantee
(pass-2 padding/rebuild), empty batches, and the CLI round trip with
--tiles_version 3.
"""

from __future__ import annotations

import json

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

    root = tmp_path_factory.mktemp("v3store")
    model = make_synthetic_model(num_clusters=12, seed=5)

    rng = np.random.default_rng(33)
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


def test_v3_store_scores_equal_live_path(corpus, tmp_path):
    from pharmaconet_tpu.scoring.tiled_store import TiledStore, write_v3_store

    model, packed, names, _ = corpus
    screener = BatchScreener(model, engine="v3", pallas_interpret=True)
    meta = write_v3_store(
        tmp_path / "store", screener.packed_model, packed, names,
        batch_size=16, verbose=False,
    )
    assert meta["version"] == 3
    assert meta["n_batches"] == 5

    store = TiledStore(tmp_path / "store", screener.packed_model)
    got: list[float] = []
    for bi in range(store.n_batches):
        sb = store.load(bi)
        if not sb.empty:
            # single program shape across the store
            assert sb.dt.shape == (meta["t"], meta["cmax"], sb.dt.shape[2])
            assert sb.tab.shape[1] == meta["g_cap"]
            assert sb.mn_cap == meta["mn_cap"]
        got.extend(screener.score_stored(sb))

    want = BatchScreener(model, engine="xla").score_packed(packed)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-4)
    assert sum(1 for v in want if v > 0) >= 20, "corpus too easy"


def test_v3_store_smaller_than_v2(corpus, tmp_path):
    """The point of v3: the same library packs ~4x smaller on disk."""
    from pharmaconet_tpu.scoring.tiled_store import (
        write_tiled_store,
        write_v3_store,
    )

    model, packed, names, _ = corpus
    screener = BatchScreener(model)
    write_tiled_store(
        tmp_path / "v2", screener.packed_model, packed, names,
        batch_size=32, verbose=False,
    )
    write_v3_store(
        tmp_path / "v3", screener.packed_model, packed, names,
        batch_size=32, verbose=False,
    )

    def tree_bytes(p):
        return sum(f.stat().st_size for f in p.rglob("*") if f.is_file())

    v2, v3 = tree_bytes(tmp_path / "v2"), tree_bytes(tmp_path / "v3")
    assert v3 < 0.5 * v2, (v3, v2)


def test_v3_store_empty_batch(corpus, tmp_path):
    """A batch of cluster-less ligands stores and loads as empty."""
    from pharmaconet_tpu.scoring.tiled_store import TiledStore, write_v3_store

    model, packed, names, _ = corpus
    bare = PackedLigand(
        node_pos=np.zeros((0, 1, 3), np.float32),
        node_mask=np.zeros(0, np.int32),
        clusters=[],
        cluster_mask=np.zeros(0, np.int32),
        cluster_center=np.zeros((0, 1, 3), np.float32),
        cluster_size=np.zeros((0, 1), np.float32),
        num_conformers=1,
    )
    lib = packed[:4] + [bare] * 4
    lib_names = names[:4] + [f"bare{i}" for i in range(4)]
    screener = BatchScreener(model, engine="v3", pallas_interpret=True)
    write_v3_store(
        tmp_path / "store", screener.packed_model, lib, lib_names,
        batch_size=4, verbose=False,
    )
    store = TiledStore(tmp_path / "store", screener.packed_model)
    s0 = store.load(0)
    s1 = store.load(1)
    assert not s0.empty and s1.empty
    assert screener.score_stored(s1) == [0.0] * 4
    live = screener.score_stored(s0)
    want = BatchScreener(model, engine="xla").score_packed(lib[:4])
    np.testing.assert_allclose(live, want, rtol=2e-5, atol=1e-4)


def test_v3_store_fingerprint_check(corpus, tmp_path):
    import sys

    sys.path.insert(0, "/root/repo")
    from bench import make_synthetic_model

    from pharmaconet_tpu.scoring.batch_screen import PackedModel
    from pharmaconet_tpu.scoring.tiled_store import TiledStore, write_v3_store

    model, packed, names, _ = corpus
    screener = BatchScreener(model)
    write_v3_store(
        tmp_path / "store", screener.packed_model, packed[:8], names[:8],
        batch_size=8, verbose=False,
    )
    other = PackedModel.from_model(make_synthetic_model(num_clusters=9, seed=9))
    with pytest.raises(ValueError, match="fingerprint"):
        TiledStore(tmp_path / "store", other)


def test_v3_cli_roundtrip(corpus, tmp_path):
    """prepack --tiles_version 3 -> screening --library_tiles equals the
    live screening CSV row-for-row."""
    import subprocess
    import sys

    model, packed, names, root = corpus
    model_path = tmp_path / "model.pm"
    model.save(str(model_path))

    import os

    env = dict(os.environ, JAX_PLATFORMS="cpu")

    r = subprocess.run(
        [sys.executable, "prepack.py", "-d", str(root),
         "-o", str(tmp_path / "lib.npz")],
        cwd="/root/repo", env=env, capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    r = subprocess.run(
        [sys.executable, "prepack.py", "--library", str(tmp_path / "lib.npz"),
         "-p", str(model_path), "--tiles_out", str(tmp_path / "tiles"),
         "--batch_size", "32"],
        cwd="/root/repo", env=env, capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    # v3 (block-major) is the production default layout — pin it
    assert json.loads((tmp_path / "tiles" / "meta.json").read_text())[
        "version"] == 3

    r = subprocess.run(
        [sys.executable, "screening.py", "-p", str(model_path),
         "--library_tiles", str(tmp_path / "tiles"),
         "-o", str(tmp_path / "stored.csv")],
        cwd="/root/repo", env=env, capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    r = subprocess.run(
        [sys.executable, "screening.py", "-p", str(model_path),
         "--library", str(tmp_path / "lib.npz"),
         "-o", str(tmp_path / "live.csv"), "--batch_size", "32"],
        cwd="/root/repo", env=env, capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr

    def rows(p):
        lines = p.read_text().strip().splitlines()[1:]
        return sorted(
            (ln.rsplit(",", 1)[0], float(ln.rsplit(",", 1)[1]))
            for ln in lines
        )

    stored = rows(tmp_path / "stored.csv")
    live = rows(tmp_path / "live.csv")
    assert len(stored) == len(live) == len(names)
    for (n1, s1), (n2, s2) in zip(stored, live):
        assert n1 == n2
        assert s1 == pytest.approx(s2, rel=2e-5, abs=1e-4)


def test_v3_stored_group_mesh_equality(corpus, tmp_path):
    """score_stored_group on v3 batches (one per mesh device, single
    shard_map program) equals per-batch single-device scoring."""
    from pharmaconet_tpu.parallel.screening import ShardedScreener
    from pharmaconet_tpu.scoring.tiled_store import TiledStore, write_v3_store

    model, packed, names, _ = corpus
    screener = ShardedScreener(model, engine="v3", pallas_interpret=True)
    n_dev = screener.mesh.devices.size
    assert n_dev == 8
    write_v3_store(
        tmp_path / "store", screener.packed_model, packed, names,
        batch_size=8, verbose=False,
    )
    store = TiledStore(tmp_path / "store", screener.packed_model)
    sbs = [store.load(i) for i in range(n_dev)]
    assert all(not sb.empty for sb in sbs)
    grouped = screener.score_stored_group(sbs)
    for k, sb in enumerate(sbs):
        single = screener.score_stored(store.load(k))
        np.testing.assert_allclose(grouped[k], single, rtol=2e-5, atol=1e-4)


def test_v3_stored_group_mesh_equality_sparse_wire(corpus, tmp_path):
    """The sharded grouped program handles the 7-element sparse-wire
    bucket tuples (arity-parameterized operand layout) with scores equal
    to the dense wire."""
    from pharmaconet_tpu.parallel.screening import ShardedScreener
    from pharmaconet_tpu.scoring.tiled_store import TiledStore, write_v3_store

    model, packed, names, _ = corpus
    screener = ShardedScreener(model, engine="v3", pallas_interpret=True)
    n_dev = screener.mesh.devices.size
    write_v3_store(
        tmp_path / "store", screener.packed_model, packed, names,
        batch_size=8, verbose=False, leaf_wire="sparse",
    )
    store = TiledStore(tmp_path / "store", screener.packed_model)
    sbs = [store.load(i) for i in range(n_dev)]
    assert all(len(sb.leaf_buckets[0]) == 7 for sb in sbs)
    grouped = screener.score_stored_group(sbs)
    for k, sb in enumerate(sbs):
        single = screener.score_stored(store.load(k))
        np.testing.assert_allclose(grouped[k], single, rtol=2e-5, atol=1e-4)
