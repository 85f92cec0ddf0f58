"""v3 block-major screening engine must match the host GraphMatcher.

The v3 layout (scoring/screen_v3.py) deduplicates per-block gaussian
tables into groups and moves the model-node-pair axis in-kernel; these
tests pin (a) score equality with the exact host matcher, (b) the layout
invariants the kernel relies on, and (c) the byte-stream reduction that
motivates the layout.
"""

import numpy as np
import pytest

from pharmaconet_tpu.chem.smallmol import parse_sdf
from pharmaconet_tpu.pharmacophore.model import PharmacophoreModel
from pharmaconet_tpu.scoring.batch_screen import BatchScreener, build_batch
from pharmaconet_tpu.scoring.graph_match import GraphMatcher
from pharmaconet_tpu.scoring.ligand import Ligand
from pharmaconet_tpu.scoring.screen_v3 import TILE, build_v3_layout

from helpers import ACETATE_SDF, BENZENE_SDF, ETHANOL_SDF, _model_state


@pytest.fixture(scope="module")
def rich_model():
    nodes = [
        ("Hydrophobic", "Hydrophobic", (0.0, 0.0, 0.0), 0.9),
        ("Hydrophobic", "Hydrophobic", (1.8, 0.5, 0.0), 1.1),
        ("Aromatic", "PiStacking_P", (4.0, 1.0, 0.5), 1.4),
        ("HBond_donor", "HBond_ldon", (2.5, 3.0, 1.0), 0.8),
        ("HBond_acceptor", "HBond_pdon", (5.5, 3.5, -1.0), 0.8),
        ("Anion", "SaltBridge_lneg", (6.5, 0.0, 2.0), 1.2),
        ("Cation", "PiCation_pring", (-2.0, 2.0, 1.0), 1.0),
    ]
    clusters = [
        ("Hydrophobic", [0, 1]),
        ("Aromatic", [2]),
        ("HBond", [3]),
        ("HBond", [4]),
        ("Anion", [5]),
        ("Cation", [6]),
    ]
    model = PharmacophoreModel()
    model.__setstate__(_model_state(nodes, clusters))
    return model


def _multi_conformer(ligand_sdf: str, num_conf: int, seed: int) -> Ligand:
    mol = parse_sdf(ligand_sdf)[0].strip_hydrogens()
    rng = np.random.default_rng(seed)
    base = mol.coords
    confs = [base]
    for _ in range(num_conf - 1):
        theta = rng.uniform(0, 2 * np.pi)
        rot = np.array(
            [
                [np.cos(theta), -np.sin(theta), 0],
                [np.sin(theta), np.cos(theta), 0],
                [0, 0, 1],
            ],
            dtype=np.float32,
        )
        shifted = base @ rot.T + rng.uniform(-2, 2, size=(1, 3)).astype(np.float32)
        shifted += rng.normal(0, 0.1, size=base.shape).astype(np.float32)
        confs.append(shifted.astype(np.float32))
    return Ligand(mol, confs)


@pytest.fixture(scope="module")
def test_ligands():
    return [
        Ligand(parse_sdf(ETHANOL_SDF)[0]),
        Ligand(parse_sdf(BENZENE_SDF)[0]),
        Ligand(parse_sdf(ACETATE_SDF)[0]),
        _multi_conformer(ETHANOL_SDF, 4, seed=1),
        _multi_conformer(BENZENE_SDF, 3, seed=2),
        _multi_conformer(ACETATE_SDF, 5, seed=3),
    ]


def test_v3_engine_matches_host(rich_model, test_ligands):
    host = [GraphMatcher(rich_model, lig).run() for lig in test_ligands]
    v3 = BatchScreener(
        rich_model, engine="v3", pallas_interpret=True
    ).score_ligands(test_ligands)
    np.testing.assert_allclose(v3, host, rtol=2e-5, atol=1e-4)
    assert max(host) > 0.0


def test_v3_engine_custom_weights(rich_model, test_ligands):
    weights = {"Hydrophobic": 2.0, "Anion": 10.0, "HBond_donor": 1.0}
    host = [GraphMatcher(rich_model, lig, weights).run() for lig in test_ligands]
    v3 = BatchScreener(
        rich_model, weights, engine="v3", pallas_interpret=True
    ).score_ligands(test_ligands)
    np.testing.assert_allclose(v3, host, rtol=2e-5, atol=1e-4)


def test_v3_shifted_ligand(rich_model):
    """Far-away ligand exercises the prune/fail path."""
    mol = parse_sdf(ETHANOL_SDF)[0]
    mol.coords = mol.coords + np.float32(100.0)
    lig = Ligand(mol)
    host = GraphMatcher(rich_model, lig).run()
    v3 = BatchScreener(rich_model, engine="v3", pallas_interpret=True)
    assert v3.score_ligands([lig])[0] == pytest.approx(host, abs=1e-6)


def test_v3_layout_invariants(rich_model, test_ligands):
    from pharmaconet_tpu.scoring.batch_screen import PackedLigand

    packed = [PackedLigand.from_ligand(lig) for lig in test_ligands]
    screener = BatchScreener(rich_model, engine="v3", pallas_interpret=True)
    batch = build_batch(screener.packed_model, packed)
    vb = build_v3_layout(batch)

    t, c, tile = vb.dt.shape
    assert tile == TILE
    assert vb.aux.shape == (t, 3, tile)
    assert vb.gid.shape == (t, tile)
    # every real row count fits
    assert vb.nbt <= t * tile

    fp = vb.aux[:, 0, :].reshape(-1)
    thr = vb.aux[:, 1, :].reshape(-1)
    # tile boundaries always start a new pair segment (scan never crosses)
    assert bool((vb.aux[:, 0, 0] == 1.0).all())
    # real rows inherit their pair's threshold; padding rows are +inf.
    # (self-pairs legitimately carry +inf too, so count via the source.)
    blk_pair = batch.block_pair.astype(np.int64)
    expect_finite = int(np.isfinite(batch.pair_threshold[blk_pair]).sum())
    assert int(np.isfinite(thr).sum()) == expect_finite
    # group ids stay within each tile's table occupancy
    for ti in range(t):
        occupied = int((np.abs(vb.tab[ti]).sum(axis=1) > 0).sum())
        assert vb.gid[ti].max(initial=0) <= max(occupied - 1, 0)
    # pair_end_rows: every non-empty pair compacts from a real row
    ends = vb.pair_end_rows
    assert bool((ends[ends >= 0] < t * tile).all())
    # segments: each pair's rows are contiguous and end where recorded
    starts = np.nonzero(fp == 1.0)[0]
    assert 0 in starts


def test_v3_group_dedup_exact(rich_model, test_ligands):
    """Group table reconstruction reproduces the per-block tables bit-exactly."""
    from pharmaconet_tpu.scoring.batch_screen import PackedLigand
    from pharmaconet_tpu.scoring.screen_v3 import block_tables, group_blocks

    packed = [PackedLigand.from_ligand(lig) for lig in test_ligands]
    screener = BatchScreener(rich_model, engine="v3", pallas_interpret=True)
    batch = build_batch(screener.packed_model, packed)
    mu_b, std_b, w_b, mn, first_row, mn_cap = block_tables(batch)
    gid_of_block, rep = group_blocks(mu_b, std_b, w_b, mn)
    np.testing.assert_array_equal(rep[gid_of_block, :mn_cap], mu_b)
    np.testing.assert_array_equal(
        rep[gid_of_block, mn_cap : 2 * mn_cap], std_b
    )
    np.testing.assert_array_equal(
        rep[gid_of_block, 2 * mn_cap : 3 * mn_cap], w_b
    )
    np.testing.assert_array_equal(rep[gid_of_block, 3 * mn_cap], mn)
    # dedup actually deduplicates on this pool
    assert len(rep) < len(mu_b)


def test_v3_meta_grouping_equals_content_hash(rich_model, test_ligands):
    """group_ids_meta (the fast metadata-key dedup used at prepack time)
    produces EXACTLY the content-hash partition: same block groups (up to
    relabeling) and bit-identical group signatures. Guards the derivation
    that a block's table content is determined by
    (node_mask[u] & avail[m1], m1, node_mask[v] & avail[m2], m2)."""
    from pharmaconet_tpu.scoring.batch_screen import PackedLigand
    from pharmaconet_tpu.scoring.screen_v3 import (
        _block_offsets,
        block_tables,
        group_blocks,
        group_ids_meta,
    )

    packed = [PackedLigand.from_ligand(lig) for lig in test_ligands]
    screener = BatchScreener(rich_model, engine="v3", pallas_interpret=True)
    batch = build_batch(screener.packed_model, packed)
    assert batch.node_mask is not None  # both packers emit it

    mn, first_row = _block_offsets(batch)
    mn_cap = 16
    got = group_ids_meta(batch, screener.packed_model, mn, first_row, mn_cap)
    assert got is not None
    gid_m, sig_m = got

    mu_b, std_b, w_b, _, _, _ = block_tables(batch, mn_cap)
    gid_h, sig_h = group_blocks(mu_b, std_b, w_b, mn)

    # bijection between the two labelings over every block
    pairs = np.unique(np.stack([gid_m, gid_h], axis=1), axis=0)
    assert len(pairs) == len(sig_m) == len(sig_h)
    perm = np.empty(len(sig_m), dtype=np.int64)
    perm[pairs[:, 0]] = pairs[:, 1]
    np.testing.assert_array_equal(sig_m, sig_h[perm])


def test_v3_matches_pallas_engine_big_batch(rich_model):
    """64 jittered copies: v3 and the v2 fused engine agree on a batch
    large enough to span multiple tiles and exercise bucketing."""
    rng = np.random.default_rng(7)
    ligands = []
    for i in range(64):
        sdf = [ETHANOL_SDF, BENZENE_SDF, ACETATE_SDF][i % 3]
        mol = parse_sdf(sdf)[0].strip_hydrogens()
        mol.coords = mol.coords + rng.uniform(-3, 3, size=(1, 3)).astype(
            np.float32
        )
        ligands.append(Ligand(mol))
    v2 = BatchScreener(
        rich_model, engine="pallas", pallas_interpret=True
    ).score_ligands(ligands)
    v3 = BatchScreener(
        rich_model, engine="v3", pallas_interpret=True
    ).score_ligands(ligands)
    np.testing.assert_allclose(v3, v2, rtol=2e-5, atol=1e-4)
