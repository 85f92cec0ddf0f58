"""Voxelizer tests: XLA path vs numpy reference vs Pallas kernel."""

import jax.numpy as jnp
import numpy as np
import pytest

from pharmaconet_tpu import constants as C
from pharmaconet_tpu.ops.voxelize import voxelize, voxelize_numpy
from pharmaconet_tpu.ops.voxelize_pallas import voxelize_pallas


@pytest.fixture(scope="module")
def small_system():
    rng = np.random.default_rng(0)
    num_atoms = 50
    center = np.array([10.0, -5.0, 3.0], dtype=np.float32)
    positions = center + rng.uniform(-12, 12, size=(num_atoms, 3)).astype(np.float32)
    features = rng.integers(0, 2, size=(num_atoms, 33)).astype(np.float32)
    return positions, features, center


def _pad(positions, features, total=512):
    num = len(positions)
    pos = np.zeros((total, 3), dtype=np.float32)
    feat = np.zeros((total, 33), dtype=np.float32)
    valid = np.zeros(total, dtype=bool)
    pos[:num] = positions
    feat[:num] = features
    valid[:num] = True
    return pos, feat, valid


def test_xla_matches_numpy(small_system):
    positions, features, center = small_system
    ref_img, ref_occ = voxelize_numpy(positions, features, center)
    pos, feat, valid = _pad(positions, features)
    img, occ = voxelize(jnp.array(pos), jnp.array(feat), jnp.array(valid), jnp.array(center))
    np.testing.assert_allclose(np.asarray(img), ref_img, atol=1e-4, rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(occ), ref_occ)


def test_pallas_matches_xla(small_system):
    # dim=32 keeps interpret-mode runtime manageable on one CPU core
    positions, features, center = small_system
    pos, feat, valid = _pad(positions, features)
    img_x, occ_x = voxelize(
        jnp.array(pos), jnp.array(feat), jnp.array(valid), jnp.array(center), dim=32
    )
    img_p, occ_p = voxelize_pallas(
        jnp.array(pos), jnp.array(feat), jnp.array(valid), jnp.array(center),
        dim=32, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(img_p), np.asarray(img_x), atol=1e-5, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(occ_p), np.asarray(occ_x))


def test_truncation_radius():
    # single atom at grid center: contributions drop to zero beyond 1.5 A
    center = np.zeros(3, dtype=np.float32)
    positions = np.zeros((1, 3), dtype=np.float32)
    features = np.ones((1, 1), dtype=np.float32)
    img, occ = voxelize_numpy(positions, features, center)
    d = C.GRID_DIM // 2  # voxel at exactly center - res/2 offset
    origin = -C.GRID_RESOLUTION * (C.GRID_DIM - 1) / 2
    # voxel indices within 1.5 A of origin-based position
    axes = origin + np.arange(C.GRID_DIM) * C.GRID_RESOLUTION
    gx, gy, gz = np.meshgrid(axes, axes, axes, indexing="ij")
    dist = np.sqrt(gx**2 + gy**2 + gz**2)
    assert np.all((img[..., 0] > 0) == (dist <= C.FEATURE_RADII))
    assert np.all(occ == (dist <= C.MASK_RADII))
    # peak value at nearest voxel = exp(-d2/(2*(sigma*r)^2))
    nearest = np.unravel_index(np.argmin(dist), dist.shape)
    expected = np.exp(-dist[nearest] ** 2 / (2 * (C.VOXELIZER_SIGMA * C.FEATURE_RADII) ** 2))
    np.testing.assert_allclose(img[..., 0][nearest], expected, rtol=1e-5)


def test_sum_aggregation():
    # two coincident atoms double the density
    center = np.zeros(3, dtype=np.float32)
    one = np.zeros((1, 3), dtype=np.float32)
    two = np.zeros((2, 3), dtype=np.float32)
    feat1 = np.ones((1, 1), dtype=np.float32)
    feat2 = np.ones((2, 1), dtype=np.float32)
    img1, _ = voxelize_numpy(one, feat1, center)
    img2, _ = voxelize_numpy(two, feat2, center)
    np.testing.assert_allclose(img2, 2 * img1, rtol=1e-6)


def test_closed_form_gaussian_values():
    """Exhaustive closed-form check: randomized atoms, every non-zero voxel
    value equals sum_a exp(-d^2 / (2*(sigma*r)^2)) * feat[a] with truncation
    at d > r (the molvoxel 0.2.0 'gaussian' semantics the reference
    configures at parser.py:28,96-99). molvoxel itself is not installable in
    this image, so the oracle is the kernel formula evaluated independently
    in float64."""
    import numpy as np

    from pharmaconet_tpu import constants as C
    from pharmaconet_tpu.ops.voxelize import voxelize

    rng = np.random.default_rng(123)
    dim, res = 16, C.GRID_RESOLUTION
    num_atoms, channels = 37, 5
    center = rng.uniform(-3, 3, 3).astype(np.float32)
    span = res * (dim - 1) / 2
    pos = (center + rng.uniform(-span - 1.0, span + 1.0, (num_atoms, 3))).astype(np.float32)
    feats = rng.uniform(0.0, 1.0, (num_atoms, channels)).astype(np.float32)
    valid = np.ones(num_atoms, bool)
    valid[-5:] = False

    img, occ = voxelize(pos, feats, valid, center, dim=dim)
    img, occ = np.asarray(img), np.asarray(occ)

    origin = center.astype(np.float64) - res * (dim - 1) / 2
    grid = origin + np.stack(
        np.meshgrid(*[np.arange(dim)] * 3, indexing="ij"), -1
    ) * res
    d = np.linalg.norm(grid[..., None, :] - pos[None, None, None].astype(np.float64), axis=-1)
    sr = C.VOXELIZER_SIGMA * C.FEATURE_RADII
    rbf = np.where(
        (d <= C.FEATURE_RADII) & valid[None, None, None],
        np.exp(-(d**2) / (2 * sr**2)),
        0.0,
    )
    expected = rbf @ feats.astype(np.float64)
    np.testing.assert_allclose(img, expected, atol=5e-6)
    expected_occ = ((d <= C.MASK_RADII) & valid).any(-1)
    assert (occ == expected_occ).all()
    assert expected.max() > 0.5 and expected_occ.any()  # test exercises hits


def test_module_pallas_voxelizer_end_to_end(protein_pdb, ref_ligand_pdb):
    """PharmacoNet(voxelizer='pallas') produces the same hotspots as the
    XLA voxelizer (interpret mode on CPU; real-TPU equality verified in
    probes/probe_modeling.py)."""
    import numpy as np

    from pharmaconet_tpu.module import PharmacoNet

    micro = dict(embed_dim=8, depths=(1, 1), num_heads=(1, 2), window=2,
                 token_feature_dim=16)
    kwargs = dict(weight_path=None, score_threshold=0.0, verbose=False,
                  max_hotspots=8, segmentation_chunk=4, grid_dim=16,
                  model_kwargs=micro)
    xla = PharmacoNet(voxelizer="xla", **kwargs)
    pal = PharmacoNet(voxelizer="pallas", **kwargs)
    data = xla.parse(protein_pdb, ref_ligand_pdb)
    infos_x = xla.create_density_maps(data)
    infos_p = pal.create_density_maps(data)
    assert len(infos_x) == len(infos_p)
    for a, b in zip(infos_x, infos_p):
        assert a["nci_type"] == b["nci_type"]
        np.testing.assert_allclose(a["point_map"], b["point_map"], atol=1e-5)
