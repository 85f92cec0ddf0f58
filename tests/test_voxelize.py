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
