"""Atom → voxel-grid rasterization, formulated for the MXU.

Replaces the reference's CPU molvoxel dependency
(/root/reference/src/pmnet/data/parser.py:28,95-99: Gaussian voxelizer with
resolution 0.5, dim 64, sigma=1/3; features at radii 1.5, occupancy mask at
radii 1.0).

Instead of translating molvoxel's scatter loops, the op is re-derived as a
dense voxel-tile × atom-block computation — the natural TPU formulation:

    d2[v, a] = (vx-ax)^2 + (vy-ay)^2 + (vz-az)^2   (VPU, exact f32 —
               the |v|^2 - 2 v·a + |a|^2 matmul form cancels catastrophically
               under bf16 MXU passes and is deliberately avoided)
    rbf[v, a] = exp(-d2 / (2 (sigma*r)^2)) * [d2 <= r^2]      (VPU)
    out[v, c] = rbf @ feats                 (MXU, C=33 channels, f32)

Both the 33-channel feature image (r=1.5) and the binary occupancy mask
(r=1.0) are produced from the same distance computation in one pass.

Gaussian semantics: contribution exp(-d^2 / (2 (sigma*r)^2)), truncated at
d > r, summed over atoms (molvoxel 0.2.0 'gaussian' density). Voxel centers
sit at origin = center - res*(dim-1)/2 + idx*res, matching the node-position
convention in density_map.py:16-25.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C

VOXEL_CHUNK = 8192  # voxels per lax.map step (memory/parallelism tradeoff)


def grid_coordinates(
    center: jax.Array,
    resolution: float = C.GRID_RESOLUTION,
    dim: int = C.GRID_DIM,
) -> jax.Array:
    """Voxel-center world coordinates, flattened to [dim^3, 3] (x-major)."""
    idx = jnp.arange(dim, dtype=jnp.float32)
    origin = center.astype(jnp.float32) - resolution * (dim - 1) / 2
    ax = origin[0] + idx * resolution
    ay = origin[1] + idx * resolution
    az = origin[2] + idx * resolution
    gx, gy, gz = jnp.meshgrid(ax, ay, az, indexing="ij")
    return jnp.stack([gx, gy, gz], axis=-1).reshape(-1, 3)


@functools.partial(
    jax.jit,
    static_argnames=("resolution", "dim", "feature_radius", "mask_radius", "sigma"),
)
def voxelize(
    positions: jax.Array,  # [A, 3] float32 (padded)
    features: jax.Array,  # [A, C] float32
    valid: jax.Array,  # [A] bool
    center: jax.Array,  # [3] float32
    *,
    resolution: float = C.GRID_RESOLUTION,
    dim: int = C.GRID_DIM,
    feature_radius: float = C.FEATURE_RADII,
    mask_radius: float = C.MASK_RADII,
    sigma: float = C.VOXELIZER_SIGMA,
) -> tuple[jax.Array, jax.Array]:
    """Rasterize atoms into ([D,H,W,C] float image, [D,H,W] bool occupancy).

    The occupancy output marks voxels with ANY valid atom within mask_radius;
    the pipeline's protein mask is its negation (parser.py:99).
    """
    num_channels = features.shape[-1]
    voxels = grid_coordinates(center, resolution, dim)  # [V, 3]
    positions = positions.astype(jnp.float32)
    features = jnp.where(valid[:, None], features.astype(jnp.float32), 0.0)

    # invalid atoms are pushed far away (additive penalty keeps f32 exact)
    penalty = jnp.where(valid, 0.0, 1e30)  # [A]

    inv_two_sigma_sq = 1.0 / (2.0 * (sigma * feature_radius) ** 2)
    feature_r_sq = feature_radius * feature_radius
    mask_r_sq = mask_radius * mask_radius

    def chunk_fn(voxel_chunk: jax.Array) -> tuple[jax.Array, jax.Array]:
        dx = voxel_chunk[:, 0:1] - positions[None, :, 0]  # [v, A]
        dy = voxel_chunk[:, 1:2] - positions[None, :, 1]
        dz = voxel_chunk[:, 2:3] - positions[None, :, 2]
        d2 = dx * dx + dy * dy + dz * dz + penalty[None, :]
        rbf = jnp.where(d2 <= feature_r_sq, jnp.exp(-d2 * inv_two_sigma_sq), 0.0)
        img = jnp.dot(
            rbf,
            features,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [v, C] — MXU
        occ = jnp.any(d2 <= mask_r_sq, axis=-1)
        return img, occ

    num_voxels = dim * dim * dim
    chunk = min(VOXEL_CHUNK, num_voxels)
    chunked = voxels.reshape(num_voxels // chunk, chunk, 3)
    image, occupancy = jax.lax.map(chunk_fn, chunked)
    image = image.reshape(dim, dim, dim, num_channels)
    occupancy = occupancy.reshape(dim, dim, dim)
    return image, occupancy


def voxelize_numpy(
    positions: np.ndarray,
    features: np.ndarray,
    center: np.ndarray,
    *,
    resolution: float = C.GRID_RESOLUTION,
    dim: int = C.GRID_DIM,
    feature_radius: float = C.FEATURE_RADII,
    mask_radius: float = C.MASK_RADII,
    sigma: float = C.VOXELIZER_SIGMA,
) -> tuple[np.ndarray, np.ndarray]:
    """Reference numpy implementation (direct per-atom loop) for testing."""
    num_channels = features.shape[-1]
    image = np.zeros((dim, dim, dim, num_channels), dtype=np.float64)
    occupancy = np.zeros((dim, dim, dim), dtype=bool)
    origin = np.asarray(center, dtype=np.float64) - resolution * (dim - 1) / 2
    axes = origin[:, None] + np.arange(dim)[None, :] * resolution
    inv_two_sigma_sq = 1.0 / (2.0 * (sigma * feature_radius) ** 2)
    for pos, feat in zip(positions, features):
        dx2 = (axes[0] - pos[0]) ** 2
        dy2 = (axes[1] - pos[1]) ** 2
        dz2 = (axes[2] - pos[2]) ** 2
        d2 = dx2[:, None, None] + dy2[None, :, None] + dz2[None, None, :]
        rbf = np.where(d2 <= feature_radius**2, np.exp(-d2 * inv_two_sigma_sq), 0.0)
        image += rbf[..., None] * feat[None, None, None, :]
        occupancy |= d2 <= mask_radius**2
    return image.astype(np.float32), occupancy
