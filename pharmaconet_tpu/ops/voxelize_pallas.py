"""Pallas TPU kernel for atom→grid voxelization.

Same math as ops.voxelize (molvoxel-semantics Gaussian rasterization,
re-derived as distance matrix + channel matmul), but fused in one kernel so
the [voxels, atoms] RBF matrix never round-trips through HBM:

  * grid over voxel tiles (TILE_V flat voxels per program)
  * voxel coordinates are derived from program_id with iota — the grid is
    never materialized in memory
  * inner fori_loop over atom blocks: distance^2 on the VPU, channel
    accumulation rbf @ feats on the MXU
  * the occupancy mask (radius 1.0) is computed from the same distances

The kernel is numerically identical to the XLA path (tests compare both).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import constants as C

TILE_V = 1024  # voxels per program (flat; 2048 overflows the 16MB VMEM budget)
ATOM_BLOCK = 512  # atoms per inner-loop step
LANE = 128


def _kernel(
    params_ref,  # SMEM [8]: ox, oy, oz, res, fr2, mr2, inv2s2, dim
    positions_ref,  # VMEM [A, 3]
    pos_sq_ref,  # VMEM [A_blocks, ATOM_BLOCK] (padded-invalid = 1e30)
    features_ref,  # VMEM [A, C_pad]
    image_ref,  # VMEM out [TILE_V, C_pad]
    occ_ref,  # VMEM out [TILE_V, LANE] (column 0 meaningful)
):
    tile = pl.program_id(0)
    dim = params_ref[7].astype(jnp.int32)
    res = params_ref[3]
    fr2 = params_ref[4]
    mr2 = params_ref[5]
    inv2s2 = params_ref[6]

    # voxel world coordinates for this tile, derived from flat indices
    flat = tile * TILE_V + jax.lax.broadcasted_iota(jnp.int32, (TILE_V, 1), 0)
    ix = flat // (dim * dim)
    iy = (flat // dim) % dim
    iz = flat % dim
    vx = params_ref[0] + ix.astype(jnp.float32) * res  # [TILE_V, 1]
    vy = params_ref[1] + iy.astype(jnp.float32) * res
    vz = params_ref[2] + iz.astype(jnp.float32) * res

    num_blocks = pos_sq_ref.shape[0]
    num_channels = image_ref.shape[1]

    def body(blk, carry):
        image_acc, occ_acc = carry
        a0 = blk * ATOM_BLOCK
        pos = positions_ref[pl.ds(a0, ATOM_BLOCK), :]  # [AB, 3]
        ax = pos[:, 0].reshape(1, ATOM_BLOCK)
        ay = pos[:, 1].reshape(1, ATOM_BLOCK)
        az = pos[:, 2].reshape(1, ATOM_BLOCK)
        penalty = pos_sq_ref[blk, :].reshape(1, ATOM_BLOCK)  # 0 valid / 1e30 pad
        # exact f32 per-coordinate distances on the VPU (no cancellation)
        dx = vx - ax
        dy = vy - ay
        dz = vz - az
        d2 = dx * dx + dy * dy + dz * dz + penalty  # [TILE_V, AB]
        rbf = jnp.where(d2 <= fr2, jnp.exp(-d2 * inv2s2), 0.0)
        feats = features_ref[pl.ds(a0, ATOM_BLOCK), :]  # [AB, C_pad]
        image_acc = image_acc + jnp.dot(
            rbf,
            feats,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        occ_hit = jnp.max(jnp.where(d2 <= mr2, 1.0, 0.0), axis=1, keepdims=True)
        occ_acc = jnp.maximum(occ_acc, occ_hit)
        return image_acc, occ_acc

    image0 = jnp.zeros((TILE_V, num_channels), dtype=jnp.float32)
    occ0 = jnp.zeros((TILE_V, 1), dtype=jnp.float32)
    image, occ = jax.lax.fori_loop(0, num_blocks, body, (image0, occ0))
    image_ref[:, :] = image
    occ_ref[:, :] = jnp.broadcast_to(occ, (TILE_V, LANE))


@functools.partial(
    jax.jit,
    static_argnames=("resolution", "dim", "feature_radius", "mask_radius", "sigma", "interpret"),
)
def voxelize_pallas(
    positions: jax.Array,  # [A, 3] float32, A % ATOM_BLOCK == 0
    features: jax.Array,  # [A, C]
    valid: jax.Array,  # [A] bool
    center: jax.Array,  # [3]
    *,
    resolution: float = C.GRID_RESOLUTION,
    dim: int = C.GRID_DIM,
    feature_radius: float = C.FEATURE_RADII,
    mask_radius: float = C.MASK_RADII,
    sigma: float = C.VOXELIZER_SIGMA,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Fused Pallas voxelizer; returns ([D,H,W,C] image, [D,H,W] occupancy)."""
    num_atoms, num_channels = features.shape
    if num_atoms % ATOM_BLOCK != 0:
        pad = ATOM_BLOCK - num_atoms % ATOM_BLOCK
        positions = jnp.pad(positions, ((0, pad), (0, 0)))
        features = jnp.pad(features, ((0, pad), (0, 0)))
        valid = jnp.pad(valid, (0, pad))
        num_atoms += pad
    c_pad = (num_channels + LANE - 1) // LANE * LANE
    features = jnp.pad(features.astype(jnp.float32), ((0, 0), (0, c_pad - num_channels)))
    features = jnp.where(valid[:, None], features, 0.0)

    positions = positions.astype(jnp.float32)
    # additive distance penalty: 0 for valid atoms, 1e30 for padding
    pos_sq = jnp.where(valid, 0.0, 1e30).reshape(num_atoms // ATOM_BLOCK, ATOM_BLOCK)

    origin = center.astype(jnp.float32) - resolution * (dim - 1) / 2
    inv2s2 = 1.0 / (2.0 * (sigma * feature_radius) ** 2)
    params = jnp.concatenate(
        [
            origin,
            jnp.array(
                [
                    resolution,
                    feature_radius * feature_radius,
                    mask_radius * mask_radius,
                    inv2s2,
                    float(dim),
                ],
                dtype=jnp.float32,
            ),
        ]
    )

    num_voxels = dim * dim * dim
    grid = (num_voxels // TILE_V,)
    image, occ = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE_V, c_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_V, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((num_voxels, c_pad), jnp.float32),
            jax.ShapeDtypeStruct((num_voxels, LANE), jnp.float32),
        ],
        interpret=interpret,
    )(params, positions, pos_sq, features)

    image = image[:, :num_channels].reshape(dim, dim, dim, num_channels)
    occupancy = occ[:, 0].reshape(dim, dim, dim) > 0.5
    return image, occupancy
