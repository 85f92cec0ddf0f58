"""On-device post-processing: Gaussian smoothing + density-map masking.

Fuses the reference's host/torch post-processing
(/root/reference/src/pmnet/module.py:280-288 and utils/smoothing.py:17-71)
into the modeling program:

    unavailable = NOT(box_area AND protein_mask AND cavity_narrow)
    density = sigmoid(logits); density[unavailable] = 0
    density = gaussian_smooth_5x5x5(density, sigma=0.5, zero-pad)
    density[unavailable] = 0; density[density < 0.5] = 0

The 5^3 Gaussian is separable, so it runs as three 5-tap 1-D convolutions
(VPU/MXU-friendly, no 125-tap kernel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C


def gaussian_kernel_1d(kernel_size: int = 5, sigma: float = 0.5) -> np.ndarray:
    mean = (kernel_size - 1) / 2
    x = np.arange(kernel_size, dtype=np.float64)
    k = np.exp(-(((x - mean) / sigma) ** 2) / 2)
    return (k / k.sum()).astype(np.float32)


def gaussian_smooth(maps: jax.Array, kernel_size: int = 5, sigma: float = 0.5) -> jax.Array:
    """Depthwise 3-D Gaussian smoothing with zero padding.

    maps: [K, D, H, W] -> [K, D, H, W]. Matches the reference's normalized
    product kernel exactly (separable product of normalized 1-D kernels).
    """
    kernel = jnp.asarray(gaussian_kernel_1d(kernel_size, sigma))
    pad = kernel_size // 2

    def conv_axis(x: jax.Array, axis: int) -> jax.Array:
        moved = jnp.moveaxis(x, axis, -1)
        padded = jnp.pad(moved, [(0, 0)] * (moved.ndim - 1) + [(pad, pad)])
        windows = [
            jax.lax.slice_in_dim(padded, i, i + moved.shape[-1], axis=-1)
            for i in range(kernel_size)
        ]
        out = sum(w * kernel[i] for i, w in enumerate(windows))
        return jnp.moveaxis(out, -1, axis)

    out = maps
    for axis in (1, 2, 3):
        out = conv_axis(out, axis)
    return out


def box_area_mask(tokens: jax.Array, dim: int = C.GRID_DIM) -> jax.Array:
    """Per-token spherical mask [K, dim^3-as-3D] (token_inference.py:118-146).

    Radius per interaction type: ceil((dist + 1.0) / 0.5) voxels, compared as
    voxel-distance < radius.
    """
    radii = jnp.asarray(
        [C.box_radius_voxels(t) for t in range(C.NUM_INTERACTION_TYPES)], dtype=jnp.float32
    )
    axes = jnp.arange(dim, dtype=jnp.float32)
    gx = axes[:, None, None]
    gy = axes[None, :, None]
    gz = axes[None, None, :]

    def one(token: jax.Array) -> jax.Array:
        x, y, z, t = token[0], token[1], token[2], token[3]
        d2 = (
            (gx - x.astype(jnp.float32)) ** 2
            + (gy - y.astype(jnp.float32)) ** 2
            + (gz - z.astype(jnp.float32)) ** 2
        )
        return d2 < radii[t] ** 2

    return jax.vmap(one)(tokens)


@functools.partial(jax.jit, static_argnames=("box_threshold",))
def postprocess_density(
    logits: jax.Array,  # [K, D, H, W] mask-head logits
    tokens: jax.Array,  # [K, 4]
    protein_mask: jax.Array,  # [D, H, W] bool (True = empty space)
    cavity_narrow: jax.Array,  # [D, H, W] bool
    box_threshold: float = C.DEFAULT_BOX_THRESHOLD,
) -> jax.Array:
    """Masked + smoothed + thresholded density maps [K, D, H, W]."""
    available = box_area_mask(tokens, dim=logits.shape[-1]) & protein_mask[None] & cavity_narrow[None]
    density = jax.nn.sigmoid(logits)
    density = jnp.where(available, density, 0.0)
    density = gaussian_smooth(density)
    density = jnp.where(available, density, 0.0)
    return jnp.where(density >= box_threshold, density, 0.0)


def sparse_compact(density: jax.Array, cap: int):
    """On-device nonzero compaction for the sparse density wire.

    density: [K, ...spatial] post-threshold maps (mostly zeros — masked to
    box∩protein∩cavity and thresholded at box_threshold above). Returns
    (vals[K,cap] f32, idxs[K,cap] i32 flat indices, counts[K] i32). Host
    reconstruction by scatter is exact; counts > cap signal overflow (the
    caller falls back to a dense transfer for those maps).
    """
    flat = density.reshape(density.shape[0], -1)
    nz = flat > 0.0
    counts = nz.sum(axis=1, dtype=jnp.int32)

    def compact(row_nz, row):
        (idx,) = jnp.nonzero(row_nz, size=cap, fill_value=0)
        idx = idx.astype(jnp.int32)
        return idx, row[idx]

    idxs, vals = jax.vmap(compact)(nz, flat)
    # pad lanes gathered voxel 0 — zero them so a nonzero corner voxel
    # can't leak into the padding
    lane = jnp.arange(cap, dtype=jnp.int32)[None, :]
    vals = jnp.where(lane < jnp.minimum(counts, cap)[:, None], vals, 0.0)
    return vals, idxs, counts
