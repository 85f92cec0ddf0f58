"""3D Swin Transformer V2 backbone (flax.linen, channel-last).

TPU-native reimplementation of the backbone consumed by the frozen
PharmacoNet checkpoint (/root/reference/src/pmnet/network/backbones/
swinv2.py:503-644). Architectural contract reproduced exactly:

  * patch embed: conv k2 s2 (33 -> 96) + LayerNorm (swinv2.py:450-500)
  * 4 stages, depths (2,6,2,2), heads (3,6,12,24), window 4
  * cosine attention with per-head clamped logit scale (swinv2.py:134-145)
  * continuous relative position bias: log-spaced coord table -> MLP(3,512,nH)
    -> 16*sigmoid (swinv2.py:50-77, 139-144)
  * res-post-norm blocks: x + norm1(attn(x)); x + norm2(mlp(x))
  * QUIRK (deliberate): the cyclic shift rolls only dims (1,2) of the
    [B,D,H,W,C] view — D and H, not W — while the shifted-window attention
    mask is built as if all three dims were shifted (swinv2.py:232-265,
    276-297). The frozen weights were trained with this behavior, so it is
    reproduced bit-for-bit.
  * patch merging: 8-way parity concat (d,h,w order) -> Linear(8C,2C,no bias)
    -> LayerNorm (swinv2.py:314-360)

All attention math is computed in float32 (the 1e-4 parity budget does not
allow bf16 here; the MXU matmuls still dominate and stay efficient at these
sizes: 64-token windows, 96-768 channels).
"""

from __future__ import annotations

import math
from collections.abc import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .layers import LN_EPS, Mlp

F32 = jax.lax.Precision.HIGHEST


def window_partition(x: jax.Array, window: int) -> jax.Array:
    """[B, D, H, W, C] -> [B*nW, window^3, C] (swin.py:47-68 layout)."""
    b, d, h, w, c = x.shape
    x = x.reshape(b, d // window, window, h // window, window, w // window, window, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(-1, window * window * window, c)


def window_reverse(windows: jax.Array, window: int, d: int, h: int, w: int) -> jax.Array:
    """Inverse of window_partition (swin.py:71-95)."""
    c = windows.shape[-1]
    b = windows.shape[0] // ((d // window) * (h // window) * (w // window))
    x = windows.reshape(b, d // window, h // window, w // window, window, window, window, c)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(b, d, h, w, c)


def make_cpb_table(window: int) -> np.ndarray:
    """Log-spaced relative-coordinate table [(2w-1)^3, 3] (swinv2.py:57-77).

    QUIRK (deliberate): the reference normalizes with in-place slices
    ``table[:, :, :, c] /= window-1`` on a 5-D [1, 2w-1, 2w-1, 2w-1, 3]
    tensor (swinv2.py:71-73) — index 3 is the W-OFFSET axis there, not the
    coordinate channel (the 2D SwinV2 original had 4 dims). So only W-offset
    slices 0..2 are divided (across all three coordinate channels); the
    remaining W slices keep raw offsets and scale to +-8(w-1). The frozen
    checkpoint was trained with this table, so it is reproduced bit-for-bit
    (verified against the reference buffers in test_reference_parity.py).
    """
    rng = np.arange(-(window - 1), window, dtype=np.float32)
    table = np.stack(np.meshgrid(rng, rng, rng, indexing="ij"), axis=-1)  # [2w-1]^3 x 3
    div = np.float32(max(window - 1, 1))
    for w_slice in range(min(3, table.shape[2])):
        table[:, :, w_slice, :] /= div
    table *= np.float32(8.0)
    table = np.sign(table) * np.log2(np.abs(table) + 1.0) / np.float32(math.log2(8.0))
    return table.reshape(-1, 3).astype(np.float32)


def make_relative_position_index(window: int) -> np.ndarray:
    """Pairwise relative-position index [w^3, w^3] (swinv2.py:82-95)."""
    coords = np.stack(
        np.meshgrid(np.arange(window), np.arange(window), np.arange(window), indexing="ij")
    ).reshape(3, -1)
    rel = coords[:, :, None] - coords[:, None, :]  # [3, N, N]
    rel = rel.transpose(1, 2, 0) + (window - 1)
    rel[:, :, 0] *= (2 * window - 1) * (2 * window - 1)
    rel[:, :, 1] *= 2 * window - 1
    return rel.sum(-1).astype(np.int32)


def make_shift_attn_mask(resolution: tuple[int, int, int], window: int, shift: int) -> np.ndarray:
    """Shifted-window attention mask [nW, N, N] with 0 / -100 entries.

    Built with three-axis slicing even though the data roll is two-axis —
    reproducing swinv2.py:232-261 exactly.
    """
    d, h, w = resolution
    img_mask = np.zeros((1, d, h, w, 1), dtype=np.float32)
    slices = (slice(0, -window), slice(-window, -shift), slice(-shift, None))
    cnt = 0
    for ds in slices:
        for hs in slices:
            for ws in slices:
                img_mask[:, ds, hs, ws, :] = cnt
                cnt += 1
    x = img_mask.reshape(1, d // window, window, h // window, window, w // window, window, 1)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(-1, window**3)
    diff = x[:, None, :] - x[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    """Cosine window attention with continuous relative position bias."""

    dim: int
    window: int
    num_heads: int

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array | None) -> jax.Array:
        bw, n, c = x.shape
        nh = self.num_heads
        hd = c // nh

        logit_scale = self.param(
            "logit_scale",
            lambda key, shape: jnp.full(shape, math.log(10.0), jnp.float32),
            (nh, 1, 1),
        )
        qkv_kernel = self.param(
            "qkv_kernel", nn.initializers.lecun_normal(), (c, 3 * c)
        )
        q_bias = self.param("q_bias", nn.initializers.zeros, (c,))
        v_bias = self.param("v_bias", nn.initializers.zeros, (c,))

        qkv_bias = jnp.concatenate([q_bias, jnp.zeros_like(q_bias), v_bias])
        qkv = jnp.dot(x, qkv_kernel, precision=F32) + qkv_bias
        qkv = qkv.reshape(bw, n, 3, nh, hd).transpose(2, 0, 3, 1, 4)  # [3,B,nh,N,hd]
        q, k, v = qkv[0], qkv[1], qkv[2]

        # cosine attention (swinv2.py:134-136)
        q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
        k = k / jnp.maximum(jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-12)
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k, precision=F32)
        scale = jnp.exp(jnp.minimum(logit_scale, math.log(100.0)))
        attn = attn * scale

        # continuous relative position bias (swinv2.py:139-145)
        table = jnp.asarray(make_cpb_table(self.window))  # [(2w-1)^3, 3]
        hidden = nn.Dense(512, name="cpb_fc1")(table)
        hidden = nn.relu(hidden)
        bias_table = nn.Dense(nh, use_bias=False, name="cpb_fc2")(hidden)  # [T, nh]
        index = jnp.asarray(make_relative_position_index(self.window)).reshape(-1)
        rel_bias = bias_table[index].reshape(n, n, nh).transpose(2, 0, 1)
        rel_bias = 16.0 * jax.nn.sigmoid(rel_bias)
        attn = attn + rel_bias[None]

        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(bw // nw, nw, nh, n, n) + mask[None, :, None]
            attn = attn.reshape(bw, nh, n, n)
        attn = jax.nn.softmax(attn, axis=-1)

        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v, precision=F32)
        out = out.transpose(0, 2, 1, 3).reshape(bw, n, c)
        return nn.Dense(c, name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    resolution: tuple[int, int, int]
    num_heads: int
    window: int
    shift: int
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        d, h, w = self.resolution
        b, length, c = x.shape
        window, shift = self.window, self.shift
        if min(self.resolution) <= window:
            window = min(self.resolution)
            shift = 0

        shortcut = x
        x = x.reshape(b, d, h, w, c)
        if shift > 0:
            # QUIRK: roll dims (1, 2) only — matches swinv2.py:277
            x = jnp.roll(x, shift=(-shift, -shift), axis=(1, 2))
        windows = window_partition(x, window)

        mask = None
        if shift > 0:
            mask = jnp.asarray(make_shift_attn_mask(self.resolution, window, shift))
        attn_out = WindowAttention(self.dim, window, self.num_heads, name="attn")(windows, mask)

        x = window_reverse(attn_out, window, d, h, w)
        if shift > 0:
            x = jnp.roll(x, shift=(shift, shift), axis=(1, 2))
        x = x.reshape(b, length, c)
        # res-post-norm (swinv2.py:300-303)
        x = shortcut + nn.LayerNorm(epsilon=LN_EPS, name="norm1")(x)
        mlp_out = Mlp(int(self.dim * self.mlp_ratio), self.dim, name="mlp")(x)
        x = x + nn.LayerNorm(epsilon=LN_EPS, name="norm2")(mlp_out)
        return x


class PatchMerging(nn.Module):
    dim: int
    resolution: tuple[int, int, int]

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        d, h, w = self.resolution
        b, length, c = x.shape
        x = x.reshape(b, d, h, w, c)
        # parity order x0..x7 = (d,h,w) in (000,100,010,110,001,101,011,111)
        parts = [
            x[:, di::2, hi::2, wi::2, :]
            for (di, hi, wi) in [(0, 0, 0), (1, 0, 0), (0, 1, 0), (1, 1, 0),
                                 (0, 0, 1), (1, 0, 1), (0, 1, 1), (1, 1, 1)]
        ]
        x = jnp.concatenate(parts, axis=-1).reshape(b, -1, 8 * c)
        x = nn.Dense(2 * self.dim, use_bias=False, name="reduction")(x)
        return nn.LayerNorm(epsilon=LN_EPS, name="norm")(x)


class SwinStage(nn.Module):
    dim: int
    resolution: tuple[int, int, int]
    depth: int
    num_heads: int
    window: int
    downsample: bool

    @nn.compact
    def __call__(self, x: jax.Array) -> tuple[jax.Array, jax.Array]:
        for i in range(self.depth):
            x = SwinBlock(
                dim=self.dim,
                resolution=self.resolution,
                num_heads=self.num_heads,
                window=self.window,
                shift=0 if i % 2 == 0 else self.window // 2,
                name=f"blocks_{i}",
            )(x)
        if self.downsample:
            down = PatchMerging(self.dim, self.resolution, name="downsample")(x)
            return x, down
        return x, x


class SwinTransformerV2_3D(nn.Module):
    """Backbone producing 4 scales: [96@32^3, 192@16^3, 384@8^3, 768@4^3]."""

    in_channels: int = 33
    image_size: int = 64
    patch_size: int = 2
    embed_dim: int = 96
    depths: Sequence[int] = (2, 6, 2, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window: int = 4

    @nn.compact
    def __call__(self, x: jax.Array) -> list[jax.Array]:
        """x: [B, D, H, W, C_in] -> list of [B, d, h, w, C_i] (bottom-up)."""
        b = x.shape[0]
        res0 = self.image_size // self.patch_size
        x = nn.Conv(
            features=self.embed_dim,
            kernel_size=(self.patch_size,) * 3,
            strides=(self.patch_size,) * 3,
            padding="VALID",
            name="patch_embed_proj",
        )(x)
        x = x.reshape(b, -1, self.embed_dim)
        x = nn.LayerNorm(epsilon=LN_EPS, name="patch_embed_norm")(x)

        outs = []
        num_layers = len(self.depths)
        for i in range(num_layers):
            dim = self.embed_dim * 2**i
            res = res0 // 2**i
            x_out, x = SwinStage(
                dim=dim,
                resolution=(res, res, res),
                depth=self.depths[i],
                num_heads=self.num_heads[i],
                window=self.window,
                downsample=i < num_layers - 1,
                name=f"layers_{i}",
            )(x)
            x_out = nn.LayerNorm(epsilon=LN_EPS, name=f"norm{i}")(x_out)
            outs.append(x_out.reshape(b, res, res, res, dim))
        return outs
