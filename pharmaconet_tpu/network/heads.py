"""Prediction heads: cavity extraction, token scoring, conditional masks.

Rebuilds /root/reference/src/pmnet/network/{cavity_head,token_head,
mask_head}.py in channel-last flax. The mask head is the TPU-relevant
redesign: the reference loops hotspots in micro-batches of 1-4 NN calls
(module.py:261-276); here all hotspots are a single padded batch dimension
processed in fixed-size chunks inside one compiled program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .fpn import FPNDecoder
from .layers import BaseConv3d


class CavityHead(nn.Module):
    """Two conv stacks predicting narrow/wide cavity logits (cavity_head.py:8-60)."""

    feature_dim: int = 96
    hidden_dim: int = 96

    @nn.compact
    def __call__(self, features: jax.Array) -> tuple[jax.Array, jax.Array]:
        short = BaseConv3d(self.hidden_dim, kernel_size=3, name="short_conv")(features)
        short = BaseConv3d(1, kernel_size=1, use_norm=False, use_act=False, name="short_logit")(short)
        long = BaseConv3d(self.hidden_dim, kernel_size=3, name="long_conv")(features)
        long = BaseConv3d(1, kernel_size=1, use_norm=False, use_act=False, name="long_logit")(long)
        return short, long


class TokenHead(nn.Module):
    """Token feature extraction + scoring (token_head.py:7-86).

    token feature = skip(cat[voxel feature, type embedding])
                    + SiLU-MLP(cat[...]); score = ReLU-MLP -> scalar logit.
    With feature_dim 96 and token_feature_dim 192 the skip is identity.
    """

    feature_dim: int = 96
    num_interactions: int = 10
    token_feature_dim: int = 192
    num_feature_mlp_layers: int = 3
    num_score_mlp_layers: int = 3

    @nn.compact
    def __call__(self, features: jax.Array, tokens: jax.Array) -> tuple[jax.Array, jax.Array]:
        """features: [D, H, W, F]; tokens: [T, 4] int (x, y, z, type).

        Returns (scores [T], token_features [T, token_feature_dim]).
        Padded tokens (any index) produce garbage rows masked by the caller.
        """
        embedding = nn.Embed(self.num_interactions, self.feature_dim, name="interaction_embedding")
        x, y, z, t = tokens[:, 0], tokens[:, 1], tokens[:, 2], tokens[:, 3]
        voxel_feats = features[x, y, z]  # [T, F] gather
        type_feats = embedding(t)  # [T, F]
        concat = jnp.concatenate([voxel_feats, type_feats], axis=-1)  # [T, 2F]

        h = concat
        for i in range(self.num_feature_mlp_layers):
            h = nn.Dense(self.token_feature_dim, name=f"feature_mlp_{i}")(h)
            h = jax.nn.silu(h)
        if 2 * self.feature_dim != self.token_feature_dim:
            skip = nn.Dense(self.token_feature_dim, name="skip")(concat)
        else:
            skip = concat
        token_features = skip + h

        s = token_features
        for i in range(self.num_score_mlp_layers - 1):
            s = nn.Dense(self.token_feature_dim, name=f"score_mlp_{i}")(s)
            s = nn.relu(s)
        scores = nn.Dense(1, name=f"score_mlp_{self.num_score_mlp_layers - 1}")(s)
        return scores[:, 0], token_features


class MaskHead(nn.Module):
    """Per-hotspot conditional segmentation (mask_head.py:9-196).

    Each hotspot conditions the full 5-scale pyramid: a background embedding
    of its token feature is broadcast over every voxel and a point embedding
    is added at the hotspot voxel (scaled per level); a private FPN decoder
    + 1x1 conv then emits a 64^3 logit map per hotspot. Batched over K.
    """

    token_feature_dim: int = 192
    channels: int = 96
    num_levels: int = 5
    num_convs: tuple = (1, 2, 2, 2, 2)

    @nn.compact
    def __call__(
        self,
        multi_scale_features: list[jax.Array],  # top-down [[1,d,h,w,96] x5]
        tokens: jax.Array,  # [K, 4]
        token_features: jax.Array,  # [K, token_feature_dim]
    ) -> jax.Array:
        """Returns [K, D, H, W] mask logits at full resolution."""
        bottom_up = multi_scale_features[::-1]  # highest-res first
        k = tokens.shape[0]
        full = bottom_up[0].shape[1]  # Dout (=64)

        conditioned = []
        for level in range(self.num_levels):
            feats = bottom_up[level][0]  # [d, h, w, C]
            d = feats.shape[0]
            scale = full // d
            xs = tokens[:, 0] // scale
            ys = tokens[:, 1] // scale
            zs = tokens[:, 2] // scale
            background = nn.Dense(feats.shape[-1], name=f"background_mlp_{level}")(token_features)
            point = nn.Dense(feats.shape[-1], name=f"point_mlp_{level}")(token_features)
            box = jnp.broadcast_to(
                background[:, None, None, None, :], (k, d, d, d, feats.shape[-1])
            )
            box = box.at[jnp.arange(k), xs, ys, zs].add(point)
            conditioned.append(feats[None] + box)  # [K, d, h, w, C]

        decoder = FPNDecoder(
            feature_channels=(self.channels,) * self.num_levels,
            num_convs=self.num_convs,
            channels=self.channels,
            name="decoder",
        )
        top_down = decoder(conditioned)
        logits = nn.Conv(1, kernel_size=(1, 1, 1), name="conv_logits")(top_down[-1])
        return logits[..., 0]  # [K, D, H, W]
