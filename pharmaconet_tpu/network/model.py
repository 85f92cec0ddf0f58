"""PharmacoNet detector: embedding trunk + three heads (flax facade).

Rebuilds /root/reference/src/pmnet/network/detector.py:12-91 and
builder.py:12-54 (hard-coded architecture of the published checkpoint).
All activations NDHWC, float32.
"""

from __future__ import annotations

from collections.abc import Sequence

import jax
from flax import linen as nn

from .fpn import FPNDecoder
from .heads import CavityHead, MaskHead, TokenHead
from .swin3d import SwinTransformerV2_3D


class PharmacoNetModel(nn.Module):
    """Facade exposing the four forward passes used by the pipeline."""

    in_channels: int = 33
    image_size: int = 64
    embed_dim: int = 96
    depths: Sequence[int] = (2, 6, 2, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window: int = 4
    token_feature_dim: int = 192
    num_interactions: int = 10

    def setup(self):
        self.backbone = SwinTransformerV2_3D(
            in_channels=self.in_channels,
            image_size=self.image_size,
            embed_dim=self.embed_dim,
            depths=self.depths,
            num_heads=self.num_heads,
            window=self.window,
        )
        dims = [self.embed_dim * 2**i for i in range(len(self.depths))]
        num_convs = (1,) + (2,) * len(self.depths)
        self.decoder = FPNDecoder(
            feature_channels=(self.in_channels, *dims),
            num_convs=num_convs,
            channels=self.embed_dim,
        )
        self.cavity_head = CavityHead(self.embed_dim, self.embed_dim)
        self.token_head = TokenHead(
            feature_dim=self.embed_dim,
            num_interactions=self.num_interactions,
            token_feature_dim=self.token_feature_dim,
        )
        self.mask_head = MaskHead(
            token_feature_dim=self.token_feature_dim,
            channels=self.embed_dim,
            num_levels=len(self.depths) + 1,
            num_convs=num_convs,
        )

    # ------------------------------------------------------------------
    def forward_feature(self, image: jax.Array) -> list[jax.Array]:
        """image [B, D, H, W, 33] -> top-down pyramid [[B,4^3,96]..[B,64^3,96]].

        The raw input is prepended as the bottom level
        (feature_embedding.py:36-51).
        """
        bottom_up = self.backbone(image)
        return self.decoder([image, *bottom_up])

    def forward_cavity_extraction(self, features: jax.Array) -> tuple[jax.Array, jax.Array]:
        """features [B,64^3,96] -> (narrow, wide) logits [B, D, H, W, 1]."""
        return self.cavity_head(features)

    def forward_token_prediction(
        self, features: jax.Array, tokens: jax.Array
    ) -> tuple[jax.Array, jax.Array]:
        """features [1,64^3,96], tokens [T,4] -> (logits [T], feats [T,192])."""
        return self.token_head(features[0], tokens)

    def forward_segmentation(
        self,
        multi_scale_features: list[jax.Array],
        tokens: jax.Array,
        token_features: jax.Array,
    ) -> jax.Array:
        """-> [K, D, H, W] mask logits."""
        return self.mask_head(multi_scale_features, tokens, token_features)

    def __call__(self, image: jax.Array, tokens: jax.Array):
        """Init-friendly combined pass (also used by the graft entry)."""
        pyramid = self.forward_feature(image)
        narrow, wide = self.forward_cavity_extraction(pyramid[-1])
        scores, token_feats = self.forward_token_prediction(pyramid[-1], tokens)
        masks = self.forward_segmentation(pyramid, tokens, token_feats)
        return pyramid, narrow, wide, scores, masks


def build_model(image_size: int = 64, **kwargs) -> PharmacoNetModel:
    """The published-checkpoint architecture (builder.py:12-54) by default;
    kwargs override for reduced test configurations."""
    return PharmacoNetModel(image_size=image_size, **kwargs)
