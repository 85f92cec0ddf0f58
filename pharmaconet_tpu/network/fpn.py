"""Top-down FPN decoder (flax.linen, channel-last).

Rebuilds /root/reference/src/pmnet/network/decoders/fpn_decoder.py:10-115:
lateral 1x1 conv stacks + nearest x2 upsampling + 3x3 conv stacks, all to 96
channels, emitted top-down (lowest resolution first). Used twice in the
model: the feature-embedding FPN over (input, 4 backbone scales) and the
mask-head's private decoder over 5 conditioned 96-channel scales.
"""

from __future__ import annotations

from collections.abc import Sequence

import jax
from flax import linen as nn

from .layers import BaseConv3d, upsample_nearest_2x


class FPNDecoder(nn.Module):
    feature_channels: Sequence[int] = (33, 96, 192, 384, 768)
    num_convs: Sequence[int] = (1, 2, 2, 2, 2)
    channels: int = 96

    @nn.compact
    def __call__(self, features: Sequence[jax.Array]) -> list[jax.Array]:
        """features: bottom-up [highest-res, ..., lowest-res] NDHWC.
        Returns top-down [lowest-res, ..., highest-res], each ``channels``-d.
        """
        num_levels = len(features)
        assert num_levels == len(self.feature_channels)
        fpn = None
        outs = []
        for level in range(num_levels - 1, -1, -1):
            x = features[level]
            if level == num_levels - 1:
                # top level: identity lateral, conv stack may change channels
                fpn = x
            else:
                lateral = BaseConv3d(self.channels, kernel_size=1, name=f"lateral_{level}")(x)
                fpn = lateral + upsample_nearest_2x(fpn)
            for j in range(self.num_convs[level]):
                fpn = BaseConv3d(self.channels, kernel_size=3, name=f"fpn_{level}_{j}")(fpn)
            outs.append(fpn)
        return outs
