"""Center-crop necks (part of the public network API).

Rebuilds /root/reference/src/pmnet/network/necks/center_crop.py:4-42: crop
the central region of feature maps between backbone and decoder. Not used by
the published-checkpoint architecture (builder.py wires no neck), but kept
for API parity and custom configurations. Channel-last NDHWC.
"""

from __future__ import annotations

from collections.abc import Sequence

import jax


def center_crop(x: jax.Array, size: int | Sequence[int]) -> jax.Array:
    """Crop the spatial center of [B, D, H, W, C] to `size` (int or 3-tuple)."""
    if isinstance(size, int):
        size = (size, size, size)
    _, d, h, w, _ = x.shape
    sd, sh, sw = size
    assert sd <= d and sh <= h and sw <= w, (size, x.shape)
    od, oh, ow = (d - sd) // 2, (h - sh) // 2, (w - sw) // 2
    return x[:, od : od + sd, oh : oh + sh, ow : ow + sw, :]


class CenterCropNeck:
    """Crops each pyramid level to a target size list."""

    def __init__(self, sizes: Sequence[int | Sequence[int]]):
        self.sizes = sizes

    def __call__(self, features: Sequence[jax.Array]) -> list[jax.Array]:
        assert len(features) == len(self.sizes)
        return [center_crop(f, s) for f, s in zip(features, self.sizes)]
