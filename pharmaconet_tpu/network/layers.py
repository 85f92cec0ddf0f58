"""Shared network building blocks (flax.linen, channel-last NDHWC).

Numerical-parity notes vs the torch reference (checkpoint is frozen, so these
details are part of the contract):
  * LayerNorm eps = 1e-5 (torch default; flax default is 1e-6)
  * GELU is the exact erf form (torch nn.GELU; flax default is tanh approx)
  * BatchNorm3d runs in inference mode with checkpoint running stats
    (reference FPN/cavity convs: nn/layers.py:4-46)
"""

from __future__ import annotations

from collections.abc import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

LN_EPS = 1e-5
BN_EPS = 1e-5


def exact_gelu(x: jax.Array) -> jax.Array:
    return jax.nn.gelu(x, approximate=False)


class FrozenBatchNorm(nn.Module):
    """Inference-mode BatchNorm: y = (x - mean) * scale / sqrt(var+eps) + bias."""

    features: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        inv = scale * jax.lax.rsqrt(var + BN_EPS)
        return x * inv + (bias - mean * inv)


class BaseConv3d(nn.Module):
    """Conv3d + optional frozen BatchNorm + optional ReLU (nn/layers.py:4-46).

    Bias is present iff normalization is absent, matching the reference.
    """

    features: int
    kernel_size: int = 3
    use_norm: bool = True
    use_act: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        pad = (self.kernel_size - 1) // 2
        x = nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size,) * 3,
            padding=[(pad, pad)] * 3,
            use_bias=not self.use_norm,
            name="conv",
        )(x)
        if self.use_norm:
            x = FrozenBatchNorm(self.features, name="norm")(x)
        if self.use_act:
            x = nn.relu(x)
        return x


class Mlp(nn.Module):
    """fc1 -> GELU(exact) -> fc2 (reference swin.py:19-44; dropout is a
    no-op at inference and omitted)."""

    hidden_features: int
    out_features: int
    act: Callable[[jax.Array], jax.Array] = exact_gelu

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Dense(self.hidden_features, name="fc1")(x)
        x = self.act(x)
        x = nn.Dense(self.out_features, name="fc2")(x)
        return x


def upsample_nearest_2x(x: jax.Array) -> jax.Array:
    """Exact nearest-neighbor x2 upsampling for NDHWC (integer factor)."""
    b, d, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :, None, :], (b, d, 2, h, 2, w, 2, c))
    return x.reshape(b, d * 2, h * 2, w * 2, c)
