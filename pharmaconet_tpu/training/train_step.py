"""Training step for the PharmacoNet detector (data-parallel over a mesh).

The reference ships a trainer for proxy heads only (developer/src/
trainer.py:25-209, Adam + exponential-decay LambdaLR + grad clip); the core
detector checkpoint is frozen. This module provides the TPU-native training
loop primitive for the detector itself: BCE losses on the cavity heads,
token scores, and per-hotspot segmentation masks, optimized with
optax adam + exponential decay + global-norm clipping.

Parallelism: pure data parallel — parameters replicated, batch sharded over
the ('data',) mesh axis; XLA inserts the gradient all-reduce (psum over ICI)
from the sharding annotations. No TP/PP at this model size (SURVEY.md §2.6).
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..network.model import PharmacoNetModel


def bce_with_logits(logits: jax.Array, labels: jax.Array, mask: jax.Array | None = None):
    loss = optax.sigmoid_binary_cross_entropy(logits, labels)
    if mask is not None:
        denom = jnp.maximum(jnp.sum(mask), 1.0)
        return jnp.sum(loss * mask) / denom
    return jnp.mean(loss)


def detector_loss(model: PharmacoNetModel, params, batch: dict[str, jax.Array]) -> jax.Array:
    """batch:
    image        [B, D, H, W, 33]
    tokens       [B, T, 4]
    token_mask   [B, T]        (1 = real token)
    token_label  [B, T]        (binary hotspot label)
    cavity_short [B, D, H, W]
    cavity_long  [B, D, H, W]
    mask_label   [B, T, D, H, W] (binary density label per token)
    """
    pyramid = model.apply(params, batch["image"], method="forward_feature")
    narrow, wide = model.apply(params, pyramid[-1], method="forward_cavity_extraction")
    cavity_loss = bce_with_logits(narrow[..., 0], batch["cavity_short"]) + bce_with_logits(
        wide[..., 0], batch["cavity_long"]
    )

    def per_sample(feats_last, pyr, tokens, token_label, token_mask, mask_label):
        scores, token_feats = model.apply(
            params, feats_last[None], tokens, method="forward_token_prediction"
        )
        token_loss = bce_with_logits(scores, token_label, token_mask)
        seg_logits = model.apply(
            params, [p[None] for p in pyr], tokens, token_feats,
            method="forward_segmentation",
        )  # [T, D, H, W]
        seg_loss = bce_with_logits(
            seg_logits, mask_label, token_mask[:, None, None, None]
        )
        return token_loss, seg_loss

    token_loss, seg_loss = jax.vmap(per_sample)(
        pyramid[-1],
        [p for p in pyramid],
        batch["tokens"],
        batch["token_label"],
        batch["token_mask"],
        batch["mask_label"],
    )
    return cavity_loss + jnp.mean(token_loss) + jnp.mean(seg_loss)


def make_optimizer(
    lr: float = 1e-3, decay_rate: float = 0.99, decay_steps: int = 1000, clip: float = 1.0
) -> optax.GradientTransformation:
    """Adam + exponential decay + grad clip (developer/src/trainer.py:165-175)."""
    schedule = optax.exponential_decay(lr, decay_steps, decay_rate)
    return optax.chain(optax.clip_by_global_norm(clip), optax.adam(schedule))


def make_train_step(
    model: PharmacoNetModel,
    optimizer: optax.GradientTransformation,
    mesh: Mesh | None = None,
) -> Callable:
    """Returns train_step(params, opt_state, batch) -> (params, opt_state, loss).

    With a mesh, the batch is sharded over 'data' and params/optimizer state
    are replicated; gradients all-reduce over ICI automatically.
    """

    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(functools.partial(detector_loss, model))(
            params, batch
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    if mesh is None:
        return jax.jit(step)

    replicated = NamedSharding(mesh, P())
    batch_sharded = NamedSharding(mesh, P("data"))
    return jax.jit(
        step,
        in_shardings=(replicated, replicated, batch_sharded),
        out_shardings=(replicated, replicated, replicated),
    )


def make_dummy_batch(
    batch_size: int, grid: int, num_tokens: int, seed: int = 0
) -> dict[str, Any]:
    """Tiny synthetic batch for smoke tests / multichip dryruns."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return {
        "image": rng.normal(0, 1, (batch_size, grid, grid, grid, 33)).astype("float32"),
        "tokens": (
            rng.integers(0, grid, (batch_size, num_tokens, 4))
            % np.array([grid, grid, grid, 10])
        ).astype("int32"),
        "token_mask": (rng.uniform(size=(batch_size, num_tokens)) > 0.2).astype("float32"),
        "token_label": rng.integers(0, 2, (batch_size, num_tokens)).astype("float32"),
        "cavity_short": rng.integers(0, 2, (batch_size, grid, grid, grid)).astype("float32"),
        "cavity_long": rng.integers(0, 2, (batch_size, grid, grid, grid)).astype("float32"),
        "mask_label": rng.integers(0, 2, (batch_size, num_tokens, grid, grid, grid)).astype(
            "float32"
        ),
    }
