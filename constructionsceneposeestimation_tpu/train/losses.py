"""Training losses for heatmap regression."""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def heatmap_mse(pred: Array, target: Array, channel_weights: Array | None = None) -> Array:
    """Mean-squared error over (B, C, h, w) heatmaps.

    ``channel_weights`` (C,) can de-emphasize crowded channels (e.g. fence
    corners appear 20x per frame, humans once)."""
    err = (pred - target) ** 2
    if channel_weights is not None:
        err = err * channel_weights[None, :, None, None]
    return jnp.mean(err)


def focal_heatmap_loss(pred: Array, target: Array, alpha: float = 2.0,
                       beta: float = 4.0, eps: float = 1e-6,
                       channel_weights: Array | None = None) -> Array:
    """CenterNet-style penalty-reduced focal loss — better than MSE when
    positives are sparse (83 channels, few blobs each).

    ``channel_weights`` (C,) scales each leading-axis channel's pos AND neg
    terms — used by the detector to upweight small/rare classes (a human at
    DR range is ~6 x 20 px at 512^2; its few positive cells vanish next to
    20 fence panels without it)."""
    p = jnp.clip(jax.nn.sigmoid(pred), eps, 1.0 - eps)
    pos = (target > 0.9).astype(pred.dtype)
    neg_w = jnp.power(1.0 - target, beta)
    pos_loss = -jnp.power(1.0 - p, alpha) * jnp.log(p) * pos
    neg_loss = -jnp.power(p, alpha) * jnp.log(1.0 - p) * neg_w * (1.0 - pos)
    if channel_weights is not None:
        w = channel_weights.reshape(
            channel_weights.shape + (1,) * (pred.ndim - 1))
        pos_loss = pos_loss * w
        neg_loss = neg_loss * w
    n_pos = jnp.maximum(jnp.sum(pos), 1.0)
    return (jnp.sum(pos_loss) + jnp.sum(neg_loss)) / n_pos
