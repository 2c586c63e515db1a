"""Heatmap -> keypoint decoding: soft-argmax and DARK refinement (pure JAX).

The inference half of the north star ("soft-argmax/DARK decode ... entirely on
TPU", BASELINE.json). Both decoders are batched over arbitrary leading dims
and channels; everything is static-shape reductions/gathers that XLA fuses.

* ``soft_argmax``: temperature-softmax expectation over the grid. Robust,
  differentiable, but biased toward the blob center when heatmaps clip at the
  image border.
* ``dark_decode``: hard argmax + Taylor refinement on the log-heatmap
  (Distribution-Aware coordinate Representation, Zhang et al. 2020): for a
  Gaussian heatmap, mu = peak - Hess^{-1} grad recovers the sub-pixel mode
  exactly. A small Gaussian blur stabilizes the finite differences.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def soft_argmax(heatmaps: Array, temperature: float | None = None):
    """(..., C, H, W) -> (uv (..., C, 2), score (..., C)).

    uv is in heatmap pixel units (multiply by the stride for image coords).

    ``temperature=None`` (default) uses the linear spatial expectation of the
    non-negative heatmap — exact for unclipped Gaussian blobs. A float uses a
    softmax at that temperature (sharper, but biased toward the max pixel).
    """
    *_, H, W = heatmaps.shape
    flat = heatmaps.reshape(heatmaps.shape[:-2] + (H * W,))
    if temperature is None:
        pos = jnp.maximum(flat, 0.0)
        p = pos / jnp.maximum(jnp.sum(pos, -1, keepdims=True), 1e-9)
    else:
        p = jax.nn.softmax(temperature * flat, axis=-1)
    xs = jnp.arange(W, dtype=jnp.float32)
    ys = jnp.arange(H, dtype=jnp.float32)
    grid_x = jnp.tile(xs, H)
    grid_y = jnp.repeat(ys, W)
    u = jnp.sum(p * grid_x, -1)
    v = jnp.sum(p * grid_y, -1)
    score = jnp.max(flat, -1)
    return jnp.stack([u, v], -1), score


def _gaussian_blur_3x3(h: Array) -> Array:
    """Separable 3x3 blur, kernel [1 2 1]/4 per axis, edge-padded."""
    k = jnp.asarray([0.25, 0.5, 0.25], h.dtype)
    hp = jnp.pad(h, [(0, 0)] * (h.ndim - 2) + [(1, 1), (0, 0)], mode="edge")
    h1 = k[0] * hp[..., :-2, :] + k[1] * hp[..., 1:-1, :] + k[2] * hp[..., 2:, :]
    hp = jnp.pad(h1, [(0, 0)] * (h.ndim - 2) + [(0, 0), (1, 1)], mode="edge")
    return k[0] * hp[..., :, :-2] + k[1] * hp[..., :, 1:-1] + k[2] * hp[..., :, 2:]


def dark_decode(heatmaps: Array, blur: bool = True, eps: float = 1e-8):
    """(..., C, H, W) -> (uv (..., C, 2), score (..., C)) with DARK sub-pixel
    refinement. Peaks at the border skip refinement (offset clamped to 0)."""
    *_, H, W = heatmaps.shape
    if blur:
        hm = _gaussian_blur_3x3(heatmaps)
        # Blur preserves peak amplitude poorly; renormalize per channel.
        scale = jnp.max(heatmaps, (-1, -2), keepdims=True) / (
            jnp.max(hm, (-1, -2), keepdims=True) + eps
        )
        hm = hm * scale
    else:
        hm = heatmaps
    flat = hm.reshape(hm.shape[:-2] + (H * W,))
    idx = jnp.argmax(flat, -1)
    score = jnp.take_along_axis(flat, idx[..., None], -1)[..., 0]
    py = idx // W
    px = idx % W

    logh = jnp.log(jnp.maximum(hm, eps))

    def sample(dy, dx):
        y = jnp.clip(py + dy, 0, H - 1)
        x = jnp.clip(px + dx, 0, W - 1)
        lin = y * W + x
        return jnp.take_along_axis(logh.reshape(flat.shape), lin[..., None], -1)[..., 0]

    dx = 0.5 * (sample(0, 1) - sample(0, -1))
    dy = 0.5 * (sample(1, 0) - sample(-1, 0))
    dxx = sample(0, 1) - 2.0 * sample(0, 0) + sample(0, -1)
    dyy = sample(1, 0) - 2.0 * sample(0, 0) + sample(-1, 0)
    dxy = 0.25 * (sample(1, 1) - sample(1, -1) - sample(-1, 1) + sample(-1, -1))

    det = dxx * dyy - dxy * dxy
    det_safe = jnp.where(jnp.abs(det) < eps, jnp.sign(det) * eps + eps, det)
    off_x = -(dyy * dx - dxy * dy) / det_safe
    off_y = -(dxx * dy - dxy * dx) / det_safe
    # Only trust refinement when the peak is interior, curvature is negative
    # (a real maximum), and the offset is sub-pixel.
    interior = (px > 0) & (px < W - 1) & (py > 0) & (py < H - 1)
    sane = (dxx < 0) & (dyy < 0) & (jnp.abs(off_x) < 1.0) & (jnp.abs(off_y) < 1.0)
    ok = interior & sane
    off_x = jnp.where(ok, off_x, 0.0)
    off_y = jnp.where(ok, off_y, 0.0)
    uv = jnp.stack([px + off_x, py + off_y], -1)
    return uv, score
