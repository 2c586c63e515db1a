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


def _dark_refine(logh_flat: Array, py: Array, px: Array, H: int, W: int,
                 eps: float = 1e-8):
    """DARK Taylor refinement at integer peak locations.

    logh_flat (..., H*W); py/px (..., K) -> sub-pixel offsets (..., K, 2)."""

    def sample(dy, dx):
        y = jnp.clip(py + dy, 0, H - 1)
        x = jnp.clip(px + dx, 0, W - 1)
        lin = y * W + x
        return jnp.take_along_axis(logh_flat, lin, -1)

    dx = 0.5 * (sample(0, 1) - sample(0, -1))
    dy = 0.5 * (sample(1, 0) - sample(-1, 0))
    dxx = sample(0, 1) - 2.0 * sample(0, 0) + sample(0, -1)
    dyy = sample(1, 0) - 2.0 * sample(0, 0) + sample(-1, 0)
    dxy = 0.25 * (sample(1, 1) - sample(1, -1) - sample(-1, 1) + sample(-1, -1))
    det = dxx * dyy - dxy * dxy
    det_safe = jnp.where(jnp.abs(det) < eps, jnp.sign(det) * eps + eps, det)
    off_x = -(dyy * dx - dxy * dy) / det_safe
    off_y = -(dxx * dy - dxy * dx) / det_safe
    interior = (px > 0) & (px < W - 1) & (py > 0) & (py < H - 1)
    sane = (dxx < 0) & (dyy < 0) & (jnp.abs(off_x) < 1.0) & (jnp.abs(off_y) < 1.0)
    ok = interior & sane
    return jnp.stack([jnp.where(ok, off_x, 0.0), jnp.where(ok, off_y, 0.0)], -1)


def extract_peaks(heatmaps: Array, max_peaks: int = 8, blur: bool = True,
                  eps: float = 1e-8):
    """Multi-instance decoding: top-K 3x3 local maxima per channel with DARK
    sub-pixel refinement.

    Class-level channels carry one blob PER INSTANCE (e.g. 20 fence panels);
    single-argmax decoding recovers only the strongest. Returns
    (uv (..., C, K, 2), scores (..., C, K)) sorted by score descending.
    """
    *_, H, W = heatmaps.shape
    if blur:
        hm = _gaussian_blur_3x3(heatmaps)
        scale = jnp.max(heatmaps, (-1, -2), keepdims=True) / (
            jnp.max(hm, (-1, -2), keepdims=True) + eps)
        hm = hm * scale
    else:
        hm = heatmaps
    # 3x3 max-pool via two separable 3-taps (edge-padded).
    mp = hm
    pad = [(0, 0)] * (hm.ndim - 2)
    mp = jnp.pad(mp, pad + [(1, 1), (0, 0)], mode="edge")
    mp = jnp.maximum(jnp.maximum(mp[..., :-2, :], mp[..., 1:-1, :]), mp[..., 2:, :])
    mp = jnp.pad(mp, pad + [(0, 0), (1, 1)], mode="edge")
    mp = jnp.maximum(jnp.maximum(mp[..., :, :-2], mp[..., :, 1:-1]), mp[..., :, 2:])
    is_peak = hm >= mp
    flat = jnp.where(is_peak, hm, 0.0).reshape(hm.shape[:-2] + (H * W,))
    scores, idx = jax.lax.top_k(flat, max_peaks)
    py = idx // W
    px = idx % W
    logh = jnp.log(jnp.maximum(hm, eps)).reshape(flat.shape)
    off = _dark_refine(logh, py, px, H, W, eps)
    uv = jnp.stack([px.astype(jnp.float32), py.astype(jnp.float32)], -1) + off
    return uv, scores


def associate_peaks(
    uv_pk: Array,  # (..., C, P, 2) peak pixel coords (FULL-resolution units)
    sc_pk: Array,  # (..., C, P) peak scores
    channels: Array,  # (O, K) int32 heatmap channel per instance keypoint, -1 pad
    bbox2d: Array,  # (..., O, 4) [u_min, v_min, u_max, v_max]; -1 if unseen
    margin: float = 8.0,
):
    """Peak-to-instance association: class-level channels carry one blob per
    instance (20 fence panels share a channel), so instance-resolved keypoints
    need the peaks routed to owners. Routing key: the instance's 2D box
    (expanded by ``margin`` px) — each (instance, keypoint) slot takes the
    highest-scoring peak of its channel inside the owner's box.

    Boxes come from a detector at inference or from the renderer's
    pixel-tight ``bbox2d`` labels at evaluation (the reference has no 2D
    boxes at all — generate_construction_data.py labels are 3D-only — this
    is part of the TPU build's instance-level extension).

    Returns (uv (..., O, K, 2), score (..., O, K)); score 0 where no peak of
    the right channel lands in the box (or the slot is padding).
    """
    O, K = channels.shape
    ch_flat = jnp.maximum(channels, 0).reshape(-1)  # (O*K,)
    pk = jnp.take(uv_pk, ch_flat, axis=-3)  # (..., O*K, P, 2)
    sc = jnp.take(sc_pk, ch_flat, axis=-2)  # (..., O*K, P)
    lead = pk.shape[:-3]
    pk = pk.reshape(lead + (O, K) + pk.shape[-2:])  # (..., O, K, P, 2)
    sc = sc.reshape(lead + (O, K, sc.shape[-1]))  # (..., O, K, P)

    box = bbox2d[..., :, None, None, :]  # (..., O, 1, 1, 4)
    u, v = pk[..., 0], pk[..., 1]
    inside = (
        (u >= box[..., 0] - margin) & (u <= box[..., 2] + margin)
        & (v >= box[..., 1] - margin) & (v <= box[..., 3] + margin)
        & (box[..., 2] >= 0)  # unseen instances have -1 boxes
    )
    sc_gated = jnp.where(inside & (channels >= 0)[..., None], sc, 0.0)
    best = jnp.argmax(sc_gated, axis=-1)  # (..., O, K)
    uv = jnp.take_along_axis(pk, best[..., None, None], axis=-2)[..., 0, :]
    score = jnp.take_along_axis(sc_gated, best[..., None], axis=-1)[..., 0]
    return uv, score


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
