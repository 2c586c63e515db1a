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


def _dense_dark_offsets(hm: Array, eps: float = 1e-8):
    """DARK Taylor offsets computed DENSELY per pixel (fused shifted-view
    arithmetic — no gathers). Returns (off_x, off_y, ok) maps; ``ok`` is
    false at borders and non-maxima, where refinement must be skipped."""
    *_, H, W = hm.shape
    pad = [(0, 0)] * (hm.ndim - 2)
    lp = jnp.pad(jnp.log(jnp.maximum(hm, eps)),
                 pad + [(1, 1), (1, 1)], mode="edge")

    def v(dy, dx):
        return lp[..., 1 + dy:1 + dy + H, 1 + dx:1 + dx + W]

    dx_ = 0.5 * (v(0, 1) - v(0, -1))
    dy_ = 0.5 * (v(1, 0) - v(-1, 0))
    dxx = v(0, 1) - 2.0 * v(0, 0) + v(0, -1)
    dyy = v(1, 0) - 2.0 * v(0, 0) + v(-1, 0)
    dxy = 0.25 * (v(1, 1) - v(1, -1) - v(-1, 1) + v(-1, -1))
    det = dxx * dyy - dxy * dxy
    det_safe = jnp.where(jnp.abs(det) < eps, jnp.sign(det) * eps + eps, det)
    off_x = -(dyy * dx_ - dxy * dy_) / det_safe
    off_y = -(dxx * dy_ - dxy * dx_) / det_safe
    sane = (dxx < 0) & (dyy < 0) & (jnp.abs(off_x) < 1.0) & (jnp.abs(off_y) < 1.0)
    ux = jnp.arange(W)[None, :]
    uy = jnp.arange(H)[:, None]
    interior = (ux > 0) & (ux < W - 1) & (uy > 0) & (uy < H - 1)
    ok = sane & interior
    return off_x, off_y, ok


def _topk_iterative(flat: Array, k: int):
    """Exact top-k for small k via unrolled max+argmax+suppress rounds.

    ``lax.top_k`` lowers to a per-row SORT on TPU — ~350 ms for
    (21k, 16384) rows at k=8; k rounds of reductions are ~10x cheaper and
    exact. Only for non-negative inputs (suppression writes 0)."""
    n = flat.shape[-1]
    iota = jnp.arange(n, dtype=jnp.int32)
    vals, idxs = [], []
    for _ in range(k):
        i = jnp.argmax(flat, -1)
        vals.append(jnp.max(flat, -1))
        idxs.append(i)
        flat = jnp.where(iota == i[..., None], 0.0, flat)
    return jnp.stack(vals, -1), jnp.stack(idxs, -1)


def extract_peaks(heatmaps: Array, max_peaks: int = 8, blur: bool = True,
                  eps: float = 1e-8):
    """Multi-instance decoding: top-K 3x3 local maxima per channel with DARK
    sub-pixel refinement.

    Class-level channels carry one blob PER INSTANCE (e.g. 20 fence panels);
    single-argmax decoding recovers only the strongest. Returns
    (uv (..., C, K, 2), scores (..., C, K)) sorted by score descending.
    """
    *_, H, W = heatmaps.shape
    # The suppress-to-0 top-k and the mantissa packing require non-negative
    # inputs; raw mse-trained network outputs can dip below zero.
    heatmaps = jnp.maximum(heatmaps, 0.0)
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

    # TPU design: per-(batch, channel, k) gathers of the 3x3 log neighborhood
    # cost ~7x everything else (scalar gather path). Instead the DARK offsets
    # are computed DENSELY (shifted-view arithmetic, fully fused), quantized
    # to 5+5 bits, and PACKED into the low mantissa of the peak score before
    # ``top_k`` — the same mantissa-payload trick as the ray sweep
    # (render/raycast._pack). One top_k then yields position, score, and
    # offset together: no gather anywhere. Offset resolution 2/31 px (~16x
    # finer than the PCK tolerance); score perturbation <= 2^-13 relative.
    off_x, off_y, ok = _dense_dark_offsets(hm, eps)
    qx = jnp.clip(jnp.round(off_x * 16.0) + 16, 0, 31).astype(jnp.int32)
    qy = jnp.clip(jnp.round(off_y * 16.0) + 16, 0, 31).astype(jnp.int32)
    code = jnp.where(ok, (qx << 5) | qy, (16 << 5) | 16)  # 16 == offset 0.0

    peak_score = jnp.where(is_peak, hm, 0.0)
    bits = jax.lax.bitcast_convert_type(peak_score, jnp.int32)
    packed = jax.lax.bitcast_convert_type(
        jnp.bitwise_or(jnp.bitwise_and(bits, ~1023), code), jnp.float32)
    flat = packed.reshape(hm.shape[:-2] + (H * W,))
    top, idx = _topk_iterative(flat, max_peaks)
    tbits = jax.lax.bitcast_convert_type(top, jnp.int32)
    scores = jax.lax.bitcast_convert_type(
        jnp.bitwise_and(tbits, ~1023), jnp.float32)
    tcode = jnp.bitwise_and(tbits, 1023)
    off_xq = ((tcode >> 5) - 16).astype(jnp.float32) / 16.0
    off_yq = (jnp.bitwise_and(tcode, 31) - 16).astype(jnp.float32) / 16.0
    py = (idx // W).astype(jnp.float32)
    px = (idx % W).astype(jnp.float32)
    uv = jnp.stack([px + off_xq, py + off_yq], -1)
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
    else:
        hm = heatmaps
    flat = hm.reshape(hm.shape[:-2] + (H * W,))
    idx = jnp.argmax(flat, -1)
    # Score = UN-blurred peak amplitude (what thresholds are calibrated on).
    # The blur only steers argmax + log-derivatives, both of which are
    # invariant to per-channel scaling — so no renormalization pass is needed
    # (it used to cost two extra full-map max reductions).
    score = jnp.max(heatmaps.reshape(flat.shape), -1)
    py = idx // W
    px = idx % W

    # TPU note: gathers with per-(batch, channel) indices (take_along_axis)
    # lower to a scalar gather path that costs ~7x the whole decode. The
    # peak's 3x3 log neighborhood is read instead with ONE-HOT MASK
    # REDUCTIONS over statically-shifted views of the edge-padded map: nine
    # fused multiply-reduce passes, no gather anywhere, and the Taylor math
    # runs only on the 9 extracted scalars per channel (computing offsets
    # densely and masking costs MORE — per-pixel log-Hessian divisions over
    # the full map beat the extra reductions; measured 4.0k vs 4.7k img/s).
    logh = jnp.log(jnp.maximum(hm, eps))
    lp = jnp.pad(logh, [(0, 0)] * (logh.ndim - 2) + [(1, 1), (1, 1)],
                 mode="edge")
    onehot = (jnp.arange(H * W, dtype=idx.dtype) == idx[..., None]).astype(
        logh.dtype)

    def sample(dy, dx):
        v = lp[..., 1 + dy:1 + dy + H, 1 + dx:1 + dx + W]
        return jnp.sum(v.reshape(flat.shape) * onehot, -1)

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
