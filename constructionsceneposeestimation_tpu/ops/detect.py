"""CenterNet-style 2D detection ops (targets + decode), pure JAX.

Completes the two-stage deployment story: at eval time the crop stage has
been fed the renderer's ``bbox2d`` labels; in deployment boxes must come from
a detector. Head layout (one backbone output, channel-major):

    [0, C)      per-class center heatmaps (focal-trained logits)
    [C, C+2)    box size (w, h) in heatmap units, regressed at the center
    [C+2, C+4)  center offset (sub-stride residual)

The four articulated crane parts are detected BOTH ways: each part as its own
class (label-free per-part ROIs for the FK-constrained crop solve) AND the
whole machine as one "crane" union box (a pseudo-instance the train/eval
wrappers append — see train/detect_loop.crane_extended_boxes).
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

DET_CLASSES: Tuple[str, ...] = (
    "trafficcone", "tree", "fence", "dumper", "human", "crane",
    "cranebase", "cranecolumn", "craneboom", "cranetelescopic",
)
CRANE_PART_CLASSES: Tuple[str, ...] = DET_CLASSES[6:]


def det_class_of_instances(roster) -> np.ndarray:
    """(O,) detection-class index per roster instance. Crane part instances
    map to their own part classes; the union "crane" class has no roster
    instance — the train/eval wrappers append a pseudo-instance for it."""
    out = np.zeros(len(roster.inst_class_names), np.int32)
    for i, n in enumerate(roster.inst_class_names):
        out[i] = DET_CLASSES.index(n)
    return out


def build_targets(
    bbox2d: Array,  # (O, 4) pixel-tight boxes, -1 when unseen
    visible: Array,  # (O,) bool
    inst_cls: Array,  # (O,) int32 detection class
    hm_h: int, hm_w: int, stride: float,
    min_sigma: float = 0.8,
):
    """Per-frame CenterNet targets.

    Returns (center (C, h, w), size (O, 2), offset (O, 2), pos_uv (O, 2) int,
    pos_mask (O,)) — size/offset are supervised per instance at its center
    cell (gather-free loss via the instance list, not a dense map)."""
    C = len(DET_CLASSES)
    b = bbox2d.astype(jnp.float32)
    cu = (b[:, 0] + b[:, 2]) * 0.5 / stride
    cv = (b[:, 1] + b[:, 3]) * 0.5 / stride
    w = (b[:, 2] - b[:, 0]) / stride
    h = (b[:, 3] - b[:, 1]) / stride
    pos_mask = visible & (w > 0) & (h > 0)
    ui = jnp.clip(jnp.floor(cu), 0, hm_w - 1)
    vi = jnp.clip(jnp.floor(cv), 0, hm_h - 1)

    # Gaussian radius ~ CenterNet: scale with box size.
    sigma = jnp.maximum(jnp.maximum(w, h) / 6.0, min_sigma)
    xs = jnp.arange(hm_w, dtype=jnp.float32)
    ys = jnp.arange(hm_h, dtype=jnp.float32)
    d2 = ((xs[None, None, :] - cu[:, None, None]) ** 2
          + (ys[None, :, None] - cv[:, None, None]) ** 2)
    g = jnp.exp(-d2 / (2.0 * sigma * sigma)[:, None, None])
    g = g * pos_mask[:, None, None].astype(jnp.float32)
    center = jnp.zeros((C, hm_h, hm_w), jnp.float32).at[inst_cls].max(g)

    size = jnp.stack([w, h], -1)
    offset = jnp.stack([cu - ui, cv - vi], -1)
    pos_uv = jnp.stack([ui, vi], -1).astype(jnp.int32)
    return center, size, offset, pos_uv, pos_mask


CLASS_LOSS_WEIGHTS: Tuple[float, ...] = (
    2.0,  # trafficcone — small at range, P/R 0.64/0.60 unweighted
    1.0,  # tree
    1.0,  # fence
    1.0,  # dumper
    4.0,  # human — ~6 x 20 px at DR range, R 0.35 unweighted
    1.0,  # crane
    1.0,  # cranebase
    1.0,  # cranecolumn
    1.0,  # craneboom
    2.0,  # cranetelescopic — thin (0.1 m section), P/R 0.54/0.65 unweighted
)


def detection_loss(pred: Array, center: Array, size: Array, offset: Array,
                   pos_uv: Array, pos_mask: Array,
                   size_weight: float = 0.1, off_weight: float = 1.0,
                   class_weights: Array | None = None):
    """pred (C+4, h, w) logits+regression vs per-frame targets.

    ``class_weights`` (C,) upweights rare/small classes in the center focal
    term (see CLASS_LOSS_WEIGHTS); None keeps uniform weighting."""
    from ..train import losses
    C = center.shape[0]
    hm_loss = losses.focal_heatmap_loss(pred[:C], center,
                                        channel_weights=class_weights)
    # Gather regression predictions at each instance's center cell.
    u, v = pos_uv[:, 0], pos_uv[:, 1]
    pr_size = pred[C:C + 2, v, u].T  # (O, 2)
    pr_off = pred[C + 2:C + 4, v, u].T
    m = pos_mask[:, None].astype(jnp.float32)
    n = jnp.maximum(jnp.sum(m), 1.0)
    size_l1 = jnp.sum(jnp.abs(pr_size - size) * m) / n
    off_l1 = jnp.sum(jnp.abs(pr_off - offset) * m) / n
    return hm_loss + size_weight * size_l1 + off_weight * off_l1, {
        "hm": hm_loss, "size_l1": size_l1, "off_l1": off_l1}


def _local_max(hm: Array, k: int = 3) -> Array:
    """NMS via kxk max-pool equality (CenterNet trick)."""
    pad = k // 2
    mx = jax.lax.reduce_window(
        hm, -jnp.inf, jax.lax.max, (1, k, k), (1, 1, 1),
        [(0, 0), (pad, pad), (pad, pad)])
    return jnp.where(hm >= mx, hm, 0.0)


def decode_detections(pred: Array, stride: float, max_det: int = 8,
                      nms_k: int | None = None):
    """pred (C+4, h, w) -> per-class boxes.

    ``nms_k`` is the peak-suppression window; by default it scales with the
    head stride so the suppression RADIUS stays ~4 image px (CenterNet's 3x3
    was tuned at stride 4 — at stride 2 the same window is half the pixel
    radius, and wide dumper/crane blobs emit duplicate local maxima that
    count as FP under one-to-one matching).

    Returns (boxes (C, max_det, 4) image pixels [u0, v0, u1, v1],
    scores (C, max_det))."""
    from . import decode as decode_ops
    if nms_k is None:
        nms_k = 3 if stride >= 4 else 5
    C = pred.shape[0] - 4
    hm = jax.nn.sigmoid(pred[:C])
    hm = _local_max(hm, nms_k)
    h, w = hm.shape[-2:]
    flat = hm.reshape(C, -1)
    # lax.top_k lowers to a per-row sort on TPU (the anti-pattern this repo
    # measured at ~350 ms); post-sigmoid NMS'd maps are non-negative, so the
    # unrolled max+suppress rounds apply. Deployment pays this per frame.
    scores, idx = decode_ops._topk_iterative(flat, max_det)  # (C, max_det)
    vi = idx // w
    ui = idx % w
    pr_size = pred[C:C + 2].reshape(2, -1)
    pr_off = pred[C + 2:C + 4].reshape(2, -1)
    bw = jnp.take(pr_size[0], idx)
    bh = jnp.take(pr_size[1], idx)
    ou = jnp.take(pr_off[0], idx)
    ov = jnp.take(pr_off[1], idx)
    cu = (ui.astype(jnp.float32) + ou) * stride
    cv = (vi.astype(jnp.float32) + ov) * stride
    bw = bw * stride
    bh = bh * stride
    boxes = jnp.stack([cu - bw / 2, cv - bh / 2, cu + bw / 2, cv + bh / 2], -1)
    return boxes, scores
