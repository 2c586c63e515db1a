"""CSPoseNet: the flagship scene keypoint-pose model.

Wraps a heatmap backbone with the full inference pipeline of the north star:
images -> heatmaps -> DARK/soft-argmax decode -> (for equipment classes)
batched PnP against the CAD keypoint tables -> 6DoF poses.

Channel layout comes from scene/assets.keypoint_channel_table(): contiguous
per-class blocks in class-id order, e.g. the human's 17 COCO channels or each
crane part's 8 box corners (the PnP targets).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp

from ..ops import decode as decode_ops
from ..ops import pnp as pnp_ops
from ..scene import assets
from . import backbone

Array = jax.Array


def class_channel_slices() -> Dict[str, tuple]:
    """{class_name: (start, stop)} channel ranges."""
    table, _ = assets.keypoint_channel_table()
    out: Dict[str, list] = {}
    for (name, k), ch in table.items():
        lo, hi = out.get(name, [ch, ch])
        out[name] = [min(lo, ch), max(hi, ch)]
    return {n: (lo, hi + 1) for n, (lo, hi) in out.items()}


def make_model(num_channels: int | None = None, lite: bool = False,
               output_stride: int = 4):
    num_channels = num_channels or assets.NUM_KEYPOINT_CHANNELS
    if lite:
        assert output_stride == 4, "LiteBackbone is stride-4 only"
        return backbone.LiteBackbone(num_channels=num_channels)
    return backbone.HeatmapBackbone(num_channels=num_channels,
                                    output_stride=output_stride)


def init_params(model, key: Array, height: int, width: int):
    dummy = jnp.zeros((1, height, width, 3), jnp.float32)
    return model.init(key, dummy)


def forward(model, params, images: Array) -> Array:
    """images (B, H, W, 3) -> heatmaps (B, C, H/4, W/4) — channel-major to
    match ops.decode/ops.heatmap conventions."""
    hm = model.apply(params, images)  # (B, h, w, C)
    return jnp.transpose(hm, (0, 3, 1, 2))


def output_to_heatmaps(raw: Array, loss: str = "mse") -> Array:
    """Map raw network output to heatmap-space values for decoding.

    The focal loss (train/losses.focal_heatmap_loss) trains LOGITS — sigmoid
    lives inside the loss — so decode/score-threshold/DARK paths must see
    sigmoid(output). MSE trains heatmap values directly (identity)."""
    return jax.nn.sigmoid(raw) if loss == "focal" else raw


def decode_keypoints(heatmaps: Array, stride: float = 4.0, use_dark: bool = True):
    """(B, C, h, w) -> uv in input-image pixels (B, C, 2) + scores (B, C)."""
    fn = decode_ops.dark_decode if use_dark else decode_ops.soft_argmax
    uv, score = fn(heatmaps)
    return uv * stride, score


def equipment_pose(
    class_name: str,
    uv_pixels: Array,  # (B, C_total, 2) decoded keypoints
    scores: Array,  # (B, C_total)
    fx: Array, fy: Array, cx: Array, cy: Array,
    score_threshold: float = 0.3,
) -> pnp_ops.PnPResult:
    """Recover the 6DoF camera-frame pose of one equipment class from its
    decoded keypoint channels via batched PnP (BASELINE.json config 4)."""
    lo, hi = class_channel_slices()[class_name]
    model_pts = jnp.asarray(assets.all_templates()[class_name].keypoints)
    uv = uv_pixels[:, lo:hi]
    w = jnp.where(scores[:, lo:hi] >= score_threshold, scores[:, lo:hi], 0.0)
    x = pnp_ops.normalize_pixels(uv, fx, fy, cx, cy)
    solve = jax.vmap(functools.partial(pnp_ops.solve_pnp))
    B = uv.shape[0]
    return solve(jnp.broadcast_to(model_pts, (B,) + model_pts.shape), x, w)
