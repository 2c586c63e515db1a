"""Evaluation metrics: PCK and ADD (the parity gates in BASELINE.json).

* PCK@alpha — fraction of predicted keypoints within ``alpha * max(bbox_w,
  bbox_h)`` pixels of ground truth, over visible keypoints.
* ADD / ADD-0.1d — mean 3D distance between model points transformed by the
  estimated vs ground-truth pose; ADD-0.1d is the fraction of objects with
  ADD below 10% of the model diameter.
All pure JAX, batched.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def pck(pred_uv: Array, gt_uv: Array, visible: Array, bbox_size: Array,
        alpha: float = 0.5):
    """pred/gt (..., K, 2), visible (..., K), bbox_size (..., 2) -> scalar PCK.

    bbox_size is the (w, h) of the object's 2D extent; the threshold is
    alpha * max(w, h) per object (broadcast over K).
    """
    thresh = alpha * jnp.max(bbox_size, -1)
    d = jnp.linalg.norm(pred_uv - gt_uv, axis=-1)
    ok = (d <= thresh[..., None]) & visible
    n = jnp.sum(visible)
    return jnp.sum(ok) / jnp.maximum(n, 1)


def add_metric(R_pred: Array, t_pred: Array, R_gt: Array, t_gt: Array,
               model_points: Array) -> Array:
    """Average Distance of model points: (..., 3, 3)/(..., 3) poses,
    model_points (..., N, 3) -> ADD (...,)."""
    p1 = jnp.einsum("...ij,...nj->...ni", R_pred, model_points) + t_pred[..., None, :]
    p2 = jnp.einsum("...ij,...nj->...ni", R_gt, model_points) + t_gt[..., None, :]
    return jnp.mean(jnp.linalg.norm(p1 - p2, axis=-1), -1)


def model_diameter(model_points: Array) -> Array:
    """Max pairwise distance (..., N, 3) -> (...,)."""
    d = jnp.linalg.norm(
        model_points[..., :, None, :] - model_points[..., None, :, :], axis=-1
    )
    return jnp.max(d, (-1, -2))


def add_accuracy(add: Array, diameter: Array, valid: Array, frac: float = 0.1) -> Array:
    """ADD-0.1d: fraction of valid objects with ADD < frac * diameter."""
    ok = (add < frac * diameter) & valid
    return jnp.sum(ok) / jnp.maximum(jnp.sum(valid), 1)


def aabb_corners(aabb_min, aabb_max) -> Array:
    """Local AABB -> its 8 corners (8, 3): the ADD model point set.

    ADD is defined over the object's GEOMETRY (model vertices; the reference
    labels 3D boxes, generate_construction_data.py:1930-1975), not over
    whichever keypoints the pose net happens to learn. Crane parts switched
    to axis keypoints in round 3 — a 3-point vertical axis spans 0.5 m on a
    2.2 x 1.0 x 0.5 m base, so keypoint-derived diameters would silently
    shrink the ADD-0.1d threshold 5x vs the part's true size (and vs the
    round-2 corner-keypoint numbers)."""
    amin = jnp.asarray(aabb_min, jnp.float32)
    amax = jnp.asarray(aabb_max, jnp.float32)
    sel = jnp.asarray(
        [[x, y, z] for x in (0, 1) for y in (0, 1) for z in (0, 1)],
        jnp.float32)
    return amin[None, :] * (1.0 - sel) + amax[None, :] * sel
