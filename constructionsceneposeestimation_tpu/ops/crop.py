"""Detect-then-crop ROI ops for the two-stage (top-down) pose path.

At the DR camera ranges (15-30 m, reference generate_construction_data.py:51)
a dumper covers ~10-25 px at 512^2 — single-shot keypoint precision is
object-size-limited. The production fix is the standard top-down design: a 2D
box (the renderer's pixel-tight ``bbox2d`` label at training/eval, a detector
in deployment) selects a square ROI, the ROI is resampled to a fixed
resolution, and a second-stage net regresses keypoints in crop coordinates
where the object fills the frame.

All ops are pure JAX (differentiable, vmap/jit-safe, static output shapes).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def square_roi(bbox: Array, margin: float = 0.25,
               min_half: float = 8.0) -> Tuple[Array, Array, Array]:
    """bbox (..., 4) [u0, v0, u1, v1] -> (cu, cv, half) square ROI.

    ``margin`` expands the tight box so context (wheels/ground contact)
    survives; ``min_half`` keeps degenerate boxes (distant or sliver
    visibility) from producing zero-area crops."""
    u0, v0, u1, v1 = bbox[..., 0], bbox[..., 1], bbox[..., 2], bbox[..., 3]
    cu = (u0 + u1) * 0.5
    cv = (v0 + v1) * 0.5
    half = jnp.maximum(jnp.maximum(u1 - u0, v1 - v0) * 0.5 * (1.0 + margin),
                       min_half)
    return cu, cv, half


def jitter_roi(key: Array, cu: Array, cv: Array, half: Array,
               shift_frac: float = 0.1, scale_frac: float = 0.15):
    """Detector-noise augmentation: random shift/scale of the ROI so the
    second stage trains on imperfect boxes (it only ever sees detector boxes
    in deployment)."""
    d = jax.random.uniform(key, (3,), minval=-1.0, maxval=1.0)
    return (cu + d[0] * shift_frac * half,
            cv + d[1] * shift_frac * half,
            half * (1.0 + d[2] * scale_frac))


def crop_resize(img: Array, cu: Array, cv: Array, half: Array,
                out: int) -> Array:
    """(H, W, C) float -> (out, out, C): bilinear resample of the square ROI
    [cu-half, cu+half] x [cv-half, cv+half] (fractional coords OK; reads
    outside the image clamp to the border via scale_and_translate's zero fill
    then edge handling below is unnecessary for our in-image boxes)."""
    scale = out / (2.0 * half)
    # input coord x maps to output scale*x + translation; we want
    # cu-half -> 0  =>  translation_u = -scale * (cu - half).
    tu = -scale * (cu - half)
    tv = -scale * (cv - half)
    return jax.image.scale_and_translate(
        img, (out, out, img.shape[-1]), (0, 1),
        jnp.stack([scale, scale]), jnp.stack([tv, tu]), method="linear")


def uv_to_crop(uv: Array, cu: Array, cv: Array, half: Array,
               out: int) -> Array:
    """Image-pixel keypoints (..., 2) -> crop-pixel coords."""
    scale = out / (2.0 * half)
    return jnp.stack([
        (uv[..., 0] - (cu - half)) * scale,
        (uv[..., 1] - (cv - half)) * scale,
    ], -1)


def crop_to_uv(uv_crop: Array, cu: Array, cv: Array, half: Array,
               out: int) -> Array:
    """Inverse of uv_to_crop."""
    scale = (2.0 * half) / out
    return jnp.stack([
        uv_crop[..., 0] * scale + (cu - half),
        uv_crop[..., 1] * scale + (cv - half),
    ], -1)
