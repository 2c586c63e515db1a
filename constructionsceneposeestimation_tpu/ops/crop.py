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


def rect_roi(bbox: Array, margin: float = 0.25, min_half: float = 8.0,
             max_aspect: float = 3.0) -> Tuple[Array, Array, Array, Array]:
    """bbox (..., 4) -> (cu, cv, half_u, half_v) aspect-matched ROI.

    Thin parts (crane column ~0.1 aspect, extended telescopic ~8) lose most
    of a SQUARE crop's pixels to background: at crop 128 the column is
    ~13 px wide and its keypoints localize at heatmap-cell precision. Per-
    axis halves keep the part filling the crop; ``max_aspect`` bounds the
    anisotropy so the resample doesn't destroy joint context (and detector-
    box noise doesn't explode through a 16x-stretched axis)."""
    u0, v0, u1, v1 = bbox[..., 0], bbox[..., 1], bbox[..., 2], bbox[..., 3]
    cu = (u0 + u1) * 0.5
    cv = (v0 + v1) * 0.5
    hu = jnp.maximum((u1 - u0) * 0.5 * (1.0 + margin), min_half)
    hv = jnp.maximum((v1 - v0) * 0.5 * (1.0 + margin), min_half)
    hu = jnp.maximum(hu, hv / max_aspect)
    hv = jnp.maximum(hv, hu / max_aspect)
    return cu, cv, hu, hv


def jitter_roi(key: Array, cu: Array, cv: Array, half: Array,
               shift_frac: float = 0.1, scale_frac: float = 0.15,
               half_v: Array | None = None):
    """Detector-noise augmentation: random shift/scale of the ROI so the
    second stage trains on imperfect boxes (it only ever sees detector boxes
    in deployment). With ``half_v`` (rect_roi), shifts are per-axis and one
    shared scale keeps the aspect; returns a 4-tuple then."""
    if half_v is None:
        d = jax.random.uniform(key, (3,), minval=-1.0, maxval=1.0)
        return (cu + d[0] * shift_frac * half,
                cv + d[1] * shift_frac * half,
                half * (1.0 + d[2] * scale_frac))
    d = jax.random.uniform(key, (3,), minval=-1.0, maxval=1.0)
    s = 1.0 + d[2] * scale_frac
    return (cu + d[0] * shift_frac * half,
            cv + d[1] * shift_frac * half_v,
            half * s, half_v * s)


def crop_resize(img: Array, cu: Array, cv: Array, half: Array,
                out: int, half_v: Array | None = None) -> Array:
    """(H, W, C) float -> (out, out, C): bilinear resample of the ROI
    [cu-half, cu+half] x [cv-half_v, cv+half_v] (square when ``half_v`` is
    None; fractional coords OK)."""
    hv = half if half_v is None else half_v
    scale_u = out / (2.0 * half)
    scale_v = out / (2.0 * hv)
    # input coord x maps to output scale*x + translation; we want
    # cu-half -> 0  =>  translation_u = -scale * (cu - half).
    tu = -scale_u * (cu - half)
    tv = -scale_v * (cv - hv)
    return jax.image.scale_and_translate(
        img, (out, out, img.shape[-1]), (0, 1),
        jnp.stack([scale_v, scale_u]), jnp.stack([tv, tu]), method="linear")


def uv_to_crop(uv: Array, cu: Array, cv: Array, half: Array,
               out: int, half_v: Array | None = None) -> Array:
    """Image-pixel keypoints (..., 2) -> crop-pixel coords."""
    hv = half if half_v is None else half_v
    return jnp.stack([
        (uv[..., 0] - (cu - half)) * (out / (2.0 * half)),
        (uv[..., 1] - (cv - hv)) * (out / (2.0 * hv)),
    ], -1)


def crop_to_uv(uv_crop: Array, cu: Array, cv: Array, half: Array,
               out: int, half_v: Array | None = None) -> Array:
    """Inverse of uv_to_crop."""
    hv = half if half_v is None else half_v
    return jnp.stack([
        uv_crop[..., 0] * ((2.0 * half) / out) + (cu - half),
        uv_crop[..., 1] * ((2.0 * hv) / out) + (cv - hv),
    ], -1)
