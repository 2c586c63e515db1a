"""Pose / bounding-box transforms (pure JAX, batched).

``bbox_record_to_pose`` reproduces the semantics of the reference's
``bboxDict_to_transform`` (generate_construction_data.py:553-584): an axis-
aligned local-corner pair plus a row-major local-to-world 4x4 becomes
(world center, world size, extrinsic-xyz euler degrees), with the rotation
orthonormalized by SVD and per-axis scale recovered from column norms.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import rotation

Array = jax.Array

# Geometry math must stay full-f32 on TPU: these 3x3/4x4 einsums are tiny, so
# HIGHEST precision costs nothing, while default-bf16 MXU passes inject ~1e-2 m
# errors into pose labels (observed on v5e).
_einsum = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)



def make_transform(R: Array, t: Array, scale: Array | None = None) -> Array:
    """Compose a (..., 4, 4) column-vector local-to-world transform.

    With ``scale``, columns of the linear block are scaled per local axis —
    the layout ``bboxDict_to_transform`` decomposes (column norms = scale,
    reference: 578-580).
    """
    lin = R if scale is None else R * scale[..., None, :]
    batch = jnp.broadcast_shapes(lin.shape[:-2], t.shape[:-1])
    lin = jnp.broadcast_to(lin, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([lin, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(jnp.array([0.0, 0.0, 0.0, 1.0]), batch + (4,))
    return jnp.concatenate([top, bottom[..., None, :]], axis=-2)


def bbox_record_to_pose(corner_min: Array, corner_max: Array, transform_rowmajor: Array):
    """(local AABB corners, row-major 4x4) -> (center_world, size_world, euler_deg).

    ``transform_rowmajor`` is the transform as the Replicator annotator stores
    it: row-major, so the column-vector matrix is its transpose (the
    ``.reshape(4,4).T`` at reference line 568).
    Returns center (..., 3), size (..., 3), euler (..., 3) in degrees.
    """
    T = jnp.swapaxes(transform_rowmajor.reshape(transform_rowmajor.shape[:-2] + (4, 4)), -1, -2)
    center_local = 0.5 * (corner_min + corner_max)
    ones = jnp.ones(center_local.shape[:-1] + (1,), center_local.dtype)
    center_h = jnp.concatenate([center_local, ones], axis=-1)
    center_world = _einsum("...ij,...j->...i", T, center_h)[..., :3]

    rot_mtx = T[..., :3, :3]
    rot_pure = rotation.orthonormalize(rot_mtx)
    euler_deg = rotation.euler_xyz_degrees_from_matrix(rot_pure)

    scale = jnp.linalg.norm(rot_mtx, axis=-2)  # column norms (reference: 578-580)
    size_local = jnp.abs(corner_max - corner_min)
    size_world = scale * size_local
    return center_world, size_world, euler_deg


def transform_points(T: Array, points: Array) -> Array:
    """Apply (..., 4, 4) column-vector transform to points (..., N, 3)."""
    return (
        _einsum("...ij,...nj->...ni", T[..., :3, :3], points) + T[..., None, :3, 3]
    )


def world_aabb_of_local_aabb(corner_min: Array, corner_max: Array, T: Array):
    """World-space AABB of a transformed local AABB — the semantics of
    ``UsdGeom.BBoxCache.ComputeWorldBound(...).ComputeAlignedRange()`` that
    the reference uses for fallback sizes and collision radii
    (generate_construction_data.py:977-986, 2002-2010)."""
    lo, hi = corner_min, corner_max
    corners = jnp.stack(
        [
            jnp.stack([lo[..., 0], lo[..., 1], lo[..., 2]], -1),
            jnp.stack([lo[..., 0], lo[..., 1], hi[..., 2]], -1),
            jnp.stack([lo[..., 0], hi[..., 1], lo[..., 2]], -1),
            jnp.stack([lo[..., 0], hi[..., 1], hi[..., 2]], -1),
            jnp.stack([hi[..., 0], lo[..., 1], lo[..., 2]], -1),
            jnp.stack([hi[..., 0], lo[..., 1], hi[..., 2]], -1),
            jnp.stack([hi[..., 0], hi[..., 1], lo[..., 2]], -1),
            jnp.stack([hi[..., 0], hi[..., 1], hi[..., 2]], -1),
        ],
        axis=-2,
    )
    world = transform_points(T, corners)
    return world.min(axis=-2), world.max(axis=-2)


def collision_radius_xy(corner_min: Array, corner_max: Array, T: Array, minimum: float = 1.0):
    """XY collision radius: 0.9 * half the world-AABB XY diagonal, floored at
    1 m (reference compute_prim_xy_radius, generate_construction_data.py:971-988)."""
    wmin, wmax = world_aabb_of_local_aabb(corner_min, corner_max, T)
    dx = (wmax[..., 0] - wmin[..., 0]) / 2.0
    dy = (wmax[..., 1] - wmin[..., 1]) / 2.0
    return jnp.maximum(jnp.sqrt(dx * dx + dy * dy) * 0.9, minimum)
