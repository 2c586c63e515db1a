"""Batched camera model (pure JAX).

Encodes the reference's camera conventions exactly:

* Isaac-style camera frame: the camera looks along its **-X** axis with **+Z**
  up; ``look_at_matrix`` reproduces ``camPosOri``
  (reference: generate_construction_data.py:507-550) including the degenerate
  forward-parallel-to-up fallback.
* Pinhole intrinsics from focal length / apertures:
  ``fx = W*f/h_aperture``, ``fy = H*f/v_aperture``, principal point at the
  image center (reference: 646-649, 2036-2053).
* ``backproject_depth_reference_quirk`` reproduces, bit-for-bit in semantics,
  the reference's depth->pointcloud fallback (reference: 616-711), which
  applies the Isaac camera rotation directly to pinhole coordinates. That is
  geometrically skewed but is the reference's on-disk behavior; the correct
  path used by this framework's own renderer is ``backproject_depth``.

Pinhole frame: X right (in image), Y down, Z forward. Conversion from the
Isaac camera frame (X backward-of-view, Y left, Z up):
``pin_x = -cam_y, pin_y = -cam_z, pin_z = -cam_x``.
"""

from __future__ import annotations

import functools

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import rotation

Array = jax.Array

# Geometry math must stay full-f32 on TPU: these 3x3/4x4 einsums are tiny, so
# HIGHEST precision costs nothing, while default-bf16 MXU passes inject ~1e-2 m
# errors into pose labels (observed on v5e).
_einsum = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)



# Rows map camera-frame coordinates to pinhole-frame coordinates.
# numpy, not jnp: module-level device arrays would initialise the XLA
# backend at import time, breaking jax.distributed.initialize ordering.
R_PINHOLE_FROM_CAM = np.array(
    [
        [0.0, -1.0, 0.0],
        [0.0, 0.0, -1.0],
        [-1.0, 0.0, 0.0],
    ]
)

# Reference default camera parameters (generate_construction_data.py:46-47,
# 1437-1443, 2047-2053).
DEFAULT_WIDTH = 1280
DEFAULT_HEIGHT = 720
DEFAULT_FOCAL_LENGTH = 12.0
DEFAULT_HORIZONTAL_APERTURE = 25.0
FALLBACK_FOCAL_LENGTH = 18.14
FALLBACK_HORIZONTAL_APERTURE = 20.955
FALLBACK_VERTICAL_APERTURE = 15.2908
CLIPPING_RANGE = (0.5, 250.0)


class Intrinsics(NamedTuple):
    fx: Array
    fy: Array
    cx: Array
    cy: Array
    width: int
    height: int


def intrinsics_from_apertures(
    focal_length: Array,
    horizontal_aperture: Array,
    width: int,
    height: int,
    vertical_aperture: Array | None = None,
) -> Intrinsics:
    """Pixel intrinsics from physical camera params.

    The reference derives ``vertical_aperture = horizontal_aperture * H/W``
    (generate_construction_data.py:1736, 2038), making fx == fy.
    """
    focal_length = jnp.asarray(focal_length, jnp.float32)
    horizontal_aperture = jnp.asarray(horizontal_aperture, jnp.float32)
    if vertical_aperture is None:
        vertical_aperture = horizontal_aperture * (height / width)
    vertical_aperture = jnp.asarray(vertical_aperture, jnp.float32)
    fx = width * focal_length / horizontal_aperture
    fy = height * focal_length / vertical_aperture
    cx = jnp.asarray(width / 2.0, jnp.float32)
    cy = jnp.asarray(height / 2.0, jnp.float32)
    return Intrinsics(fx=fx, fy=fy, cx=cx, cy=cy, width=width, height=height)


def look_at_matrix(cam_pos: Array, target: Array) -> Array:
    """Camera-frame matrix exactly as the reference's camPosOri builds it
    (generate_construction_data.py:507-550).

    Columns are the world-frame directions of the camera axes:
    col0 = -forward, col1 = -right, col2 = up. NOTE: this is a **left-handed**
    frame (det = -1, a reflection) — a quirk of the reference. Paired with
    ``R_PINHOLE_FROM_CAM`` the composite world->pinhole map is a proper
    rotation and yields a geometrically correct look-at projection, which is
    how this framework renders. See ``world_from_pinhole_matrix`` for the
    proper rotation emitted in labels, and ``reference_camera_quat_wxyz`` for
    the reference's (degenerate) quaternion path. Batched over leading dims.
    """
    forward = target - cam_pos
    forward = forward / jnp.linalg.norm(forward, axis=-1, keepdims=True)
    world_up = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), forward.shape)
    right = jnp.cross(forward, world_up)
    right_norm = jnp.linalg.norm(right, axis=-1, keepdims=True)
    # Degenerate: forward ~ parallel to world up -> fall back to +X as right
    # (reference: 529-532).
    fallback = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), forward.shape)
    right = jnp.where(right_norm < 1e-6, fallback, right / jnp.maximum(right_norm, 1e-12))
    up = jnp.cross(right, forward)
    up = up / jnp.linalg.norm(up, axis=-1, keepdims=True)
    # Stack as columns: [-forward | -right | up]
    return jnp.stack([-forward, -right, up], axis=-1)


def reference_camera_quat_wxyz(cam_pos: Array, target: Array) -> Array:
    """Bug-compatible camPosOri quaternion (w, x, y, z).

    The reference runs Shepperd on the det=-1 camPosOri matrix
    (generate_construction_data.py:548-549) which cannot represent a
    reflection; for horizontal aims (the sampler always aims level, 849/905)
    the result normalizes to the identity quaternion. Reproduced here for the
    ``bug_compatible`` schema mode; see module docstring.
    """
    return rotation.quat_wxyz_from_matrix(look_at_matrix(cam_pos, target))


def world_from_pinhole_matrix(cam_pos: Array, target: Array) -> Array:
    """Proper (det=+1) rotation mapping pinhole-frame coords to world.

    This is the rotation that makes the reference's own depth->pointcloud
    fallback (``p_world = R @ p_pinhole + t``, generate_construction_data.py:
    681-685) geometrically correct, and is what this framework writes into
    ``camera_pose`` by default so downstream consumers recover true geometry.
    """
    M = look_at_matrix(cam_pos, target)
    return _einsum("...ij,kj->...ik", M, R_PINHOLE_FROM_CAM)


def camera_pose7_xyzw(cam_pos: Array, target: Array, bug_compatible: bool = False) -> Array:
    """[x, y, z, qx, qy, qz, qw] — the ``camera_pose`` label field
    (reference get_obj_pose, generate_construction_data.py:587-605).

    Default: quaternion of ``world_from_pinhole_matrix`` (correct geometry).
    ``bug_compatible=True``: the reference's degenerate Shepperd-of-reflection
    quaternion, for byte-level output parity with the reference generator.
    """
    if bug_compatible:
        q = reference_camera_quat_wxyz(cam_pos, target)
        q_xyzw = jnp.concatenate([q[..., 1:4], q[..., 0:1]], axis=-1)
    else:
        q_xyzw = rotation.quat_xyzw_from_matrix(world_from_pinhole_matrix(cam_pos, target))
    return jnp.concatenate([cam_pos, q_xyzw], axis=-1)


def world_to_pinhole(points_w: Array, cam_pos: Array, R_cam2world: Array) -> Array:
    """World points (..., N, 3) -> pinhole-frame coords (X right, Y down, Z fwd)."""
    rel = points_w - cam_pos[..., None, :]
    cam = _einsum("...ji,...nj->...ni", R_cam2world, rel)  # R^T @ rel
    return _einsum("ij,...nj->...ni", R_PINHOLE_FROM_CAM, cam)


def pinhole_to_world(points_pin: Array, cam_pos: Array, R_cam2world: Array) -> Array:
    cam = _einsum("ji,...nj->...ni", R_PINHOLE_FROM_CAM, points_pin)
    return _einsum("...ij,...nj->...ni", R_cam2world, cam) + cam_pos[..., None, :]


def project(points_w: Array, cam_pos: Array, R_cam2world: Array, intr: Intrinsics):
    """Project world points to pixels.

    Returns (uv (..., N, 2), z (..., N)) with z = pinhole depth (>0 in front of
    the camera). Standard model: ``u = fx*X/Z + cx, v = fy*Y/Z + cy``
    (reference: generate_construction_data.py:662-666, inverted).
    """
    pin = world_to_pinhole(points_w, cam_pos, R_cam2world)
    z = pin[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = intr.fx * pin[..., 0] / z_safe + intr.cx
    v = intr.fy * pin[..., 1] / z_safe + intr.cy
    return jnp.stack([u, v], axis=-1), z


def pixel_rays(intr: Intrinsics, cam_pos: Array, R_cam2world: Array):
    """Per-pixel unit ray directions in world frame, (H, W, 3), plus origin.

    Rays pass through pixel centers (u + 0.5, v + 0.5 would be centers;
    the reference back-projects integer pixel grids, so we use integer u, v
    to stay aligned with its CSV/pointcloud outputs, reference: 652).
    """
    u = jnp.arange(intr.width, dtype=jnp.float32)
    v = jnp.arange(intr.height, dtype=jnp.float32)
    uu, vv = jnp.meshgrid(u, v)  # (H, W)
    x = (uu - intr.cx) / intr.fx
    y = (vv - intr.cy) / intr.fy
    dirs_pin = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
    dirs_cam = _einsum("ji,hwj->hwi", R_PINHOLE_FROM_CAM, dirs_pin)
    dirs_world = _einsum("ij,hwj->hwi", R_cam2world, dirs_cam)
    dirs_world = dirs_world / jnp.linalg.norm(dirs_world, axis=-1, keepdims=True)
    return cam_pos, dirs_world


def backproject_depth(
    depth: Array, intr: Intrinsics, cam_pos: Array, R_cam2world: Array
) -> Array:
    """Geometrically correct depth (H, W) -> world points (H, W, 3).

    ``depth`` is distance-to-image-plane (pinhole Z), matching the
    ``distance_to_image_plane`` annotator the reference records."""
    u = jnp.arange(intr.width, dtype=jnp.float32)
    v = jnp.arange(intr.height, dtype=jnp.float32)
    uu, vv = jnp.meshgrid(u, v)
    x = (uu - intr.cx) * depth / intr.fx
    y = (vv - intr.cy) * depth / intr.fy
    pin = jnp.stack([x, y, depth], axis=-1).reshape(-1, 3)
    return pinhole_to_world(pin, cam_pos, R_cam2world).reshape(depth.shape + (3,))


def backproject_depth_reference_quirk(
    depth: Array, intr: Intrinsics, camera_pose7_xyzw_: Array
) -> Array:
    """Reference-exact fallback back-projection (generate_construction_data.py:
    616-711): pinhole coords are rotated by the **Isaac camera frame** rotation
    without converting pinhole->camera axes first. Kept for on-disk parity of
    the pointcloud fallback path; see module docstring."""
    position = camera_pose7_xyzw_[..., :3]
    q_xyzw = camera_pose7_xyzw_[..., 3:]
    R_cam2world = rotation.matrix_from_quat_xyzw(q_xyzw)
    u = jnp.arange(intr.width, dtype=jnp.float32)
    v = jnp.arange(intr.height, dtype=jnp.float32)
    uu, vv = jnp.meshgrid(u, v)
    x = (uu - intr.cx) * depth / intr.fx
    y = (vv - intr.cy) * depth / intr.fy
    pin = jnp.stack([x, y, depth], axis=-1).reshape(-1, 3)
    world = _einsum("ij,nj->ni", R_cam2world, pin) + position
    return world.reshape(depth.shape + (3,))


def depth_valid_mask(depth: Array, far: float = CLIPPING_RANGE[1]) -> Array:
    """Validity mask used throughout the reference: finite, >0, < far clip
    (generate_construction_data.py:655)."""
    return jnp.isfinite(depth) & (depth > 0) & (depth < far)
