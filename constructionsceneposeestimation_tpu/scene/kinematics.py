"""Articulation: crane kinematic chain + human pose hook (pure JAX).

The reference reads crane part poses out of the USD scene graph
(build_crane_part_map, generate_construction_data.py:1234-1279) — the parts
are static children of the crane root. The TPU build models them as an
explicit kinematic chain so equipment-6DoF domain randomization
(BASELINE.json config 4) can articulate the boom; with the default joints the
crane matches a parked pose with the boom out (collision radius ~6-8 m,
reference: 924, 1089-1094).

Chain (crane-root local frame, base footprint on the ground at the origin):
  cranebase      fixed at the root
  cranecolumn    sits on the base top, yaw joint about +Z
  craneboom      pivots at the column top, pitch about the column's -Y
  cranetelescopic slides out of the boom tip along the boom +X axis

The human is rigid in round 1 (the reference, too, only translates + yaws the
DHGen root, generate_construction_data.py:1158-1200); ``human_joint_positions``
exposes posed COCO joints for the annotation pass.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..core import rotation

Array = jax.Array

# Chain constants (must match scene/assets.py templates).
BASE_TOP_Z = 0.5
COLUMN_HEIGHT = 1.5
BOOM_LENGTH = 4.0
TELE_MAX_EXT = 2.0
TELE_NESTED_OFFSET = 2.0  # telescopic origin sits this far before the boom tip at ext=0

# [column_yaw_deg, boom_pitch_deg (positive = raised), telescopic_extension_m]
DEFAULT_CRANE_JOINTS = jnp.array([0.0, 40.0, 1.0], jnp.float32)
CRANE_JOINT_LOW = jnp.array([-180.0, 10.0, 0.0], jnp.float32)
CRANE_JOINT_HIGH = jnp.array([180.0, 75.0, TELE_MAX_EXT], jnp.float32)

CRANE_PART_ORDER = ("cranebase", "cranecolumn", "craneboom", "cranetelescopic")


def crane_fk(joints: Array) -> Dict[str, Tuple[Array, Array]]:
    """Forward kinematics: joints (..., 3) -> {part: (R (...,3,3), t (...,3))}
    local to the crane root."""
    yaw = joints[..., 0]
    pitch = joints[..., 1]
    ext = joints[..., 2]

    eye = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), yaw.shape + (3, 3))
    zero = jnp.zeros(yaw.shape + (3,), jnp.float32)

    R_col = rotation.matrix_rot_z_degrees(yaw)
    t_col = zero.at[..., 2].set(BASE_TOP_Z)

    # Boom pivot at the column top; pitch raises the +X boom axis.
    R_boom = R_col @ rotation.matrix_rot_y_degrees(-pitch)
    t_boom = zero.at[..., 2].set(BASE_TOP_Z + COLUMN_HEIGHT)

    # Telescopic slides along the (pitched) boom +X.
    slide = BOOM_LENGTH - TELE_NESTED_OFFSET + ext
    t_tele = t_boom + R_boom[..., :, 0] * slide[..., None]

    return {
        "cranebase": (eye, zero),
        "cranecolumn": (R_col, t_col),
        "craneboom": (R_boom, t_boom),
        "cranetelescopic": (R_boom, t_tele),
    }


def crane_reach_xy(joints: Array) -> Array:
    """Horizontal reach of the telescopic tip from the crane root — used to
    derive the crane's collision radius the way the reference derives it from
    the world BBox (generate_construction_data.py:1089-1092)."""
    pitch = jnp.deg2rad(joints[..., 1])
    ext = joints[..., 2]
    tip = BOOM_LENGTH - TELE_NESTED_OFFSET + ext + 3.0  # + telescopic length
    return tip * jnp.cos(pitch)


def human_joint_positions(canonical_kpts: Array, yaw_deg: Array, pos: Array) -> Array:
    """Posed COCO joints: rigid yaw about Z + translation (..., 17, 3).

    ``canonical_kpts`` is assets.CANONICAL_COCO; the reference's randomizer
    applies exactly translate + rotateZ to the DHGen root (1175, 1189)."""
    R = rotation.matrix_rot_z_degrees(yaw_deg)
    return jnp.einsum("...ij,kj->...ki", R, canonical_kpts) + pos[..., None, :]
