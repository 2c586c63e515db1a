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
import numpy as np

from ..core import rotation

Array = jax.Array

# Chain constants (must match scene/assets.py templates).
BASE_TOP_Z = 0.5
COLUMN_HEIGHT = 1.5
BOOM_LENGTH = 4.0
TELE_MAX_EXT = 2.0
TELE_NESTED_OFFSET = 2.0  # telescopic origin sits this far before the boom tip at ext=0

# [column_yaw_deg, boom_pitch_deg (positive = raised), telescopic_extension_m]
# numpy, not jnp: no backend init at import (multi-process bring-up).
DEFAULT_CRANE_JOINTS = np.array([0.0, 40.0, 1.0], np.float32)
CRANE_JOINT_LOW = np.array([-180.0, 10.0, 0.0], np.float32)
CRANE_JOINT_HIGH = np.array([180.0, 75.0, TELE_MAX_EXT], np.float32)

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


# ---- articulated human (the TPU stand-in for the DHGen SkelRoot rig) ----
# Limb chains rotated about their proximal joints; bone lengths (and thus the
# capsule parameters) stay constant, so only transforms change per pose.
# COCO ids: 5/6 shoulders, 7/8 elbows, 9/10 wrists, 11/12 hips, 13/14 knees,
# 15/16 ankles.

# [l_arm_swing, l_arm_abduct, l_elbow, r_arm_swing, r_arm_abduct, r_elbow,
#  l_leg_swing, l_knee, r_leg_swing, r_knee]  (degrees)
HUMAN_POSE_LOW = np.array([-40.0, -10.0, 0.0, -40.0, -10.0, 0.0,
                            -25.0, 0.0, -25.0, 0.0], jnp.float32)
HUMAN_POSE_HIGH = np.array([40.0, 70.0, 80.0, 40.0, 70.0, 80.0,
                             25.0, 50.0, 25.0, 50.0], jnp.float32)


def sample_human_pose(key: Array) -> Array:
    """Natural-ish working-pose joint angles (10,) in degrees."""
    return jax.random.uniform(key, (10,), minval=HUMAN_POSE_LOW,
                              maxval=HUMAN_POSE_HIGH)


def pose_human_joints(canonical_kpts: Array, angles_deg: Array) -> Array:
    """Articulate the canonical COCO skeleton (17, 3) -> posed (17, 3) in the
    human's local frame (+X facing, +Z up). Arms rotate about the shoulder
    (swing about local Y = forward/back, abduction lifts sideways about X),
    elbows bend the forearm; legs swing about Y with knee bends."""
    k = canonical_kpts

    def rot_about(point, pivot, R):
        return pivot + jnp.einsum("ij,...j->...i", R, point - pivot)

    out = k
    # Arms: (shoulder_id, elbow_id, wrist_id, swing, abduct_sign, angles)
    for sh, el, wr, a_sw, a_ab, a_el, side in (
        (5, 7, 9, angles_deg[0], angles_deg[1], angles_deg[2], 1.0),
        (6, 8, 10, angles_deg[3], angles_deg[4], angles_deg[5], -1.0),
    ):
        R_sh = (rotation.matrix_rot_y_degrees(a_sw)
                @ rotation.matrix_rot_x_degrees(-side * a_ab))
        elbow = rot_about(out[el], out[sh], R_sh)
        wrist0 = rot_about(out[wr], out[sh], R_sh)
        # Elbow bend about the local Y at the (posed) elbow.
        R_el = rotation.matrix_rot_y_degrees(-a_el)
        wrist = rot_about(wrist0, elbow, R_el)
        out = out.at[el].set(elbow).at[wr].set(wrist)
    # Legs: hip swing + knee bend, both about Y.
    for hp, kn, an, a_sw, a_kn in (
        (11, 13, 15, angles_deg[6], angles_deg[7]),
        (12, 14, 16, angles_deg[8], angles_deg[9]),
    ):
        R_hip = rotation.matrix_rot_y_degrees(a_sw)
        knee = rot_about(out[kn], out[hp], R_hip)
        ankle0 = rot_about(out[an], out[hp], R_hip)
        R_knee = rotation.matrix_rot_y_degrees(a_kn)
        ankle = rot_about(ankle0, knee, R_knee)
        out = out.at[kn].set(knee).at[an].set(ankle)
    return out


def _frame_from_z(z: Array) -> Array:
    """Rotation whose +Z column is the (unnormalized) direction z (jnp mirror
    of assets._capsule_between's construction)."""
    zn = z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True), 1e-6)
    up = jnp.where(jnp.abs(zn[..., 2:3]) > 0.9,
                   jnp.array([1.0, 0.0, 0.0]), jnp.array([0.0, 0.0, 1.0]))
    x = jnp.cross(up, zn)
    x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-6)
    y = jnp.cross(zn, x)
    return jnp.stack([x, y, zn], axis=-1)


def human_capsule_transforms(joints: Array):
    """Posed joints (17, 3) -> (rot (P_h, 3, 3), offset (P_h, 3)) for the
    human template's primitives IN TEMPLATE ORDER (head sphere, torso capsule,
    then assets.HUMAN_SEGMENTS). Capsule params are pose-invariant."""
    from . import assets  # local import to avoid cycle at module load

    rots = []
    offs = []
    # Head sphere: centered behind/above the face landmarks.
    head = (joints[0] + joints[3] + joints[4]) / 3.0 + jnp.array([0.0, 0.0, 0.04])
    rots.append(jnp.eye(3))
    offs.append(head)
    # Torso capsule between mid-shoulder and mid-hip.
    mid_sh = (joints[5] + joints[6]) / 2.0
    mid_hip = (joints[11] + joints[12]) / 2.0
    rots.append(_frame_from_z(mid_hip - mid_sh))
    offs.append((mid_sh + mid_hip) / 2.0)
    for a, b, _r in assets.HUMAN_SEGMENTS:
        rots.append(_frame_from_z(joints[b] - joints[a]))
        offs.append((joints[a] + joints[b]) / 2.0)
    return jnp.stack(rots), jnp.stack(offs)
