"""Crane FK + articulated human skeleton invariants."""

import numpy as np
import jax
import jax.numpy as jnp

from constructionsceneposeestimation_tpu.scene import assets, kinematics


def test_crane_fk_default_geometry():
    fk = kinematics.crane_fk(kinematics.DEFAULT_CRANE_JOINTS)
    Rb, tb = fk["craneboom"]
    # Boom pivot at the column top.
    np.testing.assert_allclose(np.asarray(tb), [0, 0, 2.0], atol=1e-6)
    # 40-degree raised boom: +X axis pitched up.
    x_axis = np.asarray(Rb)[:, 0]
    np.testing.assert_allclose(x_axis[2], np.sin(np.deg2rad(40)), atol=1e-5)
    Rt, tt = fk["cranetelescopic"]
    # Telescopic origin sits along the boom axis at slide distance.
    slide = 4.0 - 2.0 + 1.0
    np.testing.assert_allclose(np.asarray(tt), np.asarray(tb) + x_axis * slide, atol=1e-5)


def test_crane_fk_yaw():
    joints = jnp.asarray([90.0, 0.0, 0.0])
    fk = kinematics.crane_fk(joints)
    Rb, _ = fk["craneboom"]
    # Boom +X now points along world +Y.
    np.testing.assert_allclose(np.asarray(Rb)[:, 0], [0, 1, 0], atol=1e-5)


def _bone_lengths(j):
    pairs = [(5, 7), (7, 9), (6, 8), (8, 10), (11, 13), (13, 15), (12, 14), (14, 16)]
    return np.asarray([np.linalg.norm(np.asarray(j[a]) - np.asarray(j[b])) for a, b in pairs])


def test_human_pose_preserves_bone_lengths():
    canon = jnp.asarray(assets.CANONICAL_COCO)
    want = _bone_lengths(canon)
    for seed in range(5):
        angles = kinematics.sample_human_pose(jax.random.PRNGKey(seed))
        posed = kinematics.pose_human_joints(canon, angles)
        np.testing.assert_allclose(_bone_lengths(posed), want, atol=1e-5)
        # Torso (shoulders/hips) untouched.
        np.testing.assert_allclose(np.asarray(posed[5]), np.asarray(canon[5]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(posed[11]), np.asarray(canon[11]), atol=1e-6)


def test_human_pose_zero_angles_identity():
    canon = jnp.asarray(assets.CANONICAL_COCO)
    posed = kinematics.pose_human_joints(canon, jnp.zeros(10))
    np.testing.assert_allclose(np.asarray(posed), np.asarray(canon), atol=1e-6)


def test_capsule_transforms_follow_joints():
    canon = jnp.asarray(assets.CANONICAL_COCO)
    angles = kinematics.sample_human_pose(jax.random.PRNGKey(3))
    posed = kinematics.pose_human_joints(canon, angles)
    rot, off = kinematics.human_capsule_transforms(posed)
    assert rot.shape[0] == 2 + len(assets.HUMAN_SEGMENTS)
    # Each segment capsule: center at the midpoint, +Z column along the bone.
    for i, (a, b, _r) in enumerate(assets.HUMAN_SEGMENTS):
        mid = (np.asarray(posed[a]) + np.asarray(posed[b])) / 2
        np.testing.assert_allclose(np.asarray(off[2 + i]), mid, atol=1e-5)
        bone = np.asarray(posed[b]) - np.asarray(posed[a])
        bone /= np.linalg.norm(bone)
        np.testing.assert_allclose(np.asarray(rot[2 + i])[:, 2], bone, atol=1e-4)
        # Orthonormal.
        R = np.asarray(rot[2 + i])
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
