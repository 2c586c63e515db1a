"""core.rotation vs numpy/scipy oracles.

The numpy oracle for quat conversion is an independent re-statement of the
reference's Shepperd branches (generate_construction_data.py:475-504)."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

import jax.numpy as jnp

from constructionsceneposeestimation_tpu.core import rotation


def reference_rot_mtx_to_quaternion(Rm):
    # Independent numpy restatement of the reference's Shepperd conversion.
    trace = np.trace(Rm)
    if trace > 0:
        S = np.sqrt(trace + 1.0) * 2
        w = 0.25 * S
        x = (Rm[2, 1] - Rm[1, 2]) / S
        y = (Rm[0, 2] - Rm[2, 0]) / S
        z = (Rm[1, 0] - Rm[0, 1]) / S
    elif (Rm[0, 0] > Rm[1, 1]) and (Rm[0, 0] > Rm[2, 2]):
        S = np.sqrt(1.0 + Rm[0, 0] - Rm[1, 1] - Rm[2, 2]) * 2
        w = (Rm[2, 1] - Rm[1, 2]) / S
        x = 0.25 * S
        y = (Rm[0, 1] + Rm[1, 0]) / S
        z = (Rm[0, 2] + Rm[2, 0]) / S
    elif Rm[1, 1] > Rm[2, 2]:
        S = np.sqrt(1.0 + Rm[1, 1] - Rm[0, 0] - Rm[2, 2]) * 2
        w = (Rm[0, 2] - Rm[2, 0]) / S
        x = (Rm[0, 1] + Rm[1, 0]) / S
        y = 0.25 * S
        z = (Rm[1, 2] + Rm[2, 1]) / S
    else:
        S = np.sqrt(1.0 + Rm[2, 2] - Rm[0, 0] - Rm[1, 1]) * 2
        w = (Rm[1, 0] - Rm[0, 1]) / S
        x = (Rm[0, 2] + Rm[2, 0]) / S
        y = (Rm[1, 2] + Rm[2, 1]) / S
        z = 0.25 * S
    return np.array([w, x, y, z])


def random_rotations(n, seed=0):
    return R.random(n, random_state=seed).as_matrix().astype(np.float32)


def test_quat_from_matrix_matches_reference_all_branches():
    # Force every Shepperd branch: identity (trace>0) plus 180-degree flips
    # about each axis (each makes a different diagonal element dominant).
    mats = [
        np.eye(3),
        R.from_euler("x", 180, degrees=True).as_matrix(),
        R.from_euler("y", 180, degrees=True).as_matrix(),
        R.from_euler("z", 180, degrees=True).as_matrix(),
    ] + list(random_rotations(50))
    for Rm in mats:
        got = np.asarray(rotation.quat_wxyz_from_matrix(jnp.asarray(Rm, jnp.float32)))
        want = reference_rot_mtx_to_quaternion(np.asarray(Rm, np.float64))
        # Same sign convention: both use Shepperd with positive dominant term.
        np.testing.assert_allclose(got, want, atol=2e-5)


def test_quat_matrix_roundtrip_batched():
    mats = random_rotations(64, seed=1)
    q = rotation.quat_wxyz_from_matrix(jnp.asarray(mats))
    back = np.asarray(rotation.matrix_from_quat_wxyz(q))
    np.testing.assert_allclose(back, mats, atol=2e-5)


def test_quat_xyzw_matches_scipy():
    mats = random_rotations(32, seed=2)
    got = np.asarray(rotation.quat_xyzw_from_matrix(jnp.asarray(mats)))
    want = R.from_matrix(mats).as_quat()
    # Quaternion sign ambiguity: compare up to sign.
    sign = np.sign(np.sum(got * want, axis=-1, keepdims=True))
    np.testing.assert_allclose(got * sign, want, atol=2e-5)


def test_euler_xyz_degrees_matches_scipy():
    mats = random_rotations(200, seed=3)
    got = np.asarray(rotation.euler_xyz_degrees_from_matrix(jnp.asarray(mats)))
    want = R.from_matrix(mats).as_euler("xyz", degrees=True)
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_euler_gimbal_lock_consistent():
    Rm = R.from_euler("y", 90, degrees=True).as_matrix().astype(np.float32)
    got = np.asarray(rotation.euler_xyz_degrees_from_matrix(jnp.asarray(Rm)))
    back = R.from_euler("xyz", got, degrees=True).as_matrix()
    np.testing.assert_allclose(back, Rm, atol=1e-3)


def test_rotate_vec_matches_matrix():
    mats = random_rotations(16, seed=4)
    q = rotation.quat_wxyz_from_matrix(jnp.asarray(mats))
    v = np.random.RandomState(0).randn(16, 3).astype(np.float32)
    got = np.asarray(rotation.rotate_vec_wxyz(q, jnp.asarray(v)))
    want = np.einsum("nij,nj->ni", mats, v)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_orthonormalize_svd():
    rng = np.random.RandomState(5)
    mats = random_rotations(8, seed=6)
    scales = rng.uniform(0.5, 2.0, size=(8, 1, 3)).astype(np.float32)
    noisy = mats * scales  # per-column scaling
    got = np.asarray(rotation.orthonormalize(jnp.asarray(noisy)))
    for g, want in zip(got, mats):
        U, _, Vt = np.linalg.svd(noisy[0] * 0 + g)  # g should already be orthonormal
        np.testing.assert_allclose(g @ g.T, np.eye(3), atol=1e-4)
    # positive scaling preserves the rotation itself
    np.testing.assert_allclose(got, mats, atol=1e-4)


def test_orthonormalize_matches_svd_oracle():
    """The Newton-polar implementation must agree with U @ Vt to f32 eps —
    including additive noise, wide singular-value spreads, and det<0
    reflections (it replaced jnp.linalg.svd for TPU perf; see docstring)."""
    rng = np.random.RandomState(7)
    mats = random_rotations(64, seed=8)
    scales = rng.uniform(0.3, 3.0, size=(64, 1, 3)).astype(np.float32)
    noisy = mats * scales + rng.randn(64, 3, 3).astype(np.float32) * 0.05
    reflected = noisy.copy()
    reflected[:, :, 0] *= -1
    for M in (noisy, reflected):
        got = np.asarray(rotation.orthonormalize(jnp.asarray(M)))
        U, _, Vt = np.linalg.svd(M.astype(np.float64))
        np.testing.assert_allclose(got, (U @ Vt).astype(np.float32),
                                   atol=1e-5)


def test_rot_z_degrees():
    got = np.asarray(rotation.matrix_rot_z_degrees(jnp.asarray([0.0, 90.0, -45.0])))
    want = R.from_euler("z", [[0], [90], [-45]], degrees=True).as_matrix()
    np.testing.assert_allclose(got, want, atol=1e-5)
