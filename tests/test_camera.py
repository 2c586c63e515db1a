"""core.camera vs independent numpy oracles of the reference semantics."""

import numpy as np
from scipy.spatial.transform import Rotation as R

import jax.numpy as jnp

from constructionsceneposeestimation_tpu.core import camera, rotation


def numpy_cam_pos_ori_matrix(target_point, aimed_point):
    # Independent numpy restatement of reference camPosOri
    # (generate_construction_data.py:507-550), returning the matrix.
    forward = np.asarray(aimed_point, float) - np.asarray(target_point, float)
    forward = forward / np.linalg.norm(forward)
    world_up = np.array([0.0, 0.0, 1.0])
    right = np.cross(forward, world_up)
    rn = np.linalg.norm(right)
    if rn < 1e-6:
        right = np.array([1.0, 0.0, 0.0])
    else:
        right = right / rn
    up = np.cross(right, forward)
    up = up / np.linalg.norm(up)
    return np.array(
        [
            [-forward[0], -right[0], up[0]],
            [-forward[1], -right[1], up[1]],
            [-forward[2], -right[2], up[2]],
        ]
    )


def test_look_at_matrix_matches_reference():
    rng = np.random.RandomState(0)
    for _ in range(50):
        cam = rng.uniform(-10, 10, 3)
        tgt = rng.uniform(-5, 5, 3)
        if np.linalg.norm(tgt - cam) < 1e-3:
            continue
        got = np.asarray(camera.look_at_matrix(jnp.asarray(cam, jnp.float32), jnp.asarray(tgt, jnp.float32)))
        want = numpy_cam_pos_ori_matrix(cam, tgt)
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_look_at_degenerate_vertical():
    cam = jnp.asarray([0.0, 0.0, 10.0])
    tgt = jnp.asarray([0.0, 0.0, 0.0])  # looking straight down
    got = np.asarray(camera.look_at_matrix(cam, tgt))
    want = numpy_cam_pos_ori_matrix(np.array([0, 0, 10.0]), np.zeros(3))
    np.testing.assert_allclose(got, want, atol=1e-6)
    # Must still be a rotation matrix.
    np.testing.assert_allclose(got @ got.T, np.eye(3), atol=1e-6)


def test_reference_camposori_matrix_is_reflection():
    # Documents the reference quirk: camPosOri builds a det=-1 (left-handed)
    # matrix; for horizontal aims its Shepperd quaternion degenerates to
    # identity (generate_construction_data.py:540-549).
    cam = np.array([1.0, 2.0, 3.0])
    tgt = np.array([0.0, 0.0, 3.0])
    M = numpy_cam_pos_ori_matrix(cam, tgt)
    assert np.linalg.det(M) < -0.99
    got = np.asarray(
        camera.reference_camera_quat_wxyz(jnp.asarray(cam, jnp.float32), jnp.asarray(tgt, jnp.float32))
    )
    np.testing.assert_allclose(got, [1.0, 0.0, 0.0, 0.0], atol=1e-5)


def test_camera_pose7_layout_and_correct_geometry():
    cam = jnp.asarray([1.0, 2.0, 3.0])
    tgt = jnp.asarray([0.0, 0.0, 3.0])
    pose = np.asarray(camera.camera_pose7_xyzw(cam, tgt))
    assert pose.shape == (7,)
    np.testing.assert_allclose(pose[:3], [1, 2, 3], atol=1e-6)
    q = pose[3:]  # xyzw
    Rm = R.from_quat(q).as_matrix()
    # Default mode emits a proper rotation (world-from-pinhole).
    assert np.linalg.det(Rm) > 0.99
    # Its third column (pinhole +Z = view direction) points at the target.
    view = Rm[:, 2]
    want_dir = (np.array([0, 0, 3.0]) - np.array([1, 2, 3.0]))
    want_dir /= np.linalg.norm(want_dir)
    np.testing.assert_allclose(view, want_dir, atol=1e-4)


def test_camera_pose_makes_reference_backprojection_correct():
    # End-to-end consistency: project world points to (u, v, depth) with the
    # rendering path, then run the *reference's* fallback backprojection using
    # our emitted camera_pose -> must recover the original world points.
    intr = camera.intrinsics_from_apertures(12.0, 25.0, 64, 48)
    cam_pos = jnp.asarray([8.0, -4.0, 2.5])
    tgt = jnp.asarray([0.0, 0.0, 2.5])
    M = camera.look_at_matrix(cam_pos, tgt)
    rng = np.random.RandomState(3)
    pts = jnp.asarray(rng.uniform(-1.5, 1.5, (40, 3)), jnp.float32)
    uv, z = camera.project(pts, cam_pos, M, intr)
    pose7 = camera.camera_pose7_xyzw(cam_pos, tgt)
    # Reference fallback math: p_world = R(q) @ [x_pin, y_pin, z] + t
    u, v = np.asarray(uv).T
    z = np.asarray(z)
    x_pin = (u - float(intr.cx)) * z / float(intr.fx)
    y_pin = (v - float(intr.cy)) * z / float(intr.fy)
    pin = np.stack([x_pin, y_pin, z], -1)
    Rq = R.from_quat(np.asarray(pose7)[3:]).as_matrix()
    recovered = pin @ Rq.T + np.asarray(pose7)[:3]
    np.testing.assert_allclose(recovered, np.asarray(pts), atol=1e-3)


def test_project_backproject_roundtrip():
    intr = camera.intrinsics_from_apertures(12.0, 25.0, 128, 96)
    cam_pos = jnp.asarray([5.0, -3.0, 2.0])
    Rm = camera.look_at_matrix(cam_pos, jnp.asarray([0.0, 0.0, 1.0]))
    rng = np.random.RandomState(1)
    pts = jnp.asarray(rng.uniform(-2, 2, (32, 3)), jnp.float32)
    uv, z = camera.project(pts, cam_pos, Rm, intr)
    # Reconstruct world points from (u, v, z)
    u, v = np.asarray(uv).T
    z = np.asarray(z)
    x = (u - float(intr.cx)) * z / float(intr.fx)
    y = (v - float(intr.cy)) * z / float(intr.fy)
    pin = jnp.asarray(np.stack([x, y, z], -1), jnp.float32)
    back = np.asarray(camera.pinhole_to_world(pin, cam_pos, Rm))
    np.testing.assert_allclose(back, np.asarray(pts), atol=1e-3)


def test_points_in_front_have_positive_depth():
    cam_pos = jnp.asarray([10.0, 0.0, 2.0])
    Rm = camera.look_at_matrix(cam_pos, jnp.asarray([0.0, 0.0, 2.0]))
    intr = camera.intrinsics_from_apertures(12.0, 25.0, 640, 360)
    ahead = jnp.asarray([[0.0, 0.0, 2.0], [5.0, 0.0, 2.0]])
    behind = jnp.asarray([[20.0, 0.0, 2.0]])
    _, z_ahead = camera.project(ahead, cam_pos, Rm, intr)
    _, z_behind = camera.project(behind, cam_pos, Rm, intr)
    assert np.all(np.asarray(z_ahead) > 0)
    assert np.all(np.asarray(z_behind) < 0)
    # A point straight ahead lands on the principal point.
    uv, _ = camera.project(ahead[:1], cam_pos, Rm, intr)
    np.testing.assert_allclose(np.asarray(uv)[0], [320.0, 180.0], atol=1e-2)


def numpy_reference_backproject(depth, camera_params, camera_pose):
    # Independent numpy restatement of reference depth_to_pointcloud_with_rgb
    # geometry (generate_construction_data.py:616-685), without RGB.
    h, w = depth.shape
    fx = camera_params["width"] * camera_params["focal_length"] / camera_params["horizontal_aperture"]
    fy = camera_params["height"] * camera_params["focal_length"] / camera_params["vertical_aperture"]
    cx = camera_params["width"] / 2.0
    cy = camera_params["height"] / 2.0
    u, v = np.meshgrid(np.arange(w), np.arange(h))
    valid = np.isfinite(depth) & (depth > 0) & (depth < 250)
    z = depth[valid]
    x = (u[valid] - cx) * z / fx
    y = (v[valid] - cy) * z / fy
    pts_pin = np.stack([x, y, z], -1)
    pos = np.array(camera_pose[:3])
    quat = np.array(camera_pose[3:])
    Rm = R.from_quat(quat).as_matrix()
    return (Rm @ pts_pin.T).T + pos


def test_reference_quirk_backprojection_parity():
    rng = np.random.RandomState(2)
    h, w = 24, 32
    depth = rng.uniform(1.0, 50.0, (h, w)).astype(np.float32)
    depth[0, 0] = 0.0
    depth[1, 1] = np.inf
    depth[2, 2] = 300.0
    params = {
        "focal_length": 18.14,
        "horizontal_aperture": 20.955,
        "vertical_aperture": 15.2908,
        "width": w,
        "height": h,
    }
    cam_pos = np.array([3.0, -2.0, 1.5])
    q = R.from_euler("xyz", [10, 20, 30], degrees=True).as_quat()
    pose7 = np.concatenate([cam_pos, q]).astype(np.float32)
    intr = camera.intrinsics_from_apertures(
        params["focal_length"], params["horizontal_aperture"], w, h,
        vertical_aperture=params["vertical_aperture"],
    )
    got_grid = np.asarray(
        camera.backproject_depth_reference_quirk(jnp.asarray(depth), intr, jnp.asarray(pose7))
    )
    valid = np.asarray(camera.depth_valid_mask(jnp.asarray(depth)))
    got = got_grid[valid]
    want = numpy_reference_backproject(depth, params, pose7)
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_intrinsics_defaults():
    intr = camera.intrinsics_from_apertures(
        camera.FALLBACK_FOCAL_LENGTH, camera.FALLBACK_HORIZONTAL_APERTURE, 1280, 720,
        vertical_aperture=camera.FALLBACK_VERTICAL_APERTURE,
    )
    np.testing.assert_allclose(float(intr.fx), 1280 * 18.14 / 20.955, rtol=1e-6)
    np.testing.assert_allclose(float(intr.fy), 720 * 18.14 / 15.2908, rtol=1e-6)
    assert (float(intr.cx), float(intr.cy)) == (640.0, 360.0)
