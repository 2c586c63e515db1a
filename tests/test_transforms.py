"""core.transforms vs a numpy/scipy oracle of bboxDict_to_transform."""

import numpy as np
from scipy.spatial.transform import Rotation as R

import jax.numpy as jnp

from constructionsceneposeestimation_tpu.core import transforms


def numpy_bbox_dict_to_transform(corner_min, corner_max, trans_mtx_flat):
    # Independent numpy restatement of reference bboxDict_to_transform
    # (generate_construction_data.py:553-584).
    corner = np.array([corner_min, corner_max], float)
    center_local = np.mean(corner, axis=0)
    center_local_1 = np.append(center_local, 1.0)
    trans_mtx_T = np.asarray(trans_mtx_flat, float).reshape(4, 4).T
    center_world = (trans_mtx_T @ center_local_1)[:3]
    rot_mtx = trans_mtx_T[:3, :3]
    U, _, Vt = np.linalg.svd(rot_mtx)
    rot_pure = U @ Vt
    euler = R.from_matrix(rot_pure).as_euler("xyz", degrees=True)
    scale = np.linalg.norm(rot_mtx, axis=0)
    size_local = np.abs(corner[1] - corner[0])
    return center_world, scale * size_local, euler


def make_record(rng):
    Rm = R.random(random_state=rng.randint(1 << 30)).as_matrix()
    scale = rng.uniform(0.5, 3.0, 3)
    t = rng.uniform(-10, 10, 3)
    # Column-vector local-to-world with per-local-axis scale.
    lin = Rm * scale[None, :]
    T_col = np.eye(4)
    T_col[:3, :3] = lin
    T_col[:3, 3] = t
    row_major = T_col.T  # how the annotator stores it (reference line 568)
    cmin = rng.uniform(-2, 0, 3)
    cmax = cmin + rng.uniform(0.1, 4.0, 3)
    return cmin, cmax, row_major


def test_bbox_record_to_pose_matches_reference_oracle():
    rng = np.random.RandomState(7)
    for _ in range(40):
        cmin, cmax, row_major = make_record(rng)
        want_c, want_s, want_e = numpy_bbox_dict_to_transform(cmin, cmax, row_major)
        got_c, got_s, got_e = transforms.bbox_record_to_pose(
            jnp.asarray(cmin, jnp.float32),
            jnp.asarray(cmax, jnp.float32),
            jnp.asarray(row_major, jnp.float32),
        )
        np.testing.assert_allclose(np.asarray(got_c), want_c, atol=2e-3)
        np.testing.assert_allclose(np.asarray(got_s), want_s, atol=2e-3)
        np.testing.assert_allclose(np.asarray(got_e), want_e, atol=0.05)


def test_bbox_record_to_pose_batched():
    rng = np.random.RandomState(8)
    recs = [make_record(rng) for _ in range(8)]
    cmin = jnp.asarray(np.stack([r[0] for r in recs]), jnp.float32)
    cmax = jnp.asarray(np.stack([r[1] for r in recs]), jnp.float32)
    T = jnp.asarray(np.stack([r[2] for r in recs]), jnp.float32)
    got_c, got_s, got_e = transforms.bbox_record_to_pose(cmin, cmax, T)
    assert got_c.shape == (8, 3) and got_s.shape == (8, 3) and got_e.shape == (8, 3)
    for i, (a, b, rm) in enumerate(recs):
        want_c, want_s, want_e = numpy_bbox_dict_to_transform(a, b, rm)
        np.testing.assert_allclose(np.asarray(got_c[i]), want_c, atol=2e-3)


def test_world_aabb_and_collision_radius():
    # Unit cube centered at origin, rotated 45 degrees about Z, scaled by 2 in x.
    Rm = R.from_euler("z", 45, degrees=True).as_matrix()
    T = np.eye(4)
    T[:3, :3] = Rm @ np.diag([2.0, 1.0, 1.0])
    T[:3, 3] = [5.0, 0.0, 0.0]
    cmin = jnp.asarray([-0.5, -0.5, -0.5])
    cmax = jnp.asarray([0.5, 0.5, 0.5])
    wmin, wmax = transforms.world_aabb_of_local_aabb(cmin, cmax, jnp.asarray(T, jnp.float32))
    # Extent in x/y: rotated scaled cube has half-extent (|2c|+|s|)/2 etc.
    c = np.cos(np.pi / 4)
    np.testing.assert_allclose(np.asarray(wmin)[2], -0.5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(wmax)[0] - 5.0, (2 * c + c) / 2, atol=1e-4)
    r = transforms.collision_radius_xy(cmin, cmax, jnp.asarray(T, jnp.float32))
    dx = (np.asarray(wmax)[0] - np.asarray(wmin)[0]) / 2
    dy = (np.asarray(wmax)[1] - np.asarray(wmin)[1]) / 2
    np.testing.assert_allclose(float(r), max(np.hypot(dx, dy) * 0.9, 1.0), rtol=1e-5)


def test_make_transform_and_apply():
    Rm = R.from_euler("xyz", [10, 20, 30], degrees=True).as_matrix().astype(np.float32)
    t = np.array([1.0, 2.0, 3.0], np.float32)
    T = transforms.make_transform(jnp.asarray(Rm), jnp.asarray(t))
    pts = jnp.asarray(np.random.RandomState(0).randn(5, 3), jnp.float32)
    got = np.asarray(transforms.transform_points(T, pts))
    want = np.asarray(pts) @ Rm.T + t
    np.testing.assert_allclose(got, want, atol=1e-5)
