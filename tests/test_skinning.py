"""Skinned worker (tools/make_worker_skin.py + render/meshcast.load_skin):
rest-pose exactness, LBS-vs-oracle depth, articulated smoothness, label
invariance."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from constructionsceneposeestimation_tpu.config import SceneConfig
from constructionsceneposeestimation_tpu.render import meshcast, raycast
from constructionsceneposeestimation_tpu.scene import kinematics, world as world_mod

from tests.test_meshcast import look_at_rays, mt_oracle


@pytest.fixture(scope="module")
def skin():
    s = meshcast.load_skin()
    if s is None:
        pytest.skip("worker_skin.npz not baked")
    return s


@pytest.fixture(scope="module")
def scene():
    cfg = SceneConfig()
    roster = world_mod.make_roster(cfg)
    return cfg, roster


def _skin_oracle_verts(skin, prim_rot, prim_pos, bone_rows):
    """NumPy LBS: the contract render/meshcast._world_corners implements."""
    R = prim_rot[bone_rows]  # (B, 3, 3)
    p = prim_pos[bone_rows]  # (B, 3)
    out = np.zeros_like(skin["verts"])
    for j in range(2):
        b = skin["bone_ids"][:, j]
        vj = np.einsum("vkj,vj->vk", R[b], skin["v_loc"][:, j]) + p[b]
        out += skin["weights"][:, j][:, None] * vj
    return out


def test_rest_pose_reconstruction_exact(skin):
    """At the canonical pose every bone transform is the capsule's own rest
    frame, so LBS must reproduce the baked vertices exactly (weights sum to
    1 and v_loc round-trips)."""
    import tools.make_worker_skin as mws

    np.testing.assert_allclose(skin["weights"].sum(-1), 1.0, atol=1e-6)
    rot0, c0, _, _, _ = mws._frame_rows()
    rest = _skin_oracle_verts(skin, rot0, c0,
                              np.arange(len(rot0)))
    np.testing.assert_allclose(rest, skin["verts"], atol=1e-5)


def _human_world(cfg, roster, angles=None):
    pose = world_mod.default_pose(roster, cfg)
    if angles is not None:
        n_h = roster.human_slice[1] - roster.human_slice[0]
        joints = jax.vmap(lambda a: kinematics.pose_human_joints(
            jnp.asarray(world_mod.assets.CANONICAL_COCO), a))(
                jnp.broadcast_to(angles, (n_h, 10)))
        pose = world_mod.ScenePose(pose.crane_pos, pose.crane_yaw_deg,
                                   pose.crane_joints, pose.positions,
                                   pose.yaw_deg, human_joints=joints)
    return world_mod.build_world(roster, pose)


def test_skinned_sweep_matches_lbs_oracle(scene, skin):
    """meshcast's skinned human triangles equal the NumPy LBS oracle, under
    an articulated (bent-elbow, bent-knee) pose."""
    cfg, roster = scene
    angles = jnp.asarray([20.0, 45.0, 70.0, -15.0, 30.0, 40.0,
                          15.0, 45.0, -10.0, 30.0], jnp.float32)
    world = _human_world(cfg, roster, angles)
    mesh = meshcast.make_mesh_caster(roster, templates={}, classes=("human",))
    assert mesh is not None and mesh.n_blocks >= 1

    h0, h1 = roster.human_slice
    hpos = np.asarray(world["inst_pos"])[h0]
    cam = (hpos + np.float32([2.2, 1.0, 1.4])).astype(np.float32)
    dirs = look_at_rays(cam, hpos + [0, 0, 1.0], res=48, half_fov=0.35)
    t, code = raycast._unpack(mesh(world, jnp.asarray(cam), jnp.asarray(dirs)))
    t, code = np.asarray(t), np.asarray(code)

    prim_inst = np.asarray(roster.prim_inst)
    tris = []
    for i in range(h0, h1):
        rows = np.nonzero(prim_inst == i)[0]
        vw = _skin_oracle_verts(skin, np.asarray(world["prim_rot"]),
                                np.asarray(world["prim_pos"]), rows)
        tris.append(vw[skin["faces"]])
    tm = mt_oracle(np.concatenate(tris).astype(np.float32), cam, dirs)

    hit_mine = t < raycast.INF * 0.99
    hit_oracle = np.isfinite(tm)
    assert hit_mine.sum() > 200  # the worker is actually in view
    assert (hit_mine == hit_oracle).mean() > 0.999
    both = hit_mine & hit_oracle
    assert np.abs(t[both] - tm[both]).max() < 1e-3
    assert np.isin(code[both] - 2, np.arange(h0, h1)).all()


def test_skinned_silhouette_close_to_capsules(scene, skin):
    """The skinned shell IS the capsule surface away from joints — the hifi
    human mask must closely agree with the analytic capsule mask, and labels
    (keypoints) must be identical either way."""
    from constructionsceneposeestimation_tpu.core import camera as cam_mod
    from constructionsceneposeestimation_tpu.render import annotate

    cfg, roster = scene
    angles = jnp.asarray([10.0, 30.0, 60.0, -20.0, 20.0, 30.0,
                          12.0, 35.0, -8.0, 20.0], jnp.float32)
    world = _human_world(cfg, roster, angles)
    h0, _ = roster.human_slice
    hpos = np.asarray(world["inst_pos"])[h0]

    hifi = meshcast.make_hifi_caster(roster, scene_cfg=cfg)
    plain = raycast.make_raycaster(roster, scene_cfg=cfg)
    intr = cam_mod.intrinsics_from_apertures(12.0, 25.0, 128, 128)
    cam = jnp.asarray(hpos + np.float32([2.0, 0.6, 1.2]))
    tgt = jnp.asarray(hpos + np.float32([0.0, 0.0, 0.9]))
    a = annotate.render_frame(roster, hifi, world, cam, tgt, intr)
    b = annotate.render_frame(roster, plain, world, cam, tgt, intr)

    ma = np.asarray(a.instance) == h0
    mb = np.asarray(b.instance) == h0
    assert mb.sum() > 300
    iou = (ma & mb).sum() / max((ma | mb).sum(), 1)
    assert iou > 0.75, iou  # same body, smoother joints + mesh facets
    # Labels are the skeleton's, not the shell's: identical bytes.
    np.testing.assert_array_equal(np.asarray(a.kpt_uv), np.asarray(b.kpt_uv))
    np.testing.assert_array_equal(np.asarray(a.center), np.asarray(b.center))
