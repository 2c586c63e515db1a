"""Analytic ray-caster vs geometric oracles."""

import numpy as np
import jax.numpy as jnp

from constructionsceneposeestimation_tpu.scene import assets, world as world_mod
from constructionsceneposeestimation_tpu.render import raycast as rc
from constructionsceneposeestimation_tpu.config import SceneConfig


def single_prim_world(kind, params, pos=(0, 0, 0), rot=None):
    rot = np.eye(3, dtype=np.float32) if rot is None else np.asarray(rot, np.float32)
    p4 = list(params) + [0.0] * (4 - len(params))
    return {
        "prim_kind": jnp.asarray([kind], jnp.int32),
        "prim_rot": jnp.asarray(rot)[None],
        "prim_pos": jnp.asarray(np.asarray(pos, np.float32))[None],
        "prim_params": jnp.asarray([p4], jnp.float32),
        "prim_inst": jnp.asarray([0], jnp.int32),
    }


class FakeRoster:
    def __init__(self, kinds, insts):
        self.prim_kind = np.asarray(kinds, np.int32)
        self.prim_inst = np.asarray(insts, np.int32)
        self.num_prims = len(kinds)


def cast_single(kind, params, o, d, pos=(0, 0, 0), rot=None):
    w = single_prim_world(kind, params, pos, rot)
    roster = FakeRoster([kind], [0])
    caster = rc.make_raycaster(roster)
    d = np.asarray(d, np.float32)
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    out = caster(w, jnp.asarray(o, jnp.float32), jnp.asarray(d).reshape(-1, 3))
    return {k: np.asarray(v) for k, v in out.items()}


def test_sphere_hit_and_normal():
    out = cast_single(assets.SPHERE, [1.0], [5, 0, 0], [[-1, 0, 0]])
    np.testing.assert_allclose(out["t"], [4.0], atol=1e-5)
    np.testing.assert_allclose(out["normal"][0], [1, 0, 0], atol=1e-5)


def test_sphere_miss():
    out = cast_single(assets.SPHERE, [1.0], [5, 0, 0], [[0, 1, 0]])
    assert np.isinf(out["t"][0]) and out["inst"][0] == -2


def test_box_hit_faces():
    out = cast_single(assets.BOX, [1.0, 2.0, 0.5], [10, 0, 0], [[-1, 0, 0]])
    np.testing.assert_allclose(out["t"], [9.0], atol=1e-5)
    np.testing.assert_allclose(out["normal"][0], [1, 0, 0], atol=1e-4)
    out = cast_single(assets.BOX, [1.0, 2.0, 0.5], [0, 0, 10], [[0, 0, -1]])
    np.testing.assert_allclose(out["t"], [9.5], atol=1e-5)
    np.testing.assert_allclose(out["normal"][0], [0, 0, 1], atol=1e-4)


def test_rotated_box():
    # 45-degree rotated box: ray along x hits the edge-on diagonal.
    c, s = np.cos(np.pi / 4), np.sin(np.pi / 4)
    rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    out = cast_single(assets.BOX, [1.0, 1.0, 1.0], [10, 0, 0], [[-1, 0, 0]], rot=rot)
    np.testing.assert_allclose(out["t"], [10 - np.sqrt(2)], atol=1e-4)


def test_cylinder_side_and_cap():
    out = cast_single(assets.CYLINDER, [0.5, 1.0], [5, 0, 0], [[-1, 0, 0]])
    np.testing.assert_allclose(out["t"], [4.5], atol=1e-5)
    out = cast_single(assets.CYLINDER, [0.5, 1.0], [0.2, 0, 5], [[0, 0, -1]])
    np.testing.assert_allclose(out["t"], [4.0], atol=1e-5)
    np.testing.assert_allclose(out["normal"][0], [0, 0, 1], atol=1e-4)
    # Ray parallel to axis but outside radius: miss.
    out = cast_single(assets.CYLINDER, [0.5, 1.0], [1.0, 0, 5], [[0, 0, -1]])
    assert np.isinf(out["t"][0])


def test_cone_truncated():
    # Truncated cone: r 0.5 at z=-1 -> 0.1 at z=+1. Horizontal ray at z=0
    # should hit at radius 0.3.
    out = cast_single(assets.CONE, [0.5, 0.1, 1.0], [5, 0, 0], [[-1, 0, 0]])
    np.testing.assert_allclose(out["t"], [4.7], atol=1e-4)
    # At z = -0.99 radius ~0.498
    out = cast_single(assets.CONE, [0.5, 0.1, 1.0], [5, 0, -0.99], [[-1, 0, 0]])
    np.testing.assert_allclose(out["t"], [5 - (0.5 - 0.4 * 0.005)], atol=1e-3)
    # From above: bottom/top cap handling — hits top cap within r_top.
    out = cast_single(assets.CONE, [0.5, 0.1, 1.0], [0.05, 0, 5], [[0, 0, -1]])
    np.testing.assert_allclose(out["t"], [4.0], atol=1e-4)


def test_capsule():
    out = cast_single(assets.CAPSULE, [0.3, 0.5], [5, 0, 0], [[-1, 0, 0]])
    np.testing.assert_allclose(out["t"], [4.7], atol=1e-5)
    # Spherical cap above the segment end.
    out = cast_single(assets.CAPSULE, [0.3, 0.5], [0, 0, 5], [[0, 0, -1]])
    np.testing.assert_allclose(out["t"], [5 - 0.8], atol=1e-4)
    np.testing.assert_allclose(out["normal"][0], [0, 0, 1], atol=1e-4)


def test_unnormalized_direction_scale_invariance():
    # occlusion_ts casts raw (unnormalized) segments: every kind's t must
    # scale as 1/|d| (regression: sphere/capsule quadratics once assumed |d|=1,
    # producing false hits from objects meters away).
    cases = [
        (assets.SPHERE, [1.0]),
        (assets.BOX, [1.0, 1.0, 1.0]),
        (assets.CYLINDER, [0.5, 1.0]),
        (assets.CONE, [0.5, 0.1, 1.0]),
        (assets.CAPSULE, [0.3, 0.5]),
    ]
    for kind, params in cases:
        w = single_prim_world(kind, params)
        roster = FakeRoster([kind], [0])
        o = jnp.asarray([5.0, 0.05, 0.05], jnp.float32)
        for scale in (1.0, 4.3):
            d = jnp.asarray([[-scale, 0.0, 0.0]], jnp.float32)
            t = rc.occlusion_ts(w, roster, o, d, jnp.asarray([-9], jnp.int32))
            np.testing.assert_allclose(
                float(t[0]) * scale, float(
                    rc.occlusion_ts(w, roster, o, jnp.asarray([[-1.0, 0.0, 0.0]], jnp.float32),
                                    jnp.asarray([-9], jnp.int32))[0]
                ), rtol=1e-4, err_msg=f"kind={kind} scale={scale}")
        # And a miss stays a miss regardless of |d|.
        d_miss = jnp.asarray([[0.0, 0.0, 17.0]], jnp.float32)
        o_out = jnp.asarray([4.0, 0.0, 5.0], jnp.float32)
        t = rc.occlusion_ts(w, roster, o_out, d_miss, jnp.asarray([-9], jnp.int32))
        assert float(t[0]) > 1e9, f"kind={kind} false hit with unnormalized d"


def test_plane():
    out = cast_single(assets.PLANE, [0.0], [0, 0, 3], [[1, 0, -1]])
    np.testing.assert_allclose(out["t"], [3 * np.sqrt(2)], atol=1e-4)
    # Looking up: miss.
    out = cast_single(assets.PLANE, [0.0], [0, 0, 3], [[0, 0, 1]])
    assert np.isinf(out["t"][0])


def test_nearest_of_many_and_instance_ids():
    roster = world_mod.make_roster(SceneConfig(n_cones=2, n_trees=1, n_fence_panels=4))
    pose = world_mod.default_pose(roster, SceneConfig(n_cones=2, n_trees=1, n_fence_panels=4))
    w = world_mod.build_world(roster, pose)
    caster = rc.make_raycaster(roster)
    # Ray straight down at the dumper location must hit the dumper, not ground.
    o = jnp.asarray([-7.37, -0.59, 20.0], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
    out = caster(w, o, d)
    d0, _ = roster.dumper_slice
    assert int(out["inst"][0]) == d0
    # Down at empty space: ground (-1).
    o2 = jnp.asarray([-9.5, 8.0, 20.0], jnp.float32)
    out2 = caster(w, o2, d)
    assert int(out2["inst"][0]) == -1
    # t must equal 20 - dumper height at that point (cab top z=2.2).
    assert 17.0 < float(out["t"][0]) < 20.0


def test_fast_cast_matches_slow():
    cfg = SceneConfig(n_cones=3, n_trees=2, n_fence_panels=6)
    roster = world_mod.make_roster(cfg)
    pose = world_mod.default_pose(roster, cfg)
    w = world_mod.build_world(roster, pose)
    caster = rc.make_raycaster(roster)
    rng = np.random.RandomState(0)
    o = jnp.asarray([9.0, -7.0, 3.0], jnp.float32)
    d = rng.randn(500, 3).astype(np.float32)
    d[:, 2] -= 0.5  # bias downward so most rays hit something
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    slow = caster(w, o, jnp.asarray(d))
    fast = caster.fast(w, o, jnp.asarray(d))
    np.testing.assert_array_equal(np.asarray(slow["inst"]), np.asarray(fast["inst"]))
    ts, tf = np.asarray(slow["t"]), np.asarray(fast["t"])
    both = np.isfinite(ts) & np.isfinite(tf)
    assert (np.isfinite(ts) == np.isfinite(tf)).all()
    # Payload packing steals 6 mantissa bits: <= 2^-18 relative depth error.
    np.testing.assert_allclose(tf[both], ts[both], rtol=2 ** -17)


def test_occlusion_ts_excludes_own_instance():
    roster = world_mod.make_roster(SceneConfig(n_cones=1, n_trees=0, n_fence_panels=0))
    pose = world_mod.default_pose(roster, SceneConfig(n_cones=1, n_trees=0, n_fence_panels=0))
    w = world_mod.build_world(roster, pose)
    c0, _ = roster.cone_slice
    # Segment from above straight to the cone apex: with the cone excluded
    # nothing blocks; without exclusion the cone itself would.
    cam = jnp.asarray([4.0, 0.0, 5.0], jnp.float32)
    apex = jnp.asarray([[4.0, 0.0, 0.7]], jnp.float32)
    seg = apex - cam
    t_excl = rc.occlusion_ts(w, roster, cam, seg, jnp.asarray([c0], jnp.int32))
    assert float(t_excl[0]) > 1.0  # not occluded by itself
    t_incl = rc.occlusion_ts(w, roster, cam, seg, jnp.asarray([-5], jnp.int32))
    assert float(t_incl[0]) <= 1.01  # the cone surface itself


def test_transform_aware_sweep_matches_generic():
    """The transform-aware fast sweep (static inv/yaw/gen categories) must
    agree with the generic SoA sweep on randomized articulated scenes —
    same nearest instance everywhere, same depth to float tolerance."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from constructionsceneposeestimation_tpu.config import (
        Config, PipelineConfig, SceneConfig, RandomizationConfig,
    )
    from constructionsceneposeestimation_tpu.core import camera as cam_mod
    from constructionsceneposeestimation_tpu.render import raycast
    from constructionsceneposeestimation_tpu.sample import placement
    from constructionsceneposeestimation_tpu.scene import world as world_mod

    cfg = Config(scene=SceneConfig(n_cones=3, n_trees=2, n_fence_panels=6))
    roster = world_mod.make_roster(cfg.scene)
    # scene_cfg enables the shared-slab fence plan — the fast path under test
    # is exactly the production pipeline configuration.
    fast = raycast.make_raycaster(roster, transform_aware=True,
                                  scene_cfg=cfg.scene)
    slow = raycast.make_raycaster(roster, transform_aware=False)
    intr = cam_mod.intrinsics_from_apertures(12.0, 25.0, 96, 96)

    for seed in range(3):
        key = jax.random.PRNGKey(seed)
        pose, _ = placement.randomize_scene(
            key, roster, cfg.scene, RandomizationConfig(),
            articulate_crane=True, articulate_humans=True)
        world = world_mod.build_world(roster, pose)
        cam = jnp.asarray([14.0 - seed, -9.0, 2.5])
        tgt = jnp.asarray([0.0, 0.0, 1.0])
        M = cam_mod.look_at_matrix(cam, tgt)
        _, dirs = cam_mod.pixel_rays(intr, cam, M)
        rd = dirs.reshape(-1, 3)
        hf = fast.fast(world, cam, rd)
        hs = slow.fast(world, cam, rd)
        inst_f = np.asarray(hf["inst"])
        inst_s = np.asarray(hs["inst"])
        agree = (inst_f == inst_s).mean()
        # Silhouette ties may flip a handful of rays between categories.
        assert agree > 0.999, f"seed {seed}: inst agreement {agree}"
        both = inst_f == inst_s
        tf = np.asarray(hf["t"])[both]
        ts = np.asarray(hs["t"])[both]
        finite = np.isfinite(tf) & np.isfinite(ts)
        np.testing.assert_allclose(tf[finite], ts[finite], rtol=1e-4, atol=1e-3)
