"""Sampler semantics vs the reference's ladder/invariants."""

import numpy as np
import jax
import jax.numpy as jnp

from constructionsceneposeestimation_tpu.config import RandomizationConfig, SceneConfig
from constructionsceneposeestimation_tpu.sample import camera_sampler, lighting, placement
from constructionsceneposeestimation_tpu.scene import world as world_mod


def test_key_positions_exact():
    cam, tgt = camera_sampler.systematic_camera_positions(30, jax.random.PRNGKey(0))
    cam = np.asarray(cam)
    tgt = np.asarray(tgt)
    # First entry: dumper left-far view at height 1.6 (reference: 798, 790).
    np.testing.assert_allclose(cam[0], [-15.0, -0.6, 1.6], atol=1e-6)
    np.testing.assert_allclose(tgt[0], [-7.37, -0.59, 1.6], atol=1e-6)
    # Heights cycle [1.6, 1.7, 1.8, 2.0, 2.5, 3.0].
    np.testing.assert_allclose(cam[:6, 2], [1.6, 1.7, 1.8, 2.0, 2.5, 3.0], atol=1e-6)
    np.testing.assert_allclose(cam[6:12, 2], [1.6, 1.7, 1.8, 2.0, 2.5, 3.0], atol=1e-6)
    # Horizontal aim everywhere: target z == camera z (reference: 849).
    np.testing.assert_allclose(cam[:, 2], tgt[:, 2], atol=1e-6)
    # 12 dumper-biased keys (reference: 797-809).
    np.testing.assert_allclose(tgt[:12, :2], np.tile([-7.37, -0.59], (12, 1)), atol=1e-6)


def test_ring_stage_geometry():
    cam, tgt = camera_sampler.systematic_camera_positions(41, jax.random.PRNGKey(1))
    cam = np.asarray(cam)
    # Frames 30..37 lie on the r=4 ring (reference: 857-867).
    r = np.linalg.norm(cam[30:38, :2], axis=1)
    np.testing.assert_allclose(r, 4.0, atol=1e-5)
    ang = np.arctan2(cam[30:38, 1], cam[30:38, 0])
    np.testing.assert_allclose(
        np.sort(np.mod(ang, 2 * np.pi)), 2 * np.pi * np.arange(8) / 8, atol=1e-5
    )
    # Frames 38..40: r=6 ring.
    np.testing.assert_allclose(np.linalg.norm(cam[38:41, :2], axis=1), 6.0, atol=1e-5)


def test_random_fill_within_documented_bounds():
    n = 80  # forces stage 3 (30 keys + 40 ring = 70)
    cam, tgt = camera_sampler.systematic_camera_positions(n, jax.random.PRNGKey(2))
    cam = np.asarray(cam)[70:]
    # Either near the dumper (dist <= 12) or in the uniform box (reference: 891-902).
    d = np.linalg.norm(cam[:, :2] - [-7.37, -0.59], axis=1)
    in_box = (cam[:, 0] >= -10) & (cam[:, 0] <= 8) & (cam[:, 1] >= -10) & (cam[:, 1] <= 10)
    assert np.all((d <= 12.0 + 1e-4) | in_box)


def test_sampler_deterministic():
    a = camera_sampler.systematic_camera_positions(41, jax.random.PRNGKey(7))
    b = camera_sampler.systematic_camera_positions(41, jax.random.PRNGKey(7))
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    # With 41 frames only ring targets are random (cam xy deterministic);
    # different keys must change the biased targets.
    c = camera_sampler.systematic_camera_positions(41, jax.random.PRNGKey(8))
    assert not np.allclose(np.asarray(a[1]), np.asarray(c[1]))


SCFG = SceneConfig(n_cones=6, n_trees=2, n_fence_panels=8)
RCFG = RandomizationConfig()


def test_placement_invariants():
    roster = world_mod.make_roster(SCFG)
    for seed in range(5):
        pose, diag = placement.randomize_scene(jax.random.PRNGKey(seed), roster, SCFG, RCFG)
        placed_xy = np.asarray(diag["placed_xy"])
        placed_r = np.asarray(diag["placed_r"])
        active = placed_r > 0
        xy = placed_xy[active]
        r = placed_r[active]
        # Fence containment for every placed object (margins vary by class;
        # check the loosest bound).
        assert np.all(xy[:, 0] >= RCFG.fence_x[0] + 0.5 - 1e-5)
        assert np.all(xy[:, 0] <= RCFG.fence_x[1] - 0.5 + 1e-5)
        assert np.all(xy[:, 1] >= RCFG.fence_y[0] + 0.5 - 1e-5)
        assert np.all(xy[:, 1] <= RCFG.fence_y[1] - 0.5 + 1e-5)
        # When all ok flags are set, pairwise sum-of-radii holds.
        all_ok = bool(diag["crane_ok"]) and bool(diag["dumper_ok"]) \
            and bool(np.all(np.asarray(diag["human_ok"]))) and bool(np.all(np.asarray(diag["cone_ok"])))
        if all_ok:
            d = np.linalg.norm(xy[:, None] - xy[None, :], axis=-1)
            req = r[:, None] + r[None, :]
            np.fill_diagonal(d, 1e9)
            assert np.all(d >= req - 1e-4), f"overlap at seed {seed}"


def test_placement_crane_first_and_unrotated():
    roster = world_mod.make_roster(SCFG)
    pose, diag = placement.randomize_scene(jax.random.PRNGKey(3), roster, SCFG, RCFG)
    # Crane yaw stays 0 (reference: 1096 moves crane without rotation).
    assert float(pose.crane_yaw_deg) == 0.0
    # Crane radius >= 6 m (reference: 1092).
    assert float(diag["crane_radius"]) >= 6.0
    # Crane within +-4 m + fallback allowance of the center.
    assert np.all(np.abs(np.asarray(pose.crane_pos)[:2]) <= 4.0 + 1e-4)


def test_placement_updates_scene_pose_rows():
    roster = world_mod.make_roster(SCFG)
    pose, _ = placement.randomize_scene(jax.random.PRNGKey(4), roster, SCFG, RCFG)
    default = world_mod.default_pose(roster, SCFG)
    # Trees and fence never move (reference randomizes only crane/dumper/human/cones).
    t0, t1 = roster.tree_slice
    f0, f1 = roster.fence_slice
    np.testing.assert_array_equal(
        np.asarray(pose.positions[t0:t1]), np.asarray(default.positions[t0:t1]))
    np.testing.assert_array_equal(
        np.asarray(pose.positions[f0:f1]), np.asarray(default.positions[f0:f1]))
    # Cones moved with z kept at ground.
    c0, c1 = roster.cone_slice
    assert not np.allclose(np.asarray(pose.positions[c0:c1, :2]),
                           np.asarray(default.positions[c0:c1, :2]))
    np.testing.assert_allclose(np.asarray(pose.positions[c0:c1, 2]), 0.0)


def test_placement_jit_and_vmap():
    roster = world_mod.make_roster(SCFG)
    fn = jax.jit(jax.vmap(lambda k: placement.randomize_scene(k, roster, SCFG, RCFG)[0]))
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    poses = fn(keys)
    assert poses.positions.shape[0] == 4
    # Batched world build works downstream.
    w = world_mod.build_world(roster, poses)
    assert w["prim_pos"].shape[0] == 4


def test_lighting_sampler():
    lit = lighting.sample_lighting(jax.random.PRNGKey(0))
    d = np.asarray(lit.sun_dir)
    np.testing.assert_allclose(np.linalg.norm(d), 1.0, atol=1e-5)
    assert d[2] < 0  # sun shines downward
    assert 0.5 < float(lit.sun_intensity) < 1.5
