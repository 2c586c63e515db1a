"""Sequence-mode datagen: temporal coherence + determinism.

The reference has no video capability (strictly frame-at-a-time,
generate_construction_data.py:1540); this is the TPU build's clip extension
(sample/sequence.py, Pipeline.make_sequence_fn)."""

import jax
import jax.numpy as jnp
import numpy as np

from constructionsceneposeestimation_tpu.config import (
    Config, PipelineConfig, SceneConfig,
)
from constructionsceneposeestimation_tpu.parallel import pipeline as pipeline_mod
from constructionsceneposeestimation_tpu.sample import sequence as seq_mod


def _pipe(seq_len=8):
    cfg = Config(
        scene=SceneConfig(n_cones=2, n_trees=1, n_fence_panels=4),
        pipeline=PipelineConfig(render_width=96, render_height=96,
                                heatmap_stride=2),
    )
    pipe = pipeline_mod.Pipeline(cfg, vmap_chunk=4)
    return pipe, jax.jit(pipe.make_sequence_fn(seq_len))


def test_sequence_smooth_camera_and_joints():
    pipe, gen = _pipe(seq_len=8)
    batch = gen(jax.random.PRNGKey(0), jnp.arange(8))  # one full clip
    cam = np.asarray(batch.camera_pose7[:, :3])
    step = np.linalg.norm(np.diff(cam, axis=0), axis=-1)
    # Smoothstep flight: finite motion, no teleports; middle steps largest.
    assert step.max() < 8.0, step
    assert step.max() > 1e-4  # it does move
    # Crane parts animate smoothly: per-frame center deltas bounded.
    names = list(pipe.roster.inst_class_names)
    tele = names.index("cranetelescopic")
    c = np.asarray(batch.center[:, tele])
    dstep = np.linalg.norm(np.diff(c, axis=0), axis=-1)
    assert dstep.max() < 4.0, dstep


def test_sequence_endpoints_differ_scenes_static():
    pipe, gen = _pipe(seq_len=6)
    batch = gen(jax.random.PRNGKey(1), jnp.arange(12))  # two clips
    names = list(pipe.roster.inst_class_names)
    cone = names.index("trafficcone")
    c = np.asarray(batch.center[:, cone])
    # Within a clip the cone is static; across clips it re-samples.
    assert np.allclose(c[0], c[5], atol=1e-5)
    assert not np.allclose(c[0], c[6], atol=1e-3)
    # The crane telescopic tip moves within a clip (animated articulation).
    tele = names.index("cranetelescopic")
    t = np.asarray(batch.center[:, tele])
    assert np.linalg.norm(t[5] - t[0]) > 0.05


def test_sequence_deterministic_and_framewise():
    _, gen = _pipe(seq_len=6)
    seed = jax.random.PRNGKey(2)
    full = gen(seed, jnp.arange(6))
    again = gen(seed, jnp.arange(6))
    np.testing.assert_array_equal(np.asarray(full.rgb), np.asarray(again.rgb))
    # A different contiguous window reproduces the same frames bit-identically
    # (per-frame keying, no dependence on batch framing).
    tail = gen(seed, jnp.arange(2, 8))
    np.testing.assert_array_equal(np.asarray(full.rgb[2:]),
                                  np.asarray(tail.rgb[:4]))


def test_interpolate_pose_boundaries():
    key = jax.random.PRNGKey(3)
    from constructionsceneposeestimation_tpu.scene import world as world_mod
    from constructionsceneposeestimation_tpu.config import RandomizationConfig
    scene_cfg = SceneConfig(n_cones=1, n_trees=1, n_fence_panels=2)
    roster = world_mod.make_roster(scene_cfg)
    pa, pb = seq_mod.sample_sequence_endpoints(
        key, roster, scene_cfg, RandomizationConfig())
    p0 = seq_mod.interpolate_pose(pa, pb, jnp.float32(0.0), roster)
    p1 = seq_mod.interpolate_pose(pa, pb, jnp.float32(1.0), roster)
    np.testing.assert_allclose(np.asarray(p0.crane_joints),
                               np.asarray(pa.crane_joints), atol=1e-5)
    np.testing.assert_allclose(np.asarray(p1.crane_joints[1]),
                               np.asarray(pb.crane_joints[1]), atol=1e-4)
    # Yaw takes the shortest path: |interp at 0.5| never exceeds 180.
    mid = seq_mod.lerp_angle_deg(jnp.float32(170.0), jnp.float32(-170.0), 0.5)
    assert abs(float(mid)) == 180.0 or abs(float(mid)) < 180.1


def test_sequence_metrics_synthetic():
    """seq-eval math on hand-built JSONL records: a dumper translating
    0.1 m/frame in world coords under a MOVING camera must score
    mean_t_delta = 0.1 (world frame), full id stability."""
    import numpy as np
    from constructionsceneposeestimation_tpu.eval import sequence_metrics as sm

    def make_rec(fid):
        # camera at x = fid (moving), identity orientation quaternion.
        cam7 = [float(fid), 0.0, 0.0, 0.0, 0.0, 0.0, 1.0]
        t_world = np.array([5.0 + 0.1 * fid, 2.0, 0.0])
        t_cam = t_world - np.array([fid, 0.0, 0.0])  # R_wp = I
        return {
            "frame_id": fid,
            "camera_pose7": cam7,
            "detections": [{
                "class": "dumper", "score": 0.9,
                "bbox2d": [10.0 + fid, 10.0, 60.0 + fid, 40.0],
                "pose_accepted": True,
                "R_cam": np.eye(3).tolist(),
                "t_cam": t_cam.tolist(),
            }],
        }

    records = [make_rec(i) for i in range(8)]
    out = sm.sequence_metrics(records, seq_len=4)
    assert out["n_frames"] == 8 and out["n_clips"] == 2
    assert out["id_stability"] == 1.0
    assert out["pose_track_rate"] == 1.0
    # Camera moved 1 m/frame but the WORLD delta is the object's 0.1 m.
    np.testing.assert_allclose(out["mean_t_delta_m"], 0.1, atol=1e-6)
    np.testing.assert_allclose(out["mean_r_delta_deg"], 0.0, atol=1e-5)

    # A detection dropout in one frame reduces id stability.
    records[3]["detections"] = []
    out2 = sm.sequence_metrics(records, seq_len=4)
    assert out2["id_stability"] < 1.0


def test_resample_animated_humans_avoid_base_statics():
    """Endpoint-B workers must be collision-checked against endpoint A's
    PLACED statics (crane/dumpers/cones), not a discarded endpoint-B layout
    (round-2 advisor finding): at both clip endpoints every human clears
    every active static slot by the sum of radii."""
    from constructionsceneposeestimation_tpu.config import RandomizationConfig
    from constructionsceneposeestimation_tpu.sample import placement
    from constructionsceneposeestimation_tpu.scene import world as world_mod

    scene_cfg = SceneConfig(n_cones=6, n_trees=2, n_fence_panels=8,
                            n_humans=2, n_dumpers=2)
    rand_cfg = RandomizationConfig()
    roster = world_mod.make_roster(scene_cfg)
    h0, h1 = roster.human_slice

    n_checked = 0
    for seed in range(6):
        pa, da = placement.randomize_scene(
            jax.random.PRNGKey(seed), roster, scene_cfg, rand_cfg,
            articulate_crane=True)
        pb, db = placement.resample_animated(
            jax.random.PRNGKey(1000 + seed), roster, scene_cfg, rand_cfg,
            pa, da)
        placed_xy = np.asarray(da["placed_xy"])
        placed_r = np.asarray(da["placed_r"])
        # Static slots = everything active except the human slots (0=crane,
        # then dumpers, then humans, then cones).
        h_slot0 = 1 + scene_cfg.n_dumpers
        static = placed_r > 0
        static[h_slot0:h_slot0 + scene_cfg.n_humans] = False
        assert static.sum() >= 1 + scene_cfg.n_dumpers  # crane + dumpers
        # ok=False marks the reference's clamped-fallback placement
        # (generate_construction_data.py:958-969) — clearance only holds
        # for genuinely accepted samples.
        for pose, ok in ((pa, np.asarray(da["human_ok"])),
                         (pb, np.asarray(db["human_ok"]))):
            hxy = np.asarray(pose.positions[h0:h1, :2])[ok]
            if hxy.shape[0] == 0:
                continue
            n_checked += hxy.shape[0]
            d = np.linalg.norm(
                hxy[:, None] - placed_xy[None, static], axis=-1)
            clearance = placed_r[None, static] + rand_cfg.human_radius
            assert (d >= clearance - 1e-4).all(), (
                seed, d - clearance)
    assert n_checked >= 8  # the invariant was actually exercised
