"""End-to-end decode-floor and 6DoF-recovery evaluation (configs 3 + 4)."""

import numpy as np
import jax
import jax.numpy as jnp

from constructionsceneposeestimation_tpu.config import Config, PipelineConfig, SceneConfig
from constructionsceneposeestimation_tpu.core import camera as cam_mod
from constructionsceneposeestimation_tpu.eval import pipeline as eval_pipeline
from constructionsceneposeestimation_tpu.parallel import pipeline as pipeline_mod

CFG = Config(
    scene=SceneConfig(n_cones=2, n_trees=1, n_fence_panels=4),
    pipeline=PipelineConfig(render_width=128, render_height=128,
                            heatmap_stride=2, heatmap_sigma=1.5),
)


def make_batch(n=4):
    pipe = pipeline_mod.Pipeline(CFG)
    gen = jax.jit(pipe.make_generate_fn(ladder=True))
    batch = gen(jax.random.PRNGKey(0), jnp.arange(n))
    return pipe, batch


def test_decode_floor_pck():
    pipe, batch = make_batch()
    out = eval_pipeline.evaluate_decode(
        batch, pipe.roster, stride=CFG.pipeline.heatmap_stride)
    # Decoding the GT heatmaps must recover most visible keypoints: channels
    # are class-level, so multi-instance classes lose some to their twins.
    assert float(out["pck"]) > 0.5, f"decode-floor PCK={float(out['pck'])}"
    assert int(out["n_keypoints"]) > 0


def test_equipment_6dof_gt_keypoints():
    pipe, batch = make_batch()
    intr = pipe.intr
    out = eval_pipeline.evaluate_equipment_6dof(
        batch, pipe.roster, intr, class_name="dumper", use_gt_keypoints=True)
    if int(out["n_valid"]) > 0:
        # With exact keypoints, PnP must nail the pose: ADD below 10% diameter.
        assert float(out["add_0_1d"]) == 1.0, f"ADD-0.1d={float(out['add_0_1d'])}, add={float(out['add_mean'])}"
        assert float(out["add_mean"]) < 0.2


def test_gt_camera_frame_pose_consistency():
    # R,t from labels must reproject the model points onto the GT pixel kpts.
    pipe, batch = make_batch()
    roster = pipe.roster
    o = [i for i, n in enumerate(roster.inst_class_names) if n == "dumper"][0]
    import constructionsceneposeestimation_tpu.scene.assets as assets
    tpl = assets.all_templates()["dumper"]
    K = tpl.num_keypoints
    R, t = eval_pipeline.gt_camera_frame_pose(roster, batch, o)
    pts_cam = jnp.einsum("bij,kj->bki", R, jnp.asarray(tpl.keypoints)) + t[:, None, :]
    z = pts_cam[..., 2]
    intr = pipe.intr
    u = intr.fx * pts_cam[..., 0] / z + intr.cx
    v = intr.fy * pts_cam[..., 1] / z + intr.cy
    uv = jnp.stack([u, v], -1)
    gt = batch.kpt_uv[:, o, :K]
    vis = np.asarray(batch.kpt_in_image[:, o, :K]) & (np.asarray(z) > 0)
    if vis.any():
        err = np.abs(np.asarray(uv) - np.asarray(gt))[vis]
        assert err.max() < 0.5, f"max reprojection gap {err.max()} px"
