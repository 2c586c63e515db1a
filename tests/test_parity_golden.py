"""Golden byte-parity tests for ``bug_compatible`` mode.

The reference generator's on-disk quirks (VERDICT round 1, item 5):

* camera_pose quaternion comes from Shepperd run on the det=-1 camPosOri
  matrix (generate_construction_data.py:548-549, 587-605) — a reflection a
  unit quaternion cannot represent;
* instance_mask_%06d.npy is a -1-filled placeholder (1908-1910, 2066-2069).

These tests pin that behavior end-to-end: a numpy oracle re-derives the
reference math from its formulas, and a full label JSON + instance mask
written by the DatasetWriter in ``bug_compatible_schema`` mode is compared
byte-for-byte against an independently assembled golden file.
"""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from constructionsceneposeestimation_tpu.config import (
    Config, PipelineConfig, SceneConfig,
)
from constructionsceneposeestimation_tpu.core import camera as cam_mod
from constructionsceneposeestimation_tpu.io import dataset_writer, schema
from constructionsceneposeestimation_tpu.parallel import pipeline as pipeline_mod
from constructionsceneposeestimation_tpu.sample import camera_sampler
from constructionsceneposeestimation_tpu.scene import taxonomy


# ---------------------------------------------------------------------------
# Numpy oracle: the reference's camPosOri -> rotMtx2quaternion path,
# re-derived from the formulas at generate_construction_data.py:475-550.
# ---------------------------------------------------------------------------

def _ref_campos_ori_matrix(cam_pos, target):
    """camPosOri's rotation matrix (reference 507-546): columns
    [-forward, -right, up] with world-up [0,0,1] and the degenerate
    forward-parallel-to-up fallback (529-532). det = -1 (a reflection)."""
    forward = np.asarray(target, np.float64) - np.asarray(cam_pos, np.float64)
    forward = forward / np.linalg.norm(forward)
    world_up = np.array([0.0, 0.0, 1.0])
    right = np.cross(forward, world_up)
    if np.linalg.norm(right) < 1e-6:
        right = np.array([1.0, 0.0, 0.0])
    else:
        right = right / np.linalg.norm(right)
    up = np.cross(right, forward)
    up = up / np.linalg.norm(up)
    return np.stack([-forward, -right, up], axis=-1)


def _ref_rot_mtx_2_quaternion(R):
    """Shepperd branch structure of rotMtx2quaternion (reference 475-504),
    returning (w, x, y, z) normalized. Run verbatim on the det=-1 matrix —
    that IS the quirk being pinned."""
    tr = R[0, 0] + R[1, 1] + R[2, 2]
    if tr > 0:
        s = np.sqrt(tr + 1.0) * 2.0
        q = [0.25 * s, (R[2, 1] - R[1, 2]) / s, (R[0, 2] - R[2, 0]) / s,
             (R[1, 0] - R[0, 1]) / s]
    elif R[0, 0] > R[1, 1] and R[0, 0] > R[2, 2]:
        s = np.sqrt(1.0 + R[0, 0] - R[1, 1] - R[2, 2]) * 2.0
        q = [(R[2, 1] - R[1, 2]) / s, 0.25 * s, (R[0, 1] + R[1, 0]) / s,
             (R[0, 2] + R[2, 0]) / s]
    elif R[1, 1] > R[2, 2]:
        s = np.sqrt(1.0 + R[1, 1] - R[0, 0] - R[2, 2]) * 2.0
        q = [(R[0, 2] - R[2, 0]) / s, (R[0, 1] + R[1, 0]) / s, 0.25 * s,
             (R[1, 2] + R[2, 1]) / s]
    else:
        s = np.sqrt(1.0 + R[2, 2] - R[0, 0] - R[1, 1]) * 2.0
        q = [(R[1, 0] - R[0, 1]) / s, (R[0, 2] + R[2, 0]) / s,
             (R[1, 2] + R[2, 1]) / s, 0.25 * s]
    q = np.asarray(q)
    return q / np.linalg.norm(q)


def test_bug_compatible_quaternion_matches_reference_oracle():
    rng = np.random.RandomState(3)
    for _ in range(16):
        cam = rng.uniform(-20, 20, 3)
        cam[2] = rng.uniform(1.5, 6.0)
        tgt = rng.uniform(-8, 8, 3)
        tgt[2] = cam[2] if rng.rand() < 0.5 else rng.uniform(0, 3)
        pose7 = np.asarray(cam_mod.camera_pose7_xyzw(
            jnp.asarray(cam, jnp.float32), jnp.asarray(tgt, jnp.float32),
            bug_compatible=True))
        w, x, y, z = _ref_rot_mtx_2_quaternion(_ref_campos_ori_matrix(cam, tgt))
        np.testing.assert_allclose(pose7[:3], cam, atol=1e-5)
        np.testing.assert_allclose(pose7[3:], [x, y, z, w], atol=1e-5)


def test_bug_compatible_vertical_aim_fallback():
    """Degenerate forward || up path (reference 529-532)."""
    cam = np.array([3.0, 4.0, 10.0])
    tgt = np.array([3.0, 4.0, 0.0])
    pose7 = np.asarray(cam_mod.camera_pose7_xyzw(
        jnp.asarray(cam, jnp.float32), jnp.asarray(tgt, jnp.float32),
        bug_compatible=True))
    w, x, y, z = _ref_rot_mtx_2_quaternion(_ref_campos_ori_matrix(cam, tgt))
    np.testing.assert_allclose(pose7[3:], [x, y, z, w], atol=1e-5)


# ---------------------------------------------------------------------------
# Full-file golden byte test.
# ---------------------------------------------------------------------------

def _tiny_cfg(bug_compatible):
    return Config(
        scene=SceneConfig(n_cones=2, n_trees=1, n_fence_panels=4),
        pipeline=PipelineConfig(
            render_width=64, render_height=64, batch_size=4,
            bug_compatible_schema=bug_compatible,
            write_rgb=False, write_depth=False, write_pointcloud=False,
        ),
    )


def test_bug_compatible_label_and_mask_bytes(tmp_path):
    cfg = _tiny_cfg(True)
    pipe = pipeline_mod.Pipeline(cfg, vmap_chunk=4)
    gen = jax.jit(pipe.make_generate_fn(ladder=True, include_heatmaps=False))
    fids = jnp.arange(4)
    batch = gen(jax.random.PRNGKey(cfg.pipeline.seed), fids)

    # The pipeline's camera_pose must be the bug-compatible quaternion of the
    # ladder's (cam, target) pair — checked against the jitted unit path AND
    # the numpy reference oracle.
    cams, tgts = camera_sampler.systematic_camera_positions(
        cfg.pipeline.max_iterations, jax.random.PRNGKey(cfg.pipeline.seed))
    pose7 = np.asarray(batch.camera_pose7)
    for b in range(4):
        want_unit = np.asarray(cam_mod.camera_pose7_xyzw(
            cams[b], tgts[b], bug_compatible=True))
        np.testing.assert_array_equal(pose7[b], want_unit)
        w, x, y, z = _ref_rot_mtx_2_quaternion(
            _ref_campos_ori_matrix(np.asarray(cams[b]), np.asarray(tgts[b])))
        np.testing.assert_allclose(pose7[b, 3:], [x, y, z, w], atol=1e-5)

    writer = dataset_writer.DatasetWriter(cfg, root=str(tmp_path / "ds"))
    writer.write_batch(batch, pipe.roster)
    writer.finish()

    # --- golden label JSON assembled independently (reference 2056-2064) ---
    visible = np.asarray(batch.inst_visible)
    center = np.asarray(batch.center)
    size = np.asarray(batch.size)
    euler = np.asarray(batch.euler_deg)
    b = 0
    objects = []
    inst_idx = 0
    for o in range(pipe.roster.num_instances):
        if not visible[b, o]:
            continue
        objects.append({
            "inst_idx": inst_idx,
            "class_id": int(pipe.roster.inst_class_id[o]),
            "class_name": pipe.roster.inst_class_names[o],
            "center": [float(v) for v in center[b, o]],
            "size": [float(v) for v in size[b, o]],
            "rotation": [float(v) for v in euler[b, o]],
            "prim_path": pipe.roster.inst_prim_paths[o],
        })
        inst_idx += 1
    golden = {
        "frame_id": 0,
        "camera_pose": [float(v) for v in pose7[b]],
        "camera_params": {
            "horizontal_aperture": 25.0,
            "vertical_aperture": 25.0 * (64 / 64),
            "focal_length": 12.0,
            "width": 64,
            "height": 64,
        },
        "objects": objects,
        "instance_mask_shape": [64, 64],
        "num_objects": len(objects),
        "class_mapping": dict(taxonomy.CONSTRUCTION_CLASS),
    }
    golden_path = str(tmp_path / "golden_label.json")
    with open(golden_path, "w", encoding="utf-8") as f:
        json.dump(golden, f, indent=2, ensure_ascii=False)

    written = open(os.path.join(str(tmp_path / "ds"), "labels",
                                "label_000000.json"), "rb").read()
    assert written == open(golden_path, "rb").read()

    # --- golden instance mask: the -1 placeholder (reference 1908-1910) ---
    mask_golden_path = str(tmp_path / "golden_mask.npy")
    np.save(mask_golden_path, np.full((64, 64), -1, np.int32))
    mask_written = open(os.path.join(str(tmp_path / "ds"), "labels",
                                     "instance_mask_000000.npy"), "rb").read()
    assert mask_written == open(mask_golden_path, "rb").read()


def test_bug_compatible_flag_changes_only_quaternion(tmp_path):
    """Same seed, flag off vs on: identical geometry labels, different
    camera quaternion convention (correct det=+1 rotation vs reference
    quirk), same camera position."""
    b_on = jax.jit(pipeline_mod.Pipeline(_tiny_cfg(True), vmap_chunk=4)
                   .make_generate_fn(ladder=True, include_heatmaps=False))(
        jax.random.PRNGKey(0), jnp.arange(4))
    b_off = jax.jit(pipeline_mod.Pipeline(_tiny_cfg(False), vmap_chunk=4)
                    .make_generate_fn(ladder=True, include_heatmaps=False))(
        jax.random.PRNGKey(0), jnp.arange(4))
    np.testing.assert_array_equal(np.asarray(b_on.center), np.asarray(b_off.center))
    np.testing.assert_array_equal(np.asarray(b_on.euler_deg), np.asarray(b_off.euler_deg))
    np.testing.assert_array_equal(np.asarray(b_on.camera_pose7[:, :3]),
                                  np.asarray(b_off.camera_pose7[:, :3]))
    assert not np.allclose(np.asarray(b_on.camera_pose7[:, 3:]),
                           np.asarray(b_off.camera_pose7[:, 3:]))
