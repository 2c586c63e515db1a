"""CLI-level end-to-end tests: cmd_generate writes the reference dataset tree
(generate_construction_data.py:1350-1355 layout) through the double-buffered
chunk loop, and a re-run resumes to a no-op."""

import argparse
import json
import os

from constructionsceneposeestimation_tpu import cli


def _gen_args(out, frames=6, batch=4, fmt="reference"):
    return argparse.Namespace(
        out=out, frames=frames, batch=batch, size=96, width=None, height=None,
        seed=0, ladder=True, format=fmt, heatmaps=False, verbose=False,
    )


def test_cmd_generate_reference_tree_and_resume(tmp_path):
    out = str(tmp_path / "ds")
    cli.cmd_generate(_gen_args(out))
    for sub in ("rgb", "depth", "pointcloud", "labels", "logs"):
        assert os.path.isdir(os.path.join(out, sub)), sub
    labels = sorted(f for f in os.listdir(os.path.join(out, "labels"))
                    if f.startswith("label_"))
    assert len(labels) == 6
    with open(os.path.join(out, "labels", labels[0])) as f:
        rec = json.load(f)
    assert list(rec)[:3] == ["frame_id", "camera_pose", "camera_params"]
    assert rec["num_objects"] == len(rec["objects"])
    # Re-run: everything already on disk -> zero pending chunks, no rewrite.
    rgb0 = os.path.join(out, "rgb", sorted(os.listdir(os.path.join(out, "rgb")))[0])
    mtime = os.path.getmtime(rgb0)
    cli.cmd_generate(_gen_args(out))
    assert os.path.getmtime(rgb0) == mtime


def test_cmd_generate_packed_shards(tmp_path):
    out = str(tmp_path / "packed")
    cli.cmd_generate(_gen_args(out, frames=5, batch=4, fmt="packed"))
    shards = [f for f in os.listdir(out) if f.endswith(".npz")]
    assert len(shards) == 2  # chunks of 4 + 1
    assert os.path.exists(os.path.join(out, "dataset_manifest.json"))
