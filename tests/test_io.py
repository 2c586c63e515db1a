"""IO: schema key order, native/fallback parity, quality logs, resume, writer."""

import io as pyio
import json
import os
import zlib
import struct

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from constructionsceneposeestimation_tpu.config import Config, PipelineConfig, SceneConfig
from constructionsceneposeestimation_tpu.io import (
    dataset_writer, native, quality, resume, schema, writers,
)
from constructionsceneposeestimation_tpu.parallel import pipeline as pipeline_mod
from constructionsceneposeestimation_tpu.scene import taxonomy


def test_label_json_key_order(tmp_path):
    params = schema.camera_params_dict(12.0, 25.0, 1280, 720)
    obj = schema.object_entry(0, 4, "dumper", [1, 2, 3], [4.5, 2.2, 2.2],
                              [0, 0, 90], taxonomy.DUMPER_ROOT)
    label = schema.label_dict(7, [1, 2, 3, 0, 0, 0, 1], params, [obj], 720, 1280)
    path = str(tmp_path / "label_000007.json")
    schema.save_label_json(label, path)
    text = open(path, encoding="utf-8").read()
    data = json.loads(text)
    # Exact top-level key order (reference 2056-2064).
    assert list(data.keys()) == [
        "frame_id", "camera_pose", "camera_params", "objects",
        "instance_mask_shape", "num_objects", "class_mapping",
    ]
    assert list(data["objects"][0].keys()) == [
        "inst_idx", "class_id", "class_name", "center", "size", "rotation", "prim_path",
    ]
    assert list(data["camera_params"].keys()) == [
        "horizontal_aperture", "vertical_aperture", "focal_length", "width", "height",
    ]
    # class_mapping preserved in source order with exact ids.
    assert data["class_mapping"] == taxonomy.CONSTRUCTION_CLASS
    assert list(data["class_mapping"].keys())[0] == "trafficcone"
    # indent=2 formatting like the reference.
    assert text.startswith('{\n  "frame_id": 7,')
    assert data["num_objects"] == 1
    assert data["instance_mask_shape"] == [720, 1280]


def test_format_floats_matches_savetxt():
    rng = np.random.RandomState(0)
    m = rng.uniform(-100, 100, (13, 6)).astype(np.float32)
    m[0, 0] = np.inf
    m[1, 1] = 0.0
    buf = pyio.StringIO()
    np.savetxt(buf, m, fmt="%.6f", delimiter=" ", header="x y z r g b", comments="")
    want = buf.getvalue().encode()
    got = native.format_floats_6f(m, header="x y z r g b")
    assert got == want


def test_format_floats_fallback_matches_native():
    if native.get_lib() is None:
        pytest.skip("native lib not built")
    rng = np.random.RandomState(1)
    m = rng.uniform(-1000, 1000, (7, 4)).astype(np.float32)
    nat = native.format_floats_6f(m)
    lib = native._LIB
    try:
        native._LIB = None
        fb = native.format_floats_6f(m)
    finally:
        native._LIB = lib
    assert nat == fb


def _decode_png(data: bytes) -> np.ndarray:
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    pos = 8
    w = h = None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + length]
        crc = struct.unpack(">I", data[pos + 8 + length:pos + 12 + length])[0]
        assert crc == zlib.crc32(tag + payload), "bad CRC"
        if tag == b"IHDR":
            w, h = struct.unpack(">II", payload[:8])
        elif tag == b"IDAT":
            idat += payload
        pos += 12 + length
    raw = zlib.decompress(idat)
    stride = w * 3 + 1
    rows = []
    for y in range(h):
        row = raw[y * stride:(y + 1) * stride]
        assert row[0] == 0  # filter none
        rows.append(np.frombuffer(row[1:], np.uint8))
    return np.stack(rows).reshape(h, w, 3)


def test_png_roundtrip_native_and_fallback():
    rng = np.random.RandomState(2)
    img = rng.randint(0, 255, (33, 47, 3), np.uint8)
    data = native.encode_png_rgb8(img)
    np.testing.assert_array_equal(_decode_png(data), img)
    lib = native._LIB
    try:
        native._LIB = None
        data_fb = native.encode_png_rgb8(img)
    finally:
        native._LIB = lib
    np.testing.assert_array_equal(_decode_png(data_fb), img)


def test_jet_colormap_endpoints():
    g = np.asarray([0, 128, 255], np.uint8)
    bgr = native.jet_colormap(g)
    # 0 -> dark blue, 128 -> green-ish, 255 -> dark red (JET anchors).
    assert bgr[0, 0] > 100 and bgr[0, 2] == 0  # blue channel high
    assert bgr[1, 1] > 200  # green mid
    assert bgr[2, 2] > 100 and bgr[2, 0] == 0  # red channel high


def test_jet_colormap_byte_exact_vs_cv2():
    """The LUT must be the EXACT cv2.COLORMAP_JET table (reference depth viz,
    generate_construction_data.py:1690-1709) — native path and fallback."""
    cv2 = pytest.importorskip("cv2")
    g = np.arange(256, dtype=np.uint8)
    ref = cv2.applyColorMap(g.reshape(1, 256), cv2.COLORMAP_JET)[0]
    np.testing.assert_array_equal(native.jet_colormap(g), ref)
    np.testing.assert_array_equal(native._JET_LUT_BGR, ref)


def test_format_floats_large_values_match_printf():
    """fmt_f6's fixed-point fast path overflows uint64 above ~1.8e13; the
    snprintf fallback must take over below that, keeping printf parity."""
    vals = np.asarray([[1.7e13, 1.9e13, 2.0e14, 9.1e15, -1.85e13, 123.456]],
                      np.float32)
    want = (" ".join(f"{float(v):.6f}" for v in vals[0]) + "\n").encode()
    assert native.format_floats_6f(vals) == want


def test_depth_outputs(tmp_path):
    depth = np.array([[1.0, 2.0], [np.inf, 0.0]], np.float32)
    csv = str(tmp_path / "d.csv")
    writers.save_depth_csv(csv, depth)
    txt = open(csv).read()
    assert txt.splitlines()[0] == "1.000000 2.000000"
    assert "inf" in txt.splitlines()[1]
    png = str(tmp_path / "d.png")
    writers.save_depth_png(png, depth)
    img = _decode_png(open(png, "rb").read())
    assert img.shape == (2, 2, 3)


def test_quality_logger_summary_schema(tmp_path):
    log = quality.DataQualityLogger(str(tmp_path / "logs"))
    log.log_frame_start(0, np.array([1.0, 2.0, 3.0]))
    log.log_pointcloud(True, 5000)
    log.log_rgb(True)
    log.log_depth(True, np.ones((4, 4), np.float32))
    log.log_labels(7)
    log.log_frame_end(True)
    log.log_frame_start(1, np.zeros(3))
    log.log_pointcloud(False, 0, "annotator返回None")
    log.log_labels(0)
    log.log_frame_end(False)
    report = log.save_summary()
    data = json.load(open(log.summary_log_path, encoding="utf-8"))
    stats = data["statistics"]
    # Exact reference key set (244-254 + success_rate).
    assert set(stats.keys()) == {
        "total_frames_attempted", "successful_frames", "failed_frames",
        "retry_count", "pointcloud_stats", "rgb_stats", "depth_stats",
        "label_stats", "object_count", "success_rate",
    }
    assert stats["pointcloud_stats"] == {"valid": 1, "empty": 1, "insufficient": 0}
    assert stats["successful_frames"] == 1 and stats["failed_frames"] == 1
    assert stats["object_count"]["total"] == 7
    assert len(data["frame_logs"]) == 2
    assert "=== 数据生成汇总报告 ===" in report
    assert "点云为空: 1" in report  # issue histogram (split-on-colon parsing)


def test_contiguous_chunks_split_on_holes():
    chunks = resume.contiguous_chunks([0, 1, 2, 3, 10, 11, 12, 950], batch=3)
    assert chunks == [[0, 1, 2], [3], [10, 11, 12], [950]]
    assert resume.contiguous_chunks([], 4) == []


def test_resume_holes_render_correct_scenes():
    """Frames generated via resume-style contiguous chunks must be
    bit-identical to the same frames from plain contiguous runs — the
    scene-cadence group window is anchored at the batch's first id, so a
    batch spanning a manifest hole used to render the wrong scene."""
    cfg = Config(
        scene=SceneConfig(n_cones=2, n_trees=1, n_fence_panels=4),
        pipeline=PipelineConfig(render_width=64, render_height=64),
    )
    pipe = pipeline_mod.Pipeline(cfg)
    gen = jax.jit(pipe.make_generate_fn())
    seed = jax.random.PRNGKey(0)
    B = 4

    def run(ids):
        padded = (ids + [ids[-1]] * (B - len(ids)))[:B]
        return gen(seed, jnp.asarray(padded))

    # Resume left holes: pending = {8, 9} U {32, 33} (different scene groups
    # under the default cadence of 10).
    pending = [8, 9, 32, 33]
    chunks = resume.contiguous_chunks(pending, B)
    assert chunks == [[8, 9], [32, 33]]
    got = {}
    for chunk in chunks:
        out = run(chunk)
        for i, fid in enumerate(chunk):
            got[fid] = jax.tree_util.tree_map(lambda x: np.asarray(x[i]), out)
    # Oracle: the same frames out of contiguous full batches.
    for start in (8, 32):
        ref = run(list(range(start, start + B)))
        for i, fid in enumerate(range(start, start + 2)):
            np.testing.assert_array_equal(got[fid].rgb, np.asarray(ref.rgb[i]))
            np.testing.assert_array_equal(got[fid].depth, np.asarray(ref.depth[i]))
            np.testing.assert_array_equal(got[fid].euler_deg,
                                          np.asarray(ref.euler_deg[i]))
            np.testing.assert_array_equal(got[fid].center,
                                          np.asarray(ref.center[i]))


def test_writer_manifest_records_only_after_writes_land(tmp_path, monkeypatch):
    """A failed file write must leave the batch's frames PENDING in the
    manifest (recording completion before the thread pool flushed used to
    mark crashed-away frames complete forever)."""
    cfg = Config(
        scene=SceneConfig(n_cones=2, n_trees=1, n_fence_panels=4),
        pipeline=PipelineConfig(render_width=64, render_height=64),
    )
    pipe = pipeline_mod.Pipeline(cfg)
    gen = jax.jit(pipe.make_generate_fn(ladder=True))
    batch = gen(jax.random.PRNGKey(0), jnp.arange(2))
    root = str(tmp_path / "ds")

    def boom(path, rgb, level=1):
        raise OSError("disk full")

    monkeypatch.setattr(writers, "save_rgb_png", boom)
    w = dataset_writer.DatasetWriter(cfg, root=root)
    w.write_batch(batch, pipe.roster)
    with pytest.raises(OSError):
        w.flush()
    assert resume.pending_frames(root, 2) == [0, 1]


def test_resume_reference_and_manifest(tmp_path):
    labels = tmp_path / "labels"
    labels.mkdir()
    assert resume.next_frame_index(str(labels)) == 0
    (labels / "label_000003.json").write_text("{}")
    (labels / "label_000011.json").write_text("{}")
    assert resume.next_frame_index(str(labels)) == 12
    root = str(tmp_path)
    resume.record_completed(root, [0, 1, 2, 5])
    assert resume.pending_frames(root, 8) == [3, 4, 6, 7]
    resume.record_completed(root, [3, 4])
    assert resume.pending_frames(root, 8) == [6, 7]


def test_packed_shard_roundtrip(tmp_path):
    from constructionsceneposeestimation_tpu.io import packed
    cfg = Config(
        scene=SceneConfig(n_cones=2, n_trees=1, n_fence_panels=4),
        pipeline=PipelineConfig(render_width=64, render_height=64),
    )
    pipe = pipeline_mod.Pipeline(cfg)
    gen = jax.jit(pipe.make_generate_fn(ladder=True))
    batch = gen(jax.random.PRNGKey(0), jnp.arange(2))
    root = str(tmp_path / "packed")
    packed.save_manifest(root, pipe.roster, cfg)
    packed.save_shard(root + "/shard_000000.npz", batch, pipe.roster)
    shards = list(packed.iter_shards(root))
    assert len(shards) == 1
    s = shards[0]
    np.testing.assert_array_equal(s["frame_id"], [0, 1])
    assert s["rgb"].shape == (2, 64, 64, 3) and s["rgb"].dtype == np.uint8
    assert s["heatmaps"].dtype == np.float16
    np.testing.assert_allclose(
        s["camera_pose7"], np.asarray(batch.camera_pose7), atol=1e-6)
    mani = json.load(open(root + "/dataset_manifest.json"))
    assert mani["class_mapping"] == taxonomy.CONSTRUCTION_CLASS
    assert mani["camera"]["width"] == 64


def test_generate_without_heatmaps_is_empty_channelwise():
    cfg = Config(
        scene=SceneConfig(n_cones=1, n_trees=0, n_fence_panels=4),
        pipeline=PipelineConfig(render_width=64, render_height=64),
    )
    pipe = pipeline_mod.Pipeline(cfg)
    gen = jax.jit(pipe.make_generate_fn(ladder=True, include_heatmaps=False))
    batch = gen(jax.random.PRNGKey(0), jnp.arange(2))
    assert batch.heatmaps.shape[1] == 0
    assert batch.rgb.shape == (2, 64, 64, 3)


def test_dataset_writer_end_to_end(tmp_path):
    cfg = Config(
        scene=SceneConfig(n_cones=2, n_trees=1, n_fence_panels=4),
        pipeline=PipelineConfig(render_width=64, render_height=64),
    )
    pipe = pipeline_mod.Pipeline(cfg)
    gen = jax.jit(pipe.make_generate_fn(ladder=True))
    batch = gen(jax.random.PRNGKey(0), jnp.arange(3))
    w = dataset_writer.DatasetWriter(cfg, root=str(tmp_path / "ds"))
    w.write_batch(batch, pipe.roster)
    report = w.finish()
    for fid in range(3):
        assert (tmp_path / "ds" / "rgb" / f"rgb_{fid:06d}.png").exists()
        assert (tmp_path / "ds" / "depth" / f"depth_{fid:06d}.csv").exists()
        assert (tmp_path / "ds" / "depth" / f"depth_{fid:06d}.png").exists()
        assert (tmp_path / "ds" / "pointcloud" / f"pointcloud_{fid:06d}.txt").exists()
        lbl = json.load(open(tmp_path / "ds" / "labels" / f"label_{fid:06d}.json"))
        assert lbl["frame_id"] == fid
        assert lbl["num_objects"] > 0
        assert lbl["camera_params"]["width"] == 64
        mask = np.load(tmp_path / "ds" / "labels" / f"instance_mask_{fid:06d}.npy")
        assert mask.shape == (64, 64) and mask.dtype == np.int32
    # Pointcloud header + row format.
    pc = open(tmp_path / "ds" / "pointcloud" / "pointcloud_000000.txt").read()
    assert pc.splitlines()[0] == "x y z r g b"
    assert len(pc.splitlines()[1].split()) == 6
    # Quality summary written with matching counts.
    summary = json.load(open(tmp_path / "ds" / "logs" / "generation_summary.json"))
    assert summary["statistics"]["total_frames_attempted"] == 3
    assert resume.pending_frames(str(tmp_path / "ds"), 3) == []
    assert "成功帧数: 3" in report
