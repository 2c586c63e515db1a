"""Host-side visualization utilities."""

import numpy as np

from constructionsceneposeestimation_tpu.utils import viz


def test_overlay_keypoints_draws_and_dims():
    rgb = np.zeros((32, 48, 3), np.uint8)
    uv = np.asarray([[[10.0, 10.0], [30.0, 20.0]]])
    vis = np.asarray([[True, False]])
    in_img = np.asarray([[True, True]])
    out = viz.overlay_keypoints(rgb, uv, vis, np.asarray([0]), in_img)
    assert out[10, 10].sum() > 0  # visible: bright class color
    assert 0 < out[20, 30].sum() < out[10, 10].sum()  # occluded: dimmed
    # Out-of-range keypoints must not crash.
    uv2 = np.asarray([[[-5.0, 100.0], [1000.0, -3.0]]])
    viz.overlay_keypoints(rgb, uv2, np.asarray([[True, True]]), np.asarray([0]))


def test_heatmap_overlay_shapes():
    rgb = np.full((64, 64, 3), 100, np.uint8)
    hm = np.zeros((3, 16, 16), np.float32)
    hm[1, 8, 8] = 1.0
    out = viz.heatmap_overlay(rgb, hm)
    assert out.shape == (64, 64, 3)
    # The peak region gets a red tint.
    assert out[32, 32, 0] > out[0, 0, 0]


def test_save_png(tmp_path):
    img = np.random.RandomState(0).randint(0, 255, (8, 8, 3), np.uint8)
    p = str(tmp_path / "x.png")
    viz.save_png(p, img)
    assert open(p, "rb").read()[:8] == b"\x89PNG\r\n\x1a\n"
