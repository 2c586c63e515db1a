"""Heatmap rasterization, decode, PnP, metrics."""

import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as Rot

from constructionsceneposeestimation_tpu.ops import decode, heatmap, pnp, preprocess
from constructionsceneposeestimation_tpu.eval import metrics


def test_heatmap_reference_peak_and_sigma():
    uv = jnp.asarray([[32.0, 16.0]])
    ch = jnp.asarray([2], jnp.int32)
    vis = jnp.asarray([True])
    hm = heatmap.render_heatmaps(uv, ch, vis, 4, 32, 64, sigma=2.0)
    assert hm.shape == (4, 32, 64)
    assert float(hm[2, 16, 32]) == 1.0
    # One sigma away: exp(-0.5).
    np.testing.assert_allclose(float(hm[2, 16, 34]), np.exp(-0.5), atol=1e-5)
    # Other channels empty.
    assert float(jnp.max(hm[0])) == 0.0


def test_heatmap_max_combination_and_visibility():
    uv = jnp.asarray([[10.0, 10.0], [12.0, 10.0], [40.0, 20.0]])
    ch = jnp.asarray([0, 0, 0], jnp.int32)
    vis = jnp.asarray([True, True, False])
    hm = heatmap.render_heatmaps(uv, ch, vis, 1, 32, 64, sigma=2.0)
    # Max, not sum: value at either peak is exactly 1.
    assert float(hm[0, 10, 10]) == 1.0
    assert float(hm[0, 10, 12]) == 1.0
    # Invisible keypoint contributes nothing.
    assert float(hm[0, 20, 40]) < 1e-4


def test_heatmap_pallas_matches_reference():
    rng = np.random.RandomState(0)
    n, C, H, W = 40, 8, 64, 128
    uv = jnp.asarray(rng.uniform(-10, 138, (n, 2)).astype(np.float32))
    ch = jnp.asarray(rng.randint(0, C, n), jnp.int32)
    vis = jnp.asarray(rng.rand(n) > 0.3)
    ref = heatmap.render_heatmaps(uv, ch, vis, C, H, W, sigma=2.0)
    # Pallas runs in interpreter mode on CPU.
    from jax.experimental.pallas import tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
        got = heatmap.render_heatmaps_pallas(uv, ch, vis, C, H, W, sigma=2.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


def test_heatmap_pallas_matches_reference_768_shape():
    """The 768^2-input heatmap shape (192x192: width beyond one 128-lane
    tile) — the config whose dynamic row window needed the round-5
    sublane-align fix; semantics must still match the jnp reference."""
    rng = np.random.RandomState(1)
    n, C, H, W = 30, 6, 192, 192
    uv = jnp.asarray(rng.uniform(-10, 200, (n, 2)).astype(np.float32))
    ch = jnp.asarray(rng.randint(0, C, n), jnp.int32)
    vis = jnp.asarray(rng.rand(n) > 0.3)
    ref = heatmap.render_heatmaps(uv, ch, vis, C, H, W, sigma=2.0)
    from jax.experimental.pallas import tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
        got = heatmap.render_heatmaps_pallas(uv, ch, vis, C, H, W, sigma=2.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


def test_soft_argmax_recovers_peak():
    uv = jnp.asarray([[40.25, 17.5]])
    hm = heatmap.render_heatmaps(uv, jnp.asarray([0], jnp.int32),
                                 jnp.asarray([True]), 1, 64, 96, sigma=2.0)
    dec, score = decode.soft_argmax(hm)
    np.testing.assert_allclose(np.asarray(dec)[0], [40.25, 17.5], atol=0.05)
    assert float(score[0]) > 0.9


def test_dark_decode_subpixel():
    for true in ([40.3, 17.6], [12.75, 30.2], [5.0, 5.0]):
        hm = heatmap.render_heatmaps(
            jnp.asarray([true]), jnp.asarray([0], jnp.int32),
            jnp.asarray([True]), 1, 64, 96, sigma=2.0,
        )
        dec, score = decode.dark_decode(hm)
        err = np.abs(np.asarray(dec)[0] - np.asarray(true))
        assert err.max() < 0.12, f"true={true} got={np.asarray(dec)[0]}"
        # DARK beats integer argmax.
        assert err.max() < 0.5


def test_extract_peaks_multi_instance():
    # Two blobs in one channel: both must be recovered sub-pixel.
    uv = jnp.asarray([[20.3, 10.6], [50.8, 25.2]])
    hm = heatmap.render_heatmaps(uv, jnp.asarray([0, 0], jnp.int32),
                                 jnp.asarray([True, True]), 1, 40, 64, sigma=2.0)
    peaks, scores = decode.extract_peaks(hm, max_peaks=4)
    got = np.asarray(peaks[0])
    sc = np.asarray(scores[0])
    strong = got[sc > 0.5]
    assert len(strong) == 2
    want = np.asarray(uv)
    d = np.linalg.norm(strong[:, None] - want[None], axis=-1)
    assert d.min(axis=0).max() < 0.15, f"peaks {strong} vs {want}"
    # Weak slots score near zero.
    assert (sc[2:] < 0.1).all()


def test_dark_decode_border_peak_safe():
    hm = heatmap.render_heatmaps(
        jnp.asarray([[0.0, 0.0]]), jnp.asarray([0], jnp.int32),
        jnp.asarray([True]), 1, 32, 32, sigma=2.0,
    )
    dec, _ = decode.dark_decode(hm)
    assert np.isfinite(np.asarray(dec)).all()
    np.testing.assert_allclose(np.asarray(dec)[0], [0.0, 0.0], atol=1.0)


def _random_pose(rng):
    R = Rot.random(random_state=rng.randint(1 << 30)).as_matrix().astype(np.float32)
    t = np.array([rng.uniform(-1, 1), rng.uniform(-1, 1), rng.uniform(4, 10)], np.float32)
    return R, t


def test_pnp_exact_recovery():
    rng = np.random.RandomState(1)
    X = rng.uniform(-1, 1, (10, 3)).astype(np.float32)
    R, t = _random_pose(rng)
    p = X @ R.T + t
    x = p[:, :2] / p[:, 2:3]
    res = pnp.solve_pnp(jnp.asarray(X), jnp.asarray(x), jnp.ones(10))
    assert bool(res.valid)
    np.testing.assert_allclose(np.asarray(res.R), R, atol=1e-3)
    np.testing.assert_allclose(np.asarray(res.t), t, atol=5e-3)
    assert float(res.rmse) < 1e-4


def test_pnp_noisy_and_weighted():
    rng = np.random.RandomState(2)
    X = rng.uniform(-1, 1, (17, 3)).astype(np.float32)
    R, t = _random_pose(rng)
    p = X @ R.T + t
    x = (p[:, :2] / p[:, 2:3]).astype(np.float32)
    x_noisy = x + rng.normal(0, 0.002, x.shape).astype(np.float32)
    # Corrupt two points but zero their weights.
    x_noisy[0] += 0.5
    x_noisy[1] -= 0.5
    w = np.ones(17, np.float32)
    w[:2] = 0.0
    res = pnp.solve_pnp(jnp.asarray(X), jnp.asarray(x_noisy), jnp.asarray(w))
    ang = Rot.from_matrix(np.asarray(res.R) @ R.T).magnitude() * 180 / np.pi
    assert ang < 1.0, f"rotation error {ang} deg"
    # 0.002-rad noise at ~7 m depth gives ~0.1 m translation noise floor
    # (depth is weakly constrained); the corrupted-but-zero-weighted points
    # must not blow this up.
    assert np.linalg.norm(np.asarray(res.t) - t) < 0.12


def test_pnp_batched_vmap():
    rng = np.random.RandomState(3)
    B = 5
    Xs, xs, Rs, ts = [], [], [], []
    for _ in range(B):
        X = rng.uniform(-1, 1, (8, 3)).astype(np.float32)
        R, t = _random_pose(rng)
        p = X @ R.T + t
        xs.append(p[:, :2] / p[:, 2:3])
        Xs.append(X)
        Rs.append(R)
        ts.append(t)
    res = jax.vmap(pnp.solve_pnp)(
        jnp.asarray(np.stack(Xs)), jnp.asarray(np.stack(xs)), jnp.ones((B, 8))
    )
    for i in range(B):
        np.testing.assert_allclose(np.asarray(res.R[i]), Rs[i], atol=2e-3)


def test_pnp_ransac_rejects_outliers():
    rng = np.random.RandomState(5)
    X = rng.uniform(-1, 1, (12, 3)).astype(np.float32)
    R, t = _random_pose(rng)
    p = X @ R.T + t
    x = (p[:, :2] / p[:, 2:3]).astype(np.float32)
    x_bad = x.copy()
    # Three gross outliers WITH full weight (swapped/hallucinated keypoints).
    x_bad[0] = x[1] + 0.3
    x_bad[5] += np.asarray([0.4, -0.2])
    x_bad[9] -= np.asarray([0.25, 0.35])
    w = np.ones(12, np.float32)
    # Plain weighted solve is wrecked by them...
    plain = pnp.solve_pnp(jnp.asarray(X), jnp.asarray(x_bad), jnp.asarray(w))
    err_plain = np.linalg.norm(np.asarray(plain.t) - t)
    # ...RANSAC recovers the pose.
    res = pnp.solve_pnp_ransac(jax.random.PRNGKey(0), jnp.asarray(X),
                               jnp.asarray(x_bad), jnp.asarray(w))
    assert bool(res.valid)
    ang = Rot.from_matrix(np.asarray(res.R) @ R.T).magnitude() * 180 / np.pi
    assert ang < 1.0, f"rot err {ang}"
    assert np.linalg.norm(np.asarray(res.t) - t) < 0.05
    assert np.linalg.norm(np.asarray(res.t) - t) < err_plain


def test_pnp_ransac_clean_data_matches_plain():
    rng = np.random.RandomState(6)
    X = rng.uniform(-1, 1, (10, 3)).astype(np.float32)
    R, t = _random_pose(rng)
    p = X @ R.T + t
    x = (p[:, :2] / p[:, 2:3]).astype(np.float32)
    res = pnp.solve_pnp_ransac(jax.random.PRNGKey(1), jnp.asarray(X),
                               jnp.asarray(x), jnp.ones(10))
    np.testing.assert_allclose(np.asarray(res.R), R, atol=2e-3)


def test_ground_pose_recovery():
    # Object upright on the ground, camera looking at it: (x, y, yaw) must be
    # recovered exactly from clean projections, and robustly from noisy ones.
    import jax.numpy as jnp2
    from constructionsceneposeestimation_tpu.core import camera as cam_mod
    rng = np.random.RandomState(7)
    X = np.array([[1.5, 1.1, 0.45], [1.5, -1.1, 0.45], [-1.5, 1.1, 0.45],
                  [-1.5, -1.1, 0.45], [2.25, 1.05, 2.2], [2.25, -1.05, 2.2],
                  [-2.1, 1.05, 1.9], [-2.1, -1.05, 1.9]], np.float32)
    for trial in range(3):
        yaw = rng.uniform(-np.pi, np.pi)
        txy = rng.uniform(-5, 5, 2)
        c, s = np.cos(yaw), np.sin(yaw)
        Rz = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
        cam_pos = np.array([20.0, 5.0, 2.5], np.float32)
        tgt = np.array([0.0, 0.0, 1.0], np.float32)
        M = cam_mod.look_at_matrix(jnp2.asarray(cam_pos), jnp2.asarray(tgt))
        R_wp = np.asarray(cam_mod.world_from_pinhole_matrix(
            jnp2.asarray(cam_pos), jnp2.asarray(tgt)))
        p_w = X @ Rz.T + np.array([txy[0], txy[1], 0.0], np.float32)
        p_cam = (p_w - cam_pos) @ R_wp  # pinhole coords
        x2d = (p_cam[:, :2] / p_cam[:, 2:3]).astype(np.float32)
        noise = rng.normal(0, 0.002, x2d.shape).astype(np.float32) if trial else 0
        res = pnp.solve_ground_pose(
            jnp.asarray(X), jnp.asarray(x2d + noise), jnp.ones(8),
            jnp.asarray(R_wp), jnp.asarray(cam_pos))
        assert bool(res.valid)
        # Recovered camera-frame pose must match p_cam = R X + t.
        rec = np.asarray(res.R) @ X.T + np.asarray(res.t)[:, None]
        tol = 0.02 if trial == 0 else 0.45
        np.testing.assert_allclose(rec.T, p_cam, atol=tol)


def test_pnp_insufficient_points_flagged():
    X = jnp.zeros((8, 3))
    x = jnp.zeros((8, 2))
    res = pnp.solve_pnp(X, x, jnp.zeros(8))
    assert not bool(res.valid)
    np.testing.assert_allclose(np.asarray(res.R), np.eye(3))


def test_pck_metric():
    gt = jnp.asarray([[[0.0, 0.0], [10.0, 10.0]]])
    pred = jnp.asarray([[[1.0, 0.0], [30.0, 10.0]]])
    vis = jnp.asarray([[True, True]])
    bbox = jnp.asarray([[20.0, 10.0]])
    # threshold = 0.5*20 = 10: errors 1 (ok) and 20 (fail) -> 0.5
    assert float(metrics.pck(pred, gt, vis, bbox, alpha=0.5)) == 0.5


def test_add_metric_and_accuracy():
    rng = np.random.RandomState(4)
    X = jnp.asarray(rng.uniform(-1, 1, (30, 3)).astype(np.float32))
    R = jnp.eye(3)
    t = jnp.zeros(3)
    t2 = jnp.asarray([0.05, 0.0, 0.0])
    add = metrics.add_metric(R, t2, R, t, X)
    np.testing.assert_allclose(float(add), 0.05, atol=1e-6)
    dia = metrics.model_diameter(X)
    acc = metrics.add_accuracy(add[None], dia[None], jnp.asarray([True]))
    # diameter ~3+, 0.1d ~ 0.3 > 0.05 -> accurate
    assert float(acc) == 1.0


def test_preprocess_shapes_and_determinism():
    rgb = jnp.asarray(np.random.RandomState(0).randint(0, 255, (64, 96, 3), np.uint8))
    k = jax.random.PRNGKey(0)
    out1 = preprocess.preprocess_frame(k, rgb, 32, 48)
    out2 = preprocess.preprocess_frame(k, rgb, 32, 48)
    assert out1.shape == (32, 48, 3)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    out3 = preprocess.preprocess_frame(jax.random.PRNGKey(1), rgb, 32, 48)
    assert not np.allclose(np.asarray(out1), np.asarray(out3))


def test_extract_peaks_pallas_matches_xla():
    """The fused Pallas peak kernel (ops/peak_kernel.py) must reproduce the
    XLA pipeline: same scores, same sub-pixel uv, for clean blobs AND noisy
    maps with negative values (interpreter mode on CPU)."""
    from constructionsceneposeestimation_tpu.ops import peak_kernel

    rng = np.random.RandomState(3)
    n, C, H, W = 3, 5, 64, 128
    uv = jnp.asarray(rng.uniform(0, 500, (n * C // 2, 2)).astype(np.float32))
    ch = jnp.asarray(rng.randint(0, C, len(uv)), jnp.int32)
    vis = jnp.ones(len(uv), bool)
    base = heatmap.render_heatmaps(uv, ch, vis, C, H, W, 2.0, stride=4.0)
    hms = jnp.stack([base * s for s in (1.0, 0.7, 0.4)])
    hms = hms + 0.02 * jnp.asarray(rng.randn(*hms.shape).astype(np.float32))

    uv_x, sc_x = decode.extract_peaks(hms, max_peaks=6, use_pallas=False)
    uv_p, sc_p = peak_kernel.extract_peaks_pallas(hms, max_peaks=6,
                                                  interpret=True)
    # Equal-score ties may reorder between implementations: compare the
    # thresholded peak SETS per channel.
    for b in range(3):
        for c in range(C):
            ref = sorted((round(float(s), 4), round(float(u), 2),
                          round(float(v), 2))
                         for (u, v), s in zip(np.asarray(uv_x[b, c]),
                                              np.asarray(sc_x[b, c]))
                         if s > 0.05)
            got = sorted((round(float(s), 4), round(float(u), 2),
                          round(float(v), 2))
                         for (u, v), s in zip(np.asarray(uv_p[b, c]),
                                              np.asarray(sc_p[b, c]))
                         if s > 0.05)
            assert ref == got, (b, c, ref, got)


def test_extract_peaks_pallas_padding_and_leading_dims():
    """N not divisible by block_maps + arbitrary leading dims."""
    from constructionsceneposeestimation_tpu.ops import peak_kernel

    uv = jnp.asarray([[20.3, 10.6], [50.8, 25.2]])
    hm = heatmap.render_heatmaps(uv, jnp.asarray([0, 0], jnp.int32),
                                 jnp.asarray([True, True]), 3, 40, 128,
                                 sigma=2.0)
    pk, sc = peak_kernel.extract_peaks_pallas(hm, max_peaks=4, block_maps=8,
                                              interpret=True)
    assert pk.shape == (3, 4, 2) and sc.shape == (3, 4)
    strong = np.asarray(pk[0])[np.asarray(sc[0]) > 0.5]
    d = np.linalg.norm(strong[:, None] - np.asarray(uv)[None], axis=-1)
    assert d.min(axis=0).max() < 0.15
