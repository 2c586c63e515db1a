"""CenterNet detection ops: target building, decode round-trip, training."""

import jax
import jax.numpy as jnp
import numpy as np

from constructionsceneposeestimation_tpu.config import (
    Config, PipelineConfig, SceneConfig, TrainConfig,
)
from constructionsceneposeestimation_tpu.ops import detect as det_ops
from constructionsceneposeestimation_tpu.parallel import pipeline as pipeline_mod
from constructionsceneposeestimation_tpu.train import detect_loop


def test_build_targets_and_decode_roundtrip():
    """Perfect predictions (targets as logits + exact size/offset maps) must
    decode back to the ground-truth boxes."""
    C = len(det_ops.DET_CLASSES)
    hm_h = hm_w = 32
    stride = 4.0
    bbox = jnp.asarray([[16.0, 24.0, 80.0, 72.0],   # dumper
                        [40.0, 40.0, 72.0, 88.0]])  # human
    vis = jnp.asarray([True, True])
    cls = jnp.asarray([det_ops.DET_CLASSES.index("dumper"),
                       det_ops.DET_CLASSES.index("human")], jnp.int32)
    center, size, offset, pos_uv, pos_mask = det_ops.build_targets(
        bbox, vis, cls, hm_h, hm_w, stride)
    assert bool(pos_mask.all())
    # Compose the "perfect" prediction tensor.
    logits = jnp.log(jnp.clip(center, 1e-6, 1 - 1e-6)
                     / (1 - jnp.clip(center, 1e-6, 1 - 1e-6)))
    size_map = jnp.zeros((2, hm_h, hm_w))
    off_map = jnp.zeros((2, hm_h, hm_w))
    for i in range(2):
        u, v = int(pos_uv[i, 0]), int(pos_uv[i, 1])
        size_map = size_map.at[:, v, u].set(size[i])
        off_map = off_map.at[:, v, u].set(offset[i])
    pred = jnp.concatenate([logits, size_map, off_map], 0)
    boxes, scores = det_ops.decode_detections(pred, stride, max_det=4)
    for i, cname in ((0, "dumper"), (1, "human")):
        ci = det_ops.DET_CLASSES.index(cname)
        best = np.asarray(boxes[ci, 0])
        np.testing.assert_allclose(best, np.asarray(bbox[i]), atol=1.5)
        assert float(scores[ci, 0]) > 0.9


def test_detection_loss_perfect_prediction_is_small():
    C = len(det_ops.DET_CLASSES)
    bbox = jnp.asarray([[8.0, 8.0, 40.0, 32.0]])
    vis = jnp.asarray([True])
    cls = jnp.asarray([3], jnp.int32)
    tgt = det_ops.build_targets(bbox, vis, cls, 16, 16, 4.0)
    center, size, offset, pos_uv, pos_mask = tgt
    logits = jnp.log(jnp.clip(center, 1e-6, 1 - 1e-6)
                     / (1 - jnp.clip(center, 1e-6, 1 - 1e-6)))
    size_map = jnp.zeros((2, 16, 16)).at[:, pos_uv[0, 1], pos_uv[0, 0]].set(size[0])
    off_map = jnp.zeros((2, 16, 16)).at[:, pos_uv[0, 1], pos_uv[0, 0]].set(offset[0])
    pred = jnp.concatenate([logits, size_map, off_map], 0)
    loss, aux = det_ops.detection_loss(pred, *tgt)
    # Focal loss on a soft Gaussian target is nonzero even for a perfect
    # prediction (the 0.9-1.0 ring); regression terms must be exactly zero.
    assert float(aux["size_l1"]) == 0.0 and float(aux["off_l1"]) == 0.0
    assert float(loss) < 0.3, float(loss)
    # A badly wrong prediction scores far worse.
    bad = jnp.concatenate([jnp.roll(logits, 5, axis=-1),
                           size_map + 3.0, off_map], 0)
    bad_loss, _ = det_ops.detection_loss(bad, *tgt)
    assert float(bad_loss) > 5 * float(loss)


def test_class_weights_scale_focal_term():
    """Upweighting a class's channel scales its center-heatmap loss without
    touching the regression terms."""
    bbox = jnp.asarray([[8.0, 8.0, 40.0, 32.0]])
    vis = jnp.asarray([True])
    hci = det_ops.DET_CLASSES.index("human")
    cls = jnp.asarray([hci], jnp.int32)
    tgt = det_ops.build_targets(bbox, vis, cls, 16, 16, 4.0)
    C = len(det_ops.DET_CLASSES)
    pred = jnp.zeros((C + 4, 16, 16))  # uniform wrong-ish logits
    base, aux0 = det_ops.detection_loss(pred, *tgt)
    w = jnp.ones(C).at[hci].set(4.0)
    up, aux1 = det_ops.detection_loss(pred, *tgt, class_weights=w)
    assert float(aux1["hm"]) > float(aux0["hm"])
    assert float(aux1["size_l1"]) == float(aux0["size_l1"])
    # All-channel scaling multiplies the focal term exactly.
    allw, _ = det_ops.detection_loss(pred, *tgt, class_weights=jnp.full(C, 3.0))
    np.testing.assert_allclose(float(allw - base), 2.0 * float(aux0["hm"]),
                               rtol=1e-4)  # f32 sum order


def test_nms_window_scales_with_stride():
    """At stride 2 the default suppression window widens to 5 cells (same
    ~4 image-px radius as CenterNet's 3x3 at stride 4): two peaks 2 cells
    apart collapse to one detection (both survive the 3x3 window)."""
    C = len(det_ops.DET_CLASSES)
    h = w = 16
    hm = jnp.full((C, h, w), -8.0)
    ci = det_ops.DET_CLASSES.index("dumper")
    hm = hm.at[ci, 8, 6].set(4.0).at[ci, 8, 8].set(3.0)  # 2 cells apart
    pred = jnp.concatenate([hm, jnp.ones((4, h, w))], 0)
    # stride 2 default (k=5): the weaker twin is suppressed.
    _, s2 = det_ops.decode_detections(pred, 2.0, max_det=4)
    assert float(s2[ci, 0]) > 0.9 and float(s2[ci, 1]) < 0.5, s2[ci]
    # explicit k=3 keeps both local maxima.
    _, s3 = det_ops.decode_detections(pred, 2.0, max_det=4, nms_k=3)
    assert float(s3[ci, 1]) > 0.9, s3[ci]


def test_detect_train_step_decreases_loss():
    cfg = Config(
        scene=SceneConfig(n_cones=1, n_trees=1, n_fence_panels=2),
        pipeline=PipelineConfig(render_width=96, render_height=96),
        train=TrainConfig(batch_size=4, steps=8, learning_rate=1e-3,
                          warmup_steps=1, loss="focal"),
    )
    pipe = pipeline_mod.Pipeline(cfg, vmap_chunk=4)
    model = detect_loop.make_detect_model(lite=True)
    from constructionsceneposeestimation_tpu.train import loop as train_loop
    state = train_loop.create_train_state(cfg, model, jax.random.PRNGKey(0))
    step_fn, _ = detect_loop.make_detect_train_step(cfg, model, pipe)
    step = jax.jit(step_fn)
    seed = jax.random.PRNGKey(1)
    losses = []
    for i in range(4):
        state, metrics = step(state, seed, jnp.arange(4) + 4 * i)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses


def test_detect_train_step_hifi_mix():
    """--hifi-mix: the k-th step renders through the CAD-mesh pipeline; both
    branches execute and produce finite losses, and the hifi step sees a
    different image stream (different loss) than the proxy step would."""
    cfg = Config(
        scene=SceneConfig(n_cones=1, n_trees=1, n_fence_panels=2),
        pipeline=PipelineConfig(render_width=96, render_height=96),
        train=TrainConfig(batch_size=2, steps=4, learning_rate=1e-3,
                          warmup_steps=1, loss="focal"),
    )
    pipe = pipeline_mod.Pipeline(cfg, vmap_chunk=2)
    hifi_pipe = pipeline_mod.Pipeline(cfg, vmap_chunk=1, hifi_mesh=True)
    import pytest as _pytest
    if not hasattr(hifi_pipe.caster, "mesh"):
        _pytest.skip("mesh_templates.npz not baked")
    model = detect_loop.make_detect_model(lite=True)
    from constructionsceneposeestimation_tpu.train import loop as train_loop
    state0 = train_loop.create_train_state(cfg, model, jax.random.PRNGKey(0))
    mixed, _ = detect_loop.make_detect_train_step(
        cfg, model, pipe, hifi_pipe=hifi_pipe, hifi_every=2)
    proxy, _ = detect_loop.make_detect_train_step(cfg, model, pipe)
    seed = jax.random.PRNGKey(1)
    ids = jnp.arange(2)
    # step 0: 0 % 2 == 0 -> hifi branch; proxy-only step for comparison
    _, m_hifi = jax.jit(mixed)(state0, seed, ids)
    _, m_proxy = jax.jit(proxy)(state0, seed, ids)
    assert jnp.isfinite(m_hifi["loss"]) and jnp.isfinite(m_proxy["loss"])
    assert float(m_hifi["loss"]) != float(m_proxy["loss"])
    # step 1 of the mixed stream takes the proxy branch: same data, same
    # loss (allclose, not ==: the cond-wrapped and inlined generators are
    # separately-compiled programs and XLA may fuse them differently)
    state1 = train_loop.TrainState(state0.params, state0.opt_state,
                                   state0.step + 1)
    _, a = jax.jit(mixed)(state1, seed, ids)
    _, b = jax.jit(proxy)(state1, seed, ids)
    np.testing.assert_allclose(float(a["loss"]), float(b["loss"]), rtol=1e-5)
