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
