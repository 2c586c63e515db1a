"""Detect-then-crop stage: ROI geometry exactness, crop training step, and
the two-stage 6DoF evaluator."""

import jax
import jax.numpy as jnp
import numpy as np

from constructionsceneposeestimation_tpu.config import (
    Config, PipelineConfig, SceneConfig, TrainConfig,
)
from constructionsceneposeestimation_tpu.ops import crop as crop_ops
from constructionsceneposeestimation_tpu.parallel import pipeline as pipeline_mod
from constructionsceneposeestimation_tpu.train import crop_loop


def test_crop_resize_matches_direct_slice():
    """Integer-aligned ROI at scale 1: crop_resize must equal numpy slicing
    (pins the scale_and_translate coordinate convention)."""
    rng = np.random.default_rng(0)
    img = rng.uniform(size=(64, 64, 3)).astype(np.float32)
    # ROI [16, 48) x [8, 40): cu=32, cv=24, half=16, out=32 -> scale 1.
    out = crop_ops.crop_resize(jnp.asarray(img), jnp.float32(32.0),
                               jnp.float32(24.0), jnp.float32(16.0), 32)
    np.testing.assert_allclose(np.asarray(out), img[8:40, 16:48], atol=1e-5)


def test_uv_transform_roundtrip_and_consistency():
    cu, cv, half = jnp.float32(100.0), jnp.float32(80.0), jnp.float32(25.0)
    uv = jnp.asarray([[100.0, 80.0], [75.0, 55.0], [125.0, 105.0]])
    uv_c = crop_ops.uv_to_crop(uv, cu, cv, half, 128)
    # Center maps to crop center, corners to crop corners.
    np.testing.assert_allclose(np.asarray(uv_c[0]), [64.0, 64.0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(uv_c[1]), [0.0, 0.0], atol=1e-5)
    back = crop_ops.crop_to_uv(uv_c, cu, cv, half, 128)
    np.testing.assert_allclose(np.asarray(back), np.asarray(uv), atol=1e-4)


def test_square_roi_margin_and_floor():
    cu, cv, half = crop_ops.square_roi(jnp.asarray([10.0, 20.0, 50.0, 40.0]))
    assert float(cu) == 30.0 and float(cv) == 30.0
    np.testing.assert_allclose(float(half), 20.0 * 1.25)
    _, _, h2 = crop_ops.square_roi(jnp.asarray([-1.0, -1.0, -1.0, -1.0]))
    assert float(h2) == 8.0  # degenerate box floor


def _tiny_setup():
    cfg = Config(
        scene=SceneConfig(n_cones=1, n_trees=1, n_fence_panels=2),
        pipeline=PipelineConfig(render_width=96, render_height=96),
        train=TrainConfig(batch_size=4, steps=4, learning_rate=1e-3),
    )
    model = crop_loop.make_crop_model("dumper", lite=True)
    pipe = pipeline_mod.Pipeline(cfg, vmap_chunk=4)
    state = crop_loop.create_crop_train_state(cfg, model, jax.random.PRNGKey(0), 64)
    return cfg, model, pipe, state


def test_crop_train_step_decreases_loss():
    cfg, model, pipe, state = _tiny_setup()
    step = jax.jit(crop_loop.make_crop_train_step(cfg, model, pipe, "dumper", 64))
    seed = jax.random.PRNGKey(1)
    losses = []
    for i in range(4):
        state, metrics = step(state, seed, jnp.arange(4) + 4 * i)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 4


def test_multi_instance_crop_eval_floor():
    """Multi-dumper crop eval: per-(frame, instance) ROIs; GT-target logits
    recover every instance's pose."""
    from constructionsceneposeestimation_tpu.config import (
        Config as C2, PipelineConfig as P2, SceneConfig as S2,
    )
    from constructionsceneposeestimation_tpu.eval import pipeline as ep
    import constructionsceneposeestimation_tpu.models.pose_net as pn
    from constructionsceneposeestimation_tpu.ops import crop as crop_ops
    from constructionsceneposeestimation_tpu.ops import heatmap as hm_ops
    from constructionsceneposeestimation_tpu.scene import assets as assets_mod
    import constructionsceneposeestimation_tpu.parallel.pipeline as pm

    cfg = C2(scene=S2(n_cones=1, n_trees=1, n_fence_panels=2, n_dumpers=2),
             pipeline=P2(render_width=96, render_height=96))
    pipe = pm.Pipeline(cfg, vmap_chunk=4)
    gen = jax.jit(pipe.make_generate_fn(ladder=True))
    batch = gen(jax.random.PRNGKey(6), jnp.arange(4))
    idxs = [i for i, n in enumerate(pipe.roster.inst_class_names)
            if n == "dumper"]
    K = assets_mod.all_templates()["dumper"].num_keypoints
    oi = jnp.asarray(idxs)
    bbox = batch.bbox2d[:, oi].astype(jnp.float32)
    cu, cv, half = crop_ops.square_roi(bbox)

    def tgt_one(c1, v1, h1, kuv, kvis):
        uvc = crop_ops.uv_to_crop(kuv, c1, v1, h1, 64)
        inside = ((uvc[..., 0] >= 0) & (uvc[..., 0] < 64)
                  & (uvc[..., 1] >= 0) & (uvc[..., 1] < 64))
        return hm_ops.render_heatmaps(uvc, jnp.arange(K, dtype=jnp.int32),
                                      kvis & inside, K, 16, 16, 1.0, 4.0)

    tgts = jax.vmap(jax.vmap(tgt_one))(
        cu, cv, half, batch.kpt_uv[:, oi, :K], batch.kpt_visible[:, oi, :K])
    tgts = tgts.reshape((-1,) + tgts.shape[2:])

    class FakeModel:
        output_stride = 4

    orig = pn.forward
    pn.forward = lambda m, p, im: jnp.log(
        jnp.clip(tgts, 1e-4, 1 - 1e-4) / (1 - jnp.clip(tgts, 1e-4, 1 - 1e-4)))
    try:
        out = ep.evaluate_crop_6dof_multi(batch, pipe.roster, pipe.intr,
                                          FakeModel(), None, "dumper", 64)
    finally:
        pn.forward = orig
    assert int(out["n_detectable"]) >= 4
    if int(out["n_accepted"]) > 0:
        assert float(out["add_0_1d"]) > 0.8, {k: float(v) for k, v in out.items()}


def test_crane_crop_batch_and_eval_floor():
    """Crane variant: union ROI + 4*Kp channels; evaluator with GT-target
    logits must recover the FK joint solve near-exactly."""
    from constructionsceneposeestimation_tpu.eval import pipeline as ep
    import constructionsceneposeestimation_tpu.models.pose_net as pn
    cfg, _, pipe, _ = _tiny_setup()
    gen = jax.jit(pipe.make_generate_fn(ladder=True))
    batch = gen(jax.random.PRNGKey(4), jnp.arange(4))
    s0, Kp = crop_loop.crane_channels(pipe.roster)
    imgs, tgts, w = crop_loop.crop_batch_crane(
        jax.random.PRNGKey(0), batch, pipe.roster, 64, 4, 1.0,
        jitter=False, augment=False)
    assert imgs.shape == (4, 64, 64, 3)
    assert tgts.shape == (4, 4 * Kp, 16, 16)

    class FakeModel:
        output_stride = 4

    orig = pn.forward
    pn.forward = lambda m, p, im: jnp.log(
        jnp.clip(tgts, 1e-4, 1 - 1e-4) / (1 - jnp.clip(tgts, 1e-4, 1 - 1e-4)))
    try:
        out = ep.evaluate_crop_crane_6dof(batch, pipe.roster, pipe.intr,
                                          FakeModel(), None, 64)
    finally:
        pn.forward = orig
    if int(out["n_accepted"]) > 0:
        assert float(out["add_0_1d"]) > 0.6, {
            k: float(v) for k, v in out.items() if "add" in k}


def test_crane_per_part_crop_and_eval_floor():
    """Per-part ROIs (4 crops/frame): shapes + near-exact FK recovery when
    the net output is the GT crop targets."""
    from constructionsceneposeestimation_tpu.eval import pipeline as ep
    import constructionsceneposeestimation_tpu.models.pose_net as pn
    cfg, _, pipe, _ = _tiny_setup()
    gen = jax.jit(pipe.make_generate_fn(ladder=True))
    batch = gen(jax.random.PRNGKey(4), jnp.arange(4))
    s0, Kp = crop_loop.crane_channels(pipe.roster)
    imgs, tgts, w = crop_loop.crop_batch_crane_parts(
        jax.random.PRNGKey(0), batch, pipe.roster, 64, 4, 1.0,
        jitter=False, augment=False)
    assert imgs.shape == (16, 64, 64, 3)
    assert tgts.shape == (16, 4 * Kp, 16, 16)

    class FakeModel:
        output_stride = 4

    orig = pn.forward
    pn.forward = lambda m, p, im: jnp.log(
        jnp.clip(tgts, 1e-4, 1 - 1e-4) / (1 - jnp.clip(tgts, 1e-4, 1 - 1e-4)))
    try:
        out = ep.evaluate_crop_crane_6dof(batch, pipe.roster, pipe.intr,
                                          FakeModel(), None, 64, per_part=True)
    finally:
        pn.forward = orig
    if int(out["n_accepted"]) > 0:
        assert float(out["add_0_1d"]) > 0.8, {
            k: float(v) for k, v in out.items() if "add_0" in k}


def test_evaluate_crop_6dof_runs_and_gt_floor():
    """With heatmap targets AS the net output stand-in, the evaluator's
    geometry (crop decode -> image uv -> ground solve -> ADD) must recover
    poses near-exactly: run the evaluator with a fake forward that returns
    the rasterized GT crop heatmaps."""
    from constructionsceneposeestimation_tpu.eval import pipeline as ep
    cfg, model, pipe, state = _tiny_setup()
    gen = jax.jit(pipe.make_generate_fn(ladder=True))
    batch = gen(jax.random.PRNGKey(2), jnp.arange(4))

    class FakeModel:
        output_stride = 4

    import constructionsceneposeestimation_tpu.models.pose_net as pn
    orig = pn.forward

    def fake_forward(model_, params_, images):
        imgs, tgts, _ = crop_loop.crop_batch(
            jax.random.PRNGKey(0), batch, pipe.roster, "dumper", 64, 4, 1.0,
            jitter=False, augment=False)
        # logits whose sigmoid ~= the GT heatmap (channel-major contract)
        p = jnp.clip(tgts, 1e-4, 1.0 - 1e-4)
        return jnp.log(p / (1 - p))

    pn.forward = fake_forward
    try:
        out = ep.evaluate_crop_6dof(batch, pipe.roster, pipe.intr,
                                    FakeModel(), None, "dumper", 64)
    finally:
        pn.forward = orig
    n = int(out["n_accepted"])
    if n > 0:
        assert float(out["add_0_1d"]) > 0.7, {k: float(v) for k, v in out.items()}


def test_single_box_eval_associates_gt_instance():
    """A detector box covering the SECOND dumper must be scored against the
    second dumper's GT pose, not instance 0's (regression: 2-dumper scenes
    scored ADD mean ~5.8 m — the inter-dumper distance)."""
    from constructionsceneposeestimation_tpu.config import (
        Config as C2, PipelineConfig as P2, SceneConfig as S2,
    )
    from constructionsceneposeestimation_tpu.eval import pipeline as ep
    import constructionsceneposeestimation_tpu.models.pose_net as pn
    from constructionsceneposeestimation_tpu.ops import crop as crop_ops
    from constructionsceneposeestimation_tpu.ops import heatmap as hm_ops
    from constructionsceneposeestimation_tpu.scene import assets as assets_mod
    import constructionsceneposeestimation_tpu.parallel.pipeline as pm

    cfg = C2(scene=S2(n_cones=1, n_trees=1, n_fence_panels=2, n_dumpers=2),
             pipeline=P2(render_width=96, render_height=96))
    pipe = pm.Pipeline(cfg, vmap_chunk=4)
    gen = jax.jit(pipe.make_generate_fn(ladder=True))
    batch = gen(jax.random.PRNGKey(6), jnp.arange(4))
    idxs = [i for i, n in enumerate(pipe.roster.inst_class_names)
            if n == "dumper"]
    assert len(idxs) == 2
    o1 = idxs[1]
    K = assets_mod.all_templates()["dumper"].num_keypoints
    boxes = batch.bbox2d[:, o1].astype(jnp.float32)  # "detections" = dumper 1
    cu, cv, half = crop_ops.square_roi(boxes)

    def tgt_one(c1, v1, h1, kuv, kvis):
        uvc = crop_ops.uv_to_crop(kuv, c1, v1, h1, 64)
        inside = ((uvc[..., 0] >= 0) & (uvc[..., 0] < 64)
                  & (uvc[..., 1] >= 0) & (uvc[..., 1] < 64))
        return hm_ops.render_heatmaps(uvc, jnp.arange(K, dtype=jnp.int32),
                                      kvis & inside, K, 16, 16, 1.0, 4.0)

    tgts = jax.vmap(tgt_one)(cu, cv, half, batch.kpt_uv[:, o1, :K],
                             batch.kpt_visible[:, o1, :K])

    class FakeModel:
        output_stride = 4

    orig = pn.forward
    pn.forward = lambda m, p, im: jnp.log(
        jnp.clip(tgts, 1e-4, 1 - 1e-4) / (1 - jnp.clip(tgts, 1e-4, 1 - 1e-4)))
    try:
        out = ep.evaluate_crop_6dof(batch, pipe.roster, pipe.intr,
                                    FakeModel(), None, "dumper", 64,
                                    boxes=boxes)
    finally:
        pn.forward = orig
    if int(out["n_accepted"]) > 0:
        assert float(out["add_mean"]) < 1.0, {
            k: float(v) for k, v in out.items()}
        assert float(out["add_0_1d"]) > 0.7, {
            k: float(v) for k, v in out.items()}
