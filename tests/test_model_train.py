"""Model forward/decode, end-to-end pipeline, sharded train step (CPU mesh)."""

import dataclasses
import numpy as np
import jax
import jax.numpy as jnp

from constructionsceneposeestimation_tpu.config import Config, PipelineConfig, SceneConfig, TrainConfig
from constructionsceneposeestimation_tpu.models import pose_net
from constructionsceneposeestimation_tpu.parallel import mesh as mesh_mod
from constructionsceneposeestimation_tpu.parallel import pipeline as pipeline_mod
from constructionsceneposeestimation_tpu.scene import assets
from constructionsceneposeestimation_tpu.train import loop as train_loop

TINY = Config(
    scene=SceneConfig(n_cones=2, n_trees=1, n_fence_panels=4),
    pipeline=PipelineConfig(render_width=64, render_height=64, batch_size=8,
                            heatmap_stride=4),
    train=TrainConfig(batch_size=8, steps=4, warmup_steps=1),
)


def test_model_forward_shapes_and_dtype():
    model = pose_net.make_model(lite=True)
    params = pose_net.init_params(model, jax.random.PRNGKey(0), 64, 64)
    imgs = jnp.zeros((2, 64, 64, 3), jnp.float32)
    hm = pose_net.forward(model, params, imgs)
    assert hm.shape == (2, assets.NUM_KEYPOINT_CHANNELS, 16, 16)
    assert hm.dtype == jnp.float32


def test_class_channel_slices_cover_all():
    slices = pose_net.class_channel_slices()
    total = sum(hi - lo for lo, hi in slices.values())
    assert total == assets.NUM_KEYPOINT_CHANNELS
    # Human block is 17 wide.
    lo, hi = slices["human"]
    assert hi - lo == 17


def test_pipeline_generates_batch():
    pipe = pipeline_mod.Pipeline(TINY)
    gen = pipe.make_generate_fn(ladder=True)
    seed = jax.random.PRNGKey(0)
    fids = jnp.arange(4)
    batch = jax.jit(gen)(seed, fids)
    assert batch.rgb.shape == (4, 64, 64, 3)
    assert batch.heatmaps.shape == (4, assets.NUM_KEYPOINT_CHANNELS, 16, 16)
    assert batch.depth.shape == (4, 64, 64)
    # Determinism: same seed+ids -> identical bits.
    batch2 = jax.jit(gen)(seed, fids)
    np.testing.assert_array_equal(np.asarray(batch.rgb), np.asarray(batch2.rgb))
    # Scene cadence: frames 0-9 share a scene; heatmap channels differ between
    # frames only via camera; frame 0 vs 10+ get different scenes.
    fids2 = jnp.asarray([0, 10])
    b2 = jax.jit(gen)(seed, fids2)
    # Object centers differ across the cadence boundary (scene re-randomized).
    assert not np.allclose(np.asarray(b2.center[0]), np.asarray(b2.center[1]))


def test_pipeline_sharded_over_cpu_mesh():
    pipe = pipeline_mod.Pipeline(TINY)
    gen_sharded, mesh = pipe.make_sharded_generate(ladder=True)
    assert mesh.shape[mesh_mod.DATA_AXIS] == 8
    seed = jax.random.PRNGKey(0)
    fids = jnp.arange(8)
    batch = gen_sharded(seed, fids)
    assert batch.rgb.shape == (8, 64, 64, 3)
    # Sharded result matches unsharded.
    ref = jax.jit(pipe.make_generate_fn(ladder=True))(seed, fids)
    np.testing.assert_allclose(
        np.asarray(batch.kpt_uv), np.asarray(ref.kpt_uv), atol=1e-3
    )
    stats = pipeline_mod.quality_stats(batch, 100)
    assert int(stats["total_frames"]) == 8


def test_train_step_decreases_loss():
    cfg = TINY
    model = pose_net.make_model(lite=True)
    pipe = pipeline_mod.Pipeline(cfg)
    state = train_loop.create_train_state(cfg, model, jax.random.PRNGKey(0))
    step = train_loop.make_train_step(cfg, model, pipe)
    seed = jax.random.PRNGKey(1)
    fids = jnp.arange(4)
    jstep = jax.jit(step, donate_argnums=(0,))
    state, m0 = jstep(state, seed, fids)
    losses = [float(m0["loss"])]
    for i in range(6):
        state, m = jstep(state, seed, fids)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"
    assert int(state.step) == 7


def test_sharded_train_step_runs_on_mesh():
    cfg = dataclasses.replace(TINY, train=dataclasses.replace(TINY.train, fsdp=False))
    model = pose_net.make_model(lite=True)
    pipe = pipeline_mod.Pipeline(cfg)
    jstep, mesh, place = train_loop.make_sharded_train_step(cfg, model, pipe)
    state = place(train_loop.create_train_state(cfg, model, jax.random.PRNGKey(0)))
    fids = jnp.arange(8)
    state, metrics = jstep(state, jax.random.PRNGKey(1), fids)
    assert np.isfinite(float(metrics["loss"]))
    state, metrics2 = jstep(state, jax.random.PRNGKey(1), fids)
    assert int(state.step) == 2


def test_fsdp_shards_params_and_opt_state():
    """FSDP must shard the OPTIMIZER STATE, not just params (adamw mu/nu are
    2x params; replicating them forfeits the memory win). Every >=2D leaf
    whose largest axis divides the mesh must have 1/n addressable size."""
    cfg = dataclasses.replace(TINY, train=dataclasses.replace(TINY.train, fsdp=True))
    model = pose_net.make_model(lite=True)
    pipe = pipeline_mod.Pipeline(cfg)
    jstep, mesh, place = train_loop.make_sharded_train_step(cfg, model, pipe)
    n = mesh.shape[mesh_mod.DATA_AXIS]
    state = place(train_loop.create_train_state(cfg, model, jax.random.PRNGKey(0)))

    def check_tree(tree, tag):
        n_sharded = 0
        for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
            if not hasattr(leaf, "shape") or leaf.ndim < 2:
                continue
            if max(leaf.shape) % n == 0:
                shard = leaf.addressable_shards[0].data
                assert shard.size == leaf.size // n, (
                    f"{tag}{jax.tree_util.keystr(path)}: shard {shard.shape} "
                    f"is not 1/{n} of {leaf.shape}")
                n_sharded += 1
        return n_sharded

    assert check_tree(state.params, "params") > 0
    assert check_tree(state.opt_state, "opt_state") > 0
    # The sharded layouts survive a train step (donated state keeps specs).
    state, metrics = jstep(state, jax.random.PRNGKey(1), jnp.arange(8))
    assert np.isfinite(float(metrics["loss"]))
    assert check_tree(state.opt_state, "opt_state_after") > 0
