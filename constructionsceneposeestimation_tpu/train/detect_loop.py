"""Detector training (CenterNet head over the shared backbone) — stage-1
detection for the two-stage deployment path. Fully on-device like the other
loops: datagen -> targets -> focal+L1 grads in one jitted scan."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ..config import Config
from ..models import pose_net
from ..ops import detect as detect_ops
from ..ops import preprocess
from ..parallel import pipeline as pipeline_mod
from ..train import crop_loop
from . import loop as base_loop

Array = jax.Array


def make_detect_model(lite: bool = False, output_stride: int = 4):
    """``output_stride=2`` doubles detection-map resolution (256^2 at a
    512^2 input): a worker at 25 m subtends ~12 px, i.e. ~3 stride-4 cells —
    too coarse for reliable center/size regression on small classes."""
    C = len(detect_ops.DET_CLASSES)
    return pose_net.make_model(num_channels=C + 4, lite=lite,
                               output_stride=output_stride)


def extended_inst_classes(roster) -> jnp.ndarray:
    """(O+1,) detection class per instance with the union-"crane"
    pseudo-instance appended (pairs with crane_extended_boxes)."""
    import numpy as np
    base = detect_ops.det_class_of_instances(roster)
    return jnp.asarray(np.concatenate(
        [base, [detect_ops.DET_CLASSES.index("crane")]]).astype(np.int32))


def crane_extended_boxes(batch, roster):
    """(bbox (B, O+1, 4), vis (B, O+1)): every roster instance keeps its own
    box (crane parts train their part classes), plus ONE appended
    pseudo-instance carrying the 4-part union box for the "crane" class —
    the whole-machine detection the single-ROI crop path consumes."""
    merged, any_vis = crop_loop.crane_union_roi(batch, roster)
    bbox = jnp.concatenate(
        [batch.bbox2d.astype(jnp.float32), merged[:, None, :]], axis=1)
    vis = jnp.concatenate([batch.inst_visible, any_vis[:, None]], axis=1)
    return bbox, vis


def make_detect_train_step(cfg: Config, model, pipe: pipeline_mod.Pipeline,
                           hifi_pipe: pipeline_mod.Pipeline | None = None,
                           hifi_every: int = 0):
    """``hifi_pipe`` + ``hifi_every=k``: every k-th step renders its batch
    through the hifi CAD-mesh pipeline instead of the analytic proxies —
    mixed-geometry training that closes the sim-to-sim transfer gap the
    proxy-only detector shows on ``--hifi-eval`` frames. A scalar-predicate
    ``lax.cond`` picks the renderer per step (real branch, not select: the
    predicate is un-batched inside the scanned train loop)."""
    tx = base_loop.make_optimizer(cfg)
    cam_mix = cfg.train.camera_mix if cfg.train.camera_mix > 0 else None
    gen = pipe.make_generate_fn(
        ladder=False, include_heatmaps=False, camera_mix=cam_mix)
    gen_hifi = None
    if hifi_pipe is not None and hifi_every > 0:
        gen_hifi = hifi_pipe.make_generate_fn(
            ladder=False, include_heatmaps=False, camera_mix=cam_mix)
    stride = getattr(model, "output_stride", 4)
    hm_h = cfg.pipeline.render_height // stride
    hm_w = cfg.pipeline.render_width // stride
    inst_cls = jnp.asarray(extended_inst_classes(pipe.roster))

    def crane_merged_boxes(batch):
        return crane_extended_boxes(batch, pipe.roster)

    cls_w = jnp.asarray(detect_ops.CLASS_LOSS_WEIGHTS, jnp.float32)

    def loss_fn(params, images, bbox, vis):
        pred = pose_net.forward(model, params, images)  # (B, C+4, h, w)

        def one(p, b, v):
            tgt = detect_ops.build_targets(b, v, inst_cls, hm_h, hm_w,
                                           float(stride))
            loss, aux = detect_ops.detection_loss(p, *tgt,
                                                  class_weights=cls_w)
            return loss
        per = jax.vmap(one)(pred, bbox, vis)
        return jnp.mean(per)

    def step(state: base_loop.TrainState, seed: Array, frame_ids: Array):
        if gen_hifi is None:
            batch = gen(seed, frame_ids)
        else:
            batch = jax.lax.cond(state.step % hifi_every == 0,
                                 lambda: gen_hifi(seed, frame_ids),
                                 lambda: gen(seed, frame_ids))
        keys = jax.vmap(lambda i: jax.random.fold_in(seed, i))(frame_ids)
        images = jax.vmap(lambda k, rgb: preprocess.preprocess_frame(
            k, rgb, cfg.pipeline.render_height, cfg.pipeline.render_width,
        ))(keys, batch.rgb)
        bbox, vis = crane_merged_boxes(batch)
        loss, grads = jax.value_and_grad(loss_fn)(state.params, images, bbox, vis)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (base_loop.TrainState(params, opt_state, state.step + 1),
                {"loss": loss, "step": state.step})

    return step, crane_merged_boxes


def make_data_detect_train_step(cfg: Config, model, roster):
    """Offline-dataset detector step: ``step(state, seed, rgb, bbox2d,
    inst_visible) -> (state, metrics)`` over io/reader batches (shards from
    ``generate --format packed``). Same targets/loss as the on-device path —
    crane part boxes plus the appended whole-machine union pseudo-instance."""
    import collections

    tx = base_loop.make_optimizer(cfg)
    stride = getattr(model, "output_stride", 4)
    hm_h = cfg.pipeline.render_height // stride
    hm_w = cfg.pipeline.render_width // stride
    inst_cls = jnp.asarray(extended_inst_classes(roster))
    cls_w = jnp.asarray(detect_ops.CLASS_LOSS_WEIGHTS, jnp.float32)
    Shim = collections.namedtuple("Shim", ["bbox2d", "inst_visible"])

    def loss_fn(params, images, bbox, vis):
        pred = pose_net.forward(model, params, images)

        def one(p, b, v):
            tgt = detect_ops.build_targets(b, v, inst_cls, hm_h, hm_w,
                                           float(stride))
            loss, aux = detect_ops.detection_loss(p, *tgt,
                                                  class_weights=cls_w)
            return loss
        return jnp.mean(jax.vmap(one)(pred, bbox, vis))

    def step(state: base_loop.TrainState, seed: Array, rgb: Array,
             bbox2d: Array, inst_visible: Array):
        B = rgb.shape[0]
        fids = state.step * B + jnp.arange(B)
        keys = jax.vmap(lambda i: jax.random.fold_in(seed, i))(fids)
        images = jax.vmap(lambda k, r: preprocess.preprocess_frame(
            k, r, cfg.pipeline.render_height, cfg.pipeline.render_width,
        ))(keys, rgb)
        bbox, vis = crane_extended_boxes(
            Shim(bbox2d.astype(jnp.float32), inst_visible), roster)
        loss, grads = jax.value_and_grad(loss_fn)(state.params, images,
                                                  bbox, vis)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (base_loop.TrainState(params, opt_state, state.step + 1),
                {"loss": loss, "step": state.step})

    return step


def make_scanned_detect_train_fn(cfg: Config, model, pipe, inner_steps: int = 10,
                                 hifi_pipe=None, hifi_every: int = 0):
    step, _ = make_detect_train_step(cfg, model, pipe, hifi_pipe=hifi_pipe,
                                     hifi_every=hifi_every)
    B = cfg.train.batch_size

    def run(state, seed: Array, start_frame: Array):
        def body(carry, i):
            st, metrics = step(carry, seed, start_frame + i * B + jnp.arange(B))
            return st, metrics
        state, metrics = jax.lax.scan(body, state, jnp.arange(inner_steps))
        return state, jax.tree_util.tree_map(lambda x: x[-1], metrics)

    return run
