"""Second-stage (detect-then-crop) keypoint training — the top-down pose
path for equipment 6DoF.

Stage 1 (train/loop.py) regresses all scene channels at image scale; at the
DR camera ranges the dumper covers ~10-25 px and keypoint precision is
object-size-limited. This stage trains a dedicated net on fixed-size ROIs
around one equipment class: boxes come from the renderer's ``bbox2d`` labels
jittered with detector noise (ops/crop.jitter_roi), keypoints live in crop
coordinates where the object fills the frame. Same fully-on-device design as
stage 1: datagen -> crop -> augment -> heatmap targets -> grads is ONE jitted
program; there is no input pipeline.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax

from ..config import Config
from ..models import pose_net
from ..ops import crop as crop_ops
from ..ops import heatmap as heatmap_ops
from ..ops import preprocess
from ..parallel import pipeline as pipeline_mod
from ..scene import assets
from . import loop as base_loop, losses

Array = jax.Array


def make_crop_model(class_name: str = "dumper", lite: bool = False,
                    roster=None, output_stride: int = 4):
    """``output_stride=2`` doubles heatmap resolution per crop — crane parts
    have small ADD-0.1d gates, so crop-decode quantization matters more than
    for the dumper."""
    if class_name == "crane":
        assert roster is not None, "crane crop model needs the roster"
        _, Kp = crane_channels(roster)
        return pose_net.make_model(num_channels=4 * Kp, lite=lite,
                                   output_stride=output_stride)
    K = assets.all_templates()[class_name].num_keypoints
    return pose_net.make_model(num_channels=K, lite=lite,
                               output_stride=output_stride)


def create_crop_train_state(cfg: Config, model, key: Array,
                            crop_size: int = 128) -> base_loop.TrainState:
    params = pose_net.init_params(model, key, crop_size, crop_size)
    tx = base_loop.make_optimizer(cfg)
    return base_loop.TrainState(params=params, opt_state=tx.init(params),
                                step=jnp.zeros((), jnp.int32))


def crop_batch(seed: Array, batch, roster, class_name: str, crop_size: int,
               stride: int, sigma: float, jitter: bool = True,
               augment: bool = True):
    """FrameBatch -> (images (B,c,c,3), targets (B,K,h,h), sample_w (B,)).

    One ROI per frame around the class instance (single-instance classes; the
    multi-instance generalization crops per (frame, instance))."""
    o = list(roster.inst_class_names).index(class_name)
    K = assets.all_templates()[class_name].num_keypoints
    hm = crop_size // stride

    def one(key, rgb, bbox, kuv, kvis):
        k_roi, k_aug = jax.random.split(key)
        cu, cv, half = crop_ops.square_roi(bbox)
        if jitter:
            cu, cv, half = crop_ops.jitter_roi(k_roi, cu, cv, half)
        img = crop_ops.crop_resize(rgb.astype(jnp.float32) / 255.0,
                                   cu, cv, half, crop_size)
        if augment:
            img = preprocess.photometric_augment(k_aug, img)
        img = preprocess.normalize(img)
        uvc = crop_ops.uv_to_crop(kuv, cu, cv, half, crop_size)
        in_crop = ((uvc[..., 0] >= 0) & (uvc[..., 0] < crop_size)
                   & (uvc[..., 1] >= 0) & (uvc[..., 1] < crop_size))
        tgt = heatmap_ops.render_heatmaps(
            uvc, jnp.arange(K, dtype=jnp.int32), kvis & in_crop,
            K, hm, hm, sigma, float(stride))
        return img, tgt

    B = batch.rgb.shape[0]
    keys = jax.vmap(lambda i: jax.random.fold_in(seed, i))(batch.frame_id)
    imgs, tgts = jax.vmap(one)(
        keys, batch.rgb, batch.bbox2d[:, o].astype(jnp.float32),
        batch.kpt_uv[:, o, :K], batch.kpt_visible[:, o, :K])
    # Frames where the instance is invisible contribute nothing (their box is
    # -1 -> min_half ROI at the corner; weight them out of the loss).
    sample_w = batch.inst_visible[:, o].astype(jnp.float32)
    return imgs, tgts, sample_w


def crane_channels(roster):
    """(s0, Kp): crane part slice start and per-part keypoint count for the
    crop net's 4*Kp channel layout."""
    import numpy as np
    s0, s1 = roster.crane_slice
    valid = np.asarray(roster.inst_kpt_valid[s0:s1])
    Kp = int(valid.sum(1).max())
    return s0, Kp


def crane_union_roi(batch, roster):
    """Merged 2D box over the four crane part instances (B, 4) — one ROI
    covers the whole articulated machine; unseen parts don't shrink it."""
    s0, s1 = roster.crane_slice
    boxes = batch.bbox2d[:, s0:s1].astype(jnp.float32)  # (B, 4parts, 4)
    vis = batch.inst_visible[:, s0:s1]
    big = jnp.float32(1e9)
    u0 = jnp.min(jnp.where(vis, boxes[..., 0], big), axis=1)
    v0 = jnp.min(jnp.where(vis, boxes[..., 1], big), axis=1)
    u1 = jnp.max(jnp.where(vis, boxes[..., 2], -big), axis=1)
    v1 = jnp.max(jnp.where(vis, boxes[..., 3], -big), axis=1)
    any_vis = jnp.any(vis, axis=1)
    merged = jnp.stack([u0, v0, u1, v1], -1)
    return jnp.where(any_vis[:, None], merged, -1.0), any_vis


def crop_batch_crane(seed: Array, batch, roster, crop_size: int, stride: int,
                     sigma: float, jitter: bool = True, augment: bool = True):
    """Crane variant of crop_batch: one ROI around the 4-part union, targets
    are 4*Kp channels (part-major) from the articulated part keypoints."""
    s0, Kp = crane_channels(roster)
    hm = crop_size // stride
    C = 4 * Kp
    kvalid = jnp.asarray(roster.inst_kpt_valid)[s0:s0 + 4, :Kp]  # (4, Kp)
    bbox, any_vis = crane_union_roi(batch, roster)

    def one(key, rgb, bb, kuv, kvis):
        k_roi, k_aug = jax.random.split(key)
        cu, cv, half = crop_ops.square_roi(bb)
        if jitter:
            cu, cv, half = crop_ops.jitter_roi(k_roi, cu, cv, half)
        img = crop_ops.crop_resize(rgb.astype(jnp.float32) / 255.0,
                                   cu, cv, half, crop_size)
        if augment:
            img = preprocess.photometric_augment(k_aug, img)
        img = preprocess.normalize(img)
        uvc = crop_ops.uv_to_crop(kuv.reshape(C, 2), cu, cv, half, crop_size)
        in_crop = ((uvc[..., 0] >= 0) & (uvc[..., 0] < crop_size)
                   & (uvc[..., 1] >= 0) & (uvc[..., 1] < crop_size))
        vis = kvis.reshape(C) & kvalid.reshape(C) & in_crop
        tgt = heatmap_ops.render_heatmaps(
            uvc, jnp.arange(C, dtype=jnp.int32), vis, C, hm, hm, sigma,
            float(stride))
        return img, tgt

    keys = jax.vmap(lambda i: jax.random.fold_in(seed, i))(batch.frame_id)
    imgs, tgts = jax.vmap(one)(
        keys, batch.rgb, bbox,
        batch.kpt_uv[:, s0:s0 + 4, :Kp], batch.kpt_visible[:, s0:s0 + 4, :Kp])
    return imgs, tgts, any_vis.astype(jnp.float32)


def crop_batch_crane_parts(seed: Array, batch, roster, crop_size: int,
                           stride: int, sigma: float, jitter: bool = True,
                           augment: bool = True):
    """Per-part crane crops: each frame contributes FOUR ROIs (one per part
    box) through the same 4*Kp-channel net. A part-centered crop puts the
    boom/telescopic at full resolution instead of a corner of the machine
    union box; keypoints of OTHER parts falling inside the crop are
    supervised too (free context).

    Returns (images (B*4, c, c, 3), targets (B*4, 4*Kp, h, h), w (B*4,))."""
    s0, Kp = crane_channels(roster)
    hm = crop_size // stride
    C = 4 * Kp
    kvalid = jnp.asarray(roster.inst_kpt_valid)[s0:s0 + 4, :Kp]  # (4, Kp)

    def one(key, rgb, part_box, kuv, kvis, part_vis):
        k_roi, k_aug = jax.random.split(key)
        # min_half 24: a thin part's tight box (the telescopic reads as a
        # stick, median half 8 px) otherwise yields a degenerate 16x-zoomed
        # crop with no joint context — measured tele-root decode at 39
        # crop-px error / 0.16 score before the clamp.
        # rect_roi (round 4): ASPECT-MATCHED crops — the thin column /
        # extended telescopic fill the crop instead of ~10% of a square
        # (max_aspect 3 keeps joint context; evaluator must match —
        # eval/pipeline.crane_part_keypoints).
        cu, cv, hu, hv = crop_ops.rect_roi(part_box, min_half=24.0)
        if jitter:
            cu, cv, hu, hv = crop_ops.jitter_roi(k_roi, cu, cv, hu,
                                                 half_v=hv)
        img = crop_ops.crop_resize(rgb.astype(jnp.float32) / 255.0,
                                   cu, cv, hu, crop_size, half_v=hv)
        if augment:
            img = preprocess.photometric_augment(k_aug, img)
        img = preprocess.normalize(img)
        uvc = crop_ops.uv_to_crop(kuv.reshape(C, 2), cu, cv, hu, crop_size,
                                  half_v=hv)
        in_crop = ((uvc[..., 0] >= 0) & (uvc[..., 0] < crop_size)
                   & (uvc[..., 1] >= 0) & (uvc[..., 1] < crop_size))
        vis = kvis.reshape(C) & kvalid.reshape(C) & in_crop
        tgt = heatmap_ops.render_heatmaps(
            uvc, jnp.arange(C, dtype=jnp.int32), vis, C, hm, hm, sigma,
            float(stride))
        return img, tgt, part_vis.astype(jnp.float32)

    B = batch.rgb.shape[0]
    kuv = batch.kpt_uv[:, s0:s0 + 4, :Kp]
    kvis = batch.kpt_visible[:, s0:s0 + 4, :Kp]
    pboxes = batch.bbox2d[:, s0:s0 + 4].astype(jnp.float32)  # (B, 4, 4)
    pvis = batch.inst_visible[:, s0:s0 + 4]

    def per_frame(key, rgb, boxes4, ku, kv, pv):
        ks = jax.random.split(key, 4)
        return jax.vmap(lambda k, bb, v: one(k, rgb, bb, ku, kv, v))(
            ks, boxes4, pv)

    keys = jax.vmap(lambda i: jax.random.fold_in(seed, i))(batch.frame_id)
    imgs, tgts, w = jax.vmap(per_frame)(keys, batch.rgb, pboxes, kuv, kvis, pvis)
    flat = lambda x: x.reshape((B * 4,) + x.shape[2:])
    return flat(imgs), flat(tgts), w.reshape(B * 4)


def make_crop_train_step(cfg: Config, model, pipe: pipeline_mod.Pipeline,
                         class_name: str = "dumper", crop_size: int = 128,
                         sigma: float = 1.5, per_part: bool = False):
    tx = base_loop.make_optimizer(cfg)
    gen = pipe.make_generate_fn(
        ladder=False, include_heatmaps=False,
        camera_mix=cfg.train.camera_mix if cfg.train.camera_mix > 0 else None)
    stride = getattr(model, "output_stride", 4)

    def loss_fn(params, images, targets, sample_w):
        pred = pose_net.forward(model, params, images)
        if cfg.train.loss == "focal":
            per = jax.vmap(losses.focal_heatmap_loss)(pred, targets)
        else:
            per = jax.vmap(lambda p, t: losses.heatmap_mse(p, t))(pred, targets)
        return jnp.sum(per * sample_w) / jnp.maximum(jnp.sum(sample_w), 1.0)

    def step(state: base_loop.TrainState, seed: Array, frame_ids: Array):
        batch = gen(seed, frame_ids)
        if class_name == "crane" and per_part:
            images, targets, sample_w = crop_batch_crane_parts(
                seed, batch, pipe.roster, crop_size, stride, sigma)
        elif class_name == "crane":
            images, targets, sample_w = crop_batch_crane(
                seed, batch, pipe.roster, crop_size, stride, sigma)
        else:
            images, targets, sample_w = crop_batch(
                seed, batch, pipe.roster, class_name, crop_size, stride, sigma)
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, images, targets, sample_w)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss, "step": state.step,
                   "n_visible": jnp.sum(sample_w)}
        return base_loop.TrainState(params, opt_state, state.step + 1), metrics

    return step


def make_scanned_crop_train_fn(cfg: Config, model, pipe, inner_steps: int = 10,
                               class_name: str = "dumper",
                               crop_size: int = 128, sigma: float = 1.5,
                               per_part: bool = False):
    step = make_crop_train_step(cfg, model, pipe, class_name, crop_size, sigma,
                                per_part)
    B = cfg.train.batch_size

    def run(state, seed: Array, start_frame: Array):
        def body(carry, i):
            st, metrics = step(carry, seed, start_frame + i * B + jnp.arange(B))
            return st, metrics
        state, metrics = jax.lax.scan(body, state, jnp.arange(inner_steps))
        return state, jax.tree_util.tree_map(lambda x: x[-1], metrics)

    return run
