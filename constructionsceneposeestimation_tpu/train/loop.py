"""Sharded heatmap-regression training (BASELINE.json config 5).

The full step — scene sampling, rendering, heatmap targets, preprocessing,
forward, loss, grads, optimizer — is ONE jitted program over the data mesh:
datagen never leaves the device, there is no input pipeline to feed, and XLA
inserts the gradient psum from the shardings. The reference has no training
code at all (SURVEY.md section 0); this supplies it TPU-first.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..config import Config
from ..models import pose_net
from ..ops import preprocess
from ..parallel import mesh as mesh_mod
from ..parallel import pipeline as pipeline_mod
from . import losses

Array = jax.Array


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: Array


def make_optimizer(cfg: Config):
    tc = cfg.train
    sched = optax.warmup_cosine_decay_schedule(
        0.0, tc.learning_rate, tc.warmup_steps, max(tc.steps, tc.warmup_steps + 1)
    )
    return optax.adamw(sched, weight_decay=tc.weight_decay)


def create_train_state(cfg: Config, model, key: Array) -> TrainState:
    params = pose_net.init_params(
        model, key, cfg.pipeline.render_height, cfg.pipeline.render_width
    )
    tx = make_optimizer(cfg)
    return TrainState(params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32))


def channel_weights_from_roster(roster) -> Array:
    """Per-channel loss weights: 1/sqrt(instances of the channel's class),
    normalized to mean 1 — crowded classes (fence x20) stop drowning out
    single-instance equipment channels."""
    import numpy as np
    ch = np.asarray(roster.inst_kpt_channel)
    valid = ch >= 0
    counts = np.zeros(int(ch.max()) + 1, np.float32)
    # Instances per channel = how many objects contribute each channel.
    for o in range(ch.shape[0]):
        for c in ch[o][valid[o]]:
            counts[c] += 1.0
    w = 1.0 / np.sqrt(np.maximum(counts, 1.0))
    w = w / w.mean()
    return jnp.asarray(w)


def _make_loss_fn(cfg: Config, model, ch_w):
    def loss_fn(params, images, targets):
        pred = pose_net.forward(model, params, images)
        if cfg.train.loss == "focal":
            loss = losses.focal_heatmap_loss(pred, targets)
        else:
            loss = losses.heatmap_mse(pred, targets, ch_w)
        return loss, pred
    return loss_fn


def make_train_step(cfg: Config, model, pipe: pipeline_mod.Pipeline):
    """Returns ``step(state, seed, frame_ids) -> (state, metrics)`` — the full
    on-device datagen + train step."""
    tx = make_optimizer(cfg)
    gen = pipe.make_generate_fn(
        ladder=False,
        camera_mix=cfg.train.camera_mix if cfg.train.camera_mix > 0 else None)
    ch_w = channel_weights_from_roster(pipe.roster) if cfg.train.channel_balance else None
    model_stride = getattr(model, "output_stride", 4)
    assert model_stride == cfg.pipeline.heatmap_stride, (
        f"model output stride {model_stride} != pipeline heatmap_stride "
        f"{cfg.pipeline.heatmap_stride}: predictions and targets would have "
        "different spatial shapes")

    loss_fn = _make_loss_fn(cfg, model, ch_w)

    def step(state: TrainState, seed: Array, frame_ids: Array):
        batch = gen(seed, frame_ids)
        keys = jax.vmap(lambda i: jax.random.fold_in(seed, i))(frame_ids)
        images = jax.vmap(
            lambda k, rgb: preprocess.preprocess_frame(
                k, rgb, cfg.pipeline.render_height, cfg.pipeline.render_width
            )
        )(keys, batch.rgb)
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, images, batch.heatmaps
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss": loss,
            "step": state.step,
            "visible_objects": jnp.mean(jnp.sum(batch.inst_visible, -1).astype(jnp.float32)),
        }
        return TrainState(params, opt_state, state.step + 1), metrics

    return step


def make_data_train_step(cfg: Config, model):
    """Offline-dataset variant of :func:`make_train_step`:
    ``step(state, seed, rgb (B,H,W,3) u8, heatmaps (B,C,h,w)) ->
    (state, metrics)``. Batches come from io/reader.ShardDataset over shards
    written by ``generate --format packed --heatmaps`` — the consumer side of
    the dataset contract. Host-fed, so the fused on-device generator remains
    the fast path; this exists for training on a FIXED, inspectable dataset
    (reproductions, ablations, external data)."""
    from ..scene import world as world_mod

    tx = make_optimizer(cfg)
    roster = world_mod.make_roster(cfg.scene)
    ch_w = channel_weights_from_roster(roster) if cfg.train.channel_balance else None
    loss_fn = _make_loss_fn(cfg, model, ch_w)

    def step(state: TrainState, seed: Array, rgb: Array, heatmaps: Array):
        B = rgb.shape[0]
        fids = state.step * B + jnp.arange(B)
        keys = jax.vmap(lambda i: jax.random.fold_in(seed, i))(fids)
        images = jax.vmap(
            lambda k, r: preprocess.preprocess_frame(
                k, r, cfg.pipeline.render_height, cfg.pipeline.render_width)
        )(keys, rgb)
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, images, heatmaps)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (TrainState(params, opt_state, state.step + 1),
                {"loss": loss, "step": state.step})

    return step


def make_scanned_train_fn(cfg: Config, model, pipe: pipeline_mod.Pipeline,
                          inner_steps: int = 10):
    """``run(state, seed, start_frame) -> (state, last_metrics)`` executing
    ``inner_steps`` train steps in one device program (lax.scan) — one host
    dispatch per ``inner_steps`` steps. Essential through high-latency
    dispatch paths (the axon tunnel costs 25-400 ms per host call)."""
    step = make_train_step(cfg, model, pipe)
    B = cfg.train.batch_size

    def run(state: TrainState, seed: Array, start_frame: Array):
        def body(carry, i):
            st = carry
            fids = start_frame + i * B + jnp.arange(B)
            st, metrics = step(st, seed, fids)
            return st, metrics
        state, metrics = jax.lax.scan(body, state, jnp.arange(inner_steps))
        last = jax.tree_util.tree_map(lambda x: x[-1], metrics)
        return state, last

    return run


def make_sharded_train_step(cfg: Config, model, pipe: pipeline_mod.Pipeline, mesh=None):
    """jit the train step over the mesh: batch sharded on 'data', params
    replicated (or FSDP-sharded when cfg.train.fsdp)."""
    mesh = mesh or mesh_mod.make_mesh()
    step = make_train_step(cfg, model, pipe)
    bs = mesh_mod.batch_sharding(mesh)
    rep = mesh_mod.replicated(mesh)

    def place_state(state: TrainState) -> TrainState:
        """Put the initial state on the mesh: FSDP-sharded or replicated
        params; XLA then propagates these layouts through the jitted step."""
        if cfg.train.fsdp:
            pspec = mesh_mod.shard_params_fsdp(mesh, state.params)
            params = jax.device_put(state.params, pspec)
            # Opt state shards leaf-wise with the SAME rule: adamw mu/nu have
            # param shapes so they land on the param layouts; scalars
            # replicate. Without this, "FSDP" replicates 2x params per device.
            opt_state = jax.device_put(
                state.opt_state, mesh_mod.shard_params_fsdp(mesh, state.opt_state))
        else:
            params = jax.device_put(state.params, rep)
            opt_state = jax.device_put(state.opt_state, rep)
        return TrainState(params, opt_state, jax.device_put(state.step, rep))

    jitted = jax.jit(step, in_shardings=(None, rep, bs), donate_argnums=(0,))
    return jitted, mesh, place_state
