"""Camera-viewpoint sampling (jittable).

Reproduces the reference's three-stage ladder
(``get_systematic_camera_positions``, generate_construction_data.py:778-911):

1. 30 hand-picked key positions, 40% biased at the dumper (796-838), heights
   cycling [1.6, 1.7, 1.8, 2.0, 2.5, 3.0] (790), target z = camera z
   (horizontal aim, 849);
2. concentric rings r in {4,6,8,10,12} x 8 points, 40% of targets jittered
   around the dumper (856-884);
3. biased random fill, 50% near the dumper (887-908).

The reference draws from global numpy RNG; here every random draw folds out of
a single JAX key, so any frame is reproducible from (seed, frame_id). Also
provides the continuous DR sampler used for large-batch datagen (BASELINE.json
configs 2/5) driven by the CameraConfig ranges (reference: 51-53).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CameraConfig

Array = jax.Array

HEIGHTS = np.array([1.6, 1.7, 1.8, 2.0, 2.5, 3.0], np.float32)  # reference: 790
DUMPER_CENTER = np.array([-7.37, -0.59], np.float32)  # reference: 794

# (cam_xy, target_xy) — exact reference table (796-838).
KEY_POSITIONS = np.array(
    [
        # dumper-biased views (40%)
        [[-15.0, -0.6], DUMPER_CENTER],
        [[-2.0, -0.6], DUMPER_CENTER],
        [[-7.4, 6.0], DUMPER_CENTER],
        [[-7.4, -7.0], DUMPER_CENTER],
        [[-12.0, 4.0], DUMPER_CENTER],
        [[-12.0, -5.0], DUMPER_CENTER],
        [[-4.0, 4.0], DUMPER_CENTER],
        [[-4.0, -4.0], DUMPER_CENTER],
        [[-10.0, 0.0], DUMPER_CENTER],
        [[-5.0, 2.0], DUMPER_CENTER],
        [[-5.0, -3.0], DUMPER_CENTER],
        [[-9.0, -4.0], DUMPER_CENTER],
        # center region
        [[-3.0, -3.0], [0.0, 0.0]],
        [[-3.0, 3.0], [0.0, 0.0]],
        [[0.0, 0.0], [5.0, 0.0]],
        [[0.0, 0.0], [-5.0, 0.0]],
        # around center
        [[6.0, 0.0], [0.0, 0.0]],
        [[0.0, 6.0], [0.0, 0.0]],
        [[0.0, -6.0], [0.0, 0.0]],
        [[-6.0, 0.0], [0.0, 0.0]],
        # diagonals
        [[5.0, 5.0], [0.0, 0.0]],
        [[5.0, -5.0], [0.0, 0.0]],
        [[-5.0, 5.0], [0.0, 0.0]],
        [[-5.0, -5.0], [0.0, 0.0]],
        # close range
        [[3.0, 0.0], [0.0, 0.0]],
        [[-3.0, 0.0], [0.0, 0.0]],
        [[0.0, 3.0], [0.0, 0.0]],
        [[0.0, -3.0], [0.0, 0.0]],
        # left region
        [[-8.0, -3.0], [0.0, 0.0]],
        [[-8.0, 3.0], [0.0, 0.0]],
    ],
    np.float32,
)

RING_RADII = np.array([4.0, 6.0, 8.0, 10.0, 12.0], np.float32)  # reference: 857
POINTS_PER_RING = 8


def systematic_camera_positions(num_frames: int, key: Array) -> Tuple[Array, Array]:
    """(cam_positions (N, 3), targets (N, 3)) — reference ladder semantics.

    Deterministic key positions and ring geometry; the random choices (ring
    target bias, random fill) come from ``key``. Static shapes — jit-safe.
    """
    n_keys = min(num_frames, len(KEY_POSITIONS))
    heights_all = jnp.asarray(np.resize(HEIGHTS, num_frames))

    cams = []
    tgts = []
    # Stage 1: key positions.
    kp = jnp.asarray(KEY_POSITIONS[:n_keys])
    cams.append(kp[:, 0, :])
    tgts.append(kp[:, 1, :])

    remaining = num_frames - n_keys
    if remaining > 0:
        # Stage 2: rings.
        ring_xy = []
        for r in RING_RADII:
            ang = 2 * np.pi * np.arange(POINTS_PER_RING) / POINTS_PER_RING
            ring_xy.append(np.stack([r * np.cos(ang), r * np.sin(ang)], -1))
        ring_xy = np.concatenate(ring_xy).astype(np.float32)
        n_ring = min(remaining, len(ring_xy))
        k_bias, k_jit, k_fill = jax.random.split(key, 3)
        bias = jax.random.uniform(k_bias, (n_ring,)) < 0.4  # reference: 873
        jit_xy = jax.random.uniform(k_jit, (n_ring, 2), minval=-2.0, maxval=2.0)
        ring_tgt = jnp.where(
            bias[:, None], jnp.asarray(DUMPER_CENTER) + jit_xy, jnp.zeros((n_ring, 2))
        )
        cams.append(jnp.asarray(ring_xy[:n_ring]))
        tgts.append(ring_tgt)
        remaining -= n_ring

        if remaining > 0:
            # Stage 3: biased random fill (reference: 887-908).
            ks = jax.random.split(k_fill, 6)
            near = jax.random.uniform(ks[0], (remaining,)) < 0.5
            ang = jax.random.uniform(ks[1], (remaining,), minval=0.0, maxval=2 * np.pi)
            dist = jax.random.uniform(ks[2], (remaining,), minval=5.0, maxval=12.0)
            cam_near = jnp.asarray(DUMPER_CENTER) + dist[:, None] * jnp.stack(
                [jnp.cos(ang), jnp.sin(ang)], -1
            )
            tgt_near = jnp.asarray(DUMPER_CENTER) + jax.random.uniform(
                ks[3], (remaining, 2), minval=-1.0, maxval=1.0
            )
            cam_far = jax.random.uniform(
                ks[4], (remaining, 2),
                minval=jnp.asarray([-10.0, -10.0]), maxval=jnp.asarray([8.0, 10.0]),
            )
            tgt_far = jax.random.uniform(ks[5], (remaining, 2), minval=-3.0, maxval=3.0)
            cams.append(jnp.where(near[:, None], cam_near, cam_far))
            tgts.append(jnp.where(near[:, None], tgt_near, tgt_far))

    cam_xy = jnp.concatenate(cams)[:num_frames]
    tgt_xy = jnp.concatenate(tgts)[:num_frames]
    z = heights_all[:, None]
    cam_pos = jnp.concatenate([cam_xy, z], axis=-1)
    # Horizontal aim: target z = camera z (reference: 849, 876-878, 905).
    target = jnp.concatenate([tgt_xy, z], axis=-1)
    return cam_pos, target


def retry_jitter(key: Array, cam_pos: Array) -> Array:
    """The reference's retry nudge: uniform(-2, 2) on xy, half on z
    (generate_construction_data.py:1577-1579)."""
    offset = jax.random.uniform(key, cam_pos.shape, minval=-2.0, maxval=2.0)
    offset = offset.at[..., 2].multiply(0.5)
    return cam_pos + offset


def sample_camera_batch(key: Array, n: int, cfg: CameraConfig = CameraConfig()) -> Tuple[Array, Array]:
    """Continuous DR viewpoint sampler for pod-scale datagen: distance/height/
    angle ranges from the config (reference constants at 51-53), horizontal
    aim at a jittered scene-center target."""
    ks = jax.random.split(key, 4)
    dist = jax.random.uniform(ks[0], (n,), minval=cfg.distance_range[0], maxval=cfg.distance_range[1])
    height = jax.random.uniform(ks[1], (n,), minval=cfg.height_range[0], maxval=cfg.height_range[1])
    ang = jnp.deg2rad(
        jax.random.uniform(ks[2], (n,), minval=cfg.angle_range[0], maxval=cfg.angle_range[1])
    )
    cam = jnp.stack([dist * jnp.cos(ang), dist * jnp.sin(ang), height], -1)
    tgt_xy = jax.random.uniform(ks[3], (n, 2), minval=-3.0, maxval=3.0)
    tgt = jnp.concatenate([tgt_xy, height[:, None]], -1)
    return cam, tgt
