"""Sequence-mode datagen: temporally-coherent clips instead of i.i.d. frames.

The reference generator is strictly frame-at-a-time with a new random scene
every 10 frames (generate_construction_data.py:1542); it has no notion of
time. This module adds the video capability the Isaac scene *implies* (an
articulated crane, a walking worker): each sequence samples TWO endpoint
scenes with the exact reference placement procedure (sample/placement.py) and
smoothly interpolates the continuous degrees of freedom across the clip —

* crane joints (column yaw / boom pitch / telescopic extension) animate
  between two sampled articulations through scene/kinematics.crane_fk;
* workers walk: human root positions/yaws and articulated COCO joints lerp;
* the camera flies a smoothstep path between two DR viewpoints.

Ground vehicles/cones keep endpoint-A placement for the whole clip (driving
vehicles would need path planning to preserve the non-overlap invariant; a
static scene with moving crane/humans/camera preserves every reference
collision guarantee exactly).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import CameraConfig, RandomizationConfig, SceneConfig
from ..scene import world as world_mod
from . import camera_sampler, placement

Array = jax.Array


def smoothstep(t: Array) -> Array:
    """C1 ease-in/out on [0, 1] — zero velocity at clip boundaries, so
    back-to-back clips do not jump-cut in velocity."""
    t = jnp.clip(t, 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def lerp_angle_deg(a: Array, b: Array, t: Array) -> Array:
    """Shortest-path angular interpolation in degrees."""
    d = jnp.mod(b - a + 180.0, 360.0) - 180.0
    return a + d * t


def interpolate_pose(pa: world_mod.ScenePose, pb: world_mod.ScenePose,
                     t: Array, roster) -> world_mod.ScenePose:
    """Blend the animated DoF of two endpoint scenes at time fraction ``t``.

    Crane joints and worker root/joint motion interpolate; every other
    instance (dumper(s), cones, static trees/fence) keeps endpoint A's
    placement so the sampled collision invariants hold at every t."""
    s = smoothstep(t)
    joints = jnp.stack([
        lerp_angle_deg(pa.crane_joints[..., 0], pb.crane_joints[..., 0], s),
        pa.crane_joints[..., 1] + (pb.crane_joints[..., 1] - pa.crane_joints[..., 1]) * s,
        pa.crane_joints[..., 2] + (pb.crane_joints[..., 2] - pa.crane_joints[..., 2]) * s,
    ], -1)
    positions = pa.positions
    yaw = pa.yaw_deg
    h0, h1 = roster.human_slice
    if h1 > h0:
        positions = positions.at[h0:h1].set(
            pa.positions[h0:h1]
            + (pb.positions[h0:h1] - pa.positions[h0:h1]) * s)
        yaw = yaw.at[h0:h1].set(
            lerp_angle_deg(pa.yaw_deg[h0:h1], pb.yaw_deg[h0:h1], s))
    human_joints = pa.human_joints
    if pa.human_joints is not None:
        human_joints = (pa.human_joints
                        + (pb.human_joints - pa.human_joints) * s)
    return world_mod.ScenePose(
        crane_pos=pa.crane_pos,
        crane_yaw_deg=pa.crane_yaw_deg,
        crane_joints=joints,
        positions=positions,
        yaw_deg=yaw,
        human_joints=human_joints,
    )


def sample_sequence_endpoints(
    key: Array, roster, scene_cfg: SceneConfig, rand_cfg: RandomizationConfig,
) -> Tuple[world_mod.ScenePose, world_mod.ScenePose]:
    """Two endpoint scenes for one clip. Endpoint B re-runs ONLY the animated
    samplers (crane articulation, human placement/pose) on a folded key — the
    static layout is endpoint A's, and B's humans are collision-checked
    against A's placed statics (placement.resample_animated), so workers
    never interpolate through dumpers/cones/crane."""
    ka, kb = jax.random.split(key)
    pa, da = placement.randomize_scene(ka, roster, scene_cfg, rand_cfg,
                                       articulate_crane=True)
    pb, _ = placement.resample_animated(kb, roster, scene_cfg, rand_cfg, pa, da)
    return pa, pb


def sequence_camera(key: Array, t: Array,
                    cfg: CameraConfig = CameraConfig()) -> Tuple[Array, Array]:
    """Smoothstep camera flight: (cam_pos (3,), target (3,)) at time ``t``.

    Endpoint A is a DR viewpoint; endpoint B is a BOUNDED perturbation of A
    in (orbit angle, distance, height) so a clip pans/dollies like a real
    operator move instead of teleporting across the site (<= 30 deg orbit,
    +-4 m distance, +-1 m height over the clip)."""
    ka, kd = jax.random.split(key)
    cams, tgts = camera_sampler.sample_camera_batch(ka, 1, cfg)
    cam0, tgt0 = cams[0], tgts[0]
    d_ang, d_dist, d_h, d_tx, d_ty = jax.random.uniform(
        kd, (5,), minval=-1.0, maxval=1.0)
    ang0 = jnp.arctan2(cam0[1], cam0[0])
    r0 = jnp.linalg.norm(cam0[:2])
    s = smoothstep(t)
    ang = ang0 + jnp.deg2rad(30.0) * d_ang * s
    r = jnp.clip(r0 + 4.0 * d_dist * s, cfg.distance_range[0],
                 cfg.distance_range[1])
    h = jnp.clip(cam0[2] + 1.0 * d_h * s, cfg.height_range[0],
                 cfg.height_range[1])
    cam = jnp.stack([r * jnp.cos(ang), r * jnp.sin(ang), h])
    tgt = jnp.stack([tgt0[0] + 2.0 * d_tx * s, tgt0[1] + 2.0 * d_ty * s, h])
    return cam, tgt
