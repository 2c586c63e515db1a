"""Object-placement domain randomization (jittable).

Vectorized reproduction of the reference's ``randomize_object_positions``
(generate_construction_data.py:914-1231), preserving its invariants:

* placement order crane -> dumper -> humans -> cones (largest first, 1084);
* sum-of-radii collision against everything already placed (946-956);
* fence containment with margin, bounds x in [-9, 8.5], y in [-9, 9] (935-941);
* <=80 rejection-sampling attempts, then a clamped fallback near the center
  (958-969) — the fallback may overlap, and the per-object ``ok`` flag records
  it exactly like the reference's ``no_overlap`` bookkeeping (1225-1229);
* dumper tries 7 shuffled candidate areas, falling back to area[0] with a
  widened range (1110-1145);
* crane never rotates (1096); dumper/human/cone yaw ~ U(-180, 180).

The variable-length attempt loop becomes a fixed 80-candidate draw with
first-valid selection — identical distribution, static shapes.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..config import RandomizationConfig, SceneConfig
from ..scene import kinematics, world as world_mod

Array = jax.Array

_INACTIVE_R = -1e9  # placed-slot radius making any candidate pass the check


def _find_valid_position(
    key: Array,
    center: Array,  # (2,)
    range_xy: Array,  # (2,) half-ranges
    own_radius: Array,
    placed_xy: Array,  # (M, 2)
    placed_r: Array,  # (M,)
    cfg: RandomizationConfig,
    fence_margin: Array,
) -> Tuple[Array, Array]:
    """80-candidate first-valid draw + clamped fallback.

    Returns (xy (2,), ok bool) with the reference's exact semantics
    (generate_construction_data.py:958-969)."""
    k_cand, k_fb = jax.random.split(key)
    u = jax.random.uniform(k_cand, (cfg.max_attempts, 2), minval=-1.0, maxval=1.0)
    cand = center + u * range_xy
    x, y = cand[:, 0], cand[:, 1]
    in_fence = (
        (x >= cfg.fence_x[0] + fence_margin) & (x <= cfg.fence_x[1] - fence_margin)
        & (y >= cfg.fence_y[0] + fence_margin) & (y <= cfg.fence_y[1] - fence_margin)
    )
    d = jnp.linalg.norm(cand[:, None, :] - placed_xy[None, :, :], axis=-1)  # (A, M)
    no_overlap = jnp.all(d >= own_radius + placed_r[None, :], axis=1)
    ok = in_fence & no_overlap
    any_ok = jnp.any(ok)
    first = jnp.argmax(ok)
    fb = center + jax.random.uniform(k_fb, (2,), minval=-1.0, maxval=1.0)
    fb = jnp.stack(
        [
            jnp.clip(fb[0], cfg.fence_x[0] + fence_margin, cfg.fence_x[1] - fence_margin),
            jnp.clip(fb[1], cfg.fence_y[0] + fence_margin, cfg.fence_y[1] - fence_margin),
        ]
    )
    return jnp.where(any_ok, cand[first], fb), any_ok


def _place_group(carry, k, radius, rng, margin, center_range,
                 cfg: RandomizationConfig):
    """One human/cone placement step (reference 1158-1222): random center,
    first-valid candidate vs everything placed so far, random yaw."""
    placed_xy, placed_r, s = carry
    kc, kp, ky = jax.random.split(k, 3)
    center = jax.random.uniform(kc, (2,), minval=-center_range,
                                maxval=center_range)
    xy, ok = _find_valid_position(
        kp, center, jnp.full(2, rng), radius, placed_xy, placed_r, cfg, margin
    )
    yaw = jax.random.uniform(ky, (), minval=-180.0, maxval=180.0)
    placed_xy = placed_xy.at[s].set(xy)
    placed_r = placed_r.at[s].set(radius)
    return (placed_xy, placed_r, s + 1), (xy, yaw, ok)


def randomize_scene(
    key: Array,
    roster: world_mod.Roster,
    scene_cfg: SceneConfig = SceneConfig(),
    cfg: RandomizationConfig = RandomizationConfig(),
    articulate_crane: bool = False,
    articulate_humans: bool = True,
) -> Tuple[world_mod.ScenePose, Dict[str, Array]]:
    """Sample a full scene placement. Batched via vmap over keys."""
    n_humans = scene_cfg.n_humans
    n_cones = scene_cfg.n_cones
    M = 1 + scene_cfg.n_dumpers + n_humans + n_cones

    keys = jax.random.split(key, 8)
    placed_xy = jnp.zeros((M, 2), jnp.float32)
    placed_r = jnp.full((M,), _INACTIVE_R, jnp.float32)
    slot = 0
    oks = []

    # ----- crane (generate_construction_data.py:1084-1107) -----
    if articulate_crane:
        joints = jax.random.uniform(
            keys[6], (3,), minval=kinematics.CRANE_JOINT_LOW, maxval=kinematics.CRANE_JOINT_HIGH
        )
    else:
        joints = kinematics.DEFAULT_CRANE_JOINTS
    crane_radius = jnp.maximum(kinematics.crane_reach_xy(joints) * 0.9, cfg.crane_min_radius)
    crane_xy, crane_ok = _find_valid_position(
        keys[0], jnp.zeros(2), jnp.full(2, cfg.crane_range), crane_radius,
        placed_xy, placed_r, cfg, jnp.float32(cfg.fence_margin),
    )
    placed_xy = placed_xy.at[slot].set(crane_xy)
    placed_r = placed_r.at[slot].set(crane_radius)
    slot += 1
    oks.append(crane_ok)

    # ----- dumpers (1109-1156): 7 shuffled areas, first valid, else area[0].
    # The reference places one dumper; extra instances (SceneConfig.n_dumpers)
    # repeat the identical area procedure with collision against everything
    # already placed (including earlier dumpers).
    areas = jnp.asarray(cfg.dumper_areas, jnp.float32)
    dumper_radius = jnp.float32(max(cfg.dumper_min_radius, 2.5))
    n_dumpers = scene_cfg.n_dumpers

    def place_dumper(carry, dk):
        placed_xy, placed_r, s = carry
        kp, ka, ky = jax.random.split(dk, 3)
        perm = jax.random.permutation(kp, areas.shape[0])
        area_keys = jax.random.split(ka, areas.shape[0] + 1)

        def try_area(i):
            return _find_valid_position(
                area_keys[i], areas[perm[i]], jnp.full(2, cfg.dumper_range),
                dumper_radius, placed_xy, placed_r, cfg,
                jnp.float32(cfg.fence_margin),
            )

        area_xy, area_ok = jax.vmap(try_area)(jnp.arange(areas.shape[0]))
        any_area = jnp.any(area_ok)
        first_area = jnp.argmax(area_ok)
        fb_xy, fb_ok = _find_valid_position(
            area_keys[-1], areas[0], jnp.full(2, 3.0), dumper_radius,
            placed_xy, placed_r, cfg, jnp.float32(cfg.fence_margin),
        )
        xy = jnp.where(any_area, area_xy[first_area], fb_xy)
        ok = jnp.where(any_area, True, fb_ok)
        yaw = jax.random.uniform(ky, (), minval=-180.0, maxval=180.0)
        placed_xy = placed_xy.at[s].set(xy)
        placed_r = placed_r.at[s].set(dumper_radius)
        return (placed_xy, placed_r, s + 1), (xy, yaw, ok)

    if n_dumpers > 0:
        d_keys = jax.random.split(keys[1], n_dumpers)
        (placed_xy, placed_r, slot_d), (dumper_xy, dumper_yaw, dumper_ok_v) = (
            jax.lax.scan(place_dumper, (placed_xy, placed_r, jnp.int32(slot)),
                         d_keys))
        slot += n_dumpers
        dumper_ok = jnp.all(dumper_ok_v)
    else:
        dumper_xy = jnp.zeros((0, 2)); dumper_yaw = jnp.zeros((0,))
        dumper_ok = jnp.asarray(True)
    oks.append(dumper_ok)

    # ----- humans (1158-1200) then cones (1202-1222), sequentially -----
    human_keys = jax.random.split(keys[4], max(n_humans, 1))
    carry = (placed_xy, placed_r, slot)
    if n_humans > 0:
        carry, (human_xy, human_yaw, human_ok) = jax.lax.scan(
            lambda c, k: _place_group(
                c, k, jnp.float32(cfg.human_radius), cfg.human_range,
                jnp.float32(cfg.fence_margin), 7.0, cfg,
            ),
            carry, human_keys,
        )
        oks.append(jnp.all(human_ok))
    else:
        human_xy = jnp.zeros((0, 2)); human_yaw = jnp.zeros((0,)); human_ok = jnp.zeros((0,), bool)
    placed_xy, placed_r, slot_v = carry

    cone_keys = jax.random.split(keys[5], max(n_cones, 1))
    if n_cones > 0:
        carry, (cone_xy, cone_yaw, cone_ok) = jax.lax.scan(
            lambda c, k: _place_group(
                c, k, jnp.float32(cfg.cone_radius), cfg.cone_range,
                jnp.float32(cfg.cone_fence_margin), cfg.cone_center_range, cfg,
            ),
            (placed_xy, placed_r, slot_v), cone_keys,
        )
        placed_xy, placed_r, _ = carry
    else:
        cone_xy = jnp.zeros((0, 2)); cone_yaw = jnp.zeros((0,)); cone_ok = jnp.zeros((0,), bool)

    # ----- assemble ScenePose over the roster -----
    O = roster.num_instances
    positions = jnp.zeros((O, 3), jnp.float32)
    yaw = jnp.zeros((O,), jnp.float32)
    # Static (non-randomized) instances keep the default layout (trees/fence).
    default = world_mod.default_pose(roster, scene_cfg)
    positions = default.positions
    yaw = default.yaw_deg

    d0, d1 = roster.dumper_slice
    if n_dumpers > 0:
        positions = positions.at[d0:d1, :2].set(dumper_xy)
        yaw = yaw.at[d0:d1].set(dumper_yaw)
    h0, h1 = roster.human_slice
    if n_humans > 0:
        positions = positions.at[h0:h1, :2].set(human_xy)
        yaw = yaw.at[h0:h1].set(human_yaw)
    c0, c1 = roster.cone_slice
    if n_cones > 0:
        positions = positions.at[c0:c1, :2].set(cone_xy)
        yaw = yaw.at[c0:c1].set(cone_yaw)

    # Articulated worker poses (the reference's rigged DHGen stand-in).
    if n_humans > 0:
        canonical = jnp.asarray(world_mod.assets.CANONICAL_COCO)
        if articulate_humans:
            pose_keys = jax.random.split(keys[7], n_humans)
            human_joints = jax.vmap(
                lambda k: kinematics.pose_human_joints(
                    canonical, kinematics.sample_human_pose(k))
            )(pose_keys)
        else:
            human_joints = jnp.broadcast_to(canonical, (n_humans, 17, 3))
    else:
        human_joints = None

    pose = world_mod.ScenePose(
        crane_pos=jnp.concatenate([crane_xy, jnp.zeros(1)]),
        crane_yaw_deg=jnp.float32(0.0),  # crane never rotates (reference: 1096)
        crane_joints=joints,
        positions=positions,
        yaw_deg=yaw,
        human_joints=human_joints,
    )
    diag = {
        "crane_ok": crane_ok,
        "dumper_ok": dumper_ok,
        "human_ok": human_ok,
        "cone_ok": cone_ok,
        "placed_xy": placed_xy,
        "placed_r": placed_r,
        "crane_radius": crane_radius,
    }
    return pose, diag


def resample_animated(
    key: Array,
    roster: world_mod.Roster,
    scene_cfg: SceneConfig,
    cfg: RandomizationConfig,
    base_pose: world_mod.ScenePose,
    base_diag: Dict[str, Array],
) -> world_mod.ScenePose:
    """Endpoint-B sampler for sequence mode: re-runs ONLY the animated DoF
    (crane articulation; human placement, yaw and body pose) while keeping
    the base scene's static layout — and, crucially, collision-checking the
    re-placed humans against the BASE scene's placed obstacles (crane,
    dumpers, cones), so interpolated workers never walk through statics that
    only existed in a discarded endpoint-B layout.

    The crane's collision slot is widened to the larger of the two endpoint
    articulations' reach, since the boom sweeps between them over the clip.
    """
    n_humans = scene_cfg.n_humans
    keys = jax.random.split(key, 3)
    joints = jax.random.uniform(
        keys[0], (3,), minval=kinematics.CRANE_JOINT_LOW,
        maxval=kinematics.CRANE_JOINT_HIGH)

    positions = base_pose.positions
    yaw = base_pose.yaw_deg
    human_joints = base_pose.human_joints
    human_ok = jnp.ones((n_humans,), bool)
    if n_humans > 0:
        placed_xy = base_diag["placed_xy"]
        placed_r = base_diag["placed_r"]
        crane_r = jnp.maximum(
            base_diag["crane_radius"],
            jnp.maximum(kinematics.crane_reach_xy(joints) * 0.9,
                        cfg.crane_min_radius))
        placed_r = placed_r.at[0].set(crane_r)
        h_slot0 = 1 + scene_cfg.n_dumpers
        # Deactivate the base humans' slots: they move during the clip, so
        # endpoint B re-places them (each placement re-activates its slot, so
        # B humans still avoid each other).
        placed_r = placed_r.at[h_slot0:h_slot0 + n_humans].set(_INACTIVE_R)
        human_keys = jax.random.split(keys[1], n_humans)
        carry = (placed_xy, placed_r, jnp.int32(h_slot0))
        _, (human_xy, human_yaw, human_ok) = jax.lax.scan(
            lambda c, k: _place_group(
                c, k, jnp.float32(cfg.human_radius), cfg.human_range,
                jnp.float32(cfg.fence_margin), 7.0, cfg),
            carry, human_keys)
        h0, h1 = roster.human_slice
        positions = positions.at[h0:h1, :2].set(human_xy)
        yaw = yaw.at[h0:h1].set(human_yaw)
        canonical = jnp.asarray(world_mod.assets.CANONICAL_COCO)
        pose_keys = jax.random.split(keys[2], n_humans)
        human_joints = jax.vmap(
            lambda k: kinematics.pose_human_joints(
                canonical, kinematics.sample_human_pose(k)))(pose_keys)

    pose = world_mod.ScenePose(
        crane_pos=base_pose.crane_pos,
        crane_yaw_deg=base_pose.crane_yaw_deg,
        crane_joints=joints,
        positions=positions,
        yaw_deg=yaw,
        human_joints=human_joints,
    )
    # human_ok False marks a reference-faithful clamped fallback (the
    # rejection sampler gave up, matching generate_construction_data.py:
    # 958-969); such placements are NOT clearance-guaranteed.
    return pose, {"human_ok": human_ok}
