"""Scene roster + world assembly (static tables -> jittable flattening).

Mirrors the content of world2.usd (asset inventory SURVEY.md section 2.2): one
articulated crane (4 labeled parts), one dumper, one DHGen worker, N traffic
cones, perimeter fencing, and trees outside the fence. The roster is built
host-side once (numpy, static shapes + prim-path strings identical in format
to the reference scene graph); ``build_world`` composes instance poses into
flat world-frame primitive arrays each frame, fully inside jit.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SceneConfig
from ..core import rotation
from . import assets, kinematics, taxonomy

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class Roster:
    """Host-side static scene description (numpy; never traced)."""

    # Instance tables, O = num instances (crane parts first, ground excluded).
    inst_class_id: np.ndarray  # (O,)
    inst_prim_paths: Tuple[str, ...]  # (O,)
    inst_class_names: Tuple[str, ...]
    inst_aabb_min: np.ndarray  # (O, 3) local
    inst_aabb_max: np.ndarray  # (O, 3)
    inst_albedo: np.ndarray  # (O, 3)
    inst_kpts: np.ndarray  # (O, K_max, 3) local, zero-padded
    inst_kpt_valid: np.ndarray  # (O, K_max) bool
    inst_kpt_channel: np.ndarray  # (O, K_max) int32 heatmap channel (-1 pad)
    # Occlusion family: keypoints first-hit by geometry of the SAME group are
    # "own surface", not occluded. Crane parts share one group — part axis
    # points sit inside nested sibling geometry (telescopic inside the boom).
    inst_occlusion_group: np.ndarray  # (O,) int32
    # Primitive tables, P = total primitives (ground plane last, inst = -1).
    prim_kind: np.ndarray  # (P,)
    prim_offset: np.ndarray  # (P, 3)
    prim_rot: np.ndarray  # (P, 3, 3)
    prim_params: np.ndarray  # (P, 4)
    prim_inst: np.ndarray  # (P,) instance index, -1 for ground
    # Group index ranges into the instance table.
    crane_slice: Tuple[int, int]
    dumper_slice: Tuple[int, int]
    human_slice: Tuple[int, int]
    cone_slice: Tuple[int, int]
    tree_slice: Tuple[int, int]
    fence_slice: Tuple[int, int]

    @property
    def num_instances(self) -> int:
        return int(self.inst_class_id.shape[0])

    @property
    def num_prims(self) -> int:
        return int(self.prim_kind.shape[0])


def _cone_path(i: int) -> str:
    # Cone001, Cone001_01, Cone001_02 ... (reference: 135-136)
    return taxonomy.CONE_ROOT_PREFIX if i == 0 else f"{taxonomy.CONE_ROOT_PREFIX}_{i:02d}"


def _tree_path(i: int) -> str:
    return taxonomy.TREE_ROOT_PREFIX if i == 0 else f"{taxonomy.TREE_ROOT_PREFIX}_{i:02d}"


def _fence_path(i: int) -> str:
    return f"{taxonomy.FENCE_ROOT_PREFIX}2_{i:02d}"


def make_roster(cfg: SceneConfig = SceneConfig()) -> Roster:
    templates = assets.all_templates()
    channel_table, _ = assets.keypoint_channel_table()
    kmax = assets.MAX_KEYPOINTS_PER_OBJECT

    entries: List[Tuple[str, str]] = []  # (class_name, prim_path)
    for part in kinematics.CRANE_PART_ORDER:
        entries.append((part, taxonomy.crane_part_root(part)))
    crane_slice = (0, len(entries))
    d0 = len(entries)
    for _ in range(cfg.n_dumpers):
        entries.append(("dumper", taxonomy.DUMPER_ROOT))
    dumper_slice = (d0, len(entries))
    h0 = len(entries)
    for _ in range(cfg.n_humans):
        entries.append(("human", taxonomy.HUMAN_ROOT))
    human_slice = (h0, len(entries))
    c0 = len(entries)
    for i in range(cfg.n_cones):
        entries.append(("trafficcone", _cone_path(i)))
    cone_slice = (c0, len(entries))
    t0 = len(entries)
    for i in range(cfg.n_trees):
        entries.append(("tree", _tree_path(i)))
    tree_slice = (t0, len(entries))
    f0 = len(entries)
    for i in range(cfg.n_fence_panels):
        entries.append(("fence", _fence_path(i)))
    fence_slice = (f0, len(entries))

    O = len(entries)
    inst_class_id = np.zeros(O, np.int32)
    inst_aabb_min = np.zeros((O, 3), np.float32)
    inst_aabb_max = np.zeros((O, 3), np.float32)
    inst_albedo = np.zeros((O, 3), np.float32)
    inst_kpts = np.zeros((O, kmax, 3), np.float32)
    inst_kpt_valid = np.zeros((O, kmax), bool)
    inst_kpt_channel = np.full((O, kmax), -1, np.int32)

    prim_kind, prim_offset, prim_rot, prim_params, prim_inst = [], [], [], [], []
    for o, (cls, _path) in enumerate(entries):
        t = templates[cls]
        inst_class_id[o] = t.class_id
        inst_aabb_min[o] = t.aabb_min
        inst_aabb_max[o] = t.aabb_max
        inst_albedo[o] = t.albedo
        k = t.num_keypoints
        inst_kpts[o, :k] = t.keypoints
        inst_kpt_valid[o, :k] = True
        for ki in range(k):
            inst_kpt_channel[o, ki] = channel_table[(cls, ki)]
        prim_kind.append(t.prim_kind)
        prim_offset.append(t.prim_offset)
        prim_rot.append(t.prim_rot)
        prim_params.append(t.prim_params)
        prim_inst.append(np.full(t.num_prims, o, np.int32))

    occl_group = np.arange(O, dtype=np.int32)
    occl_group[crane_slice[0]:crane_slice[1]] = crane_slice[0]

    g = assets.ground_template()
    prim_kind.append(g.prim_kind)
    prim_offset.append(g.prim_offset)
    prim_rot.append(g.prim_rot)
    prim_params.append(g.prim_params)
    prim_inst.append(np.full(g.num_prims, -1, np.int32))

    return Roster(
        inst_class_id=inst_class_id,
        inst_prim_paths=tuple(p for _, p in entries),
        inst_class_names=tuple(c for c, _ in entries),
        inst_aabb_min=inst_aabb_min,
        inst_aabb_max=inst_aabb_max,
        inst_albedo=inst_albedo,
        inst_kpts=inst_kpts,
        inst_kpt_valid=inst_kpt_valid,
        inst_kpt_channel=inst_kpt_channel,
        inst_occlusion_group=occl_group,
        prim_kind=np.concatenate(prim_kind),
        prim_offset=np.concatenate(prim_offset).astype(np.float32),
        prim_rot=np.concatenate(prim_rot).astype(np.float32),
        prim_params=np.concatenate(prim_params).astype(np.float32),
        prim_inst=np.concatenate(prim_inst),
        crane_slice=crane_slice,
        dumper_slice=dumper_slice,
        human_slice=human_slice,
        cone_slice=cone_slice,
        tree_slice=tree_slice,
        fence_slice=fence_slice,
    )


@jax.tree_util.register_pytree_node_class
class ScenePose:
    """Per-frame scene parameters (a pytree; every leaf is batched freely).

    ``positions``/``yaw_deg`` cover non-crane instances by roster index; crane
    root pose + joints expand to the 4 part instances inside ``build_world``.
    ``human_joints`` (..., n_humans, 17, 3) carries articulated COCO joints in
    each human's local frame (kinematics.pose_human_joints); None means the
    canonical standing pose.
    """

    def __init__(self, crane_pos, crane_yaw_deg, crane_joints,
                 positions, yaw_deg, human_joints=None):
        self.crane_pos = crane_pos  # (..., 3)
        self.crane_yaw_deg = crane_yaw_deg  # (...,)
        self.crane_joints = crane_joints  # (..., 3)
        self.positions = positions  # (..., O, 3) rows 0-3 ignored (crane parts)
        self.yaw_deg = yaw_deg  # (..., O)
        self.human_joints = human_joints  # (..., n_humans, 17, 3) or None

    def tree_flatten(self):
        return (self.crane_pos, self.crane_yaw_deg, self.crane_joints,
                self.positions, self.yaw_deg, self.human_joints), None

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves)


def fence_default_yaw_deg(n_panels: int) -> np.ndarray:
    """Static fence-panel yaws (degrees): x-running sides 0/1 get 0, the
    y-running sides 90. The fence is NEVER re-posed (placement.randomize_scene
    only moves crane/dumpers/humans/cones; sequences keep endpoint-A statics),
    so this is a contract shared with render/raycast._transform_categories,
    which bakes the 0/90 split into its axis-aligned sweep category."""
    per_side = max(n_panels // 4, 1)
    side = np.arange(n_panels) // per_side
    return np.where(side <= 1, 0.0, 90.0).astype(np.float32)


def default_pose(roster: Roster, cfg: SceneConfig = SceneConfig()) -> ScenePose:
    """The unrandomized world2-like layout: crane center, dumper at its
    original spot (generate_construction_data.py:794 'dumper position:
    [-7.37, -0.59, 0.69]'), cones scattered, fixed trees/fence."""
    O = roster.num_instances
    positions = np.zeros((O, 3), np.float32)
    yaw = np.zeros(O, np.float32)

    d0, d1 = roster.dumper_slice
    for i in range(d0, d1):
        positions[i] = [-7.37, -0.59, 0.0]
    h0, h1 = roster.human_slice
    for i in range(h0, h1):
        positions[i] = [3.0, 3.0, 0.0]
    c0, c1 = roster.cone_slice
    for j, i in enumerate(range(c0, c1)):
        ang = 2 * np.pi * j / max(c1 - c0, 1)
        positions[i] = [4.0 * np.cos(ang), 4.0 * np.sin(ang), 0.0]
    t0, t1 = roster.tree_slice
    for j, i in enumerate(range(t0, t1)):
        ang = 2 * np.pi * j / max(t1 - t0, 1) + 0.3
        positions[i] = [cfg.tree_ring_radius * np.cos(ang), cfg.tree_ring_radius * np.sin(ang), 0.0]
    f0, f1 = roster.fence_slice
    per_side = max((f1 - f0) // 4, 1)
    fence_yaw = fence_default_yaw_deg(f1 - f0)
    for j, i in enumerate(range(f0, f1)):
        side = j // per_side
        k = j % per_side
        span_x = np.linspace(-cfg.fence_half_x + 1.75, cfg.fence_half_x - 1.75, per_side)
        span_y = np.linspace(-cfg.fence_half_y + 1.75, cfg.fence_half_y - 1.75, per_side)
        yaw[i] = fence_yaw[j]
        if side == 0:
            positions[i] = [span_x[k], -cfg.fence_half_y, 0.0]
        elif side == 1:
            positions[i] = [span_x[k], cfg.fence_half_y, 0.0]
        elif side == 2:
            positions[i] = [-cfg.fence_half_x, span_y[k], 0.0]
        else:
            positions[i] = [cfg.fence_half_x, span_y[k], 0.0]

    n_h = roster.human_slice[1] - roster.human_slice[0]
    return ScenePose(
        crane_pos=jnp.asarray([0.0, 0.0, 0.0], jnp.float32),
        crane_yaw_deg=jnp.asarray(0.0, jnp.float32),
        crane_joints=kinematics.DEFAULT_CRANE_JOINTS,
        positions=jnp.asarray(positions),
        yaw_deg=jnp.asarray(yaw),
        human_joints=jnp.broadcast_to(
            jnp.asarray(assets.CANONICAL_COCO), (n_h, 17, 3)) if n_h else None,
    )


def instance_poses(roster: Roster, pose: ScenePose) -> Tuple[Array, Array]:
    """(inst_rot (..., O, 3, 3), inst_pos (..., O, 3)) for every instance,
    expanding the crane chain. Jit-friendly; batched over leading dims."""
    R_all = rotation.matrix_rot_z_degrees(pose.yaw_deg)  # (..., O, 3, 3)
    t_all = pose.positions

    crane_R = rotation.matrix_rot_z_degrees(pose.crane_yaw_deg)  # (..., 3, 3)
    fk = kinematics.crane_fk(pose.crane_joints)
    part_R = []
    part_t = []
    for part in kinematics.CRANE_PART_ORDER:
        Rl, tl = fk[part]
        part_R.append(crane_R @ Rl)
        part_t.append(pose.crane_pos + jnp.einsum("...ij,...j->...i", crane_R, tl))
    part_R = jnp.stack(part_R, axis=-3)  # (..., 4, 3, 3)
    part_t = jnp.stack(part_t, axis=-2)  # (..., 4, 3)

    s0, s1 = 0, 4  # crane parts are always the first roster rows
    R_all = jnp.concatenate([part_R, R_all[..., s1:, :, :]], axis=-3)
    t_all = jnp.concatenate([part_t, t_all[..., s1:, :]], axis=-2)
    del s0
    return R_all, t_all


def build_world(roster: Roster, pose: ScenePose):
    """Flatten instance poses into world-frame primitive arrays.

    Returns a dict of arrays (leading batch dims follow the pose):
      prim_kind (P,), prim_rot (..., P, 3, 3), prim_pos (..., P, 3),
      prim_params (P, 4), prim_inst (P,), inst_rot (..., O, 3, 3),
      inst_pos (..., O, 3), kpts_local (..., O, K, 3).
    """
    if pose.positions.ndim > 2:  # batched pose: vmap the single-frame path
        return jax.vmap(lambda p: build_world(roster, p))(pose)

    inst_rot, inst_pos = instance_poses(roster, pose)
    prim_inst = jnp.asarray(roster.prim_inst)
    # Gather per-prim instance transforms; ground (-1) gets identity.
    safe_inst = jnp.maximum(prim_inst, 0)
    pi_rot = jnp.take(inst_rot, safe_inst, axis=-3)
    pi_pos = jnp.take(inst_pos, safe_inst, axis=-2)
    is_ground = (prim_inst < 0)[..., None, None]
    eye = jnp.eye(3, dtype=jnp.float32)
    pi_rot = jnp.where(is_ground, eye, pi_rot)
    pi_pos = jnp.where(is_ground[..., 0], jnp.zeros(3, jnp.float32), pi_pos)

    local_rot = jnp.asarray(roster.prim_rot)
    local_off = jnp.asarray(roster.prim_offset)
    kpts_local = jnp.asarray(roster.inst_kpts)

    # Articulated humans: replace the humans' prim-local transforms and local
    # keypoints with the posed skeleton (capsule params are pose-invariant:
    # rigid rotations preserve bone lengths).
    if pose.human_joints is not None:
        h0, h1 = roster.human_slice
        n_h = h1 - h0
        hp_idx = np.nonzero((np.asarray(roster.prim_inst) >= h0)
                            & (np.asarray(roster.prim_inst) < h1))[0]
        if n_h > 0:
            posed_rot, posed_off = jax.vmap(
                kinematics.human_capsule_transforms)(pose.human_joints)
            idx = jnp.asarray(hp_idx)
            local_rot = local_rot.at[idx].set(posed_rot.reshape(-1, 3, 3))
            local_off = local_off.at[idx].set(posed_off.reshape(-1, 3))
            kpts_local = kpts_local.at[h0:h1, : pose.human_joints.shape[-2], :].set(
                pose.human_joints)

    prim_rot = jnp.einsum("...pij,pjk->...pik", pi_rot, local_rot,
                          precision=jax.lax.Precision.HIGHEST)
    prim_pos = pi_pos + jnp.einsum("...pij,pj->...pi", pi_rot, local_off,
                                   precision=jax.lax.Precision.HIGHEST)
    return {
        "prim_kind": jnp.asarray(roster.prim_kind),
        "prim_rot": prim_rot,
        "prim_pos": prim_pos,
        "prim_params": jnp.asarray(roster.prim_params),
        "prim_inst": prim_inst,
        "inst_rot": inst_rot,
        "inst_pos": inst_pos,
        "kpts_local": kpts_local,
    }


def world_keypoints(roster: Roster, inst_rot: Array, inst_pos: Array,
                    kpts_local: Array | None = None) -> Array:
    """Object-local keypoints -> world frame: (..., O, K_max, 3).

    ``kpts_local`` (from build_world) carries articulated-human overrides;
    None falls back to the static template keypoints."""
    kpts = jnp.asarray(roster.inst_kpts) if kpts_local is None else kpts_local
    return (
        jnp.einsum("...oij,...okj->...oki", inst_rot, kpts,
                   precision=jax.lax.Precision.HIGHEST)
        + inst_pos[..., :, None, :]
    )
