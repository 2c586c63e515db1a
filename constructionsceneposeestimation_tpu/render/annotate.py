"""The per-frame annotation pass (pure JAX, fully jittable, vmap-batchable).

Produces every modality the reference's per-frame loop collects
(generate_construction_data.py:1668-2072) from one ray-cast sweep instead of
four annotators + settle sleeps:

  rgb            <- camera.get_rgba()                 (1668-1677)
  depth          <- distance_to_image_plane annotator (1680-1711)
  pointcloud     <- pointcloud annotator / depth fallback (1715-1768)
  instance map   <- instance_segmentation (the reference only writes a -1
                    placeholder mask, 1908-1910; we compute the real thing and
                    can emit either)
  visible set    <- bounding_box_3d 'primPaths' (1788-1790)
  6DoF bbox pose <- bboxDict_to_transform / prim fallback (1912-2032)
  keypoints/visibility/heatmap targets <- the TPU-build extension
                    (BASELINE.json north star)

The retry-on-empty-pointcloud loop (reference 1573-1666) becomes the returned
``pointcloud_count`` validity stat — batched resampling replaces retries.
"""

from __future__ import annotations

import functools
import os
from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import camera as cam_mod
from ..core import transforms
from ..scene import world as world_mod
from . import raycast as _raycast_mod
from . import rgb_kernel as rgb_kernel_mod
from . import shading as sh

Array = jax.Array
_einsum = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)


def _table_bf16() -> bool:
    """Whether the per-pixel table contraction runs in bf16.

    Round-4 A/B on the real chip (all-modality bench, two runs each):
    bf16 1377/1340 f/s vs f32 1360/1375 f/s — neutral within queue noise,
    so the DEFAULT is the exact HIGHEST-f32 path on every backend (no
    accuracy caveats for zero measured win). ``CSPE_TABLE_BF16=1`` re-enables
    the bf16 MXU path for future re-measurement; the branch is read at trace
    time, like every other static config.
    """
    v = os.environ.get("CSPE_TABLE_BF16")
    if v is not None:
        return v not in ("0", "false", "False", "")
    return False


def _shade_dtype():
    """Compute dtype of the RGB shading/texture tier (labels never touch it).

    Round-4 A/B on the real chip (all-modality bench): bf16 tier 1520 f/s vs
    f32 tier 1634 f/s — bf16 LOSES 7%. The tier is a handful of fused
    elementwise kernels, so halving plane bytes buys little HBM, while every
    f32↔bf16 boundary (geometry subtractions and hash-noise args must stay
    f32) adds convert ops and splits fusions. Default is therefore the exact
    f32 tier; ``CSPE_SHADE_BF16=1`` re-enables the bf16 path (numerics when
    enabled: only post-cancellation RELATIVE math runs bf16 — ±1 u8 level of
    RGB, ~1-3 cm of procedural-pattern phase; measured in
    tests/test_annotate.py bf16-shade A/B).
    """
    v = os.environ.get("CSPE_SHADE_BF16")
    if v is not None and v not in ("0", "false", "False", ""):
        return jnp.bfloat16
    return jnp.float32


def _ao_table(roster, O_: int):
    """Static contact-AO rows: every non-fence instance (fence panels sit at
    the yard boundary where contact shading is invisible at DR range, yet
    would be half the (A, N) chain) and its footprint radius capped at 2 m
    (airborne spans — crane boom — must not darken half the yard)."""
    f0, f1 = getattr(roster, "fence_slice", (O_, O_))
    ao_rows = np.concatenate(
        [np.arange(f0), np.arange(f1, O_)]).astype(np.int32)
    if ao_rows.size == 0:  # degenerate all-fence roster
        ao_rows = np.arange(O_, dtype=np.int32)
    foot_r = jnp.asarray(
        np.minimum(np.maximum(np.abs(roster.inst_aabb_min[ao_rows, :2]),
                              np.abs(roster.inst_aabb_max[ao_rows, :2]))
                   .max(-1), 2.0), jnp.float32)  # (A,)
    return ao_rows, foot_r


class FrameAnnotations(NamedTuple):
    depth: Array  # (H, W) distance to image plane; +inf on sky
    instance: Array  # (H, W) int32 instance id, -1 ground, -2 sky
    rgb: Array  # (H, W, 3) uint8 (zeros if shading disabled)
    camera_pose7: Array  # (7,) [x y z qx qy qz qw]
    inst_visible: Array  # (O,) bool — any pixel covered (bbox_3d primPaths analogue)
    inst_pixel_count: Array  # (O,) int32
    bbox2d: Array  # (O, 4) [u_min, v_min, u_max, v_max] pixel-tight; -1 if unseen
    center: Array  # (O, 3) world bbox center
    size: Array  # (O, 3) world bbox size
    euler_deg: Array  # (O, 3) extrinsic-xyz degrees
    kpt_uv: Array  # (O, K, 2) pixel coords
    kpt_depth: Array  # (O, K) pinhole depth
    kpt_in_image: Array  # (O, K) bool
    kpt_visible: Array  # (O, K) bool (in image & not occluded)
    pointcloud_count: Array  # () int32 — valid-depth pixel count (quality gate)


def render_frame(
    roster: world_mod.Roster,
    caster,
    world: Dict[str, Array],
    cam_pos: Array,
    target: Array,
    intr: cam_mod.Intrinsics,
    lighting: sh.Lighting | None = None,
    shade_rgb: bool = True,
    kpt_occlusion_tol: float = 0.02,
    analytic_normals: bool = False,
    sun_shadows: bool = False,
    procedural_textures: bool = True,
    texture_factors=None,
    bug_compatible: bool = False,
    far_clip: float = 250.0,
    rgb_ablate: frozenset = frozenset(),
    use_rgb_kernel: bool = False,
    pixel_sweeper=None,
) -> FrameAnnotations:
    """Annotate a single frame. vmap over (world, cam_pos, target) for batches.

    Default uses the packed fast ray sweep + screen-space normals;
    ``analytic_normals=True`` selects the slow exact-normal path.

    ``rgb_ablate`` (measurement-only; benchmarks/roofline.py --rgb-fine):
    tokens that skip one RGB sub-stage each so its cost shows as a timing
    delta — {"normals", "local", "patterns", "ao", "barrier", "hash",
    "gamma"}. Production paths never set it."""
    H, W = intr.height, intr.width
    M = cam_mod.look_at_matrix(cam_pos, target)
    origin, dirs = cam_mod.pixel_rays(intr, cam_pos, M)
    rd = dirs.reshape(-1, 3)

    # Keypoint-occlusion segments share the camera origin, so they ride the
    # SAME sweep as the pixel rays (a separate occlusion pass costs ~3.5 ms of
    # tiny-op dispatch). The packed sweep is direction-scale invariant, so
    # unnormalized cam->kpt segments give t in segment units directly.
    O = roster.num_instances
    inst_rot, inst_pos = world["inst_rot"], world["inst_pos"]
    kpts_w = world_mod.world_keypoints(
        roster, inst_rot, inst_pos, world.get("kpts_local"))  # (O, K, 3)
    K = kpts_w.shape[-2]
    kpt_flat = kpts_w.reshape(-1, 3)
    seg = kpt_flat - cam_pos[None, :]
    n_px = rd.shape[0]
    n_seg = seg.shape[0]
    # Two sweeps: pixel rays padded to the caster's chunk (zero pad at 512^2),
    # segments padded only to a small tile. Folding the ~500 segments into the
    # pixel sweep would force one extra FULL 16384-ray chunk (~6% wasted sweep).
    pad_px = (-n_px) % 16384
    px_rays = jnp.concatenate([rd, jnp.ones((pad_px, 3), rd.dtype)], axis=0) \
        if pad_px else rd
    pad_seg = (-n_seg) % 1024
    seg_rays = jnp.concatenate([seg, jnp.ones((pad_seg, 3), seg.dtype)], axis=0) \
        if pad_seg else seg

    if analytic_normals:
        hit_px = caster(world, origin, px_rays)
        hit_seg = caster(world, origin, seg_rays)
    elif pixel_sweeper is not None:
        # Fused Pallas pixel sweep (render/sweep_kernel.py): the whole
        # prim x ray sweep in one kernel, rays generated in-kernel.
        # Occlusion segments (~1k rays, arbitrary directions) keep the
        # jnp caster.
        t_px, code_px = _raycast_mod._unpack(pixel_sweeper(world, cam_pos, M))
        hitp = t_px < _raycast_mod.INF * 0.99
        hit_px = {"t": jnp.where(hitp, t_px, jnp.float32(jnp.inf)),
                  "inst": code_px - 2}
        hit_seg = caster.fast(world, origin, seg_rays)
    else:
        hit_px = caster.fast(world, origin, px_rays)
        hit_seg = caster.fast(world, origin, seg_rays)
    hit = jax.tree_util.tree_map(lambda x: x[:n_px], hit_px)
    t_occ = hit_seg["t"][:n_seg]
    occ_inst = hit_seg["inst"][:n_seg]

    # Depth: the annotator records distance-to-image-plane (pinhole Z), not
    # euclidean range: z = t * (d . view_forward).
    view_fwd = -M[:, 0]  # camera looks along its -X axis
    cosang = jnp.einsum("nj,j->n", rd, view_fwd)
    depth = jnp.where(jnp.isfinite(hit["t"]), hit["t"] * cosang, jnp.inf).reshape(H, W)
    # Far clip: the reference camera's clipping_range is (0.5, 250)
    # (generate_construction_data.py:1437) — geometry beyond the far plane
    # never renders in Isaac, so those pixels are sky in every modality.
    clipped = depth >= far_clip
    depth = jnp.where(clipped, jnp.inf, depth)
    instance = jnp.where(clipped, -2, hit["inst"].reshape(H, W))
    hit = dict(hit, inst=instance.reshape(-1),
               t=jnp.where(clipped.reshape(-1), jnp.inf, hit["t"]))

    if shade_rgb:
        # Everything below runs on SoA component PLANES — (N,) x/y/z and
        # r/g/b — never (N, 3) vectors (trailing-3 pads to the 128-lane tile:
        # ~43x wasted VPU/HBM per materialized intermediate; see shading.py).
        t_safe = jnp.where(jnp.isfinite(hit["t"]), hit["t"], 0.0)
        sdt = _shade_dtype()  # RGB-tier compute dtype (labels stay f32)
        rdx, rdy, rdz = rd[:, 0], rd[:, 1], rd[:, 2]
        pwx = origin[0] + t_safe * rdx  # world hit position planes
        pwy = origin[1] + t_safe * rdy
        pwz = origin[2] + t_safe * rdz
        if "normals" in rgb_ablate:
            normal = (jnp.zeros_like(pwx, sdt), jnp.zeros_like(pwx, sdt),
                      jnp.ones_like(pwx, sdt))
        elif "normal" in hit:  # analytic-normal caster path
            normal = (hit["normal"][:, 0], hit["normal"][:, 1],
                      hit["normal"][:, 2])
        else:
            nx, ny, nz = sh.screen_space_normals(
                (pwx.reshape(H, W), pwy.reshape(H, W), pwz.reshape(H, W)),
                (rdx.reshape(H, W), rdy.reshape(H, W), rdz.reshape(H, W)),
                dtype=sdt)
            normal = (nx.reshape(-1), ny.reshape(-1), nz.reshape(-1))
        O_ = roster.num_instances
        # Per-pixel table rows — albedo (+ local rotation/position/class for
        # textures) — come from ONE one-hot MXU contraction against a packed
        # (O+2, C) table. A dynamic gather here (table[alb_idx] at 262k
        # indices) lowers to the scalar-gather path and costs ~14x the whole
        # ray sweep (the documented TPU anti-pattern; measured 493 -> 50 ms
        # per 64-frame batch at 512^2 when removed).
        albedo_table = jnp.concatenate(
            [jnp.asarray(roster.inst_albedo),
             jnp.asarray([[0.45, 0.40, 0.35], [0.0, 0.0, 0.0]], jnp.float32)]
        )  # rows: [0..O) instances, O ground, O+1 sky (unused)
        alb_idx = jnp.where(hit["inst"] >= 0, hit["inst"], O_ - 1 - hit["inst"])
        if procedural_textures:
            # Packed per-instance table: [albedo(3) | R row-major(9) |
            # pos(3) | class(1)]. Ground (-1) / sky (-2) rows get identity
            # rotation, zero offset, class -1/-2.
            rot_table = jnp.concatenate(
                [inst_rot.reshape(O_, 9),
                 jnp.broadcast_to(jnp.eye(3).reshape(1, 9), (2, 9))])
            pos_table = jnp.concatenate([inst_pos, jnp.zeros((2, 3))])
            cls_table = jnp.concatenate(
                [jnp.asarray(roster.inst_class_id, jnp.float32),
                 jnp.asarray([-1.0, -2.0], jnp.float32)])
            table = jnp.concatenate(
                [albedo_table, rot_table, pos_table, cls_table[:, None]], 1)
        else:
            table = albedo_table
        onehot = (alb_idx[None, :]
                  == jnp.arange(O_ + 2, dtype=jnp.int32)[:, None])
        if _table_bf16():
            # Opt-in bf16 path (measured neutral, see _table_bf16). px_tab
            # feeds ONLY the RGB/texture tier (no label reads it), so the
            # geometry-HIGHEST rule does not apply. Class-id row stays exact
            # (|id| <= 256 is exact in bf16); albedo/rotation err ~0.4%;
            # instance positions round at bf16's 2^-8 RELATIVE ulp — ~5 cm
            # near the 16 m yard extent, but ~0.4 m at 100 m — acceptable
            # only because the yard is fence-bounded at ~±10 m and pattern
            # phase is DR-jittered anyway.
            px_tab = jnp.einsum(
                "co,on->cn", table.T.astype(jnp.bfloat16),
                onehot.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)  # (C, N)
        else:
            px_tab = _einsum("co,on->cn", table.T,
                             onehot.astype(jnp.float32))  # (C, N), exact f32
        lighting = lighting if lighting is not None else sh.default_lighting()
        # Fused Pallas epilogue: ONE kernel replaces normals / patterns /
        # AO / shade / gamma (render/rgb_kernel.py — the jnp tier below is
        # fusion-structure-bound, see that module's docstring). The jnp path
        # remains for the optional tiers the kernel doesn't cover.
        use_fused = (use_rgb_kernel and procedural_textures
                     and texture_factors is None and not sun_shadows
                     and "normal" not in hit and not rgb_ablate
                     and sdt == jnp.float32
                     and rgb_kernel_mod.supported(H, W))
        if use_fused:
            # The kernel's dominant HBM cost is reading the 16 materialized
            # table planes, so store them bf16 (f32-accumulated dot, then
            # cast). Numerics: class ids exact (|id| <= 256), albedo/rotation
            # ~0.4% (sub-u8), instance positions ~2-4 cm at the fence-bounded
            # yard extent -> pattern phase well under the 6-50 cm band sizes.
            # Labels never read these planes.
            px_tab_b = jnp.einsum(
                "co,on->cn", table.T.astype(jnp.bfloat16),
                onehot.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            ao_rows, foot_r = _ao_table(roster, O_)
            rgb = rgb_kernel_mod.fused_rgb(
                hit["t"], px_tab_b, cam_pos, M, intr, lighting,
                inst_pos[jnp.asarray(ao_rows), :2], foot_r,
                interpret=jax.default_backend() != "tpu")
        # The shading/texture tier runs at _shade_dtype (bf16 by default);
        # only the RGB image reads these planes, never a label. World-frame
        # SUBTRACTIONS stay f32 (bf16 at ~16 m is ~6 cm — catastrophic for
        # differences); everything after the cancellation is cast.
        albedo = (px_tab[0].astype(sdt), px_tab[1].astype(sdt),
                  px_tab[2].astype(sdt))
        nr = None  # image-texture normal/roughness planes (set below)
        if use_fused:
            pass
        elif procedural_textures:
            # Hit position in the owning instance's LOCAL frame: patterns
            # (cone bands, crane stripes, vest) ride the object under DR.
            # l_i = sum_j R[j, i] * (p_w - pos)_j with R row-major at rows
            # 3..11 of the packed table (R^T, world -> local). The f32
            # subtraction feeds a sdt rotate: local coords are O(1 m), so
            # bf16 costs ~1 cm of pattern phase (bands are 6-50 cm).
            if "local" in rgb_ablate:
                lx = ly = lz = jnp.zeros_like(pwx, sdt)
            else:
                dxw = (pwx - px_tab[12]).astype(sdt)
                dyw = (pwy - px_tab[13]).astype(sdt)
                dzw = (pwz - px_tab[14]).astype(sdt)
                rt = px_tab[3:12].astype(sdt)
                lx = rt[0] * dxw + rt[3] * dyw + rt[6] * dzw
                ly = rt[1] * dxw + rt[4] * dyw + rt[7] * dzw
                lz = rt[2] * dxw + rt[5] * dyw + rt[8] * dzw
            if "patterns" not in rgb_ablate:
                albedo = sh.procedural_albedo(albedo, lx, ly, lz,
                                              px_tab[15].astype(sdt), lighting)
            if texture_factors is not None:
                # Image-texture tier: the reference's REAL texture images as
                # low-rank MXU contractions (render/textures.py). Off on the
                # headline datagen path; on for --image-textures / hifi/viz.
                # with_nr: the packed normal/roughness composites perturb
                # the shading normal + add a roughness specular (ask: the
                # MDL channels of bark3.mdl:7-42) — RGB-only, label-neutral.
                from . import textures as tex_mod
                albedo, nr = tex_mod.apply_image_textures(
                    albedo, lx, ly, lz, pwx.astype(sdt), pwy.astype(sdt),
                    px_tab[15].astype(sdt), texture_factors,
                    tex_phase=lighting.tex_phase, with_nr=True)
            # Force ONE evaluation of the pattern chain: the three RGB
            # fusion roots in shade() otherwise each re-compute the full
            # albedo DAG (sqrt/sin/floor + ~24 selects) — measured 1.35x on
            # the end-to-end pipeline (69 -> 51 ms per 64-frame batch).
            if "barrier" not in rgb_ablate:
                if nr is not None:
                    albedo, nr = jax.lax.optimization_barrier((albedo, nr))
                else:
                    albedo = jax.lax.optimization_barrier(albedo)
            if nr is not None:
                # Perturb after the barrier so the perturbed-normal DAG is
                # evaluated once, not per channel fusion root.
                normal = sh.perturb_normal(normal, nr[0], nr[1])
            # Contact AO on ground pixels: ambient falls off toward each
            # instance's footprint (cheap grounding cue; the hard sun shadow
            # is the optional sun_shadows sweep). Row set: _ao_table.
            ao_rows, foot_r = _ao_table(roster, O_)
            pos_ao = inst_pos[ao_rows]  # static-row gather, (A, 3)
            # SoA (A, N) planes: a (N, A, 2)-shaped difference would put the
            # 2-vector on lanes (the tiling anti-pattern the sweep avoids);
            # XLA fuses the plane chain into the min-reduction, so nothing
            # (A, N)-sized ever materializes.
            # f32 subtract (world coords), then the whole (A, N) chain in the
            # shading dtype — it's the biggest plane set on the RGB path.
            dx = (pwx[None, :] - pos_ao[:, 0][:, None]).astype(sdt)  # (A, N)
            dy = (pwy[None, :] - pos_ao[:, 1][:, None]).astype(sdt)
            d_xy = jnp.sqrt(dx * dx + dy * dy)
            prox = jnp.clip((d_xy - foot_r[:, None].astype(sdt)) / 0.6,
                            0.0, 1.0)
            ao_ground = 0.45 + 0.55 * jnp.min(prox, axis=0)
            ao = jnp.where(hit["inst"] == -1, ao_ground,
                           jnp.asarray(1.0, sdt))
            if "ao" in rgb_ablate:
                ao = None
        else:
            ao = None
        shadow_t = None
        if sun_shadows:
            # One packed sweep from the hit points toward the sun. Shadow-ray
            # origins differ per pixel, so this can't ride the camera sweep;
            # it costs roughly one extra sweep (~1.5 ms at 512x512).
            p_hit = jnp.stack([pwx, pwy, pwz], -1)
            sun_d = -lighting.sun_dir  # toward the sun
            bias = 1e-3
            shadow_hit = caster.fast_multi_origin(
                world, p_hit + sun_d[None, :] * bias,
                jnp.broadcast_to(sun_d, p_hit.shape))
            shadow_t = shadow_hit["t"]
        if not use_fused:
            rgb_planes = sh.shade(hit["t"], normal, (pwx, pwy, pwz),
                                  (rdx, rdy, rdz), albedo, lighting, shadow_t,
                                  ao=ao,
                                  texture_strength=(
                                      0.0 if "hash" in rgb_ablate else 0.15),
                                  rough=None if nr is None else nr[2],
                                  spec_w=None if nr is None else nr[3])
            rgb = sh.linear_to_srgb_u8(rgb_planes, H, W,
                                       gamma="gamma" not in rgb_ablate)
    else:
        rgb = jnp.zeros((H, W, 3), jnp.uint8)

    # Visible-instance set == the bbox_3d annotator's primPaths (1788-1790).
    # (O, H, W) layout — instances as the leading batch dim, pixels on the
    # (sublane, lane) tile — so the compare matrix reduces along full lanes.
    # The (H*W, O) layout pads O (~26) to 128 lanes, ~5x wasted VPU work, and
    # one_hot materializes ~40 MB/frame of int32 and costs ~10x more.
    ids = jnp.arange(O, dtype=jnp.int32)
    eq3 = instance[None, :, :] == ids[:, None, None]  # (O, H, W)
    inst_pixel_count = jnp.sum(eq3, axis=(1, 2), dtype=jnp.int32)
    inst_visible = inst_pixel_count > 0

    # Pixel-tight 2D boxes (an extension beyond the reference's 3D-only
    # labels): reduce the mask to row/column presence first, then min/max over
    # the tiny (O, H)/(O, W) planes instead of 4 full-image reductions.
    row_any = jnp.any(eq3, axis=2)  # (O, H)
    col_any = jnp.any(eq3, axis=1)  # (O, W)
    big = jnp.int32(1 << 20)
    hs = jnp.arange(H, dtype=jnp.int32)[None, :]
    ws = jnp.arange(W, dtype=jnp.int32)[None, :]
    u_min = jnp.min(jnp.where(col_any, ws, big), axis=1)
    v_min = jnp.min(jnp.where(row_any, hs, big), axis=1)
    u_max = jnp.max(jnp.where(col_any, ws, -1), axis=1)
    v_max = jnp.max(jnp.where(row_any, hs, -1), axis=1)
    bbox2d = jnp.stack([u_min, v_min, u_max, v_max], -1)
    bbox2d = jnp.where(inst_visible[:, None], bbox2d, -1)

    # 6DoF bbox labels via the exact reference math path (553-584).
    T = transforms.make_transform(inst_rot, inst_pos)
    T_rowmajor = jnp.swapaxes(T, -1, -2)
    center, size, euler = transforms.bbox_record_to_pose(
        jnp.asarray(roster.inst_aabb_min), jnp.asarray(roster.inst_aabb_max), T_rowmajor
    )

    # Keypoints: project, in-image test, occlusion test.
    uv, z = cam_mod.project(kpt_flat, cam_pos, M, intr)
    uv = uv.reshape(O, K, 2)
    z = z.reshape(O, K)
    in_img = (
        (z > 0)
        & (uv[..., 0] >= 0) & (uv[..., 0] < W)
        & (uv[..., 1] >= 0) & (uv[..., 1] < H)
        & jnp.asarray(roster.inst_kpt_valid)
    )
    # Occluded iff the first surface along the segment is FOREIGN and closer
    # than the keypoint. A first-hit inside the keypoint's own OCCLUSION GROUP
    # (its own surface, or a nested sibling crane part — axis keypoints sit
    # inside the geometry) counts as the keypoint's own visible surface — but
    # ONLY when that surface lies within ``group_surface_tol`` metres of the
    # keypoint along the ray. The proximity gate separates "axis point just
    # under its own/nested skin" (hit <= part thickness away) from "a distant
    # sibling part blocks the view" (e.g. the column in front of the far boom
    # end), which is a real occlusion and must not be supervised as visible.
    group_surface_tol = 0.5
    own = jnp.repeat(jnp.arange(O, dtype=jnp.int32), K)
    grp = jnp.asarray(roster.inst_occlusion_group)
    beyond = t_occ > (1.0 - kpt_occlusion_tol)
    occ_grp = jnp.where(occ_inst >= 0,
                        jnp.take(grp, jnp.clip(occ_inst, 0, O - 1)), -1)
    hit_to_kpt = (1.0 - t_occ) * z.reshape(-1)
    own_first = (occ_grp == jnp.take(grp, own)) & (
        hit_to_kpt <= group_surface_tol)
    not_occluded = (beyond | own_first).reshape(O, K)
    kpt_visible = in_img & not_occluded

    pc_count = jnp.sum(cam_mod.depth_valid_mask(depth)).astype(jnp.int32)

    return FrameAnnotations(
        depth=depth,
        instance=instance,
        rgb=rgb,
        camera_pose7=cam_mod.camera_pose7_xyzw(cam_pos, target,
                                               bug_compatible=bug_compatible),
        inst_visible=inst_visible,
        inst_pixel_count=inst_pixel_count,
        bbox2d=bbox2d,
        center=center,
        size=size,
        euler_deg=euler,
        kpt_uv=uv,
        kpt_depth=z,
        kpt_in_image=in_img,
        kpt_visible=kpt_visible,
        pointcloud_count=pc_count,
    )


def pointcloud_xyzrgb(depth: Array, rgb: Array, intr: cam_mod.Intrinsics,
                      camera_pose7: Array) -> Dict[str, Array]:
    """Depth + RGB -> (H*W, 6) xyzrgb with validity mask, using the
    camera_pose-based backprojection (the reference's fallback path,
    616-711 — geometrically correct with our emitted camera_pose)."""
    pts = cam_mod.backproject_depth_reference_quirk(depth, intr, camera_pose7)
    valid = cam_mod.depth_valid_mask(depth)
    xyzrgb = jnp.concatenate(
        [pts.reshape(-1, 3), rgb.reshape(-1, 3).astype(jnp.float32)], axis=-1
    )
    return {"xyzrgb": xyzrgb, "valid": valid.reshape(-1)}
