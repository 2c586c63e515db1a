"""The batched datagen pipeline — the reference's main loop, inverted.

Reference control flow (generate_construction_data.py:1540-2081) is one frame
at a time with simulator settle-sleeps; here a whole frame batch is one jitted
program: fold keys -> sample scene placements (on the reference's 10-frame
cadence, 1542) + cameras + lighting -> ray-cast render + annotate -> heatmap
targets, sharded over the data mesh. Retries (1573-1666) become per-frame
validity stats; resume is a manifest of frame ids (seed-indexed determinism
replaces the label_*.json scan at 1357-1367).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp

from ..config import Config
from ..core import camera as cam_mod
from ..ops import heatmap as heatmap_ops
from ..render import annotate, raycast
from ..sample import camera_sampler, lighting as lighting_mod, placement
from ..scene import assets, world as world_mod
from ..utils import prng
from . import mesh as mesh_mod

Array = jax.Array


class FrameBatch(NamedTuple):
    """Everything the writers need, per frame (leading batch dim)."""

    frame_id: Array  # (B,)
    rgb: Array  # (B, H, W, 3) uint8
    depth: Array  # (B, H, W) f32 (inf on sky)
    instance: Array  # (B, H, W) int32
    camera_pose7: Array  # (B, 7)
    inst_visible: Array  # (B, O)
    inst_pixel_count: Array  # (B, O)
    bbox2d: Array  # (B, O, 4)
    center: Array  # (B, O, 3)
    size: Array  # (B, O, 3)
    euler_deg: Array  # (B, O, 3)
    kpt_uv: Array  # (B, O, K, 2)
    kpt_visible: Array  # (B, O, K)
    kpt_in_image: Array  # (B, O, K)
    heatmaps: Array  # (B, C, h, w) f32
    pointcloud_count: Array  # (B,)


@dataclasses.dataclass
class Pipeline:
    """Builds the jitted generation step for a fixed Config.

    ``vmap_chunk`` bounds peak HBM: frames render ``vmap_chunk`` at a time
    under a sequential ``lax.map`` (at 512x512 a fully-vmapped batch of 32
    holds ~24 GB of ray-sweep intermediates — more than a v5e chip)."""

    cfg: Config
    use_pallas_heatmaps: bool = False
    # Fused Pallas RGB epilogue (render/rgb_kernel.py) — replaces the jnp
    # normals/patterns/AO/shade/gamma tier on the standard render path.
    use_rgb_kernel: bool = False
    # Fused Pallas pixel sweep (render/sweep_kernel.py) — replaces the jnp
    # (g, N) category sweep for primary rays on the proxy path.
    use_sweep_kernel: bool = False
    vmap_chunk: int = 4
    # RGB fidelity knobs (benchmarks/roofline.py stage isolation; production
    # keeps both True — the procedural-texture pass is the sim-to-real tier).
    procedural_textures: bool = True
    # Image-texture tier: sample the reference's REAL texture images (bark,
    # leaf, garment fabrics — render/textures.py low-rank MXU sampling) on
    # top of the procedural patterns. Opt-in (--image-textures).
    image_textures: bool = False
    # Measurement-only RGB sub-stage ablation (annotate.render_frame's
    # rgb_ablate; benchmarks/roofline.py --rgb-fine). Never set in production.
    rgb_ablate: frozenset = frozenset()
    # Hifi mesh mode: baked CAD triangle templates (render/meshcast.py)
    # replace the analytic proxies for the classes the reference crate
    # authors geometry for. Labels/keypoints stay template-based (PARITY.md
    # calibration deltas apply); depth / instance / RGB silhouettes become
    # mesh-faithful. Opt-in — and best run with ``vmap_chunk=1``: the mesh
    # sweep's tile-grained instance cull is a dynamic while_loop whose trip
    # count becomes the max over the batch under vmap (meshcast.py header).
    hifi_mesh: bool = False

    def __post_init__(self):
        self.roster = world_mod.make_roster(self.cfg.scene)
        if self.hifi_mesh:
            from ..render import meshcast
            pc0 = self.cfg.pipeline
            self.caster = meshcast.make_hifi_caster(
                self.roster, scene_cfg=self.cfg.scene,
                grid_hw=(pc0.render_height, pc0.render_width))
        else:
            self.caster = raycast.make_raycaster(self.roster,
                                                 scene_cfg=self.cfg.scene)
        if self.image_textures:
            from ..render import textures as textures_mod
            self.texture_factors = textures_mod.load_factors()
        else:
            self.texture_factors = None
        pc = self.cfg.pipeline
        self.intr = cam_mod.intrinsics_from_apertures(
            self.cfg.camera.focal_length, self.cfg.camera.horizontal_aperture,
            pc.render_width, pc.render_height,
        )
        self.pixel_sweeper = None
        if self.use_sweep_kernel and not self.hifi_mesh:
            from ..render import sweep_kernel
            self.pixel_sweeper = sweep_kernel.make_pixel_sweeper(
                self.roster, self.intr,
                interpret=jax.default_backend() != "tpu")
        elif self.use_sweep_kernel and hasattr(self.caster, "mesh"):
            # Hifi composite: the Pallas sweeper covers the masked analytic
            # base (proxies the meshes replace are excluded), merged with
            # the tile-culled triangle sweep by packed min — exactly
            # make_hifi_caster.fast's merge, with the base on the kernel.
            from ..render import sweep_kernel
            mesh = self.caster.mesh
            base_sweep = sweep_kernel.make_pixel_sweeper(
                self.roster, self.intr, prim_mask=~mesh.covered_prims,
                interpret=jax.default_backend() != "tpu")
            if base_sweep is not None:
                intr = self.intr

                def hifi_sweeper(world, cam_pos, M, _mesh=mesh,
                                 _base=base_sweep, _intr=intr):
                    packed_a = _base(world, cam_pos, M)
                    _, dirs = cam_mod.pixel_rays(_intr, cam_pos, M)
                    packed_m = _mesh(world, cam_pos, dirs.reshape(-1, 3))
                    return jnp.minimum(packed_a, packed_m)

                self.pixel_sweeper = hifi_sweeper
        self.hm_w = pc.render_width // pc.heatmap_stride
        self.hm_h = pc.render_height // pc.heatmap_stride
        self.num_channels = assets.NUM_KEYPOINT_CHANNELS

    # ---------------- single frame ----------------
    def _one_frame(self, seed: Array, frame_id: Array, pose=None,
                   ladder_cam=None, ladder_tgt=None, cam_override=None,
                   camera_mix=None, light_key=None):
        cfg = self.cfg
        if pose is None:
            # Scene randomization on the reference cadence: same scene for
            # every `cadence` consecutive frames (reference line 1542).
            k_scene = prng.scene_key(seed, frame_id, cfg.randomization.cadence_frames)
            pose, _diag = placement.randomize_scene(
                k_scene, self.roster, cfg.scene, cfg.randomization,
                articulate_crane=True,
            )
        world = world_mod.build_world(self.roster, pose)

        k_frame = prng.frame_key(seed, frame_id)
        k_cam, k_light = jax.random.split(k_frame)
        if cam_override is not None:
            cam_pos, target = cam_override
        elif ladder_cam is not None and camera_mix is not None:
            # Domain mix: ladder (close 4-12 m systematic) views with
            # probability ``camera_mix``, else the far DR sampler — a model
            # trained on one range alone degrades on the other.
            k_mix, k_dr = jax.random.split(k_cam)
            idx = frame_id % ladder_cam.shape[0]
            dr_cam, dr_tgt = jax.tree_util.tree_map(
                lambda x: x[0], camera_sampler.sample_camera_batch(k_dr, 1, cfg.camera))
            use_ladder = jax.random.bernoulli(k_mix, camera_mix)
            cam_pos = jnp.where(use_ladder, ladder_cam[idx], dr_cam)
            target = jnp.where(use_ladder, ladder_tgt[idx], dr_tgt)
        elif ladder_cam is not None:
            idx = frame_id % ladder_cam.shape[0]
            cam_pos, target = ladder_cam[idx], ladder_tgt[idx]
        else:
            cam_pos, target = jax.tree_util.tree_map(
                lambda x: x[0], camera_sampler.sample_camera_batch(k_cam, 1, cfg.camera)
            )
        if light_key is not None:
            k_light = light_key  # sequence mode: one sun per clip, no flicker
        lit = lighting_mod.sample_lighting(k_light, cfg.lighting)

        ann = annotate.render_frame(
            self.roster, self.caster, world, cam_pos, target, self.intr,
            lighting=lit, shade_rgb=cfg.pipeline.write_rgb,
            procedural_textures=self.procedural_textures,
            texture_factors=self.texture_factors,
            rgb_ablate=self.rgb_ablate,
            use_rgb_kernel=self.use_rgb_kernel,
            pixel_sweeper=self.pixel_sweeper,
            bug_compatible=cfg.pipeline.bug_compatible_schema,
            far_clip=cfg.camera.clipping[1],
        )
        hms = heatmap_ops.frame_heatmaps(
            ann.kpt_uv, ann.kpt_visible, jnp.asarray(self.roster.inst_kpt_channel),
            self.num_channels, self.hm_h, self.hm_w,
            cfg.pipeline.heatmap_sigma, cfg.pipeline.heatmap_stride,
            use_pallas=False,  # pallas path applied at batch level
        )
        return ann, hms

    # ---------------- batched step ----------------
    def make_generate_fn(self, ladder: bool = False, include_heatmaps: bool = True,
                         camera_mix: float | None = None):
        """Returns jitted ``generate(seed_key, frame_ids (B,)) -> FrameBatch``.

        ``include_heatmaps=False`` (dataset-writing path) skips heatmap
        rasterization and returns a zero-channel array — the writers don't
        consume heatmaps, and a 512x512 batch otherwise computes and ships
        ~170 MB of targets per 64 frames for nothing.

        ``camera_mix`` (training streams): per-frame Bernoulli(p) choice of a
        close-range ladder viewpoint over the far DR sampler."""
        cfg = self.cfg
        if ladder or camera_mix is not None:
            # Precompute the 41-entry systematic ladder once (static).
            cams, tgts = camera_sampler.systematic_camera_positions(
                cfg.pipeline.max_iterations, jax.random.PRNGKey(cfg.pipeline.seed)
            )
        else:
            cams = tgts = None

        def gen(seed: Array, frame_ids: Array) -> FrameBatch:
            B = frame_ids.shape[0]
            cfg2 = self.cfg
            cadence = cfg2.randomization.cadence_frames

            # Scene dedup: consecutive frames share a scene (reference cadence
            # at line 1542), so sample only the batch's scene groups once and
            # gather — otherwise placement sampling re-runs identically for
            # every frame (~3.8 ms each). REQUIRES contiguous frame_ids
            # (callers pass start + arange(B)); an id outside the batch's
            # group window would silently get the clamped edge group's scene.
            n_groups = B // cadence + 2
            g0 = frame_ids[0] // cadence

            def scene_for_group(g):
                k = prng.scene_key(seed, g * cadence, cadence)
                pose, _ = placement.randomize_scene(
                    k, self.roster, cfg2.scene, cfg2.randomization,
                    articulate_crane=True,
                )
                return pose

            poses = jax.vmap(scene_for_group)(g0 + jnp.arange(n_groups))

            def one(fid):
                gidx = jnp.clip(fid // cadence - g0, 0, n_groups - 1)
                pose = jax.tree_util.tree_map(lambda x: x[gidx], poses)
                ann, hms = self._one_frame(seed, fid, pose, cams, tgts,
                                           camera_mix=camera_mix)
                return ann, hms

            ch = min(self.vmap_chunk, B)
            if ch == 1 and B > 1:
                # No vmap: keeps dynamic control flow (the hifi mesh cull's
                # while_loop) truly data-dependent instead of batched.
                ann, hms = jax.lax.map(one, frame_ids)
            elif B % ch == 0 and B > ch:
                chunks = frame_ids.reshape(B // ch, ch)
                ann, hms = jax.lax.map(lambda f: jax.vmap(one)(f), chunks)
                ann, hms = jax.tree_util.tree_map(
                    lambda x: x.reshape((B,) + x.shape[2:]), (ann, hms)
                )
            else:
                ann, hms = jax.vmap(one)(frame_ids)
            if not include_heatmaps:
                hms = jnp.zeros((B, 0, self.hm_h, self.hm_w), jnp.float32)
            elif self.use_pallas_heatmaps:
                uv = ann.kpt_uv.reshape(ann.kpt_uv.shape[0], -1, 2)
                ch = jnp.asarray(self.roster.inst_kpt_channel).reshape(-1)
                chb = jnp.broadcast_to(ch, uv.shape[:2])
                vis = ann.kpt_visible.reshape(uv.shape[:2]) & (chb >= 0)
                hms = heatmap_ops.render_heatmaps_pallas(
                    uv, jnp.maximum(chb, 0), vis, self.num_channels,
                    self.hm_h, self.hm_w, cfg.pipeline.heatmap_sigma,
                    cfg.pipeline.heatmap_stride,
                )
            return FrameBatch(
                frame_id=frame_ids,
                rgb=ann.rgb,
                depth=ann.depth,
                instance=ann.instance,
                camera_pose7=ann.camera_pose7,
                inst_visible=ann.inst_visible,
                inst_pixel_count=ann.inst_pixel_count,
                bbox2d=ann.bbox2d,
                center=ann.center,
                size=ann.size,
                euler_deg=ann.euler_deg,
                kpt_uv=ann.kpt_uv,
                kpt_visible=ann.kpt_visible,
                kpt_in_image=ann.kpt_in_image,
                heatmaps=hms,
                pointcloud_count=ann.pointcloud_count,
            )

        return gen

    def make_sequence_fn(self, seq_len: int = 30, include_heatmaps: bool = True):
        """Returns jitted ``generate(seed_key, frame_ids (B,)) -> FrameBatch``
        producing temporally-coherent clips: frame ``fid`` belongs to sequence
        ``fid // seq_len`` at time fraction ``(fid % seq_len) / (seq_len-1)``.

        Per sequence: endpoint scenes from the reference placement procedure,
        crane/worker DoF + a camera flight interpolated between them
        (sample/sequence.py). Same FrameBatch contract as make_generate_fn, so
        every writer/eval path consumes clips unchanged. REQUIRES contiguous
        frame_ids like the cadence-dedup path."""
        from ..sample import sequence as seq_mod

        cfg = self.cfg

        def gen(seed: Array, frame_ids: Array) -> FrameBatch:
            B = frame_ids.shape[0]
            n_groups = B // seq_len + 2
            g0 = frame_ids[0] // seq_len

            def endpoints_for(g):
                k = jax.random.fold_in(jax.random.fold_in(seed, g), 7771)
                return seq_mod.sample_sequence_endpoints(
                    k, self.roster, cfg.scene, cfg.randomization)

            pas, pbs = jax.vmap(endpoints_for)(g0 + jnp.arange(n_groups))

            def one(fid):
                g = fid // seq_len
                gidx = jnp.clip(g - g0, 0, n_groups - 1)
                pa = jax.tree_util.tree_map(lambda x: x[gidx], pas)
                pb = jax.tree_util.tree_map(lambda x: x[gidx], pbs)
                t = (fid % seq_len).astype(jnp.float32) / max(seq_len - 1, 1)
                pose = seq_mod.interpolate_pose(pa, pb, t, self.roster)
                k_cam = jax.random.fold_in(jax.random.fold_in(seed, g), 7772)
                cam = seq_mod.sequence_camera(k_cam, t, cfg.camera)
                # Lighting keyed by the GROUP, not the frame: a clip's sun
                # direction/intensity must not flicker frame to frame.
                k_light = jax.random.fold_in(jax.random.fold_in(seed, g), 7773)
                return self._one_frame(seed, fid, pose, cam_override=cam,
                                       light_key=k_light)

            ch = min(self.vmap_chunk, B)
            if ch == 1 and B > 1:
                ann, hms = jax.lax.map(one, frame_ids)
            elif B % ch == 0 and B > ch:
                chunks = frame_ids.reshape(B // ch, ch)
                ann, hms = jax.lax.map(lambda f: jax.vmap(one)(f), chunks)
                ann, hms = jax.tree_util.tree_map(
                    lambda x: x.reshape((B,) + x.shape[2:]), (ann, hms))
            else:
                ann, hms = jax.vmap(one)(frame_ids)
            if not include_heatmaps:
                hms = jnp.zeros((B, 0, self.hm_h, self.hm_w), jnp.float32)
            return FrameBatch(
                frame_id=frame_ids, rgb=ann.rgb, depth=ann.depth,
                instance=ann.instance, camera_pose7=ann.camera_pose7,
                inst_visible=ann.inst_visible,
                inst_pixel_count=ann.inst_pixel_count, bbox2d=ann.bbox2d,
                center=ann.center, size=ann.size, euler_deg=ann.euler_deg,
                kpt_uv=ann.kpt_uv, kpt_visible=ann.kpt_visible,
                kpt_in_image=ann.kpt_in_image, heatmaps=hms,
                pointcloud_count=ann.pointcloud_count,
            )

        return gen

    def make_sharded_generate(self, mesh=None, ladder: bool = False):
        """jit the generate step with the batch sharded over the data mesh."""
        mesh = mesh or mesh_mod.make_mesh()
        gen = self.make_generate_fn(ladder=ladder)
        bs = mesh_mod.batch_sharding(mesh)
        rep = mesh_mod.replicated(mesh)
        return jax.jit(gen, in_shardings=(rep, bs), out_shardings=bs), mesh


def quality_stats(batch: FrameBatch, min_points: int) -> Dict[str, Array]:
    """Device-side aggregation of the DataQualityLogger counters
    (generate_construction_data.py:244-254): modality validity, object counts,
    pointcloud sufficiency. psum-able across hosts."""
    pc_valid = batch.pointcloud_count >= min_points
    n_obj = jnp.sum(batch.inst_visible, -1)
    return {
        "total_frames": jnp.asarray(batch.frame_id.shape[0]),
        "pointcloud_valid": jnp.sum(pc_valid),
        "pointcloud_insufficient": jnp.sum(
            (batch.pointcloud_count > 0) & ~pc_valid),
        "pointcloud_empty": jnp.sum(batch.pointcloud_count == 0),
        "labels_valid": jnp.sum(n_obj > 0),
        "labels_empty": jnp.sum(n_obj == 0),
        "objects_total": jnp.sum(n_obj),
    }
