"""The analytic pixel sweep as ONE Pallas TPU kernel.

This is the hot half of the framework's replacement for the reference's
Isaac RTX render + annotator reads (generate_construction_data.py:
1668-1711 — camera.get_rgba / distance_to_image_plane per frame, ~0.15
fps); render/raycast.py documents the analytic-primitive design.

The jnp sweep (render/raycast.py) runs each transform category as (g, N)
plane arithmetic with g = 6..20 primitives on the SUBLANE axis — g pads to
the 8-sublane granule, categories compile to separate fusions, and the
whole thing measured 14% of the chip's VPU peak (47 ms of the 70 ms
all-modality batch; per-category prim_mask deltas in docs/PERFORMANCE.md).

Here every primitive becomes SCALAR constants applied to full-lane ray
planes inside one kernel:

* rays are generated in-kernel from the pixel iota + 13 camera scalars
  (nothing ray-shaped is ever read from HBM);
* static prim data (kind, category, params, instance code) is baked into
  the unrolled Python loop at trace time — only the per-frame pose array
  (P, 12) [pos | rot rows] is an input, read as SMEM scalars;
* per-ray shared quantities (|d_xy|^2 reciprocal, 1/dz, world-axis slab
  reciprocals) are computed once per block — the same algebra the jnp
  categories share, but with zero sublane padding;
* the running minimum rides the same mantissa-packed (t | instance-code)
  encoding as raycast._pack, so output is ONE f32 plane and ties resolve
  identically (IEEE positive-float ordering).

The formulas mirror raycast.py's category specializations (transform-free
quadrics, axis-aligned fence slabs, yaw-2D boxes, axis-decomposed posed
capsules, general-rotation locals) with two intended simplifications: rays
are unit-normalized in-kernel so |d|^2 == 1 (the jnp path keeps a general
``a`` term), and capped cylinders/cones intersect a z-slab interval with
the quadric interval instead of testing cap discs separately (same
surface, same entry t up to f32 rounding). Equivalence vs caster.fast is
pinned in tests/test_sweep_kernel.py.

Scope: PRIMARY pixel rays only (shared camera origin, full image grid).
Keypoint-occlusion segments (~1k rays), shadow rays (per-pixel origins)
and the hifi mesh path keep the jnp casters.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import camera as cam_mod
from ..scene import assets, world as world_mod
from . import raycast

Array = jax.Array

_N_PAR = 16
_INF = float(raycast.INF)
_EPS = raycast.EPS


def _pack_static(t, code: int):
    """raycast._pack with a static python-int payload."""
    bits = pltpu.bitcast(t, jnp.int32)
    bits = jnp.bitwise_or(jnp.bitwise_and(bits, ~raycast._PAYLOAD_MASK),
                          code)
    return pltpu.bitcast(bits, jnp.float32)


def make_pixel_sweeper(roster: world_mod.Roster, intr: cam_mod.Intrinsics,
                       prim_mask: np.ndarray | None = None,
                       interpret: bool = False, hb: int | None = None,
                       n_acc: int = 4):
    """Build ``sweep(world, cam_pos, M) -> packed (H*W,) f32`` for the fixed
    roster + intrinsics, or None when the image shape is unsupported."""
    H, W = intr.height, intr.width
    if H % 8 != 0 or W < 8:
        return None
    if hb is None:
        hb = next((b for b in (64, 32, 16, 8) if H % b == 0))
    if H % hb != 0:
        hb = next((b for b in (64, 32, 16, 8) if H % b == 0))

    cats = raycast._transform_categories(roster)
    if prim_mask is not None:
        cats = {c: [(k, idx[prim_mask[idx]]) for k, idx in lst]
                for c, lst in cats.items()}
    params = np.asarray(roster.prim_params)
    prim_inst = np.asarray(roster.prim_inst)

    # Static schedule: (tag, prim_row, kind, params tuple, code, extra)
    sched = []
    for cat, lst in cats.items():
        for kind, idx in lst:
            for p in idx:
                code = int(prim_inst[p]) + 2
                sched.append((cat, int(p), int(kind),
                              tuple(float(v) for v in params[p]), code))
    fence_perm = {}
    for cat_name, perm in (("aa_id", (0, 1, 2)), ("aa_swap", (1, 0, 2))):
        for kind, idx in cats.get(cat_name, ()):
            for p in idx:
                fence_perm[int(p)] = perm

    def kernel(par_ref, prim_ref, out_ref):
        f32 = jnp.float32
        c = lambda k: par_ref[0, k]
        b00, b01, b02, b10, b11, b12, b20, b21, b22 = (c(i) for i in range(9))
        cx, cy, fx, fy = c(9), c(10), c(11), c(12)
        camx, camy, camz = c(13), c(14), c(15)

        row = (jax.lax.broadcasted_iota(jnp.int32, (hb, W), 0)
               + pl.program_id(0) * hb).astype(f32)
        col = jax.lax.broadcasted_iota(jnp.int32, (hb, W), 1).astype(f32)
        xpin = (col - cx) / fx
        ypin = (row - cy) / fy
        dx = b00 * xpin + b01 * ypin + b02
        dy = b10 * xpin + b11 * ypin + b12
        dz = b20 * xpin + b21 * ypin + b22
        # Exact normalize (one shared divide per plane): lax.rsqrt's ~2^-14
        # approximation would put ~1e-4 relative into DEPTH LABELS here —
        # this t is a label source, unlike the RGB kernel's ray recompute.
        inv = 1.0 / jnp.sqrt(dx * dx + dy * dy + dz * dz)
        dx, dy, dz = dx * inv, dy * inv, dz * inv
        # Shared per-ray quantities (|d|^2 == 1 by construction).
        a2 = dx * dx + dy * dy
        ra2 = 1.0 / jnp.maximum(a2, _EPS)
        dz_safe = jnp.where(jnp.abs(dz) < _EPS, _EPS, dz)
        rdz = 1.0 / dz_safe
        rinv = {}  # world-axis slab reciprocals, built lazily
        planes = {0: dx, 1: dy, 2: dz}

        def axis_rinv(ax):
            if ax not in rinv:
                da = planes[ax]
                rinv[ax] = 1.0 / jnp.where(jnp.abs(da) < _EPS, _EPS, da)
            return rinv[ax]

        # Hoist every per-prim SMEM scalar read ahead of the vector work so
        # the scalar core runs ahead of the VPU instead of interleaving.
        prim_s = [[prim_ref[p, k] for k in range(12)] for p in range(P)]

        # Four interleaved min accumulators break the otherwise-serial
        # 76-deep packed-min dependency chain (merged pairwise at the end).
        bests = [jnp.full((hb, W), np.float32(_INF)) for _ in range(n_acc)]
        slot = [0]

        def merge(_unused, t, ok, code):
            t = jnp.where(ok & (t > _EPS), t, np.float32(_INF))
            s = slot[0] % n_acc
            slot[0] += 1
            bests[s] = jnp.minimum(bests[s], _pack_static(t, code))
            return _unused

        best = None  # merged after the loop

        for cat, p, kind, prm, code in sched:
            ps = prim_s[p]
            px, py, pz = ps[0], ps[1], ps[2]
            ox = camx - px
            oy = camy - py
            oz = camz - pz
            if cat == "inv":
                if kind == assets.PLANE:
                    t = -oz * rdz
                    best = merge(best, t, jnp.abs(dz) >= _EPS, code)
                elif kind == assets.SPHERE:
                    r = prm[0]
                    b = ox * dx + oy * dy + oz * dz
                    cq = ox * ox + oy * oy + oz * oz - r * r
                    disc = b * b - cq  # |d|^2 == 1
                    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                    best = merge(best, -b - sq, disc > 0, code)
                elif kind == assets.CYLINDER:
                    r, hh = prm[0], prm[1]
                    b2 = ox * dx + oy * dy
                    c2 = ox * ox + oy * oy - r * r
                    disc = b2 * b2 - a2 * c2
                    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                    q_lo = (-b2 - sq) * ra2
                    q_hi = (-b2 + sq) * ra2
                    tz1 = (-hh - oz) * rdz
                    tz2 = (hh - oz) * rdz
                    z_lo = jnp.minimum(tz1, tz2)
                    z_hi = jnp.maximum(tz1, tz2)
                    # Solid capped cylinder: quadric interval ∩ z-slab.
                    # Degenerate a2 (axis-parallel ray): inside-radius iff
                    # c2 < 0, interval is the full line.
                    deg = a2 < _EPS
                    enter = jnp.where(deg, z_lo, jnp.maximum(q_lo, z_lo))
                    exit_ = jnp.where(deg, z_hi, jnp.minimum(q_hi, z_hi))
                    # (bool-valued jnp.where trips Mosaic's i8->i1
                    # truncation; pure logical ops lower fine)
                    ok = ((deg & (c2 < 0)) | (~deg & (disc > 0))) \
                        & (enter <= exit_) & (exit_ > 0)
                    best = merge(best, enter, ok, code)
                else:  # CONE (upright frustum, solid with caps)
                    rb, rt, hh = prm[0], prm[1], prm[2]
                    k = (rt - rb) / (2.0 * hh)
                    q = rb + k * (oz + hh)
                    m = k * dz
                    a = a2 - m * m
                    b = ox * dx + oy * dy - q * m
                    cq = ox * ox + oy * oy - q * q
                    a_safe = jnp.where(jnp.abs(a) < _EPS, _EPS, a)
                    disc = b * b - a_safe * cq
                    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                    ra = 1.0 / a_safe
                    t1 = (-b - sq) * ra
                    t2 = (-b + sq) * ra
                    t_lo = jnp.minimum(t1, t2)
                    t_hi = jnp.maximum(t1, t2)

                    def side_ok(t):
                        z = oz + t * dz
                        rad = q + m * t
                        return (disc > 0) & (jnp.abs(z) <= hh) & (rad > 0)

                    t_side = jnp.where(side_ok(t_lo), t_lo,
                                       jnp.where(side_ok(t_hi), t_hi,
                                                 np.float32(_INF)))
                    best = merge(best, t_side, t_side < _INF, code)
                    for sign, rr in ((-1.0, rb), (1.0, rt)):
                        t_c = (sign * hh - oz) * rdz
                        xx = ox + t_c * dx
                        yy = oy + t_c * dy
                        best = merge(best, t_c, xx * xx + yy * yy <= rr * rr,
                                     code)
            elif cat in ("aa_id", "aa_swap"):
                perm = fence_perm[p]
                o_world = (ox, oy, oz)
                enter = None
                exit_ = None
                for la in range(3):
                    wa = perm[la]
                    h = prm[la]
                    ri = axis_rinv(wa)
                    t1 = (-h - o_world[wa]) * ri
                    t2 = (h - o_world[wa]) * ri
                    lo = jnp.minimum(t1, t2)
                    hi = jnp.maximum(t1, t2)
                    enter = lo if enter is None else jnp.maximum(enter, lo)
                    exit_ = hi if exit_ is None else jnp.minimum(exit_, hi)
                best = merge(best, enter, (exit_ >= enter) & (exit_ > 0),
                             code)
            elif cat == "yaw":
                # Identity-local box on a yaw-only instance: rotate into the
                # 2D local frame; z is world z.
                cth = ps[3]   # rot[0, 0]
                sth = ps[6]   # rot[1, 0]
                olx = cth * ox + sth * oy
                oly = -sth * ox + cth * oy
                dlx = cth * dx + sth * dy
                dly = -sth * dx + cth * dy
                enter = None
                exit_ = None
                for h, oc, dc, ri in ((prm[0], olx, dlx, None),
                                      (prm[1], oly, dly, None),
                                      (prm[2], oz, dz, rdz)):
                    if ri is None:
                        ri = 1.0 / jnp.where(jnp.abs(dc) < _EPS, _EPS, dc)
                    t1 = (-h - oc) * ri
                    t2 = (h - oc) * ri
                    lo = jnp.minimum(t1, t2)
                    hi = jnp.maximum(t1, t2)
                    enter = lo if enter is None else jnp.maximum(enter, lo)
                    exit_ = hi if exit_ is None else jnp.minimum(exit_, hi)
                best = merge(best, enter, (exit_ >= enter) & (exit_ > 0),
                             code)
            elif cat == "axis":
                # Posed capsule: axial/radial decomposition about the world
                # axis (raycast._sweep_packed_fast's axis category).
                r, hh = prm[0], prm[1]
                ax0 = ps[5]   # rot[:, 2] column = capsule axis
                ax1 = ps[8]
                ax2 = ps[11]
                oz_ax = ox * ax0 + oy * ax1 + oz * ax2  # scalar
                oo = ox * ox + oy * oy + oz * oz        # scalar
                dz_ax = ax0 * dx + ax1 * dy + ax2 * dz  # plane
                od = ox * dx + oy * dy + oz * dz        # plane
                a2c = 1.0 - dz_ax * dz_ax
                b2c = od - oz_ax * dz_ax
                c2c = oo - oz_ax * oz_ax - r * r        # scalar
                a2_safe = jnp.where(a2c < _EPS, _EPS, a2c)
                disc2 = b2c * b2c - a2_safe * c2c
                sq2 = jnp.sqrt(jnp.maximum(disc2, 0.0))
                t_side = (-b2c - sq2) / a2_safe
                z_side = oz_ax + t_side * dz_ax
                ok = (disc2 > 0) & (jnp.abs(z_side) <= hh) & (a2c >= _EPS)
                best = merge(best, t_side, ok, code)
                for sign in (-1.0, 1.0):
                    bs = od - (sign * hh) * dz_ax
                    cs = oo - (2.0 * sign) * hh * oz_ax + hh * hh - r * r
                    disc = bs * bs - cs
                    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                    best = merge(best, -bs - sq, disc > 0, code)
            else:  # gen: full local rotation
                r00, r01, r02 = ps[3], ps[4], ps[5]
                r10, r11, r12 = ps[6], ps[7], ps[8]
                r20, r21, r22 = ps[9], ps[10], ps[11]
                # local = R^T * world
                ol = (r00 * ox + r10 * oy + r20 * oz,
                      r01 * ox + r11 * oy + r21 * oz,
                      r02 * ox + r12 * oy + r22 * oz)
                dl = (r00 * dx + r10 * dy + r20 * dz,
                      r01 * dx + r11 * dy + r21 * dz,
                      r02 * dx + r12 * dy + r22 * dz)
                if kind == assets.BOX:
                    enter = None
                    exit_ = None
                    for axn in range(3):
                        h = prm[axn]
                        ri = 1.0 / jnp.where(jnp.abs(dl[axn]) < _EPS, _EPS,
                                             dl[axn])
                        t1 = (-h - ol[axn]) * ri
                        t2 = (h - ol[axn]) * ri
                        lo = jnp.minimum(t1, t2)
                        hi = jnp.maximum(t1, t2)
                        enter = lo if enter is None else jnp.maximum(enter, lo)
                        exit_ = hi if exit_ is None else jnp.minimum(exit_, hi)
                    best = merge(best, enter, (exit_ >= enter) & (exit_ > 0),
                                 code)
                else:  # CYLINDER in a general frame (solid, z-slab form)
                    r, hh = prm[0], prm[1]
                    a2l = dl[0] * dl[0] + dl[1] * dl[1]
                    b2 = ol[0] * dl[0] + ol[1] * dl[1]
                    c2 = ol[0] * ol[0] + ol[1] * ol[1] - r * r
                    a2_safe = jnp.maximum(a2l, _EPS)
                    disc = b2 * b2 - a2_safe * c2
                    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                    ra2l = 1.0 / a2_safe
                    q_lo = (-b2 - sq) * ra2l
                    q_hi = (-b2 + sq) * ra2l
                    dzl = jnp.where(jnp.abs(dl[2]) < _EPS, _EPS, dl[2])
                    rdzl = 1.0 / dzl
                    tz1 = (-hh - ol[2]) * rdzl
                    tz2 = (hh - ol[2]) * rdzl
                    z_lo = jnp.minimum(tz1, tz2)
                    z_hi = jnp.maximum(tz1, tz2)
                    deg = a2l < _EPS
                    enter = jnp.where(deg, z_lo, jnp.maximum(q_lo, z_lo))
                    exit_ = jnp.where(deg, z_hi, jnp.minimum(q_hi, z_hi))
                    # (bool-valued jnp.where trips Mosaic's i8->i1
                    # truncation; pure logical ops lower fine)
                    ok = ((deg & (c2 < 0)) | (~deg & (disc > 0))) \
                        & (enter <= exit_) & (exit_ > 0)
                    best = merge(best, enter, ok, code)

        acc = bests
        while len(acc) > 1:  # pairwise tree merge
            acc = [jnp.minimum(a, b) for a, b in zip(acc[::2], acc[1::2])] \
                + ([acc[-1]] if len(acc) % 2 else [])
        out_ref[:] = acc[0]

    P = len(prim_inst)

    def sweep(world, cam_pos: Array, M: Array) -> Array:
        f32 = jnp.float32
        B = jnp.einsum("ij,kj->ik", M.astype(f32),
                       cam_mod.R_PINHOLE_FROM_CAM.astype(f32),
                       precision=jax.lax.Precision.HIGHEST)
        par = jnp.zeros((1, _N_PAR), f32)
        vals = jnp.concatenate([
            B.reshape(-1),
            jnp.stack([jnp.asarray(intr.cx, f32), jnp.asarray(intr.cy, f32),
                       jnp.asarray(intr.fx, f32), jnp.asarray(intr.fy, f32)]),
            cam_pos.astype(f32),
        ])
        par = par.at[0, : vals.shape[0]].set(vals)
        prim = jnp.concatenate(
            [world["prim_pos"].astype(f32),
             world["prim_rot"].reshape(P, 9).astype(f32)], axis=1)  # (P, 12)
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
            grid=(H // hb,),
            in_specs=[
                pl.BlockSpec((1, _N_PAR), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((P, 12), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((hb, W), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(par, prim)
        return out.reshape(H * W)

    return sweep
