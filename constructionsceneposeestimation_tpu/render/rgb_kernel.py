"""Fused RGB epilogue as ONE Pallas TPU kernel.

The jnp RGB tier (annotate.render_frame's shading block: screen-space
normals, procedural patterns, contact AO, Lambert shade, gamma, u8 pack)
costs ~26 ms of an ~80 ms 128-frame batch at 512^2 — ~2% of VPU peak. A
round-4 sub-stage ablation (benchmarks/roofline.py --rgb-fine) showed the
cost is NOT additive: removing individual sub-stages makes the program
SLOWER (XLA re-fuses around the removal and re-computes whole DAGs per
fusion root; only the explicit optimization_barrier keeps it at 26 ms, and
removing THAT costs +43 ms). The tier is fusion-structure-bound, not
op-bound — so this kernel takes the whole epilogue out of XLA's hands:

* one pass over pixel blocks, everything live in VMEM/registers;
* HBM traffic per pixel: read t (4 B), row-shifted t (4 B), the 16-row
  per-pixel table (64 B), write 3 u8 — ~75 B vs the jnp tier's many
  materialized plane round-trips;
* ray directions are recomputed IN-KERNEL from the pixel iota + the
  camera matrix (9+4 scalars in SMEM) instead of reading 3 planes;
* screen-space normals: column differences via an in-block lane roll
  (exact: jnp.diff zero-pads the last column; we mask it), row differences
  via the GLOBALLY row-shifted t input (seam-free across blocks — a +1 row
  halo is not expressible as a Pallas block offset, a shifted copy is);
* the procedural pattern chain calls the SAME shading.procedural_albedo /
  _hash_noise / _gamma22 jnp code the reference path uses — one source of
  truth for the sim-to-real patterns (reference materials:
  generate_construction_data.py:1282-1345);
* contact AO loops over the small per-frame instance table in SMEM.

Numerics: everything in f32, formulas identical to the jnp tier; the only
intended divergences are rsqrt-based ray/normal normalization (the jnp path
divides by the norm) and fused madd ordering — sub-u8 in RGB.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import camera as cam_mod
from . import shading as sh

Array = jax.Array

_N_PAR = 32  # padded scalar-parameter row


def _rgb_kernel(par_ref, ao_ref, t_ref, tn_ref, tab_ref, out_ref, *,
                hb: int, w: int, h: int, n_ao: int):
    f32 = jnp.float32
    p = lambda k: par_ref[0, k]
    b00, b01, b02 = p(0), p(1), p(2)
    b10, b11, b12 = p(3), p(4), p(5)
    b20, b21, b22 = p(6), p(7), p(8)
    cx, cy, fx, fy = p(9), p(10), p(11), p(12)
    ox, oy, oz = p(13), p(14), p(15)
    sdx, sdy, sdz = p(16), p(17), p(18)
    sun_i, dome_i = p(19), p(20)
    dome_r, dome_g, dome_b = p(21), p(22), p(23)
    tex_phase, tex_strength, dirt = p(24), p(25), p(26)

    row_i = jax.lax.broadcasted_iota(jnp.int32, (hb, w), 0) \
        + pl.program_id(0) * hb
    col_i = jax.lax.broadcasted_iota(jnp.int32, (hb, w), 1)
    xf = (col_i.astype(f32) - cx) / fx

    def ray_dir(rowf):
        """Unit world ray through pixel (row, col) — cam_mod.pixel_rays
        with B = M @ R_PINHOLE_FROM_CAM^T folded into 9 scalars."""
        y = (rowf - cy) / fy
        rx = b00 * xf + b01 * y + b02
        ry = b10 * xf + b11 * y + b12
        rz = b20 * xf + b21 * y + b22
        inv = jax.lax.rsqrt(rx * rx + ry * ry + rz * rz)
        return rx * inv, ry * inv, rz * inv

    rdx, rdy, rdz = ray_dir(row_i.astype(f32))
    t = t_ref[:]
    is_hit = jnp.isfinite(t)
    t_safe = jnp.where(is_hit, t, 0.0)
    pwx = ox + t_safe * rdx
    pwy = oy + t_safe * rdy
    pwz = oz + t_safe * rdz

    # Next-row hit positions from the row-shifted t (edge row duplicated by
    # the caller, matching jnp.diff append semantics -> dy = 0 there).
    ndx, ndy_, ndz = ray_dir((row_i + 1).astype(f32))
    tn = tn_ref[:]
    tn_safe = jnp.where(jnp.isfinite(tn), tn, 0.0)
    last_row = row_i == (h - 1)
    dyx = jnp.where(last_row, 0.0, (ox + tn_safe * ndx) - pwx)
    dyy = jnp.where(last_row, 0.0, (oy + tn_safe * ndy_) - pwy)
    dyz = jnp.where(last_row, 0.0, (oz + tn_safe * ndz) - pwz)

    # Next-col differences via a lane roll; jnp.diff(..., append=last col)
    # semantics = zero at the last column.
    last_col = col_i == (w - 1)
    # pltpu.roll needs a non-negative shift: w-1 == -1 circularly.
    dcol = lambda q: jnp.where(last_col, 0.0, pltpu.roll(q, w - 1, 1) - q)
    dxx, dxy, dxz = dcol(pwx), dcol(pwy), dcol(pwz)

    # n = dy x dx, normalized, flipped toward the camera
    # (shading.screen_space_normals).
    nx = dyy * dxz - dyz * dxy
    ny = dyz * dxx - dyx * dxz
    nz = dyx * dxy - dyy * dxx
    inv = jax.lax.rsqrt(jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-18))
    sgn = jnp.where((nx * rdx + ny * rdy + nz * rdz) * inv > 0, -inv, inv)
    nx, ny, nz = nx * sgn, ny * sgn, nz * sgn

    # Per-pixel table rows (the one-hot MXU contraction stays outside;
    # the planes arrive bf16 to halve their HBM cost — compute is f32).
    tab = lambda k: tab_ref[k].astype(f32)
    albedo = (tab(0), tab(1), tab(2))
    dxw = pwx - tab(12)
    dyw = pwy - tab(13)
    dzw = pwz - tab(14)
    lx = tab(3) * dxw + tab(6) * dyw + tab(9) * dzw
    ly = tab(4) * dxw + tab(7) * dyw + tab(10) * dzw
    lz = tab(5) * dxw + tab(8) * dyw + tab(11) * dzw
    cls = tab(15)
    lighting = sh.Lighting(sun_dir=0.0, sun_intensity=sun_i,
                           dome_intensity=dome_i, dome_color=0.0,
                           tex_phase=tex_phase, tex_strength=tex_strength,
                           dirt=dirt)
    albedo = sh.procedural_albedo(albedo, lx, ly, lz, cls, lighting)

    # Contact AO on ground pixels (annotate.render_frame's (A, N) chain).
    prox = jnp.ones_like(pwx)
    for a in range(n_ao):
        dxa = pwx - ao_ref[a, 0]
        dya = pwy - ao_ref[a, 1]
        d = jnp.sqrt(dxa * dxa + dya * dya)
        prox = jnp.minimum(prox, jnp.clip((d - ao_ref[a, 2]) / 0.6, 0.0, 1.0))
    ao = jnp.where(cls == -1.0, 0.45 + 0.55 * prox, 1.0)

    # Lambert shade under dome + sun (shading.shade, f32, no shadows).
    tex = 1.0 + 0.15 * tex_strength \
        * (sh._hash_noise(pwx, pwy, pwz) - 0.5) * 2.0
    ndotl = jnp.maximum(-(nx * sdx + ny * sdy + nz * sdz), 0.0)
    direct = sun_i * ndotl
    ambient = dome_i * (0.25 + 0.35 * (0.5 * (1.0 + nz))) * ao
    sky_base = (0.85 + 0.15 * jnp.clip(rdz, 0.0, 1.0)) \
        * jnp.maximum(dome_i, 0.3)
    for ch, (alb, dc) in enumerate(zip(albedo, (dome_r, dome_g, dome_b))):
        color = (alb * tex) * (direct + ambient * dc)
        color = jnp.where(is_hit, color, dc * sky_base)
        u8 = jnp.round(sh._gamma22(jnp.clip(color, 0.0, 1.0)) * 255.0)
        # Mosaic has no f32->u8 cast; round-trip through int32.
        out_ref[ch] = u8.astype(jnp.int32).astype(jnp.uint8)


def supported(height: int, width: int) -> bool:
    """The kernel needs a row-block that divides H (Pallas blocks can't
    ragged-pad the image) and a lane-friendly width."""
    return height % 8 == 0 and width >= 8


def _pick_hb(height: int) -> int:
    for hb in (64, 32, 16, 8):
        if height % hb == 0:
            return hb
    raise ValueError(height)


def fused_rgb(
    t: Array,  # (H, W) f32 hit distance, +inf on miss/clip
    px_tab: Array,  # (16, H*W) f32/bf16 per-pixel table rows (annotate layout)
    cam_pos: Array,  # (3,)
    M: Array,  # (3, 3) look_at matrix
    intr: cam_mod.Intrinsics,
    lighting: sh.Lighting,
    ao_pos: Array,  # (A, 2) instance xy
    ao_foot_r: Array,  # (A,)
    interpret: bool = False,
) -> Array:
    """Fused RGB epilogue -> (H, W, 3) uint8. See module docstring."""
    H, W = intr.height, intr.width
    hb = _pick_hb(H)
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
        lighting.sun_dir.astype(f32),
        jnp.stack([jnp.asarray(lighting.sun_intensity, f32),
                   jnp.asarray(lighting.dome_intensity, f32)]),
        lighting.dome_color.astype(f32),
        jnp.stack([jnp.asarray(lighting.tex_phase, f32),
                   jnp.asarray(lighting.tex_strength, f32),
                   jnp.asarray(lighting.dirt, f32)]),
    ])
    par = par.at[0, : vals.shape[0]].set(vals)

    ao_tab = jnp.concatenate(
        [ao_pos.astype(f32), ao_foot_r[:, None].astype(f32),
         jnp.zeros((ao_pos.shape[0], 1), f32)], axis=1)  # (A, 4)

    t2 = t.reshape(H, W)
    t_next = jnp.concatenate([t2[1:], t2[-1:]], axis=0)
    tab3 = px_tab.reshape(16, H, W)

    kernel = functools.partial(_rgb_kernel, hb=hb, w=W, h=H,
                               n_ao=int(ao_pos.shape[0]))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((3, H, W), jnp.uint8),
        grid=(H // hb,),
        in_specs=[
            pl.BlockSpec((1, _N_PAR), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(ao_tab.shape, lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((hb, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hb, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, hb, W), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, hb, W), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(par, ao_tab, t2, t_next, tab3)
    return jnp.transpose(out, (1, 2, 0))
