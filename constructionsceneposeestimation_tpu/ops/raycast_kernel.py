"""Pallas TPU kernel for the packed ray-primitive sweep.

The XLA sweep (render/raycast._sweep_packed) materializes (P, N) planes in
HBM per primitive group — bandwidth-bound at ~4.5 ms per 512x512 frame. This
kernel holds one (8, 128) ray tile in VMEM/registers and loops primitives as
scalars from SMEM, so HBM traffic is exactly rays-in + packed-result-out:

  per tile:   best = min over prims of pack(t_prim, code_prim)
  dispatch:   static Python loop over kind groups (prims pre-sorted by kind)
              -> no per-prim branching inside the loop body

The payload packing matches render/raycast (_pack): low 6 mantissa bits of t
carry instance id + 2, so one f32 min yields depth AND instance.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

INF = 1e10  # python float: jnp scalars become captured consts in pallas kernels
EPS = 1e-7
_PAYLOAD_BITS = 6
_PAYLOAD_MASK = (1 << _PAYLOAD_BITS) - 1

# Kind ids (scene/assets.py).
PLANE, SPHERE, BOX, CYLINDER, CONE, CAPSULE = 0, 1, 2, 3, 4, 5


def _valid_t(t, cond):
    return jnp.where(cond & (t > EPS), t, INF)


def _t_plane(ox, oy, oz, dx, dy, dz, p):
    dz_s = jnp.where(jnp.abs(dz) < EPS, EPS, dz)
    t = -oz / dz_s
    return _valid_t(t, jnp.abs(dz) >= EPS)


def _t_sphere(ox, oy, oz, dx, dy, dz, p):
    r = p[0]
    a = dx * dx + dy * dy + dz * dz
    b = ox * dx + oy * dy + oz * dz
    c = ox * ox + oy * oy + oz * oz - r * r
    a_s = jnp.maximum(a, EPS)
    disc = b * b - a_s * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    return _valid_t((-b - sq) / a_s, disc > 0)


def _t_box(ox, oy, oz, dx, dy, dz, p):
    tmin = jnp.full_like(dx, -INF)
    tmax = jnp.full_like(dx, INF)
    for h, o_c, d_c in ((p[0], ox, dx), (p[1], oy, dy), (p[2], oz, dz)):
        inv = 1.0 / jnp.where(jnp.abs(d_c) < EPS, EPS, d_c)
        t1 = (-h - o_c) * inv
        t2 = (h - o_c) * inv
        tmin = jnp.maximum(tmin, jnp.minimum(t1, t2))
        tmax = jnp.minimum(tmax, jnp.maximum(t1, t2))
    return _valid_t(tmin, (tmax >= tmin) & (tmax > 0))


def _t_cylinder(ox, oy, oz, dx, dy, dz, p):
    r, hh = p[0], p[1]
    a = dx * dx + dy * dy
    b = ox * dx + oy * dy
    c = ox * ox + oy * oy - r * r
    a_s = jnp.where(a < EPS, EPS, a)
    disc = b * b - a_s * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_side = (-b - sq) / a_s
    z_side = oz + t_side * dz
    best = _valid_t(t_side, (disc > 0) & (jnp.abs(z_side) <= hh) & (a >= EPS))
    dz_s = jnp.where(jnp.abs(dz) < EPS, EPS, dz)
    for sign in (-1.0, 1.0):
        t_c = (sign * hh - oz) / dz_s
        x = ox + t_c * dx
        y = oy + t_c * dy
        best = jnp.minimum(best, _valid_t(t_c, x * x + y * y <= r * r))
    return best


def _t_cone(ox, oy, oz, dx, dy, dz, p):
    rb, rt, hh = p[0], p[1], p[2]
    k = (rt - rb) / (2.0 * hh)
    q = rb + k * (oz + hh)
    m = k * dz
    a = dx * dx + dy * dy - m * m
    b = ox * dx + oy * dy - q * m
    c = ox * ox + oy * oy - q * q
    a_s = jnp.where(jnp.abs(a) < EPS, EPS, a)
    disc = b * b - a_s * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t1 = (-b - sq) / a_s
    t2 = (-b + sq) / a_s
    t_lo = jnp.minimum(t1, t2)
    t_hi = jnp.maximum(t1, t2)

    def ok(t):
        z = oz + t * dz
        return (disc > 0) & (jnp.abs(z) <= hh) & (q + m * t > 0)

    t_side = jnp.where(ok(t_lo), t_lo, jnp.where(ok(t_hi), t_hi, INF))
    best = jnp.where(t_side > EPS, t_side, INF)
    dz_s = jnp.where(jnp.abs(dz) < EPS, EPS, dz)
    for sign, rr in ((-1.0, rb), (1.0, rt)):
        t_c = (sign * hh - oz) / dz_s
        x = ox + t_c * dx
        y = oy + t_c * dy
        best = jnp.minimum(best, _valid_t(t_c, x * x + y * y <= rr * rr))
    return best


def _t_capsule(ox, oy, oz, dx, dy, dz, p):
    r = p[0]
    hh = p[1]
    best = _t_cylinder(ox, oy, oz, dx, dy, dz, p)
    a = dx * dx + dy * dy + dz * dz
    a_s = jnp.maximum(a, EPS)
    for sign in (-1.0, 1.0):
        ocz = oz - sign * hh
        b = ox * dx + oy * dy + ocz * dz
        c = ox * ox + oy * oy + ocz * ocz - r * r
        disc = b * b - a_s * c
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        best = jnp.minimum(best, _valid_t((-b - sq) / a_s, disc > 0))
    return best


_KIND_FNS = {PLANE: _t_plane, SPHERE: _t_sphere, BOX: _t_box,
             CYLINDER: _t_cylinder, CONE: _t_cone, CAPSULE: _t_capsule}


def _sweep_kernel(ol_ref, rot_ref, par_ref, code_ref, cen_ref, rad_ref,
                  dx_ref, dy_ref, dz_ref, out_ref, *, kind_ranges):
    dx = dx_ref[0]
    dy = dy_ref[0]
    dz = dz_ref[0]
    best = jnp.full(dx.shape, INF)

    # Per-tile view cone: axis = mean ray direction, half-angle from the
    # widest ray. A primitive whose bounding sphere lies outside the cone
    # cannot intersect any ray of this tile -> skipped with a scalar test
    # (typical scene tiles see <25% of primitives).
    sx = jnp.sum(dx)
    sy = jnp.sum(dy)
    sz = jnp.sum(dz)
    s_inv = jax.lax.rsqrt(jnp.maximum(sx * sx + sy * sy + sz * sz, 1e-20))
    ax = sx * s_inv
    ay = sy * s_inv
    az = sz * s_inv
    d_inv = jax.lax.rsqrt(jnp.maximum(dx * dx + dy * dy + dz * dz, 1e-20))
    cos_half = jnp.min((dx * ax + dy * ay + dz * az) * d_inv)
    sin_half = jnp.sqrt(jnp.maximum(1.0 - cos_half * cos_half, 0.0))
    cull_ok = cos_half > 0.0  # cone wider than a hemisphere: never skip

    for kind, (p0, p1) in kind_ranges:
        fn = _KIND_FNS[kind]

        def body(p, best, fn=fn):
            cx = cen_ref[0, 0, p * 3 + 0]
            cy = cen_ref[0, 0, p * 3 + 1]
            cz = cen_ref[0, 0, p * 3 + 2]
            rp = rad_ref[0, 0, p]
            dist2 = cx * cx + cy * cy + cz * cz
            outside = dist2 > rp * rp
            inv_d = jax.lax.rsqrt(jnp.maximum(dist2, 1e-20))
            cos_c = (cx * ax + cy * ay + cz * az) * inv_d
            sin_p = jnp.minimum(rp * inv_d, 1.0)
            cos_p = jnp.sqrt(jnp.maximum(1.0 - sin_p * sin_p, 0.0))
            cos_sum = cos_half * cos_p - sin_half * sin_p  # cos(half + prim)
            skip = cull_ok & outside & (cos_sum > 0.0) & (cos_c < cos_sum)

            def hit_prim(best):
                # Local-frame transform, per-prim scalars: dl_i = R[j,i] d_j.
                r = [rot_ref[0, 0, p * 9 + j] for j in range(9)]
                dlx = r[0] * dx + r[3] * dy + r[6] * dz
                dly = r[1] * dx + r[4] * dy + r[7] * dz
                dlz = r[2] * dx + r[5] * dy + r[8] * dz
                olx = ol_ref[0, 0, p * 3 + 0]
                oly = ol_ref[0, 0, p * 3 + 1]
                olz = ol_ref[0, 0, p * 3 + 2]
                pp = [par_ref[0, 0, p * 4 + j] for j in range(4)]
                t = fn(olx, oly, olz, dlx, dly, dlz, pp)
                bits = pltpu.bitcast(t, jnp.int32)
                bits = jnp.bitwise_or(jnp.bitwise_and(bits, ~_PAYLOAD_MASK),
                                      code_ref[0, 0, p])
                return jnp.minimum(best, pltpu.bitcast(bits, jnp.float32))

            return jax.lax.cond(skip, lambda b: b, hit_prim, best)

        best = jax.lax.fori_loop(p0, p1, body, best)

    out_ref[0] = best


def bounding_radius(kind: np.ndarray, params: np.ndarray) -> np.ndarray:
    """Host-side conservative bounding-sphere radius per primitive (for the
    kernel's cone culling). Plane: effectively unbounded."""
    r = np.zeros(kind.shape[0], np.float32)
    for i, (k, p) in enumerate(zip(kind, params)):
        if k == PLANE:
            r[i] = 1e9
        elif k == SPHERE:
            r[i] = p[0]
        elif k == BOX:
            r[i] = float(np.linalg.norm(p[:3]))
        elif k == CYLINDER:
            r[i] = float(np.hypot(p[0], p[1]))
        elif k == CONE:
            r[i] = float(np.hypot(max(p[0], p[1]), p[2]))
        elif k == CAPSULE:
            r[i] = float(p[0] + p[1])
    return r


def sweep_packed_pallas(
    ol: Array,  # (B, P, 3) local ray origins (R^T (o - pos)) per prim
    rot: Array,  # (B, P, 3, 3) world-from-local rotations
    params: Array,  # (P, 4)
    codes: Array,  # (P,) int32 payload (inst + 2)
    ray_d: Array,  # (B, N, 3)
    kind_of_prim: np.ndarray,  # (P,) host-side kinds, pre-sorted by kind
    center_rel: Array,  # (B, P, 3) prim world centers relative to the origin
    radii: Array,  # (P,) bounding-sphere radii (bounding_radius)
    tile_rows: int = 32,
) -> Tuple[Array, Array]:
    """Returns (t (B, N), code (B, N)); N must be a multiple of 128*tile_rows."""
    B, P = ol.shape[0], ol.shape[1]
    N = ray_d.shape[1]
    lanes = 128
    rows = N // lanes
    assert rows % tile_rows == 0, f"N={N} must tile into ({tile_rows},{lanes})"

    # Static contiguous kind ranges (prims must be pre-sorted by kind).
    kinds = np.asarray(kind_of_prim)
    assert (np.diff(kinds) >= 0).all(), "prims must be sorted by kind"
    kind_ranges = []
    for k in np.unique(kinds):
        idx = np.nonzero(kinds == k)[0]
        kind_ranges.append((int(k), (int(idx[0]), int(idx[-1]) + 1)))

    ol_f = ol.reshape(B, 1, P * 3)
    rot_f = rot.reshape(B, 1, P * 9)
    par_f = jnp.broadcast_to(params.reshape(1, 1, P * 4), (B, 1, P * 4))
    code_f = jnp.broadcast_to(codes.reshape(1, 1, P), (B, 1, P)).astype(jnp.int32)
    cen_f = center_rel.reshape(B, 1, P * 3)
    rad_f = jnp.broadcast_to(radii.reshape(1, 1, P), (B, 1, P)).astype(jnp.float32)
    d = ray_d.reshape(B, rows, lanes, 3)
    dx = d[..., 0]
    dy = d[..., 1]
    dz = d[..., 2]

    grid = (B, rows // tile_rows)
    smem = lambda n: pl.BlockSpec((1, 1, n), lambda b, i: (b, 0, 0),
                                  memory_space=pltpu.SMEM)
    vtile = pl.BlockSpec((1, tile_rows, lanes), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM)
    kernel = functools.partial(_sweep_kernel, kind_ranges=kind_ranges)
    packed = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, rows, lanes), jnp.float32),
        grid=grid,
        in_specs=[smem(P * 3), smem(P * 9), smem(P * 4), smem(P),
                  smem(P * 3), smem(P), vtile, vtile, vtile],
        out_specs=vtile,
    )(ol_f, rot_f, par_f, code_f, cen_f, rad_f, dx, dy, dz)

    bits = jax.lax.bitcast_convert_type(packed.reshape(B, N), jnp.int32)
    t = jax.lax.bitcast_convert_type(
        jnp.bitwise_and(bits, ~_PAYLOAD_MASK), jnp.float32)
    code = jnp.bitwise_and(bits, _PAYLOAD_MASK)
    return t, jnp.where(t < INF * 0.99, code, 0)
