"""Batched analytic ray-casting (pure JAX; the TPU replacement for the
reference's Isaac RTX renderer + annotators).

Every scene object is a set of closed-form primitives (scene/assets.py), so a
"render" is a dense [prims x rays] intersection sweep with static shapes — no
BVH, no divergent control flow, fully fusible by XLA and trivially batchable
over frames. Primitives are grouped by kind host-side (static index sets from
the roster) so each kind's formula runs vectorized over exactly its own
primitives.

Performance notes (v5e measurements):
* Structure-of-arrays layout in ``(P, N)`` planes — primitives on sublanes,
  rays on lanes — instead of ``(N, P, 3)`` vectors: trailing-dim-3 tensors
  tile terribly on the (8, 128) VPU and cost ~5x.
* All quadratics stay valid for UNNORMALIZED directions (``a != 1``):
  occlusion queries cast raw segments.
* f32 throughout: bf16 would put centimeters of noise into depth labels.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..scene import assets, world as world_mod

Array = jax.Array
_einsum = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)

INF = np.float32(1e10)  # numpy: no backend init at import
EPS = 1e-7

# Component triples: o = (ox, oy, oz) with shape (P, 1); d likewise (P, N).
Vec3 = Tuple[Array, Array, Array]


def _to_local_soa(ray_o: Array, ray_d: Array, rot: Array, pos: Array):
    """Shared origin (3,) + rays (N, 3) x prims (P, 3, 3)/(P, 3) ->
    (ol (P, 1) components, dl (P, N) components)."""
    rel = ray_o[None, :] - pos  # (P, 3)
    ol = _einsum("pji,pj->pi", rot, rel)  # (P, 3) tiny
    olx, oly, olz = ol[:, 0:1], ol[:, 1:2], ol[:, 2:3]
    d0, d1, d2 = ray_d[:, 0], ray_d[:, 1], ray_d[:, 2]
    # dl_i[p, n] = sum_j rot[p, j, i] * d[n, j]
    def comp(i):
        return (rot[:, 0, i, None] * d0[None, :]
                + rot[:, 1, i, None] * d1[None, :]
                + rot[:, 2, i, None] * d2[None, :])
    return (olx, oly, olz), (comp(0), comp(1), comp(2))


def _valid_t(t, cond):
    return jnp.where(cond & (t > EPS), t, INF)


def _plane_t(o: Vec3, d: Vec3, params):
    dz = d[2]
    t = -o[2] / jnp.where(jnp.abs(dz) < EPS, EPS, dz)
    return _valid_t(t, jnp.abs(dz) >= EPS)


def _sphere_t(o: Vec3, d: Vec3, params):
    r = params[:, 0:1]
    a = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
    b = o[0] * d[0] + o[1] * d[1] + o[2] * d[2]
    c = o[0] * o[0] + o[1] * o[1] + o[2] * o[2] - r * r
    a_safe = jnp.maximum(a, EPS)
    disc = b * b - a_safe * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    return _valid_t((-b - sq) / a_safe, disc > 0)


def _box_t(o: Vec3, d: Vec3, params):
    tmin = jnp.full_like(d[0], -INF)
    tmax = jnp.full_like(d[0], INF)
    for ax in range(3):
        h = params[:, ax:ax + 1]
        inv = 1.0 / jnp.where(jnp.abs(d[ax]) < EPS, EPS, d[ax])
        t1 = (-h - o[ax]) * inv
        t2 = (h - o[ax]) * inv
        tmin = jnp.maximum(tmin, jnp.minimum(t1, t2))
        tmax = jnp.minimum(tmax, jnp.maximum(t1, t2))
    return _valid_t(tmin, (tmax >= tmin) & (tmax > 0))


def _cylinder_t(o: Vec3, d: Vec3, params):
    r, hh = params[:, 0:1], params[:, 1:2]
    a = d[0] * d[0] + d[1] * d[1]
    b = o[0] * d[0] + o[1] * d[1]
    c = o[0] * o[0] + o[1] * o[1] - r * r
    a_safe = jnp.where(a < EPS, EPS, a)
    disc = b * b - a_safe * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_side = (-b - sq) / a_safe
    z_side = o[2] + t_side * d[2]
    t_best = _valid_t(t_side, (disc > 0) & (jnp.abs(z_side) <= hh) & (a >= EPS))
    dz = jnp.where(jnp.abs(d[2]) < EPS, EPS, d[2])
    for sign in (-1.0, 1.0):
        t_c = (sign * hh - o[2]) / dz
        x = o[0] + t_c * d[0]
        y = o[1] + t_c * d[1]
        t_best = jnp.minimum(t_best, _valid_t(t_c, x * x + y * y <= r * r))
    return t_best


def _cone_t(o: Vec3, d: Vec3, params):
    rb, rt, hh = params[:, 0:1], params[:, 1:2], params[:, 2:3]
    k = (rt - rb) / (2.0 * hh)
    q = rb + k * (o[2] + hh)
    m = k * d[2]
    a = d[0] * d[0] + d[1] * d[1] - m * m
    b = o[0] * d[0] + o[1] * d[1] - q * m
    c = o[0] * o[0] + o[1] * o[1] - q * q
    a_safe = jnp.where(jnp.abs(a) < EPS, EPS, a)
    disc = b * b - a_safe * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t1 = (-b - sq) / a_safe
    t2 = (-b + sq) / a_safe
    t_lo = jnp.minimum(t1, t2)
    t_hi = jnp.maximum(t1, t2)

    def side_ok(t):
        z = o[2] + t * d[2]
        rad = q + m * t
        return (disc > 0) & (jnp.abs(z) <= hh) & (rad > 0)

    t_side = jnp.where(side_ok(t_lo), t_lo, jnp.where(side_ok(t_hi), t_hi, INF))
    t_best = jnp.where(t_side > EPS, t_side, INF)
    dz = jnp.where(jnp.abs(d[2]) < EPS, EPS, d[2])
    for sign, rr in ((-1.0, rb), (1.0, rt)):
        t_c = (sign * hh - o[2]) / dz
        x = o[0] + t_c * d[0]
        y = o[1] + t_c * d[1]
        t_best = jnp.minimum(t_best, _valid_t(t_c, x * x + y * y <= rr * rr))
    return t_best


def _capsule_t(o: Vec3, d: Vec3, params):
    # Side tube + two end balls. The flat cap discs of the generic cylinder
    # test are strictly inside the closed end balls (|xy| <= r at z = +-hh is
    # within distance r of the ball center), so a ray always crosses the ball
    # boundary first — the discs can never be the nearest hit and are skipped.
    r, hh = params[:, 0:1], params[:, 1:2]
    a2 = d[0] * d[0] + d[1] * d[1]
    b2 = o[0] * d[0] + o[1] * d[1]
    c2 = o[0] * o[0] + o[1] * o[1] - r * r
    a2_safe = jnp.where(a2 < EPS, EPS, a2)
    disc2 = b2 * b2 - a2_safe * c2
    sq2 = jnp.sqrt(jnp.maximum(disc2, 0.0))
    t_side = (-b2 - sq2) / a2_safe
    z_side = o[2] + t_side * d[2]
    t_best = _valid_t(t_side, (disc2 > 0) & (jnp.abs(z_side) <= hh)
                      & (a2 >= EPS))
    a = a2 + d[2] * d[2]
    a_safe = jnp.maximum(a, EPS)
    for sign in (-1.0, 1.0):
        ocz = o[2] - sign * hh
        b = b2 + ocz * d[2]
        c = c2 + ocz * ocz
        disc = b * b - a_safe * c
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t_best = jnp.minimum(t_best, _valid_t((-b - sq) / a_safe, disc > 0))
    return t_best


_KIND_FNS = {
    assets.PLANE: _plane_t,
    assets.SPHERE: _sphere_t,
    assets.BOX: _box_t,
    assets.CYLINDER: _cylinder_t,
    assets.CONE: _cone_t,
    assets.CAPSULE: _capsule_t,
}


def _sweep(groups, prim_rot, prim_pos, prim_params, ray_o, ray_d,
           exclude_inst=None, prim_inst=None):
    """Min-t sweep over all primitive groups. Returns (t (N,), idx (N,))."""
    n = ray_d.shape[0]
    t_best = jnp.full(n, INF)
    idx_best = jnp.full(n, -1, jnp.int32)
    for kind, idx in groups:
        o, d = _to_local_soa(ray_o, ray_d, prim_rot[idx], prim_pos[idx])
        t = _KIND_FNS[kind](o, d, prim_params[idx])  # (g, N)
        if exclude_inst is not None:
            same = prim_inst[idx][:, None] == exclude_inst[None, :]
            t = jnp.where(same, INF, t)
        g_min = jnp.min(t, axis=0)
        g_arg = jnp.argmin(t, axis=0)
        better = g_min < t_best
        t_best = jnp.where(better, g_min, t_best)
        idx_best = jnp.where(better, jnp.asarray(idx, jnp.int32)[g_arg], idx_best)
    return t_best, idx_best


# --- packed fast path -------------------------------------------------------
# The argmin + per-ray gathers of the generic sweep cost ~10x the sweep
# itself on TPU. Fast path: steal the low 6 mantissa bits of t for an id
# payload (instance id + 2), so ONE min-reduction yields both depth and
# instance — no argmin, no gathers. Relative depth error <= 2^-18 (~4 um at
# 1 m); positive-float IEEE ordering makes the packed min exact.

_PAYLOAD_BITS = 6
_PAYLOAD_MASK = (1 << _PAYLOAD_BITS) - 1


def _pack(t: Array, code: Array) -> Array:
    bits = jax.lax.bitcast_convert_type(t, jnp.int32)
    bits = jnp.bitwise_or(jnp.bitwise_and(bits, ~_PAYLOAD_MASK), code)
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


def _unpack(packed: Array):
    bits = jax.lax.bitcast_convert_type(packed, jnp.int32)
    t = jax.lax.bitcast_convert_type(jnp.bitwise_and(bits, ~_PAYLOAD_MASK), jnp.float32)
    return t, jnp.bitwise_and(bits, _PAYLOAD_MASK)


def _to_local_soa_multi(ray_o: Array, ray_d: Array, rot: Array, pos: Array):
    """Per-ray origins variant: both o and d become (P, N) component planes
    (2x the transform cost of the shared-origin path; used by shadow rays)."""
    rel = (ray_o[:, 0][None, :] - pos[:, 0][:, None],
           ray_o[:, 1][None, :] - pos[:, 1][:, None],
           ray_o[:, 2][None, :] - pos[:, 2][:, None])
    d = (ray_d[:, 0], ray_d[:, 1], ray_d[:, 2])

    def comp(v, i, per_ray):
        if per_ray:
            return (rot[:, 0, i, None] * v[0] + rot[:, 1, i, None] * v[1]
                    + rot[:, 2, i, None] * v[2])
        return (rot[:, 0, i, None] * v[0][None, :] + rot[:, 1, i, None] * v[1][None, :]
                + rot[:, 2, i, None] * v[2][None, :])

    ol = tuple(comp(rel, i, True) for i in range(3))
    dl = tuple(comp(d, i, False) for i in range(3))
    return ol, dl


def _sweep_packed_multi(groups, prim_rot, prim_pos, prim_params, prim_codes,
                        ray_o, ray_d):
    """Packed sweep with per-ray origins (N, 3)."""
    n = ray_d.shape[0]
    best = jnp.full(n, INF)
    for kind, idx in groups:
        o, d = _to_local_soa_multi(ray_o, ray_d, prim_rot[idx], prim_pos[idx])
        t = _KIND_FNS[kind](o, d, prim_params[idx])
        packed = _pack(t, prim_codes[idx][:, None])
        best = jnp.minimum(best, jnp.min(packed, axis=0))
    t, code = _unpack(best)
    return t, jnp.where(t < INF * 0.99, code, 0)


def _sweep_packed(groups, prim_rot, prim_pos, prim_params, prim_codes,
                  ray_o, ray_d):
    """Returns (t (N,), code (N,)) — code is the per-prim payload (inst + 2)
    of the nearest hit, 0 when the ray misses everything."""
    n = ray_d.shape[0]
    best = jnp.full(n, INF)
    for kind, idx in groups:
        o, d = _to_local_soa(ray_o, ray_d, prim_rot[idx], prim_pos[idx])
        t = _KIND_FNS[kind](o, d, prim_params[idx])  # (g, N)
        packed = _pack(t, prim_codes[idx][:, None])
        best = jnp.minimum(best, jnp.min(packed, axis=0))
    t, code = _unpack(best)
    return t, jnp.where(t < INF * 0.99, code, 0)


def _local_normal(kind, ol, dl, t, params):
    """Outward local-frame normal at hit point, branchless over kinds.

    Per-ray (N, 3) inputs here — this phase is O(N), not O(N*P)."""
    p = ol + t[..., None] * dl
    n_plane = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), p.shape)
    n_sphere = p / jnp.maximum(jnp.linalg.norm(p, axis=-1, keepdims=True), EPS)
    h = jnp.maximum(params[..., :3], EPS)
    rel = p / h
    ax = jnp.argmax(jnp.abs(rel), axis=-1)
    n_box = jax.nn.one_hot(ax, 3, dtype=p.dtype) * jnp.sign(
        jnp.take_along_axis(rel, ax[..., None], axis=-1)
    )
    hh = params[..., 1]
    side = jnp.abs(p[..., 2]) < hh - 1e-4
    radial = jnp.concatenate([p[..., :2], jnp.zeros_like(p[..., :1])], -1)
    radial = radial / jnp.maximum(jnp.linalg.norm(radial, axis=-1, keepdims=True), EPS)
    cap = jnp.stack([jnp.zeros_like(hh), jnp.zeros_like(hh), jnp.sign(p[..., 2])], -1)
    n_cyl = jnp.where(side[..., None], radial, cap)
    seg_z = jnp.clip(p[..., 2], -hh, hh)
    seg = jnp.stack([jnp.zeros_like(seg_z), jnp.zeros_like(seg_z), seg_z], -1)
    n_capsule = p - seg
    n_capsule = n_capsule / jnp.maximum(jnp.linalg.norm(n_capsule, axis=-1, keepdims=True), EPS)
    rb, rt, chh = params[..., 0], params[..., 1], params[..., 2]
    kslope = (rt - rb) / (2.0 * jnp.maximum(chh, EPS))
    n_cone_side = jnp.concatenate(
        [radial[..., :2], jnp.broadcast_to((-kslope)[..., None], radial[..., :1].shape)], -1
    )
    n_cone_side = n_cone_side / jnp.maximum(
        jnp.linalg.norm(n_cone_side, axis=-1, keepdims=True), EPS
    )
    on_cap = jnp.abs(jnp.abs(p[..., 2]) - chh) < 1e-4
    n_cone = jnp.where(
        on_cap[..., None],
        jnp.stack([jnp.zeros_like(chh), jnp.zeros_like(chh), jnp.sign(p[..., 2])], -1),
        n_cone_side,
    )
    kind_b = kind[..., None]
    n = jnp.where(kind_b == assets.PLANE, n_plane,
        jnp.where(kind_b == assets.SPHERE, n_sphere,
        jnp.where(kind_b == assets.BOX, n_box,
        jnp.where(kind_b == assets.CYLINDER, n_cyl,
        jnp.where(kind_b == assets.CONE, n_cone, n_capsule)))))
    flip = jnp.sum(n * dl, -1, keepdims=True) > 0
    return jnp.where(flip, -n, n)


# --- shared-reciprocal variants for the transform-free ("inv") category ----
# There d components are (1, N) planes shared by every prim in the group, so
# each division by a d-derived denominator — (g, N) numerator over (1, N)
# denominator — is replaced by ONE (1, N) reciprocal plus (g, N) multiplies.
# VPU divides cost ~7x a multiply, so this cuts the cylinder-heavy sweep
# (50 of 110 prims) by roughly a third.


def _inv_shared(d: Vec3):
    dz = jnp.where(jnp.abs(d[2]) < EPS, EPS, d[2])
    a2 = d[0] * d[0] + d[1] * d[1]
    a3 = a2 + d[2] * d[2]
    return {
        "a2": a2, "a3": a3,
        "ra2": 1.0 / jnp.maximum(a2, EPS),
        "ra3": 1.0 / jnp.maximum(a3, EPS),
        "rdz": 1.0 / dz,
        "dz_ok": jnp.abs(d[2]) >= EPS,
    }


def _plane_t_inv(o: Vec3, d: Vec3, params, sh):
    return _valid_t(-o[2] * sh["rdz"], sh["dz_ok"])


def _sphere_t_inv(o: Vec3, d: Vec3, params, sh):
    r = params[:, 0:1]
    b = o[0] * d[0] + o[1] * d[1] + o[2] * d[2]
    c = o[0] * o[0] + o[1] * o[1] + o[2] * o[2] - r * r
    disc = b * b - jnp.maximum(sh["a3"], EPS) * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    return _valid_t((-b - sq) * sh["ra3"], disc > 0)


def _cylinder_t_inv(o: Vec3, d: Vec3, params, sh):
    r, hh = params[:, 0:1], params[:, 1:2]
    b = o[0] * d[0] + o[1] * d[1]
    c = o[0] * o[0] + o[1] * o[1] - r * r
    disc = b * b - jnp.maximum(sh["a2"], EPS) * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_side = (-b - sq) * sh["ra2"]
    z_side = o[2] + t_side * d[2]
    t_best = _valid_t(t_side, (disc > 0) & (jnp.abs(z_side) <= hh)
                      & (sh["a2"] >= EPS))
    for sign in (-1.0, 1.0):
        t_c = (sign * hh - o[2]) * sh["rdz"]
        x = o[0] + t_c * d[0]
        y = o[1] + t_c * d[1]
        t_best = jnp.minimum(t_best, _valid_t(t_c, x * x + y * y <= r * r))
    return t_best


def _cone_t_inv(o: Vec3, d: Vec3, params, sh):
    rb, rt, hh = params[:, 0:1], params[:, 1:2], params[:, 2:3]
    k = (rt - rb) / (2.0 * hh)
    q = rb + k * (o[2] + hh)
    m = k * d[2]
    a = sh["a2"] - m * m  # per-prim: slope k differs, division stays
    b = o[0] * d[0] + o[1] * d[1] - q * m
    c = o[0] * o[0] + o[1] * o[1] - q * q
    a_safe = jnp.where(jnp.abs(a) < EPS, EPS, a)
    disc = b * b - a_safe * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    ra = 1.0 / a_safe  # one divide feeds both roots
    t1 = (-b - sq) * ra
    t2 = (-b + sq) * ra
    t_lo = jnp.minimum(t1, t2)
    t_hi = jnp.maximum(t1, t2)

    def side_ok(t):
        z = o[2] + t * d[2]
        rad = q + m * t
        return (disc > 0) & (jnp.abs(z) <= hh) & (rad > 0)

    t_side = jnp.where(side_ok(t_lo), t_lo, jnp.where(side_ok(t_hi), t_hi, INF))
    t_best = jnp.where(t_side > EPS, t_side, INF)
    for sign, rr in ((-1.0, rb), (1.0, rt)):
        t_c = (sign * hh - o[2]) * sh["rdz"]
        x = o[0] + t_c * d[0]
        y = o[1] + t_c * d[1]
        t_best = jnp.minimum(t_best, _valid_t(t_c, x * x + y * y <= rr * rr))
    return t_best


_KIND_FNS_INV = {
    assets.PLANE: _plane_t_inv,
    assets.SPHERE: _sphere_t_inv,
    assets.CYLINDER: _cylinder_t_inv,
    assets.CONE: _cone_t_inv,
}


# Instance classes whose world rotation is NOT guaranteed yaw-only: the
# pitched crane boom/telescopic (kinematics.crane_fk) and the articulated
# human (posed capsule frames). Everything else only ever yaws (placement
# samples rotateZ, reference generate_construction_data.py:1130/1190/1213).
_GENERAL_ROT_CLASSES = frozenset({"craneboom", "cranetelescopic", "human"})


def _transform_categories(roster: world_mod.Roster):
    """Static per-prim transform category for the sweep:

    * ``inv``  — transform-free: spheres (any rotation), the ground plane,
      and upright surfaces of revolution (cyl/cone with identity local
      rotation on a yaw-only instance). Their intersection formulas use only
      z and the rotation invariants x^2+y^2, ox*dx+oy*dy, so world-frame
      o - pos and d can be fed directly.
    * ``aa_id`` / ``aa_swap`` — boxes on STATIC axis-aligned instances
      (fence panels; world.fence_default_yaw_deg is the shared contract):
      no rotation at all — yaw 0 uses world components directly, yaw 90
      swaps x/y (the box slab test is sign-invariant per axis, so the
      permutation alone is exact). These also share ONE per-ray reciprocal
      triple across the whole category instead of 3 divides per prim.
    * ``yaw``  — boxes with identity local rotation on a yaw-only instance:
      a 2D (cos, sin) rotation read off prim_rot replaces the 3x3 transform.
    * ``axis`` — capsules with ARBITRARY orientation (the posed human rig):
      a capsule is a surface of revolution, so the intersection needs only
      the axial/radial decomposition of the ray — axis dot products instead
      of the full 3x3 local transform (~half the flops of ``gen``; the
      9-capsule human is the single largest block of the construction sweep).
    * ``gen``  — everything else: full local-frame transform.

    Returns {cat: [(kind, prim_idx_array), ...]}.
    """
    kinds = np.asarray(roster.prim_kind)
    prim_inst = np.asarray(roster.prim_inst)
    if not hasattr(roster, "prim_rot") or not hasattr(roster, "inst_class_names"):
        # Minimal roster (unit-test fixtures): everything general.
        return {"inv": [], "aa_id": [], "aa_swap": [], "yaw": [], "axis": [],
                "gen": [(int(k), np.nonzero(kinds == k)[0])
                        for k in np.unique(kinds)]}
    local_identity = (
        np.abs(np.asarray(roster.prim_rot) - np.eye(3)).max(axis=(1, 2)) < 1e-6
    )
    yaw_only = np.asarray([
        prim_inst[p] >= 0
        and roster.inst_class_names[prim_inst[p]] not in _GENERAL_ROT_CLASSES
        for p in range(kinds.shape[0])
    ])
    f0, f1 = roster.fence_slice
    fence_yaw = world_mod.fence_default_yaw_deg(f1 - f0)
    cat = np.empty(kinds.shape[0], dtype=object)
    for p in range(kinds.shape[0]):
        k = kinds[p]
        inst = prim_inst[p]
        if k == assets.SPHERE or (k == assets.PLANE and inst < 0):
            cat[p] = "inv"
        elif k in (assets.CYLINDER, assets.CONE) and local_identity[p] and yaw_only[p]:
            cat[p] = "inv"
        elif (k == assets.BOX and local_identity[p]
              and f0 <= inst < f1):  # static fence panel: yaw fixed at 0/90
            cat[p] = "aa_id" if fence_yaw[inst - f0] == 0.0 else "aa_swap"
        elif k == assets.BOX and local_identity[p] and yaw_only[p]:
            cat[p] = "yaw"
        elif k == assets.CAPSULE:
            cat[p] = "axis"
        else:
            cat[p] = "gen"
    out = {}
    for c in ("inv", "aa_id", "aa_swap", "yaw", "axis", "gen"):
        sel = np.nonzero(cat == c)[0]
        groups = [(int(k), sel[kinds[sel] == k]) for k in np.unique(kinds[sel])]
        out[c] = [(k, idx) for k, idx in groups if idx.size]
    return out


def _aa_slab_plan(roster: world_mod.Roster, cats, scene_cfg):
    """Shared-slab plan for the static axis-aligned fence categories.

    Panels of one fence side share their transverse and vertical slab
    intervals, and parallel sides share the same along-axis spans, so each
    unique (world_axis, offset, half-extent) slab is computed once per ray
    instead of once per panel (~40% of the fence sweep's flops at 5 panels
    per side). Grouping is by VALUE at the roster's default pose; validity
    rests on the static-fence contract (world.fence_default_yaw_deg: panels
    are never re-posed), which the fast-vs-generic equivalence test pins.

    Returns {(cat_name, group_i): (ids (g, 3) slab index per prim per local
    axis, slabs [(world_axis, rep_prim, local_axis), ...])}, or None.
    """
    if scene_cfg is None or not (cats.get("aa_id") or cats.get("aa_swap")):
        return None
    pose0 = world_mod.default_pose(roster, scene_cfg)
    world0 = world_mod.build_world(roster, pose0)
    pos0 = np.asarray(world0["prim_pos"])
    params = np.asarray(roster.prim_params)
    plan = {}
    for cat_name, perm in (("aa_id", (0, 1, 2)), ("aa_swap", (1, 0, 2))):
        for gi, (kind, idx) in enumerate(cats.get(cat_name, ())):
            slabs = []  # (world_axis, representative prim, local_axis)
            keymap = {}
            ids = np.zeros((len(idx), 3), np.int32)
            for la in range(3):
                wa = perm[la]
                for pi, p in enumerate(idx):
                    key = (wa, round(float(pos0[p, wa]), 5),
                           round(float(params[p, la]), 5))
                    if key not in keymap:
                        keymap[key] = len(slabs)
                        slabs.append((wa, int(p), la))
                    ids[pi, la] = keymap[key]
            if len(slabs) < 3 * len(idx):  # sharing actually exists
                plan[(cat_name, gi)] = (ids, slabs)
    return plan or None


def _box_t_aa(o: Vec3, rinv: Vec3, params):
    """Slab test for axis-aligned boxes with a SHARED per-ray reciprocal
    triple: o components are per-prim scalars (g, 1), rinv components are
    (1, N) planes — zero divides and zero transform flops per prim."""
    tmin = None
    tmax = None
    for ax in range(3):
        h = params[:, ax:ax + 1]
        t1 = (-h - o[ax]) * rinv[ax]
        t2 = (h - o[ax]) * rinv[ax]
        lo = jnp.minimum(t1, t2)
        hi = jnp.maximum(t1, t2)
        tmin = lo if tmin is None else jnp.maximum(tmin, lo)
        tmax = hi if tmax is None else jnp.minimum(tmax, hi)
    return _valid_t(tmin, (tmax >= tmin) & (tmax > 0))


def _sweep_packed_fast(cats, prim_rot, prim_pos, prim_params, prim_codes,
                      ray_o, ray_d, slab_plan=None):
    """Transform-aware packed sweep (shared origin). Skips or shrinks the
    local-frame transform per static category (_transform_categories); ~60%
    of the generic sweep's flops on the construction scene (110 prims: 51
    transform-free, 48 yaw-2D, 11 full)."""
    n = ray_d.shape[0]
    d0, d1, d2 = ray_d[:, 0], ray_d[:, 1], ray_d[:, 2]
    best = jnp.full(n, INF)
    sh = _inv_shared((d0[None, :], d1[None, :], d2[None, :])) if cats["inv"] else None
    if cats.get("aa_id") or cats.get("aa_swap"):
        # One guarded reciprocal triple shared by every axis-aligned box
        # (matches the generic _box_t guard exactly for equivalence).
        rinv = tuple(
            1.0 / jnp.where(jnp.abs(dc) < EPS, EPS, dc)[None, :]
            for dc in (d0, d1, d2))
        for cat_name, perm in (("aa_id", (0, 1, 2)), ("aa_swap", (1, 0, 2))):
            for gi, (kind, idx) in enumerate(cats.get(cat_name, ())):
                entry = (slab_plan or {}).get((cat_name, gi))
                if entry is not None:
                    # Shared slabs (_aa_slab_plan): each unique axis slab is
                    # computed once, prims combine 3 precomputed intervals.
                    ids, slabs = entry
                    los, his = [], []
                    for wa, rep, la in slabs:
                        o_rep = ray_o[wa] - prim_pos[rep, wa]
                        h_rep = prim_params[rep, la]
                        t1 = (-h_rep - o_rep) * rinv[wa][0]
                        t2 = (h_rep - o_rep) * rinv[wa][0]
                        los.append(jnp.minimum(t1, t2))
                        his.append(jnp.maximum(t1, t2))
                    tmin = jnp.stack([
                        jnp.maximum(jnp.maximum(los[i0], los[i1]), los[i2])
                        for i0, i1, i2 in ids])
                    tmax = jnp.stack([
                        jnp.minimum(jnp.minimum(his[i0], his[i1]), his[i2])
                        for i0, i1, i2 in ids])
                    t = _valid_t(tmin, (tmax >= tmin) & (tmax > 0))
                else:
                    rel = ray_o[None, :] - prim_pos[idx]  # (g, 3) world frame
                    o = tuple(rel[:, a:a + 1] for a in perm)
                    ri = tuple(rinv[a] for a in perm)
                    t = _box_t_aa(o, ri, prim_params[idx])
                best = jnp.minimum(
                    best, jnp.min(_pack(t, prim_codes[idx][:, None]), axis=0))
    for kind, idx in cats["inv"]:
        rel = ray_o[None, :] - prim_pos[idx]  # (g, 3)
        o = (rel[:, 0:1], rel[:, 1:2], rel[:, 2:3])
        d = (d0[None, :], d1[None, :], d2[None, :])
        t = _KIND_FNS_INV[kind](o, d, prim_params[idx], sh)
        best = jnp.minimum(best, jnp.min(_pack(t, prim_codes[idx][:, None]), axis=0))
    for kind, idx in cats["yaw"]:
        rot = prim_rot[idx]
        c = rot[:, 0, 0][:, None]  # cos(yaw): world-from-local column 0
        s = rot[:, 1, 0][:, None]  # sin(yaw)
        rel = ray_o[None, :] - prim_pos[idx]
        olx = c * rel[:, 0:1] + s * rel[:, 1:2]  # R^T rel
        oly = -s * rel[:, 0:1] + c * rel[:, 1:2]
        o = (olx, oly, rel[:, 2:3])
        d = (c * d0[None, :] + s * d1[None, :],
             -s * d0[None, :] + c * d1[None, :],
             d2[None, :])
        t = _KIND_FNS[kind](o, d, prim_params[idx])
        best = jnp.minimum(best, jnp.min(_pack(t, prim_codes[idx][:, None]), axis=0))
    if cats.get("axis"):
        # Arbitrarily-oriented capsules (the posed human rig): a capsule is a
        # surface of revolution, so only the axial/radial decomposition of
        # the ray is needed — oz/dz along the axis plus rotation-invariant
        # residuals — instead of the full 3x3 local transform (one axis dot
        # product per prim vs 9 madds; ~half the flops of the gen path).
        # End balls replace cap discs (see _capsule_t). Valid for
        # unnormalized directions: all terms scale consistently with |d|.
        dd = d0 * d0 + d1 * d1 + d2 * d2  # (N,) |d|^2, shared by all prims
        rdd = (1.0 / jnp.maximum(dd, EPS))[None, :]  # shared reciprocal
        rod = ray_o[0] * d0 + ray_o[1] * d1 + ray_o[2] * d2  # (N,) o . d
        for kind, idx in cats["axis"]:
            rot = prim_rot[idx]
            ax = rot[:, :, 2]  # (g, 3) capsule axis, world frame
            cc = prim_pos[idx]  # (g, 3)
            rel = ray_o[None, :] - cc
            r, hh = prim_params[idx][:, 0:1], prim_params[idx][:, 1:2]
            oz = jnp.sum(rel * ax, -1, keepdims=True)  # (g, 1)
            oo = jnp.sum(rel * rel, -1, keepdims=True)  # (g, 1)
            dz = (ax[:, 0:1] * d0[None, :] + ax[:, 1:2] * d1[None, :]
                  + ax[:, 2:3] * d2[None, :])  # (g, N)
            od = rod[None, :] - (cc[:, 0:1] * d0[None, :]
                                 + cc[:, 1:2] * d1[None, :]
                                 + cc[:, 2:3] * d2[None, :])  # (g, N) rel . d
            a2 = dd[None, :] - dz * dz
            b2 = od - oz * dz
            c2 = oo - oz * oz - r * r  # (g, 1) radial^2 - r^2 at the origin
            a2_safe = jnp.where(a2 < EPS, EPS, a2)
            disc2 = b2 * b2 - a2_safe * c2
            sq2 = jnp.sqrt(jnp.maximum(disc2, 0.0))
            t_side = (-b2 - sq2) / a2_safe
            z_side = oz + t_side * dz
            t = _valid_t(t_side, (disc2 > 0) & (jnp.abs(z_side) <= hh)
                         & (a2 >= EPS))
            for sign in (-1.0, 1.0):
                bs = od - (sign * hh) * dz
                cs = oo - (2.0 * sign) * hh * oz + hh * hh - r * r  # (g, 1)
                disc = bs * bs - dd[None, :] * cs
                sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                t = jnp.minimum(t, _valid_t((-bs - sq) * rdd, disc > 0))
            best = jnp.minimum(
                best, jnp.min(_pack(t, prim_codes[idx][:, None]), axis=0))
    for kind, idx in cats["gen"]:
        o, d = _to_local_soa(ray_o, ray_d, prim_rot[idx], prim_pos[idx])
        t = _KIND_FNS[kind](o, d, prim_params[idx])
        best = jnp.minimum(best, jnp.min(_pack(t, prim_codes[idx][:, None]), axis=0))
    t, code = _unpack(best)
    return t, jnp.where(t < INF * 0.99, code, 0)


def make_raycaster(roster: world_mod.Roster, chunk: int = 16384,
                   transform_aware: bool = True, scene_cfg=None,
                   prim_mask: np.ndarray | None = None):
    """Build a jittable ray-caster with per-kind primitive groups baked in.

    Returns ``cast(world, ray_o (3,), ray_d (N, 3)) -> dict`` with
    t (N,), prim (N,) winning primitive index, inst (N,) instance id (-1 for
    ground, -2 for sky/miss), normal (N, 3) world frame.

    ``transform_aware`` (default) routes the packed fast path through the
    static transform categories; disable to force the generic SoA sweep
    (equivalence-tested in tests/test_raycast.py). ``scene_cfg`` additionally
    enables the shared-slab fence plan (_aa_slab_plan) — pass the
    SceneConfig the roster was built from. ``prim_mask`` (P,) bool keeps only
    the masked-True prims in the sweep (the hifi mesh path excludes proxies
    it replaces; render/meshcast.py).
    """
    kinds_np = np.asarray(roster.prim_kind)
    groups = [(int(k), np.nonzero(kinds_np == k)[0]) for k in np.unique(kinds_np)]
    cats = _transform_categories(roster) if transform_aware else None
    if prim_mask is not None:
        keep = np.asarray(prim_mask, bool)
        groups = [(k, idx[keep[idx]]) for k, idx in groups]
        groups = [(k, idx) for k, idx in groups if idx.size]
        if cats is not None:
            cats = {c: [(k, idx[keep[idx]]) for k, idx in lst]
                    for c, lst in cats.items()}
            cats = {c: [(k, idx) for k, idx in lst if idx.size]
                    for c, lst in cats.items()}
    slab_plan = _aa_slab_plan(roster, cats, scene_cfg) if cats else None
    # Payload codes for the packed fast path: inst + 2 (miss=0, ground=1).
    prim_codes_np = np.asarray(roster.prim_inst) + 2
    assert prim_codes_np.max() <= _PAYLOAD_MASK, (
        f"{prim_codes_np.max()} instances exceed the {_PAYLOAD_BITS}-bit payload; "
        "raise _PAYLOAD_BITS (costs depth precision) or split the roster")

    def cast(world: Dict[str, Array], ray_o: Array, ray_d: Array):
        prim_rot = world["prim_rot"]
        prim_pos = world["prim_pos"]
        prim_params = world["prim_params"]

        def chunk_fn(rd):
            return _sweep(groups, prim_rot, prim_pos, prim_params, ray_o, rd)

        n = ray_d.shape[0]
        if n > chunk and n % chunk == 0:
            rd = ray_d.reshape(n // chunk, chunk, 3)
            t_best, idx_best = jax.lax.map(chunk_fn, rd)
            t_best = t_best.reshape(n)
            idx_best = idx_best.reshape(n)
        else:
            t_best, idx_best = chunk_fn(ray_d)

        hit = t_best < INF
        safe_idx = jnp.maximum(idx_best, 0)
        rot_w = prim_rot[safe_idx]
        pos_w = prim_pos[safe_idx]
        par_w = prim_params[safe_idx]
        kind_w = jnp.asarray(roster.prim_kind)[safe_idx]
        ol = _einsum("nji,nj->ni", rot_w, ray_o[None, :] - pos_w)
        dl = _einsum("nji,nj->ni", rot_w, ray_d)
        nl = _local_normal(kind_w, ol, dl, t_best, par_w)
        normal = _einsum("nij,nj->ni", rot_w, nl)
        normal = jnp.where(hit[..., None], normal, 0.0)

        inst = jnp.where(hit, jnp.asarray(roster.prim_inst)[safe_idx], -2)
        return {
            "t": jnp.where(hit, t_best, jnp.float32(jnp.inf)),
            "prim": jnp.where(hit, idx_best, -1),
            "inst": inst,
            "normal": normal,
        }

    def cast_fast(world: Dict[str, Array], ray_o: Array, ray_d: Array):
        """Packed sweep: {t, inst} only — no argmin, no gathers, no normals
        (use screen-space normals from the depth/position grid for shading).
        ~15x faster than the full cast on v5e at 512x512."""
        prim_codes = jnp.asarray(prim_codes_np, jnp.int32)

        def chunk_fn(rd):
            if cats is not None:
                return _sweep_packed_fast(cats, world["prim_rot"],
                                          world["prim_pos"],
                                          world["prim_params"], prim_codes,
                                          ray_o, rd, slab_plan=slab_plan)
            return _sweep_packed(groups, world["prim_rot"], world["prim_pos"],
                                 world["prim_params"], prim_codes, ray_o, rd)

        n = ray_d.shape[0]
        if n > chunk and n % chunk == 0:
            rd = ray_d.reshape(n // chunk, chunk, 3)
            t, code = jax.lax.map(chunk_fn, rd)
            t = t.reshape(n)
            code = code.reshape(n)
        else:
            t, code = chunk_fn(ray_d)
        hit = t < INF * 0.99
        return {
            "t": jnp.where(hit, t, jnp.float32(jnp.inf)),
            "inst": code - 2,
        }

    def cast_fast_multi_origin(world: Dict[str, Array], ray_o: Array, ray_d: Array):
        """Packed sweep with PER-RAY origins (N, 3) — shadow/secondary rays."""
        prim_codes = jnp.asarray(prim_codes_np, jnp.int32)

        def chunk_fn(args):
            ro, rd = args
            return _sweep_packed_multi(groups, world["prim_rot"], world["prim_pos"],
                                       world["prim_params"], prim_codes, ro, rd)

        n = ray_d.shape[0]
        if n > chunk and n % chunk == 0:
            ro = ray_o.reshape(n // chunk, chunk, 3)
            rd = ray_d.reshape(n // chunk, chunk, 3)
            t, code = jax.lax.map(chunk_fn, (ro, rd))
            t = t.reshape(n)
            code = code.reshape(n)
        else:
            t, code = chunk_fn((ray_o, ray_d))
        hit = t < INF * 0.99
        return {
            "t": jnp.where(hit, t, jnp.float32(jnp.inf)),
            "inst": code - 2,
        }

    cast.fast = cast_fast
    cast.fast_multi_origin = cast_fast_multi_origin
    return cast


def occlusion_ts(world: Dict[str, Array], roster: world_mod.Roster,
                 ray_o: Array, ray_d: Array, exclude_inst: Array) -> Array:
    """Nearest hit distance per ray, ignoring primitives of ``exclude_inst``
    (per-ray instance id). Used for keypoint visibility: a keypoint on object
    o is occluded iff some *other* surface is closer.

    ray_d need not be normalized here — pass (kpt - cam); returned t is in
    units of that vector (occluded iff t < 1)."""
    kinds_np = np.asarray(roster.prim_kind)
    groups = [(int(k), np.nonzero(kinds_np == k)[0]) for k in np.unique(kinds_np)]
    t, _ = _sweep(groups, world["prim_rot"], world["prim_pos"], world["prim_params"],
                  ray_o, ray_d, exclude_inst=exclude_inst,
                  prim_inst=jnp.asarray(roster.prim_inst))
    return t
