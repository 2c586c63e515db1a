"""Batched analytic ray-casting (pure JAX; the TPU replacement for the
reference's Isaac RTX renderer + annotators).

Every scene object is a set of closed-form primitives (scene/assets.py), so a
"render" is a dense [rays x prims] intersection sweep with static shapes — no
BVH, no divergent control flow, fully fusible by XLA and trivially batchable
over frames. Primitives are grouped by kind host-side (static index sets from
the roster) so each kind's formula runs vectorized over exactly its own
primitives.

All intersections happen in the primitive's local frame: ``ol = R^T (o - p)``,
``dl = R^T d``; the returned t is world-scale because R is orthonormal.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..scene import assets, world as world_mod

Array = jax.Array
_einsum = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)

INF = jnp.float32(1e10)
EPS = 1e-7


def _to_local(ray_o, ray_d, rot, pos):
    """Shared origin (3,) + rays (N, 3) x prims (P, ...) -> local coords.

    Returns ol (1, P, 3) (broadcasts over rays) and dl (N, P, 3)."""
    rel = ray_o[None, :] - pos  # (P, 3)
    ol = _einsum("pji,pj->pi", rot, rel)[None]
    dl = _einsum("pji,nj->npi", rot, ray_d)
    return ol, dl


def _valid_t(t, cond):
    return jnp.where(cond & (t > EPS), t, INF)


def _plane_t(ol, dl, params):
    dz = dl[..., 2]
    t = -ol[..., 2] / jnp.where(jnp.abs(dz) < EPS, EPS, dz)
    return _valid_t(t, jnp.abs(dz) >= EPS)


def _sphere_t(ol, dl, params):
    # Full quadratic (a != 1): every formula here must stay correct for
    # UNNORMALIZED directions — occlusion_ts casts raw segments.
    r = params[..., 0]
    a = jnp.sum(dl * dl, -1)
    b = jnp.sum(ol * dl, -1)
    c = jnp.sum(ol * ol, -1) - r * r
    a_safe = jnp.maximum(a, EPS)
    disc = b * b - a_safe * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t = (-b - sq) / a_safe
    return _valid_t(t, disc > 0)


def _box_t(ol, dl, params):
    h = params[..., :3]
    inv = 1.0 / jnp.where(jnp.abs(dl) < EPS, EPS, dl)
    t1 = (-h - ol) * inv
    t2 = (h - ol) * inv
    tmin = jnp.max(jnp.minimum(t1, t2), -1)
    tmax = jnp.min(jnp.maximum(t1, t2), -1)
    return _valid_t(tmin, (tmax >= tmin) & (tmax > 0))


def _cylinder_t(ol, dl, params):
    r, hh = params[..., 0], params[..., 1]
    a = dl[..., 0] ** 2 + dl[..., 1] ** 2
    b = ol[..., 0] * dl[..., 0] + ol[..., 1] * dl[..., 1]
    c = ol[..., 0] ** 2 + ol[..., 1] ** 2 - r * r
    a_safe = jnp.where(a < EPS, EPS, a)
    disc = b * b - a_safe * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_side = (-b - sq) / a_safe
    z_side = ol[..., 2] + t_side * dl[..., 2]
    t_side = _valid_t(t_side, (disc > 0) & (jnp.abs(z_side) <= hh) & (a >= EPS))
    # Caps
    dz = jnp.where(jnp.abs(dl[..., 2]) < EPS, EPS, dl[..., 2])
    t_caps = []
    for sign in (-1.0, 1.0):
        t_c = (sign * hh - ol[..., 2]) / dz
        x = ol[..., 0] + t_c * dl[..., 0]
        y = ol[..., 1] + t_c * dl[..., 1]
        t_caps.append(_valid_t(t_c, x * x + y * y <= r * r))
    return jnp.minimum(t_side, jnp.minimum(*t_caps))


def _cone_t(ol, dl, params):
    rb, rt, hh = params[..., 0], params[..., 1], params[..., 2]
    k = (rt - rb) / (2.0 * hh)
    q = rb + k * (ol[..., 2] + hh)  # radius at the ray origin's z
    m = k * dl[..., 2]
    a = dl[..., 0] ** 2 + dl[..., 1] ** 2 - m * m
    b = ol[..., 0] * dl[..., 0] + ol[..., 1] * dl[..., 1] - q * m
    c = ol[..., 0] ** 2 + ol[..., 1] ** 2 - q * q
    a_safe = jnp.where(jnp.abs(a) < EPS, EPS, a)
    disc = b * b - a_safe * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t1 = (-b - sq) / a_safe
    t2 = (-b + sq) / a_safe
    t_lo = jnp.minimum(t1, t2)
    t_hi = jnp.maximum(t1, t2)

    def side_ok(t):
        z = ol[..., 2] + t * dl[..., 2]
        rad = q + m * t
        return (disc > 0) & (jnp.abs(z) <= hh) & (rad > 0)

    t_side = jnp.where(side_ok(t_lo), t_lo, jnp.where(side_ok(t_hi), t_hi, INF))
    t_side = jnp.where(t_side > EPS, t_side, INF)
    # Bottom cap (radius rb at z = -hh); the tiny top cap too.
    dz = jnp.where(jnp.abs(dl[..., 2]) < EPS, EPS, dl[..., 2])
    t_caps = []
    for sign, rr in ((-1.0, rb), (1.0, rt)):
        t_c = (sign * hh - ol[..., 2]) / dz
        x = ol[..., 0] + t_c * dl[..., 0]
        y = ol[..., 1] + t_c * dl[..., 1]
        t_caps.append(_valid_t(t_c, x * x + y * y <= rr * rr))
    return jnp.minimum(t_side, jnp.minimum(*t_caps))


def _capsule_t(ol, dl, params):
    r, hh = params[..., 0], params[..., 1]
    t_cyl = _cylinder_t(ol, dl, params)  # includes caps, fine as bound
    # Sphere caps at (0, 0, +-hh)
    ts = [t_cyl]
    a = jnp.sum(dl * dl, -1)
    a_safe = jnp.maximum(a, EPS)
    for sign in (-1.0, 1.0):
        oc = ol - jnp.stack(
            [jnp.zeros_like(hh), jnp.zeros_like(hh), sign * hh], -1
        )
        b = jnp.sum(oc * dl, -1)
        c = jnp.sum(oc * oc, -1) - r * r
        disc = b * b - a_safe * c
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        ts.append(_valid_t((-b - sq) / a_safe, disc > 0))
    return jnp.minimum(jnp.minimum(ts[0], ts[1]), ts[2])


_KIND_FNS = {
    assets.PLANE: _plane_t,
    assets.SPHERE: _sphere_t,
    assets.BOX: _box_t,
    assets.CYLINDER: _cylinder_t,
    assets.CONE: _cone_t,
    assets.CAPSULE: _capsule_t,
}


def _local_normal(kind, ol, dl, t, params):
    """Outward local-frame normal at hit point, branchless over kinds."""
    p = ol + t[..., None] * dl
    # plane
    n_plane = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), p.shape)
    # sphere
    n_sphere = p / jnp.maximum(jnp.linalg.norm(p, axis=-1, keepdims=True), EPS)
    # box: dominant axis of p / h
    h = jnp.maximum(params[..., :3], EPS)
    rel = p / h
    ax = jnp.argmax(jnp.abs(rel), axis=-1)
    n_box = jax.nn.one_hot(ax, 3, dtype=p.dtype) * jnp.sign(
        jnp.take_along_axis(rel, ax[..., None], axis=-1)
    )
    # cylinder/capsule: side vs cap by |z| closeness
    hh = params[..., 1]
    side = jnp.abs(p[..., 2]) < hh - 1e-4
    radial = jnp.concatenate([p[..., :2], jnp.zeros_like(p[..., :1])], -1)
    radial = radial / jnp.maximum(jnp.linalg.norm(radial, axis=-1, keepdims=True), EPS)
    cap = jnp.stack([jnp.zeros_like(hh), jnp.zeros_like(hh), jnp.sign(p[..., 2])], -1)
    n_cyl = jnp.where(side[..., None], radial, cap)
    # capsule: radial from nearest segment point
    seg_z = jnp.clip(p[..., 2], -hh, hh)
    seg = jnp.stack([jnp.zeros_like(seg_z), jnp.zeros_like(seg_z), seg_z], -1)
    n_capsule = p - seg
    n_capsule = n_capsule / jnp.maximum(jnp.linalg.norm(n_capsule, axis=-1, keepdims=True), EPS)
    # cone: slanted side normal (or caps)
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
    # Face the ray.
    flip = jnp.sum(n * dl, -1, keepdims=True) > 0
    return jnp.where(flip, -n, n)


def make_raycaster(roster: world_mod.Roster, chunk: int = 8192):
    """Build a jittable ray-caster with per-kind primitive groups baked in.

    Returns ``cast(world, ray_o (3,), ray_d (N, 3)) -> dict`` with
    t (N,), prim (N,) winning primitive index, inst (N,) instance id (-1 for
    ground, -2 for sky/miss), normal (N, 3) world frame.
    """
    kinds_np = np.asarray(roster.prim_kind)
    groups = [(int(k), np.nonzero(kinds_np == k)[0]) for k in np.unique(kinds_np)]

    def cast(world: Dict[str, Array], ray_o: Array, ray_d: Array):
        prim_rot = world["prim_rot"]
        prim_pos = world["prim_pos"]
        prim_params = world["prim_params"]

        def chunk_fn(rd):
            t_best = jnp.full(rd.shape[0], INF)
            idx_best = jnp.full(rd.shape[0], -1, jnp.int32)
            for kind, idx in groups:
                rot = prim_rot[idx]
                pos = prim_pos[idx]
                par = prim_params[idx]
                ol, dl = _to_local(ray_o, rd, rot, pos)
                t = _KIND_FNS[kind](ol, dl, par[None, :, :])  # (n, g)
                g_min = jnp.min(t, axis=1)
                g_arg = jnp.argmin(t, axis=1)
                better = g_min < t_best
                t_best = jnp.where(better, g_min, t_best)
                idx_best = jnp.where(better, jnp.asarray(idx, jnp.int32)[g_arg], idx_best)
            return t_best, idx_best

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

    return cast


def occlusion_ts(world: Dict[str, Array], roster: world_mod.Roster,
                 ray_o: Array, ray_d: Array, exclude_inst: Array) -> Array:
    """Nearest hit distance per ray, ignoring primitives of ``exclude_inst``
    (per-ray instance id). Used for keypoint visibility: a keypoint on object
    o is occluded iff some *other* surface is closer.

    ray_d need not be normalized here — pass (kpt - cam); returned t is in
    units of that vector (occluded iff t < 1)."""
    kinds_np = np.asarray(roster.prim_kind)
    prim_inst = jnp.asarray(roster.prim_inst)
    t_best = jnp.full(ray_d.shape[0], INF)
    for kind in np.unique(kinds_np):
        idx = np.nonzero(kinds_np == kind)[0]
        rot = world["prim_rot"][idx]
        pos = world["prim_pos"][idx]
        par = world["prim_params"][idx]
        ol, dl = _to_local(ray_o, ray_d, rot, pos)
        t = _KIND_FNS[int(kind)](ol, dl, par[None, :, :])  # (n, g)
        same = prim_inst[idx][None, :] == exclude_inst[:, None]
        t = jnp.where(same, INF, t)
        t_best = jnp.minimum(t_best, jnp.min(t, axis=1))
    return t_best
