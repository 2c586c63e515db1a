"""Hifi mesh render path: a Möller–Trumbore triangle sweep shaped for TPU.

The reference renders real CAD meshes through Isaac's RTX path
(generate_construction_data.py:1668-1677); the analytic proxy sweep
(render/raycast.py) replaces that with closed-form primitives. This module
closes the remaining silhouette gap for the classes whose triangle geometry
the reference crate actually authors (traffic cone, fence panel, tree —
extracted + decimated by tools/extract_meshes.py into
``data/mesh_templates.npz``; crane/dumper/worker bodies are LFS stubs
upstream, see PARITY.md).

TPU shaping — no BVH, no divergence, same architecture as the prim sweep:

* With a SHARED per-frame camera origin, every per-pair Möller–Trumbore
  quantity is a dot of the ray direction against a per-triangle vector:
  ``det = d . (e2 x e1)``, ``u_num = d . (e2 x s)``, ``v_num = d . (s x e1)``
  (s = origin - v0 is per-tri once per frame). The whole [rays x tris] test
  is three ``(N, 3) @ (3, T)`` contractions plus elementwise compares — MXU
  work, not scalar gathers.
* Triangles ride a ``lax.scan`` over fixed-size blocks with the same
  mantissa-packed running-min the prim sweep uses (raycast._pack): one
  reduction yields depth AND instance id, bounded memory.
* Instancing is static: template vertex tables are baked host-side; world
  vertices are one tiny einsum per frame (V <= ~800 per template).

Keypoint-visibility segments share the camera origin so they ride the same
sweep; secondary rays (sun shadows) keep the analytic proxies — that path
has per-ray origins and the proxy shadows are already soft-shadow-accurate.
"""

from __future__ import annotations

import functools
import os
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..scene import world as world_mod
from . import raycast

Array = jax.Array
_einsum = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)

DATA_NPZ = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "data", "mesh_templates.npz")

DEFAULT_CLASSES = ("trafficcone", "tree", "fence")


def load_templates(path: str | None = None
                   ) -> Dict[str, Tuple[np.ndarray, np.ndarray]]:
    """{class: (verts (V, 3) f32 local frame, faces (T, 3) i32)} or {} if the
    baked npz is absent (hifi mode then degrades to the analytic proxies)."""
    path = path or DATA_NPZ
    if not os.path.exists(path):
        return {}
    z = np.load(path)
    out = {}
    for key in z.files:
        if key.endswith("_verts"):
            cls = key[:-6]
            out[cls] = (z[f"{cls}_verts"].astype(np.float32),
                        z[f"{cls}_faces"].astype(np.int32))
    return out


def make_mesh_caster(roster: world_mod.Roster,
                     templates: Dict[str, Tuple[np.ndarray, np.ndarray]] | None = None,
                     classes: Sequence[str] = DEFAULT_CLASSES,
                     tri_block: int = 2048, chunk: int = 16384):
    """Triangle sweep over every roster instance of ``classes`` that has a
    baked template. Returns None when nothing is meshable, else a callable
    ``packed(world, ray_o (3,), ray_d (N, 3)) -> packed f32 (N,)`` (the
    raycast._pack encoding: depth mantissa carries instance id + 2), with
    ``.covered_prims`` — a (P,) bool mask of analytic prims the mesh replaces.
    """
    templates = load_templates() if templates is None else templates
    groups = []  # (verts, faces, inst_ids)
    for cls in classes:
        if cls not in templates:
            continue
        ids = [i for i, name in enumerate(roster.inst_class_names)
               if name == cls]
        if ids:
            v, f = templates[cls]
            groups.append((jnp.asarray(v), jnp.asarray(f), np.asarray(ids)))
    if not groups:
        return None

    covered = np.zeros(len(roster.prim_inst), bool)
    meshed_insts = np.concatenate([ids for _, _, ids in groups])
    covered |= np.isin(np.asarray(roster.prim_inst), meshed_insts)

    n_tri_total = sum(len(f) * len(ids) for _, f, ids in groups)
    n_blocks = -(-n_tri_total // tri_block)
    pad_tris = n_blocks * tri_block - n_tri_total

    codes_np = np.concatenate(
        [np.repeat(np.asarray(ids, np.int32) + 2, len(f))
         for _, f, ids in groups] + [np.zeros(pad_tris, np.int32)])
    codes_blocks = jnp.asarray(codes_np.reshape(n_blocks, tri_block))

    def _world_corners(world):
        """Concatenated per-tri world corners (Ttot, 3) x3, padded."""
        inst_rot, inst_pos = world["inst_rot"], world["inst_pos"]
        c0s, c1s, c2s = [], [], []
        for verts, faces, ids in groups:
            R = inst_rot[jnp.asarray(ids)]  # (I, 3, 3)
            p = inst_pos[jnp.asarray(ids)]  # (I, 3)
            vw = _einsum("ikj,vj->ivk", R, verts) + p[:, None, :]  # (I, V, 3)
            # static tiny gathers: V <= ~800, I <= ~20
            c0s.append(vw[:, faces[:, 0], :].reshape(-1, 3))
            c1s.append(vw[:, faces[:, 1], :].reshape(-1, 3))
            c2s.append(vw[:, faces[:, 2], :].reshape(-1, 3))
        zpad = jnp.zeros((pad_tris, 3), jnp.float32)
        c0 = jnp.concatenate(c0s + [zpad])
        c1 = jnp.concatenate(c1s + [zpad])
        c2 = jnp.concatenate(c2s + [zpad])
        return c0, c1, c2

    def packed(world, ray_o: Array, ray_d: Array) -> Array:
        c0, c1, c2 = _world_corners(world)
        e1 = c1 - c0
        e2 = c2 - c0
        s = ray_o[None, :] - c0
        cr = jnp.cross(e2, e1)   # det   = d . cr
        au = jnp.cross(e2, s)    # u_num = d . au
        qv = jnp.cross(s, e1)    # v_num = d . qv
        tnum = jnp.sum(e2 * qv, axis=-1)  # (Ttot,)
        blk = lambda a: a.reshape(n_blocks, tri_block, -1)
        tn_b = tnum.reshape(n_blocks, tri_block)

        def ray_chunk(rd):
            def body(best, xs):
                crb, aub, qvb, tnb, cdb = xs
                det = _einsum("nj,bj->nb", rd, crb)
                unum = _einsum("nj,bj->nb", rd, aub)
                vnum = _einsum("nj,bj->nb", rd, qvb)
                inv = jnp.where(jnp.abs(det) < raycast.EPS, 0.0, 1.0 / det)
                t = tnb[None, :] * inv
                u = unum * inv
                v = vnum * inv
                ok = ((u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                      & (t > raycast.EPS) & (inv != 0.0))
                t = jnp.where(ok, t, raycast.INF)
                pk = raycast._pack(t, cdb[None, :])
                return jnp.minimum(best, jnp.min(pk, axis=1)), None

            init = jnp.full(rd.shape[0], raycast.INF)
            best, _ = jax.lax.scan(
                body, init,
                (blk(cr), blk(au), blk(qv), tn_b, codes_blocks))
            return best

        n = ray_d.shape[0]
        if n > chunk and n % chunk == 0:
            out = jax.lax.map(ray_chunk, ray_d.reshape(n // chunk, chunk, 3))
            return out.reshape(n)
        return ray_chunk(ray_d)

    packed.covered_prims = covered
    packed.n_triangles = n_tri_total
    return packed


def make_hifi_caster(roster: world_mod.Roster, scene_cfg=None,
                     templates=None, classes: Sequence[str] = DEFAULT_CLASSES,
                     chunk: int = 16384):
    """Composite caster: baked CAD triangles for meshable classes + the
    analytic prim sweep for everything else. Drop-in for
    raycast.make_raycaster's return — render_frame needs no changes.

    ``.fast`` merges the two packed sweeps by mantissa-packed min (exact IEEE
    ordering). ``.fast_multi_origin`` (shadow rays, per-ray origins) and the
    full analytic ``cast`` keep the UNFILTERED proxy roster: shadows stay
    proxy-shaped, and meshed instances still self-shadow/occlude there.
    """
    mesh = make_mesh_caster(roster, templates, classes, chunk=chunk)
    full = raycast.make_raycaster(roster, chunk=chunk, scene_cfg=scene_cfg)
    if mesh is None:
        return full
    base = raycast.make_raycaster(roster, chunk=chunk, scene_cfg=scene_cfg,
                                  prim_mask=~mesh.covered_prims)

    def cast(world, ray_o, ray_d):
        return full(world, ray_o, ray_d)

    def fast(world, ray_o, ray_d):
        a = base.fast(world, ray_o, ray_d)
        pk_a = raycast._pack(
            jnp.where(jnp.isfinite(a["t"]), a["t"], raycast.INF),
            a["inst"] + 2)
        pk_m = mesh(world, ray_o, ray_d)
        t, code = raycast._unpack(jnp.minimum(pk_a, pk_m))
        hit = t < raycast.INF * 0.99
        return {"t": jnp.where(hit, t, jnp.float32(jnp.inf)),
                "inst": jnp.where(hit, code - 2, -2)}

    cast.fast = fast
    cast.fast_multi_origin = full.fast_multi_origin
    cast.mesh = mesh
    return cast
