#!/usr/bin/env python
"""Quantify proxy-vs-CAD geometric fidelity against the reference crate.

For every asset class whose triangle geometry is authored INSIDE
``cad_models/world2.usd.backup`` (traffic cone, fence panel, tree — the
crane/dumper/worker bodies are external LFS-stub references, see
tools/calibrate_proxies.py), this renders matched depth maps of

* the repo's primitive proxy (scene/assets.py template, cast with the
  production ray sweep), and
* the actual CAD triangle mesh (fan-triangulated crate geometry, cast with a
  NumPy Moller-Trumbore reference caster),

from an orbit of cameras, and reports silhouette IoU plus depth RMSE over
mutually-hit pixels. Complements the dimension deltas in PARITY.md with a
surface-level error measure.

Usage: python tools/mesh_fidelity.py [path-to-crate] [--res 160]
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")  # repo root

from constructionsceneposeestimation_tpu.io.usdc import CrateFile  # noqa: E402
from constructionsceneposeestimation_tpu.scene import assets  # noqa: E402
from tools.calibrate_proxies import world_matrix  # noqa: E402

DEFAULT_CRATE = "/root/reference/cad_models/world2.usd.backup"

ASSETS = {
    # class -> (crate root prim, proxy template name)
    "trafficcone": ("/World/GroundPlane/Cone001_01", "trafficcone"),
    "fence": ("/World/GroundPlane/Construction_Site_Construction_Zeppelin_"
              "Rental_GmbH_Metal_Construction_Site_Fencing_height_03",
              "fence"),
    "tree": ("/World/Tree/Tree_01", "tree"),
}


def extract_triangles(crate, root, prims):
    """All Mesh prims under ``root`` -> (T, 3, 3) world-frame triangles
    (fan triangulation of n-gons)."""
    tris = []
    for p, f in prims.items():
        if p != root and not p.startswith(root + "/"):
            continue
        if f.get("typeName") != "Mesh":
            continue
        pts = crate.attr_default(p, "points")
        fvc = crate.attr_default(p, "faceVertexCounts")
        fvi = crate.attr_default(p, "faceVertexIndices")
        if pts is None or fvc is None or fvi is None:
            continue
        M = world_matrix(crate, p)
        w = np.asarray(pts) @ M[:3, :3].T + M[:3, 3]
        fvc = np.asarray(fvc, np.int64)
        fvi = np.asarray(fvi, np.int64)
        off = 0
        for n in fvc:
            poly = fvi[off:off + n]
            for i in range(1, n - 1):  # fan
                tris.append(w[[poly[0], poly[i], poly[i + 1]]])
            off += n
    return np.asarray(tris, np.float32)


def mt_depth(tris, origin, dirs, ray_chunk=1024, tri_chunk=4096):
    """NumPy Moller-Trumbore nearest-hit t per ray (reference oracle).

    Dual chunking bounds the (rays x tris, 3) temporaries — the tree asset
    is ~31k triangles."""
    t_best = np.full(len(dirs), np.inf, np.float32)
    for tlo in range(0, len(tris), tri_chunk):
        blk = tris[tlo:tlo + tri_chunk]
        v0 = blk[:, 0]
        e1 = blk[:, 1] - v0
        e2 = blk[:, 2] - v0
        s = (origin[None, :] - v0).astype(np.float32)  # (T, 3)
        q = np.cross(s, e1)  # (T, 3)
        te2q = np.einsum("tj,tj->t", e2, q)  # (T,)
        for rlo in range(0, len(dirs), ray_chunk):
            d = dirs[rlo:rlo + ray_chunk]  # (n, 3)
            p = np.cross(d[:, None, :], e2[None, :, :])  # (n, T, 3)
            det = np.einsum("tj,ntj->nt", e1, p)
            inv = np.where(np.abs(det) < 1e-9, np.inf, 1.0 / det)
            u = np.einsum("tj,ntj->nt", s, p) * inv
            v = np.einsum("nj,tj->nt", d, q) * inv
            t = te2q[None, :] * inv
            ok = (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 1e-6)
            t = np.where(ok, t, np.inf).min(1)
            t_best[rlo:rlo + ray_chunk] = np.minimum(
                t_best[rlo:rlo + ray_chunk], t)
    return t_best


def proxy_depth(template, origin, dirs):
    """Cast the proxy template's primitives with the production sweep."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from constructionsceneposeestimation_tpu.render import raycast

    kinds = np.asarray(template.prim_kind)
    groups = [(int(k), np.nonzero(kinds == k)[0]) for k in np.unique(kinds)]
    t, _ = raycast._sweep(
        groups, jnp.asarray(template.prim_rot),
        jnp.asarray(template.prim_offset), jnp.asarray(template.prim_params),
        jnp.asarray(origin), jnp.asarray(dirs))
    t = np.asarray(t)
    return np.where(t < raycast.INF * 0.99, t, np.inf)


def orbit_rays(center, radius, height, res, yaw_deg):
    """Simple look-at pinhole rays (60 deg vFOV) from an orbit viewpoint."""
    yaw = np.deg2rad(yaw_deg)
    cam = center + np.array([radius * np.cos(yaw), radius * np.sin(yaw),
                             height], np.float32)
    fwd = center - cam
    fwd /= np.linalg.norm(fwd)
    right = np.cross(fwd, [0.0, 0.0, 1.0])
    right /= np.linalg.norm(right)
    up = np.cross(right, fwd)
    f = 0.866  # cot(60deg/2)
    xs = np.linspace(-1, 1, res, dtype=np.float32)
    uu, vv = np.meshgrid(xs, xs)
    dirs = (fwd[None, :] * f + right[None, :] * uu.reshape(-1, 1)
            + up[None, :] * -vv.reshape(-1, 1))
    return cam.astype(np.float32), dirs.astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("crate", nargs="?", default=DEFAULT_CRATE)
    ap.add_argument("--res", type=int, default=160)
    args = ap.parse_args()

    crate = CrateFile.from_file(args.crate)
    prims = crate.prims()
    templates = assets.all_templates()

    np.seterr(divide="ignore", invalid="ignore")
    print(f"{'class':12s} {'tris':>6s} {'IoU':>6s} {'mesh<proxy':>10s} "
          f"{'proxy<mesh':>10s} {'RMSE m':>8s} {'mean m':>8s}  "
          f"(4-view orbit, res {args.res})")
    for cls, (root, tname) in ASSETS.items():
        tris = extract_triangles(crate, root, prims)
        if not len(tris):
            print(f"{cls:12s} (no authored geometry)")
            continue
        # Canonicalize: proxy frames put the instance origin at the AABB
        # bottom-center (ground contact), so shift the mesh the same way.
        lo, hi = tris.reshape(-1, 3).min(0), tris.reshape(-1, 3).max(0)
        shift = np.array([(lo[0] + hi[0]) / 2, (lo[1] + hi[1]) / 2, lo[2]],
                         np.float32)
        tris = tris - shift
        size = hi - lo
        tpl = templates[tname]
        center = np.array([0.0, 0.0, size[2] * 0.5], np.float32)
        radius = float(max(size[0], size[1])) * 1.6 + float(size[2]) * 0.8

        inter = union = nm = np_ = 0.0
        sq = n = ad = 0.0
        for yaw in (15.0, 105.0, 195.0, 285.0):
            cam, dirs = orbit_rays(center, radius, size[2] * 0.45,
                                   args.res, yaw)
            tm = mt_depth(tris, cam, dirs)
            tp = proxy_depth(tpl, cam, dirs)
            hm, hp = np.isfinite(tm), np.isfinite(tp)
            inter += (hm & hp).sum()
            union += (hm | hp).sum()
            nm += hm.sum()
            np_ += hp.sum()
            both = hm & hp
            if both.any():
                d = (tm[both] - tp[both])
                sq += float((d * d).sum())
                ad += float(np.abs(d).sum())
                n += int(both.sum())
        iou = inter / max(union, 1)
        rmse = (sq / max(n, 1)) ** 0.5
        # mesh<proxy: fraction of CAD-hit pixels the proxy also covers — a
        # solid proxy over an open lattice (the wire fence) should be ~1.0
        # there even though IoU is low.
        print(f"{cls:12s} {len(tris):6d} {iou:6.3f} {inter / max(nm, 1):10.3f} "
              f"{inter / max(np_, 1):10.3f} {rmse:8.3f} {ad / max(n, 1):8.3f}")


if __name__ == "__main__":
    main()
