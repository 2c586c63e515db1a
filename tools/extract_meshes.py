#!/usr/bin/env python
"""Bake decimated CAD triangle templates from the reference scene crate.

The reference renders real CAD meshes (SURVEY.md section 2.2); the crate
``cad_models/world2.usd.backup`` authors triangle geometry inline for the
traffic cone, the fence panels, and the trees (crane / dumper / worker bodies
are external LFS-stub references — tools/calibrate_proxies.py). This tool
extracts one canonical template per class, decimates it with vertex
clustering to a TPU-friendly triangle budget, and writes
``constructionsceneposeestimation_tpu/data/mesh_templates.npz`` — the input
of the hifi mesh render path (render/meshcast.py).

Canonical frame matches the proxy templates (scene/assets.py): instance
origin at the AABB bottom-center (ground contact), world axes of the crate's
default pose (the cone and tree are revolution-symmetric; the fence panel is
rotated so its long axis lies on +x, the proxy convention).

Usage: python tools/extract_meshes.py [path-to-crate] [--out npz]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from constructionsceneposeestimation_tpu.io.usdc import CrateFile  # noqa: E402
from tools.calibrate_proxies import world_matrix  # noqa: E402
from tools.mesh_fidelity import extract_triangles  # noqa: E402

DEFAULT_CRATE = "/root/reference/cad_models/world2.usd.backup"
DEFAULT_OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "constructionsceneposeestimation_tpu", "data", "mesh_templates.npz")

# class -> (crate root prim, triangle budget)
SOURCES = {
    "trafficcone": ("/World/GroundPlane/Cone001_01", 800),
    "fence": ("/World/GroundPlane/Construction_Site_Construction_Zeppelin_"
              "Rental_GmbH_Metal_Construction_Site_Fencing_height_03", 900),
    "tree": ("/World/Tree/Tree_01", 2200),
}


def weld(tris: np.ndarray, tol: float = 1e-6):
    """(T, 3, 3) triangle soup -> indexed (verts (V, 3), faces (T, 3))."""
    flat = tris.reshape(-1, 3)
    key = np.round(flat / tol).astype(np.int64)
    _, idx, inv = np.unique(key, axis=0, return_index=True, return_inverse=True)
    verts = flat[idx]
    faces = inv.reshape(-1, 3).astype(np.int32)
    return verts.astype(np.float32), faces


def cluster_decimate(verts: np.ndarray, faces: np.ndarray, budget: int):
    """Uniform-grid vertex clustering to <= budget triangles.

    Snaps vertices to grid cells, replaces each cell by its centroid, drops
    degenerate and duplicate faces. Coarse but robust; silhouette accuracy is
    what the hifi path needs, not watertightness."""
    if len(faces) <= budget:
        return verts, faces
    lo, hi = verts.min(0), verts.max(0)
    diag = float(np.linalg.norm(hi - lo))
    # bisection on cell size: larger cell -> fewer triangles
    cell_lo, cell_hi = diag * 1e-4, diag * 0.25
    best = None
    for _ in range(32):
        cell = (cell_lo * cell_hi) ** 0.5
        cid = np.floor((verts - lo) / cell).astype(np.int64)
        key = (cid[:, 0] << 42) ^ (cid[:, 1] << 21) ^ cid[:, 2]
        uniq, inv = np.unique(key, return_inverse=True)
        nv = len(uniq)
        cverts = np.zeros((nv, 3), np.float64)
        counts = np.bincount(inv, minlength=nv).astype(np.float64)
        for ax in range(3):
            cverts[:, ax] = np.bincount(inv, weights=verts[:, ax],
                                        minlength=nv) / counts
        f = inv[faces]
        ok = (f[:, 0] != f[:, 1]) & (f[:, 1] != f[:, 2]) & (f[:, 0] != f[:, 2])
        f = f[ok]
        # dedupe faces irrespective of winding-preserving rotation
        fs = np.sort(f, axis=1)
        _, fidx = np.unique(fs, axis=0, return_index=True)
        f = f[np.sort(fidx)]
        n = len(f)
        if n <= budget:
            best = (cverts.astype(np.float32), f.astype(np.int32))
            cell_hi = cell  # try finer for more detail
        else:
            cell_lo = cell
        if abs(n - budget) <= max(8, budget // 50) and n <= budget:
            break
    if best is None:  # budget unreachable (shouldn't happen)
        return verts, faces
    return best


def canonicalize(verts: np.ndarray, cls: str) -> np.ndarray:
    lo, hi = verts.min(0), verts.max(0)
    if cls == "fence":
        # proxy convention: long axis on x
        if (hi - lo)[1] > (hi - lo)[0]:
            verts = verts[:, [1, 0, 2]] * np.float32([1, -1, 1])
            lo, hi = verts.min(0), verts.max(0)
    shift = np.array([(lo[0] + hi[0]) / 2, (lo[1] + hi[1]) / 2, lo[2]],
                     np.float32)
    return verts - shift


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("crate", nargs="?", default=DEFAULT_CRATE)
    ap.add_argument("--out", default=DEFAULT_OUT)
    args = ap.parse_args()

    crate = CrateFile.from_file(args.crate)
    prims = crate.prims()
    out = {}
    for cls, (root, budget) in SOURCES.items():
        tris = extract_triangles(crate, root, prims)
        if not len(tris):
            print(f"{cls}: no authored geometry, skipped")
            continue
        verts, faces = weld(tris)
        v0, f0 = len(verts), len(faces)
        verts, faces = cluster_decimate(verts, faces, budget)
        verts = canonicalize(verts, cls)
        size = verts.max(0) - verts.min(0)
        print(f"{cls}: {f0} tris / {v0} verts -> {len(faces)} / {len(verts)}"
              f"  size {size[0]:.2f} x {size[1]:.2f} x {size[2]:.2f} m")
        out[f"{cls}_verts"] = verts
        out[f"{cls}_faces"] = faces
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    np.savez_compressed(args.out, **out)
    print(f"wrote {args.out} ({os.path.getsize(args.out)} bytes)")


if __name__ == "__main__":
    main()
