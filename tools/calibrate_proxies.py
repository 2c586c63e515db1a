#!/usr/bin/env python
"""Calibrate proxy assets against the reference's composed scene crate.

Parses ``cad_models/world2.usd.backup`` (the only non-LFS-stub scene binary
the reference ships) with io/usdc.py — no pxr needed — and prints a table
comparing:

* object counts and world placements (crane, dumper, worker, cones, trees,
  fence panels) against sample/placement.py's layout assumptions, and
* measured world-space dimensions of every asset whose geometry is authored
  IN the crate (fence panels, traffic cones, trees) against
  scene/assets.py's proxy AABBs.

Crane / dumper / DHGen worker bodies are references to external .usd files
that are LFS stubs in the reference checkout — only their placements and
unit scales are recoverable (recorded below); their proxy dimensions remain
estimated from the generator script's numbers (see PARITY.md).

Usage: python tools/calibrate_proxies.py [path-to-crate]
"""

import sys

import numpy as np

sys.path.insert(0, ".")  # repo root

from constructionsceneposeestimation_tpu.io.usdc import CrateFile  # noqa: E402
from constructionsceneposeestimation_tpu.scene import assets  # noqa: E402

DEFAULT_CRATE = "/root/reference/cad_models/world2.usd.backup"


def quat_to_matrix(q):
    """Crate xformOp:orient components are (i, j, k, real): the Tree group's
    Y-up -> Z-up +90deg-about-X decodes as [0.703, 0, 0, 0.711] and identity
    as [0, 0, 0, 1]."""
    x, y, z, w = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def local_matrix(crate, prim):
    tr, q, s = crate.local_transform(prim)
    M = np.eye(4)
    R = quat_to_matrix(q) if q is not None else np.eye(3)
    M[:3, :3] = R * np.asarray(s)[None, :]
    M[:3, 3] = tr
    return M


def world_matrix(crate, prim):
    M = np.eye(4)
    parts = prim.strip("/").split("/")
    for i in range(len(parts)):
        M = M @ local_matrix(crate, "/" + "/".join(parts[:i + 1]))
    return M


def world_aabb(crate, root_prim, prims):
    """World AABB over every Mesh under root_prim with authored points."""
    lo = np.full(3, np.inf)
    hi = np.full(3, -np.inf)
    found = False
    for p, f in prims.items():
        if p != root_prim and not p.startswith(root_prim + "/"):
            continue
        if f.get("typeName") != "Mesh":
            continue
        pts = crate.attr_default(p, "points")
        if pts is None or not hasattr(pts, "ndim") or pts.ndim != 2:
            continue
        M = world_matrix(crate, p)
        w = pts @ M[:3, :3].T + M[:3, 3]
        lo = np.minimum(lo, w.min(0))
        hi = np.maximum(hi, w.max(0))
        found = True
    return (lo, hi) if found else None


def fmt_vec(v):
    return "[" + " ".join(f"{x:7.3f}" for x in v) + "]"


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_CRATE
    crate = CrateFile.from_file(path)
    prims = crate.prims()
    gp = "/World/GroundPlane"
    kids = prims[gp]["primChildren"]
    print(f"crate: {path}")
    print(f"prims: {len(prims)}   referenced assets: "
          f"{prims[gp].get('references')}")
    print()

    groups = {"fence": [], "cone": [], "tree": [], "crane": [], "dumper": [],
              "human": []}
    for k in kids:
        p = f"{gp}/{k}"
        if "Fencing" in k:
            groups["fence"].append(p)
        elif k.startswith("Cone"):
            groups["cone"].append(p)
        elif "Pk7501" in k:
            groups["crane"].append(p)
        elif k.startswith("tn__"):
            groups["dumper"].append(p)
        elif k == "DHGen":
            groups["human"].append(p)
    tree_root = "/World/Tree"
    for k in prims.get(tree_root, {}).get("primChildren", []):
        groups["tree"].append(f"{tree_root}/{k}")

    print("=== object census + placements (world frame, meters) ===")
    for name, members in groups.items():
        print(f"{name}: {len(members)} instance(s)")
        for m in members[:4]:
            M = world_matrix(crate, m)
            print(f"   {m.split('/')[-1][:40]:42s} pos={fmt_vec(M[:3, 3])}")
        if len(members) > 4:
            print(f"   ... {len(members) - 4} more")

    print()
    print("=== measured dimensions (authored geometry only) vs proxies ===")
    templates = assets.all_templates()
    proxy_of = {"fence": "fence", "cone": "trafficcone", "tree": "tree"}
    print(f"{'class':8s} {'USD size (m)':30s} {'proxy size (m)':30s} delta")
    for gname, tname in proxy_of.items():
        # The originally-referenced instance keeps its external payload;
        # in-place copies are flattened with authored points — use those.
        bb = None
        for member in groups[gname]:
            bb = world_aabb(crate, member, prims)
            if bb is not None:
                break
        if bb is None:
            print(f"{gname:8s} (no authored geometry in crate)")
            continue
        size = bb[1] - bb[0]
        t = templates[tname]
        psize = t.aabb_max - t.aabb_min
        # fence/tree proxies are axis-aligned in local frame; compare sorted
        # extents (instance yaw rotates x/y).
        s_usd = np.sort(size)
        s_pxy = np.sort(psize)
        print(f"{gname:8s} {fmt_vec(s_usd):30s} {fmt_vec(s_pxy):30s} "
              f"{fmt_vec(s_usd - s_pxy)}")

    print()
    print("=== external-reference assets (geometry not in crate) ===")
    for gname in ("crane", "dumper", "human"):
        for m in groups[gname]:
            tr, q, s = crate.local_transform(m)
            print(f"{gname:8s} {m.split('/')[-1]}: translate={fmt_vec(tr)} "
                  f"scale={fmt_vec(s)}")

    # Site bounds: fence panel world positions span the placement area.
    fx = [world_matrix(crate, m)[:3, 3] for m in groups["fence"]]
    fx = np.asarray(fx)
    print()
    print("=== fence ring extent (site bounds) ===")
    print(f"x: [{fx[:, 0].min():.2f}, {fx[:, 0].max():.2f}]  "
          f"y: [{fx[:, 1].min():.2f}, {fx[:, 1].max():.2f}]")
    from constructionsceneposeestimation_tpu.config import RandomizationConfig
    rc = RandomizationConfig()
    print(f"repo fence_x={rc.fence_x} fence_y={rc.fence_y}")


if __name__ == "__main__":
    main()
