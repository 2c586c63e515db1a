"""Bake a skinned worker mesh: capsule-surface triangles + two-bone LBS.

The reference animates a rigged DHGen SkelRoot human (its randomizer
translates/yaws the root, generate_construction_data.py:1158-1200; the rig
itself is an LFS stub upstream, so true skin weights are unobtainable —
PARITY.md). The analytic proxy articulates rigid capsules per segment
(scene/kinematics.human_capsule_transforms), which leaves hard creases at
bent joints in silhouettes/masks. This tool bakes the minimal
linear-blend-skinning pass SURVEY §7 hard-part 5 asks for:

* tessellate each canonical-pose body capsule (+ head sphere) into a
  watertight-enough shell (interior overlap is hidden by the depth min —
  no CSG needed for ray casting);
* give every vertex TWO bone influences — its owning capsule plus the
  ADJACENT capsule across the nearest shared joint — with a smooth
  distance-based falloff (w2 <= 0.5, reaching 0.5 exactly on the joint
  bisector), rigid (w2 = 0) away from joints;
* store per-vertex coordinates IN EACH BONE'S LOCAL FRAME
  (``v_loc[v, j] = R0_bone^T (v - c0_bone)``) so runtime skinning is just
  ``sum_j w_j (prim_rot[bone_j] @ v_loc_j + prim_pos[bone_j])`` against the
  posed world-frame prim transforms build_world already computes — the
  bones ARE the human's primitives (render/meshcast.py consumes this).

Bone order = human template prim order (scene/assets.human_template):
0 head sphere, 1 torso capsule, 2-9 = assets.HUMAN_SEGMENTS.

Usage: python tools/make_worker_skin.py [--theta 8]
(writes constructionsceneposeestimation_tpu/data/worker_skin.npz)
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from constructionsceneposeestimation_tpu.scene import assets

BLEND_TAU = 0.05  # blend half-width (m): w2 falls 0.5 -> 0 over this gap


def _frame_rows():
    """Canonical capsule/sphere frames in template coords, prim order.

    Returns (rot0 (B, 3, 3), c0 (B, 3), seg (B, 2, 3) core segments,
    radius (B,), adjacency list-of-sets)."""
    k = assets.CANONICAL_COCO
    head_c = k[0] + np.array([-0.06, 0.0, 0.04], np.float32)
    mid_sh = (k[5] + k[6]) / 2
    mid_hip = (k[11] + k[12]) / 2

    rows = [(np.eye(3, dtype=np.float32), head_c, (head_c, head_c),
             assets.HUMAN_HEAD_RADIUS)]
    segs = [(mid_sh, mid_hip)] + [(k[a], k[b]) for a, b, _ in
                                  assets.HUMAN_SEGMENTS]
    radii = [assets.HUMAN_TORSO_RADIUS] + [r for _, _, r in
                                           assets.HUMAN_SEGMENTS]
    for (a, b), r in zip(segs, radii):
        cap = assets._capsule_between(a, b, r)
        rows.append((np.asarray(cap[2], np.float32),
                     np.asarray(cap[1], np.float32), (a, b), r))
    rot0 = np.stack([r for r, _, _, _ in rows])
    c0 = np.stack([c for _, c, _, _ in rows])
    seg = np.stack([np.stack([np.asarray(s[0], np.float32),
                              np.asarray(s[1], np.float32)])
                    for _, _, s, _ in rows])
    rad = np.asarray([r for _, _, _, r in rows], np.float32)

    # Adjacency across shared joints (prim indices; 0 head, 1 torso,
    # 2/3 L arm, 4/5 R arm, 6/7 L leg, 8/9 R leg).
    adj = {0: {1}, 1: {0, 2, 4, 6, 8}, 2: {1, 3}, 3: {2}, 4: {1, 5},
           5: {4}, 6: {1, 7}, 7: {6}, 8: {1, 9}, 9: {8}}
    return rot0, c0, seg, rad, adj


def _capsule_shell(r: float, hh: float, n_theta: int):
    """Capsule surface (+Z axis): verts (V, 3), faces (T, 3)."""
    th = np.linspace(0, 2 * np.pi, n_theta, endpoint=False)
    ct, st = np.cos(th), np.sin(th)
    rings = []  # (radius, z)
    for phi in np.linspace(-np.pi / 2, 0, 4)[1:]:  # bottom cap (skip pole)
        rings.append((r * np.cos(phi), -hh + r * np.sin(phi)))
    for z in np.linspace(-hh, hh, 5)[1:-1]:  # cylinder interior rings
        rings.append((r, z))
    for phi in np.linspace(0, np.pi / 2, 4)[:-1]:  # top cap (skip pole)
        rings.append((r * np.cos(phi), hh + r * np.sin(phi)))
    verts = [np.array([0.0, 0.0, -hh - r], np.float32)]
    for rr, z in rings:
        verts.append(np.stack([rr * ct, rr * st, np.full(n_theta, z)], -1))
    verts.append(np.array([0.0, 0.0, hh + r], np.float32))
    V = np.concatenate([v.reshape(-1, 3) for v in
                        (verts[0][None], *verts[1:-1], verts[-1][None])])
    faces = []
    first = 1
    for j in range(n_theta):  # bottom fan
        faces.append((0, first + (j + 1) % n_theta, first + j))
    for ring in range(len(rings) - 1):
        a = 1 + ring * n_theta
        b = a + n_theta
        for j in range(n_theta):
            j2 = (j + 1) % n_theta
            faces.append((a + j, a + j2, b + j))
            faces.append((a + j2, b + j2, b + j))
    last = len(V) - 1
    a = last - n_theta
    for j in range(n_theta):  # top fan
        faces.append((last, a + j, a + (j + 1) % n_theta))
    return V.astype(np.float32), np.asarray(faces, np.int32)


def _sphere_shell(r: float, n_theta: int, n_phi: int = 6):
    v, f = _capsule_shell(r, 0.0, n_theta)
    del n_phi
    return v, f


def _seg_dist(p: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Distance from points (V, 3) to segment a-b."""
    d = b - a
    L2 = float(d @ d)
    if L2 < 1e-12:
        return np.linalg.norm(p - a, axis=-1)
    t = np.clip((p - a) @ d / L2, 0.0, 1.0)
    return np.linalg.norm(p - (a + t[:, None] * d), axis=-1)


def build(n_theta: int):
    rot0, c0, seg, rad, adj = _frame_rows()
    B = len(rad)

    verts, faces, owner = [], [], []
    off = 0
    for b in range(B):
        if b == 0:
            v, f = _sphere_shell(rad[b], n_theta)
        else:
            hh = float(np.linalg.norm(seg[b, 1] - seg[b, 0])) / 2.0
            v, f = _capsule_shell(rad[b], hh, n_theta)
        vw = v @ rot0[b].T + c0[b]  # capsule local -> template frame
        verts.append(vw)
        faces.append(f + off)
        owner.append(np.full(len(v), b, np.int32))
        off += len(v)
    verts = np.concatenate(verts)
    faces = np.concatenate(faces)
    owner = np.concatenate(owner)
    V = len(verts)

    # Signed surface distance to every bone's core.
    sdist = np.stack([_seg_dist(verts, seg[b, 0], seg[b, 1]) - rad[b]
                      for b in range(B)], -1)  # (V, B)

    bone_ids = np.zeros((V, 2), np.int32)
    w = np.zeros((V, 2), np.float32)
    bone_ids[:, 0] = owner
    for i in range(V):
        b1 = owner[i]
        cands = sorted(adj[int(b1)], key=lambda b: sdist[i, b])
        b2 = cands[0]
        gap = sdist[i, b2] - sdist[i, b1]  # >= ~0 near joints, grows away
        w2 = float(np.clip(0.5 - 0.5 * gap / BLEND_TAU, 0.0, 0.5))
        bone_ids[i, 1] = b2 if w2 > 0 else b1
        w[i] = (1.0 - w2, w2)

    # Per-vertex coords in each influencing bone's local frame.
    v_loc = np.zeros((V, 2, 3), np.float32)
    for j in range(2):
        for b in range(B):
            m = bone_ids[:, j] == b
            v_loc[m, j] = (verts[m] - c0[b]) @ rot0[b]

    # Conservative pose-independent local AABB for the tile cull: canonical
    # extents inflated by the max limb excursion under HUMAN_POSE_HIGH
    # (arm abduction 70 deg lifts the wrist ~0.55 m out/up).
    lo = np.array([-0.85, -0.85, -0.05], np.float32)
    hi = np.array([0.85, 0.85, 2.05], np.float32)
    return dict(verts=verts, faces=faces, bone_ids=bone_ids, weights=w,
                v_loc=v_loc, aabb_lo=lo, aabb_hi=hi)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--theta", type=int, default=8)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "constructionsceneposeestimation_tpu", "data", "worker_skin.npz"))
    args = ap.parse_args()
    d = build(args.theta)
    blended = (d["weights"][:, 1] > 0).mean()
    print(f"verts {len(d['verts'])} faces {len(d['faces'])} "
          f"blended-verts {blended:.0%}")
    out = os.path.abspath(args.out)
    np.savez_compressed(out, **d)
    print(f"wrote {out} ({os.path.getsize(out) / 1024:.0f} KB)")


if __name__ == "__main__":
    main()
