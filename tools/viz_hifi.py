#!/usr/bin/env python
"""Side-by-side proxy vs hifi-mesh renders (RGB + instance + depth).

Writes viz_hifi/{proxy,hifi}_NN.png plus a diff column — the visual
counterpart of tests/test_meshcast.py. Runs on CPU by default (pass --tpu
to use the real chip).

Usage: python tools/viz_hifi.py [--res 256] [--frames 3] [--out viz_hifi]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--frames", type=int, default=3)
    ap.add_argument("--out", default="viz_hifi")
    ap.add_argument("--tpu", action="store_true")
    args = ap.parse_args()

    import jax
    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from constructionsceneposeestimation_tpu.config import SceneConfig
    from constructionsceneposeestimation_tpu.core import camera as cam_mod
    from constructionsceneposeestimation_tpu.io.native import encode_png_rgb8 as encode_png
    from constructionsceneposeestimation_tpu.render import (annotate, meshcast,
                                                            raycast)
    from constructionsceneposeestimation_tpu.sample import lighting as lt
    from constructionsceneposeestimation_tpu.scene import world as wm

    cfg = SceneConfig()
    roster = wm.make_roster(cfg)
    hifi = meshcast.make_hifi_caster(roster, scene_cfg=cfg)
    plain = raycast.make_raycaster(roster, scene_cfg=cfg)
    pose = wm.default_pose(roster, cfg)
    world = wm.build_world(roster, pose)
    intr = cam_mod.intrinsics_from_apertures(12.0, 25.0, args.res, args.res)

    # Articulate the worker (bent elbows/knees) so the skinned-mesh worker
    # view shows smooth joints vs the rigid capsule seams.
    from constructionsceneposeestimation_tpu.scene import (assets,
                                                           kinematics)
    n_h = roster.human_slice[1] - roster.human_slice[0]
    if n_h:
        ang = jnp.asarray([25.0, 50.0, 75.0, -20.0, 35.0, 45.0,
                           18.0, 45.0, -12.0, 30.0], jnp.float32)
        joints = jax.vmap(lambda a: kinematics.pose_human_joints(
            jnp.asarray(assets.CANONICAL_COCO), a))(
                jnp.broadcast_to(ang, (n_h, 10)))
        pose = wm.ScenePose(pose.crane_pos, pose.crane_yaw_deg,
                            pose.crane_joints, pose.positions, pose.yaw_deg,
                            human_joints=joints)
        world = wm.build_world(roster, pose)

    # viewpoints: wide site view, cone close-up, fence-on view, tree view,
    # articulated-worker close-up (skinned LBS mesh under --hifi)
    c0 = roster.cone_slice[0]
    t0 = roster.tree_slice[0]
    h0 = roster.human_slice[0]
    cone = np.asarray(world["inst_pos"])[c0]
    tree = np.asarray(world["inst_pos"])[t0]
    human = np.asarray(world["inst_pos"])[h0] if n_h else np.zeros(3)
    views = [
        (np.float32([14.0, 8.0, 4.0]), np.float32([0.0, 0.0, 1.0])),
        ((cone + [2.0, 1.2, 0.9]).astype(np.float32),
         (cone + [0, 0, 0.3]).astype(np.float32)),
        (np.float32([0.0, -14.5, 2.0]), np.float32([0.0, -10.7, 1.0])),
        ((tree + [9.0, 3.0, 3.0]).astype(np.float32),
         (tree + [0, 0, 3.5]).astype(np.float32)),
        ((human + [2.2, 0.7, 1.3]).astype(np.float32),
         (human + [0, 0, 0.95]).astype(np.float32)),
    ][: max(args.frames, 1)]

    os.makedirs(args.out, exist_ok=True)
    lighting = lt.sample_lighting(jax.random.PRNGKey(3),
                                  __import__(
        "constructionsceneposeestimation_tpu.config",
        fromlist=["LightingConfig"]).LightingConfig())

    for i, (cam, tgt) in enumerate(views):
        row = []
        for name, caster in (("proxy", plain), ("hifi", hifi)):
            fr = annotate.render_frame(roster, caster, world,
                                       jnp.asarray(cam), jnp.asarray(tgt),
                                       intr, lighting=lighting)
            rgb = np.asarray(fr.rgb)
            row.append(rgb)
            with open(os.path.join(args.out, f"{name}_{i:02d}.png"), "wb") as f:
                f.write(encode_png(rgb))
        diff = (np.abs(row[0].astype(np.int16) - row[1].astype(np.int16))
                .max(-1) > 8)
        dimg = np.stack([diff * 255, diff * 64, diff * 64], -1).astype(np.uint8)
        with open(os.path.join(args.out, f"diff_{i:02d}.png"), "wb") as f:
            f.write(encode_png(np.concatenate([row[0], row[1], dimg], axis=1)))
        print(f"view {i}: diff px {int(diff.sum())}/{diff.size}")
    print(f"wrote {args.out}/")


if __name__ == "__main__":
    main()
