#!/usr/bin/env python
"""Side-by-side viz: flat-Lambert vs procedural textures vs IMAGE textures.

Renders the same ladder viewpoints three ways (render/annotate.render_frame
with procedural_textures off/on, then with the real-image low-rank texture
tier from render/textures.py stacked on top) and writes a comparison PNG per
frame plus an index.html. Run on any backend:

    python tools/viz_textures.py --out /tmp/texviz --frames 4
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from constructionsceneposeestimation_tpu.config import Config, PipelineConfig  # noqa: E402
from constructionsceneposeestimation_tpu.parallel import pipeline as pipeline_mod  # noqa: E402
from constructionsceneposeestimation_tpu.render import annotate  # noqa: E402
from constructionsceneposeestimation_tpu.sample import camera_sampler, lighting as lmod  # noqa: E402
from constructionsceneposeestimation_tpu.utils import viz  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/texviz")
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--worker", action="store_true",
                    help="close-up on the worker: camera 3.5 m from the "
                         "human instance (round-5 fabric albedo + "
                         "normal/roughness side-by-side)")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    cfg = Config(pipeline=PipelineConfig(render_width=args.size,
                                         render_height=args.size))
    pipe = pipeline_mod.Pipeline(cfg, vmap_chunk=4)
    cams, tgts = camera_sampler.systematic_camera_positions(
        max(args.frames, 8), jax.random.PRNGKey(args.seed + 99))

    from constructionsceneposeestimation_tpu.render import textures as tex_mod
    factors = tex_mod.load_factors()

    def frame(seed, i, textures, image_tex=False):
        key = jax.random.fold_in(jax.random.PRNGKey(seed), i)
        k_scene, k_light = jax.random.split(key)
        from constructionsceneposeestimation_tpu.sample import placement
        pose, _diag = placement.randomize_scene(
            k_scene, pipe.roster, cfg.scene, cfg.randomization)
        from constructionsceneposeestimation_tpu.scene import world as world_mod
        world = world_mod.build_world(pipe.roster, pose)
        lit = lmod.sample_lighting(k_light, cfg.lighting)
        cam, tgt = cams[i % len(cams)], tgts[i % len(tgts)]
        if args.worker:
            # Aim 3.5 m from the (first) human instance at chest height,
            # azimuth varying per frame.
            hidx = int(np.argmax(pipe.roster.inst_class_id == 5))
            hpos = world["inst_pos"][hidx]
            ang = 2.3 + 0.9 * jnp.asarray(i, jnp.float32)
            off = jnp.stack([2.2 * jnp.cos(ang), 2.2 * jnp.sin(ang),
                             jnp.asarray(1.3, jnp.float32)])
            tgt = hpos + jnp.asarray([0.0, 0.0, 1.1])
            cam = hpos + off
        ann = annotate.render_frame(
            pipe.roster, pipe.caster, world, cam, tgt, pipe.intr,
            lighting=lit, procedural_textures=textures,
            texture_factors=factors if image_tex else None)
        return ann.rgb

    rows = []
    for i in range(args.frames):
        jf = jax.jit(frame, static_argnums=(2, 3))
        flat = np.asarray(jf(args.seed, i, False, False))
        tex = np.asarray(jf(args.seed, i, True, False))
        imtex = np.asarray(jf(args.seed, i, True, True))
        trip = np.concatenate([flat, tex, imtex], axis=1)  # side by side
        path = os.path.join(args.out, f"frame_{i:02d}.png")
        viz.save_png(path, trip)
        rows.append(f'<div><p>frame {i}: flat | procedural textures + AO | '
                    f'+ real image textures (bark/leaf/fabric/ground)</p>'
                    f'<img src="frame_{i:02d}.png" width="100%"/></div>')
        print("wrote", path)
    with open(os.path.join(args.out, "index.html"), "w") as f:
        f.write("<html><body><h2>Procedural texture pass</h2>"
                + "\n".join(rows) + "</body></html>")
    print("open", os.path.join(args.out, "index.html"))


if __name__ == "__main__":
    main()
