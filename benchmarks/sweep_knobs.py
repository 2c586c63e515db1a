"""Quick A/B of headline-bench knobs on the real chip (round-5 ask 4).

Sweeps BATCH x vmap_chunk x sweep-kernel row-block (hb) x accumulator
fan-out (n_acc) on the all-modality consumer; prints one JSON line per
config. Methodology: the tunnel-safe chained scan from bench.py.
"""

import argparse
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp

from constructionsceneposeestimation_tpu.config import Config, PipelineConfig
from constructionsceneposeestimation_tpu.parallel import pipeline as pipeline_mod
from constructionsceneposeestimation_tpu.render import sweep_kernel


def full_consume(b):
    f32 = jnp.float32
    fin = lambda x: jnp.sum(jnp.where(jnp.isfinite(x), x, 0.0))
    return (fin(b.depth) + jnp.sum(b.rgb.astype(f32))
            + jnp.sum(b.instance).astype(f32) + jnp.sum(b.heatmaps)
            + fin(b.kpt_uv) + jnp.sum(b.kpt_visible).astype(f32)
            + jnp.sum(b.kpt_in_image).astype(f32)
            + fin(b.center) + fin(b.size) + fin(b.euler_deg)
            + jnp.sum(b.bbox2d).astype(f32) + fin(b.camera_pose7)
            + jnp.sum(b.inst_pixel_count).astype(f32)
            + jnp.sum(b.pointcloud_count).astype(f32))


def measure(batch, chunk, hb, n_acc, steps=4, image_textures=False):
    cfg = Config(pipeline=PipelineConfig(render_width=512, render_height=512,
                                         batch_size=batch))
    on_tpu = jax.default_backend() == "tpu"
    pipe = pipeline_mod.Pipeline(
        cfg, use_pallas_heatmaps=on_tpu, use_rgb_kernel=on_tpu,
        use_sweep_kernel=False, vmap_chunk=chunk,
        image_textures=image_textures)
    # Rebuild the sweeper with explicit hb / n_acc (Pipeline uses defaults).
    pipe.pixel_sweeper = sweep_kernel.make_pixel_sweeper(
        pipe.roster, pipe.intr, interpret=not on_tpu, hb=hb, n_acc=n_acc)
    gen = pipe.make_generate_fn(ladder=False)

    def step(acc, _):
        seed = jax.random.fold_in(jax.random.PRNGKey(0), acc.astype(jnp.int32))
        b = gen(seed, jnp.arange(batch))
        return acc + full_consume(b) * 1e-12, None

    run = jax.jit(lambda a: jax.lax.scan(step, a, None, length=steps)[0])
    float(jax.block_until_ready(run(jnp.float32(0.0))))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        float(jax.block_until_ready(run(jnp.float32(1.0))))
        best = min(best, (time.perf_counter() - t0) / steps)
    return batch / best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", type=str, default=(
        "512,8,64,4 512,8,32,4 512,8,64,8 512,16,64,4 1024,8,64,4 512,8,64,2"))
    ap.add_argument("--image-textures", action="store_true")
    args = ap.parse_args()
    for spec in args.configs.split():
        batch, chunk, hb, n_acc = (int(v) for v in spec.split(","))
        fps = measure(batch, chunk, hb, n_acc,
                      image_textures=args.image_textures)
        print(json.dumps({"batch": batch, "vmap_chunk": chunk, "hb": hb,
                          "n_acc": n_acc,
                          "image_textures": args.image_textures,
                          "fps": round(fps, 1)}), flush=True)


if __name__ == "__main__":
    main()
