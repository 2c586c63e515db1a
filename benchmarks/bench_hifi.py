"""Hifi-mesh datagen throughput (same chained methodology as bench.py).

Measures the --hifi render path: baked CAD triangle templates for
cone/fence/tree (render/meshcast.py) + analytic sweep for the rest, all
modalities consumed. Prints one JSON line per config.
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp

from constructionsceneposeestimation_tpu.config import Config, PipelineConfig
from constructionsceneposeestimation_tpu.parallel import pipeline as pipeline_mod

STEPS = 3


def consume(b):
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


def measure(hifi: bool, batch: int, vmap_chunk: int = 8) -> float:
    # Hifi runs UNVMAPPED (chunk 1): the mesh sweep's tile cull is a dynamic
    # while_loop whose trip count becomes the max over the batch under vmap
    # (render/meshcast.py header), which erodes most of the cull.
    cfg = Config(pipeline=PipelineConfig(render_width=512, render_height=512,
                                         batch_size=batch))
    on_tpu = jax.default_backend() == "tpu"
    pipe = pipeline_mod.Pipeline(
        cfg, use_pallas_heatmaps=on_tpu, use_rgb_kernel=on_tpu,
        use_sweep_kernel=on_tpu,
        vmap_chunk=1 if hifi else vmap_chunk, hifi_mesh=hifi)
    gen = pipe.make_generate_fn(ladder=False)

    def step(acc, _):
        seed = jax.random.fold_in(jax.random.PRNGKey(0), acc.astype(jnp.int32))
        b = gen(seed, jnp.arange(batch))
        return acc + consume(b) * 1e-12, None

    run = jax.jit(lambda a: jax.lax.scan(step, a, None, length=STEPS)[0])
    float(jax.block_until_ready(run(jnp.float32(0.0))))
    t0 = time.perf_counter()
    float(jax.block_until_ready(run(jnp.float32(1.0))))
    return batch / ((time.perf_counter() - t0) / STEPS)


def main() -> None:
    # hifi batch is smaller: one chained device program must stay well under
    # the axon tunnel's execution watchdog (the pre-cull sweep at batch 128
    # ran minutes and was killed as a "TPU device error").
    for hifi, batch in ((False, 128), (True, 32)):
        fps = measure(hifi, batch)
        print(json.dumps({
            "metric": "annotated_512x512_frames_per_sec_per_chip",
            "mode": "hifi_mesh" if hifi else "proxy",
            "batch": batch,
            "value": round(fps, 2),
            "unit": "frames/s",
        }), flush=True)


if __name__ == "__main__":
    main()
