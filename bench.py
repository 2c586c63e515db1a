"""Headline benchmark: annotated 512x512 datagen frames/sec on one chip.

Each "frame" is the full reference modality set — shaded RGB, depth, instance
map, 6DoF bbox labels, keypoint visibility, and Gaussian heatmap targets —
produced by the batched jitted pipeline (no host I/O on the timed path, like
the reference's annotator reads which exclude disk writes).

Baseline: the reference's implied throughput is <=0.15 frames/s (>=6-8 s of
mandatory settle sleeps per frame; BASELINE.md "Implied reference
throughput"). vs_baseline = ours / 0.15.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp

from constructionsceneposeestimation_tpu.config import Config, PipelineConfig
from constructionsceneposeestimation_tpu.parallel import pipeline as pipeline_mod

REFERENCE_FPS = 0.15
BATCH = 512  # batch x vmap_chunk sweep (docs/PERFORMANCE.md): 512 x 8 best
STEPS = 4


def main() -> None:
    cfg = Config(pipeline=PipelineConfig(render_width=512, render_height=512,
                                         batch_size=BATCH))
    on_tpu = jax.default_backend() == "tpu"
    pipe = pipeline_mod.Pipeline(
        cfg, use_pallas_heatmaps=on_tpu, use_rgb_kernel=on_tpu,
        use_sweep_kernel=on_tpu, vmap_chunk=8)
    gen = pipe.make_generate_fn(ladder=False)

    # Device-side loop with an un-elidable chain: each step's PRNG seed folds
    # in a value computed from the previous batch, so XLA cannot parallelize
    # or constant-fold steps away (int32 `*0` tricks DO get folded; naive
    # async timing through the axon tunnel is also unreliable — its
    # block_until_ready does not cover queued predecessors). One host fetch
    # of a scalar at the end forces the whole chain. This measures on-device
    # generation throughput, the production regime (writers overlap via
    # double buffering on a separate stream).
    #
    # EVERY modality is consumed by a FULL reduction: a partial consumer
    # (e.g. only pointcloud_count, as this bench did before round 3) lets
    # XLA dead-code-eliminate entire pipeline stages — the RGB shading path
    # is elementwise per pixel, so even a strided-slice consumer can be
    # partially elided. Rounds 1-2 effectively timed a depth-only program
    # (restated in README.md).
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

    def step(carry, _):
        acc = carry
        seed = jax.random.fold_in(jax.random.PRNGKey(0), acc.astype(jnp.int32))
        batch = gen(seed, jnp.arange(BATCH))
        return acc + consume(batch) * 1e-12, None

    run = jax.jit(lambda a: jax.lax.scan(step, a, None, length=STEPS)[0])
    float(jax.block_until_ready(run(jnp.float32(0.0))))  # compile + warm-up

    t0 = time.perf_counter()
    float(jax.block_until_ready(run(jnp.float32(1.0))))
    dt = (time.perf_counter() - t0) / STEPS
    fps = BATCH / dt

    print(json.dumps({
        "metric": "annotated_512x512_frames_per_sec_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / REFERENCE_FPS, 1),
    }))


if __name__ == "__main__":
    main()
