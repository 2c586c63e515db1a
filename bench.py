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
BATCH = 32
STEPS = 5


def main() -> None:
    cfg = Config(pipeline=PipelineConfig(render_width=512, render_height=512,
                                         batch_size=BATCH))
    pipe = pipeline_mod.Pipeline(cfg, use_pallas_heatmaps=jax.default_backend() == "tpu")
    gen = jax.jit(pipe.make_generate_fn(ladder=False))
    seed = jax.random.PRNGKey(0)

    # Warm-up / compile.
    batch = gen(seed, jnp.arange(BATCH))
    jax.block_until_ready(batch)

    # Chained timing: each step's frame_ids depend on the previous batch, so
    # the device MUST execute every step before the final host fetch — naive
    # async timing under-reports through the axon tunnel, whose
    # block_until_ready does not reliably cover queued predecessors.
    t0 = time.perf_counter()
    for s in range(STEPS):
        dep = batch.pointcloud_count[0] * 0
        batch = gen(seed, jnp.arange(s * BATCH, (s + 1) * BATCH) + dep)
    float(jnp.sum(batch.pointcloud_count))  # host fetch forces the chain
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
