"""Secondary benchmark: end-to-end training throughput (BASELINE config 5).

One number: images/second through the FULL on-device loop — scene sampling,
ray-cast render, heatmap targets, preprocessing, forward, backward, adamw —
measured with a genuine sequential chain (the state threads through
lax.scan). The reference has no training path at all.
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp

from constructionsceneposeestimation_tpu.config import Config, PipelineConfig, TrainConfig
from constructionsceneposeestimation_tpu.models import pose_net
from constructionsceneposeestimation_tpu.parallel import pipeline as pipeline_mod
from constructionsceneposeestimation_tpu.train import loop as train_loop

BATCH = 32
SIZE = 256
INNER = 20


def main() -> None:
    cfg = Config(
        pipeline=PipelineConfig(render_width=SIZE, render_height=SIZE),
        train=TrainConfig(batch_size=BATCH, steps=INNER * 2 + 1),
    )
    model = pose_net.make_model()
    pipe = pipeline_mod.Pipeline(
        cfg, use_pallas_heatmaps=jax.default_backend() == "tpu", vmap_chunk=8)
    run = jax.jit(train_loop.make_scanned_train_fn(cfg, model, pipe, INNER))
    state = train_loop.create_train_state(cfg, model, jax.random.PRNGKey(0))
    seed = jax.random.PRNGKey(1)
    state, m = run(state, seed, jnp.int32(0))
    jax.block_until_ready(m["loss"])  # compile + warm-up
    t0 = time.perf_counter()
    state, m = run(state, seed, jnp.int32(INNER * BATCH))
    float(m["loss"])  # state chain + host fetch force every step
    dt = (time.perf_counter() - t0) / INNER
    print(json.dumps({
        "metric": f"train_img_per_sec_{SIZE}x{SIZE}_full_backbone",
        "value": round(BATCH / dt, 1),
        "unit": "img/s",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()
