"""Stage decomposition of the HEAD headline program (kernels ON).

Same consumption-set method as benchmarks/roofline.py part 2, but with the
round-4 Pallas kernels enabled (the roofline script predates them) so the
deltas describe the program the driver actually benches.
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp

from constructionsceneposeestimation_tpu.config import Config, PipelineConfig
from constructionsceneposeestimation_tpu.parallel import pipeline as pipeline_mod
from benchmarks.roofline import _consumers, full_consume

BATCH = 128
STEPS = 8


def build(consume, textures=True):
    cfg = Config(pipeline=PipelineConfig(render_width=512, render_height=512,
                                         batch_size=BATCH))
    on_tpu = jax.default_backend() == "tpu"
    pipe = pipeline_mod.Pipeline(
        cfg, use_pallas_heatmaps=on_tpu, use_rgb_kernel=on_tpu,
        use_sweep_kernel=on_tpu, vmap_chunk=8, procedural_textures=textures)
    gen = pipe.make_generate_fn(ladder=False)

    def step(acc, _):
        seed = jax.random.fold_in(jax.random.PRNGKey(0), acc.astype(jnp.int32))
        b = gen(seed, jnp.arange(BATCH))
        return acc + consume(b) * 1e-12, None

    return jax.jit(lambda a: jax.lax.scan(step, a, None, length=STEPS)[0])


def main():
    rows = _consumers(fine=True)
    prev = 0.0
    for name, consume, textures in rows:
        run = build(consume, textures)
        float(jax.block_until_ready(run(jnp.float32(0.0))))
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            float(jax.block_until_ready(run(jnp.float32(1.0))))
            best = min(best, (time.perf_counter() - t0) / STEPS)
        ms = best * 1e3
        print(json.dumps({"stage": name, "ms_per_batch128": round(ms, 2),
                          "delta_ms": round(ms - prev, 2),
                          "fps": round(BATCH / best, 1)}), flush=True)
        prev = ms


if __name__ == "__main__":
    main()
