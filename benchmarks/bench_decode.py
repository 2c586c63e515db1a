"""Secondary benchmark: heatmap-decode throughput (north star: >=5k img/s).

Measures the full inference decode path on (B, 83, 128, 128) heatmaps:
DARK decode (blur + argmax + log-Hessian refinement) -> per-class PnP for the
equipment classes. Prints one JSON line per stage.
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp

from constructionsceneposeestimation_tpu.eval import pipeline as eval_pipeline
from constructionsceneposeestimation_tpu.ops import decode, heatmap
from constructionsceneposeestimation_tpu.scene import assets

B = 256
C = assets.NUM_KEYPOINT_CHANNELS
H = W = 128


def timed(fn, *args, n=10):
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(n)]
    jax.block_until_ready(outs[-1])
    return (time.perf_counter() - t0) / n


def main():
    key = jax.random.PRNGKey(0)
    uv = jax.random.uniform(key, (B, 200, 2), minval=0, maxval=512)
    ch = jax.random.randint(jax.random.PRNGKey(1), (B, 200), 0, C)
    vis = jnp.ones((B, 200), bool)
    hms = heatmap.render_heatmaps_pallas(uv, ch, vis, C, H, W, 2.0, stride=4.0)
    jax.block_until_ready(hms)

    f_dark = jax.jit(lambda h: decode.dark_decode(h))
    dt = timed(f_dark, hms)
    print(json.dumps({
        "metric": "dark_decode_img_per_sec", "value": round(B / dt, 1),
        "unit": "img/s", "vs_baseline": round(B / dt / 5000.0, 3),
    }))

    f_soft = jax.jit(lambda h: decode.soft_argmax(h))
    dt = timed(f_soft, hms)
    print(json.dumps({
        "metric": "soft_argmax_img_per_sec", "value": round(B / dt, 1),
        "unit": "img/s", "vs_baseline": round(B / dt / 5000.0, 3),
    }))


if __name__ == "__main__":
    main()
