"""Secondary benchmark: heatmap-decode throughput (north star: >=5k img/s).

Measures the inference decode path on (B, 83, 128, 128) heatmaps: DARK decode
(blur + argmax + log-Hessian refinement), soft-argmax, and multi-peak
extraction. Prints one JSON line per stage.

Timing uses ``utils/profiling.chained_ms`` — a device-side chain where each
iteration's input depends on the previous output — per the repo timing rules
(async submit-then-block under-reports through the axon tunnel; host
per-call dispatch costs 25-400 ms).
"""

import json
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp

from constructionsceneposeestimation_tpu.ops import decode, heatmap
from constructionsceneposeestimation_tpu.utils import profiling

B = 256
# Fixed at the round-1/2 comparison shape (the old 83-channel layout) so the
# numbers stay comparable across rounds; the production channel count dropped
# to 71 when crane corners became axis keypoints, which would otherwise
# inflate img/s by ~17% with no code change.
C = 83
H = W = 128


def main():
    key = jax.random.PRNGKey(0)
    uv = jax.random.uniform(key, (B, 200, 2), minval=0, maxval=512)
    ch = jax.random.randint(jax.random.PRNGKey(1), (B, 200), 0, C)
    vis = jnp.ones((B, 200), bool)
    hms = heatmap.render_heatmaps_pallas(uv, ch, vis, C, H, W, 2.0, stride=4.0)
    hms = jax.block_until_ready(hms)

    def emit(name, ms):
        print(json.dumps({
            "metric": f"{name}_img_per_sec", "value": round(B / (ms / 1e3), 1),
            "unit": "img/s", "vs_baseline": round(B / (ms / 1e3) / 5000.0, 3),
        }))

    # Each step perturbs the input heatmaps with an f32 epsilon derived from
    # the carried accumulator (un-elidable; int*0 would constant-fold) and
    # carries a scalar derived from the decoded output. Heatmaps ride
    # chained_ms's args (a closure constant of this size is embedded in the
    # HLO and overflows the tunnel's compile upload).
    def chain(fn):
        def step(acc, h):
            out_uv, out_sc = fn(h + acc * 1e-30)
            return acc + jnp.sum(out_uv) * 1e-12
        return step

    emit("dark_decode", profiling.chained_ms(
        chain(decode.dark_decode), args=(hms,)))
    emit("soft_argmax", profiling.chained_ms(
        chain(decode.soft_argmax), args=(hms,)))
    emit("extract_peaks_8", profiling.chained_ms(
        chain(lambda h: decode.extract_peaks(h, max_peaks=8)), args=(hms,)))


if __name__ == "__main__":
    main()
