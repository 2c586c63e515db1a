"""Roofline measurement for the datagen pipeline (docs/PERFORMANCE.md).

Three parts, all measured on the executing backend (run on the real chip):

1. Empirical peaks — measured, not spec-sheet: f32 VPU throughput (chaotic
   quadratic map: non-foldable, register-chained), bf16 MXU matmul
   throughput, HBM read bandwidth. Runs are sized to several hundred ms so
   the axon tunnel's per-dispatch latency (25-400 ms) amortizes below 5%.
2. Stage decomposition — the bench program compiled with successively larger
   consumption sets (XLA dead-code-eliminates unconsumed stages, so each
   delta is one pipeline stage — the same mechanism that made rounds 1-2
   accidentally time a depth-only program now measures stages on purpose).
3. Jaxpr op counts per stage — ``utils/flops.count_ops`` recursing into
   scan/map bodies (XLA's cost_analysis does not and under-counts ~500x
   here). VPU lane-op tallies vs the measured peak give per-stage
   utilization and the ceiling of the current algorithm.

Usage: python benchmarks/roofline.py [--batch 128] [--steps 16]
Prints a markdown table for docs/PERFORMANCE.md.
"""

from __future__ import annotations

import argparse
import functools
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp

from constructionsceneposeestimation_tpu.config import Config, PipelineConfig
from constructionsceneposeestimation_tpu.core import camera as cam_mod
from constructionsceneposeestimation_tpu.parallel import pipeline as pipeline_mod
from constructionsceneposeestimation_tpu.render import annotate
from constructionsceneposeestimation_tpu.utils import flops as flops_mod


def _chained_time(run, steps: int, *args) -> float:
    """Seconds per step of an already-jitted chained program (min of 2)."""
    float(jax.block_until_ready(run(jnp.float32(0.0), *args)))  # compile+warm
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        float(jax.block_until_ready(run(jnp.float32(1.0), *args)))
        best = min(best, (time.perf_counter() - t0) / steps)
    return best


# ---------------------------------------------------------------------------
# Part 1: empirical peaks
# ---------------------------------------------------------------------------

def measure_peaks():
    # f32 VPU: chaotic quadratic map x <- 1 - 1.9 x^2 — nonlinear, so the
    # algebraic simplifier cannot collapse the chain (an affine x*a+b chain
    # folds to one madd at compile time). 3 lane-ops per iteration.
    n, K, steps = 1 << 24, 128, 256
    def vpu_step(acc):
        x = jnp.full((n,), 0.5, jnp.float32) + acc * 1e-20
        for _ in range(K):
            x = 1.0 - 1.9 * x * x
        return acc + jnp.sum(x) * 1e-30
    run = jax.jit(lambda s: jax.lax.fori_loop(
        0, steps, lambda i, acc: vpu_step(acc), s))
    dt = _chained_time(run, steps)
    vpu = (3.0 * K * n) / dt / 1e12

    # bf16 MXU: chained square matmuls (f32 `* 0` is not foldable — inf/nan).
    m, msteps = 4096, 128
    def mxu_step(acc):
        x = jnp.full((m, m), 0.001, jnp.bfloat16) + (acc * 0).astype(jnp.bfloat16)
        return acc + (x @ x)[0, 0].astype(jnp.float32) * 1e-20
    run = jax.jit(lambda s: jax.lax.fori_loop(
        0, msteps, lambda i, acc: mxu_step(acc), s))
    dt = _chained_time(run, msteps)
    mxu = (2.0 * m ** 3) / dt / 1e12

    # HBM read: full reduction of a 256 MB resident array; the where() on acc
    # defeats loop-invariant hoisting without materializing a copy.
    big = jnp.ones((64 * 1024 * 1024,), jnp.float32)
    hsteps = 256
    def hbm_step(acc, arr):
        return acc + jnp.sum(jnp.where(arr > acc * 1e-30, arr, acc)) * 1e-20
    run = jax.jit(lambda s, arr: jax.lax.fori_loop(
        0, hsteps, lambda i, acc: hbm_step(acc, arr), s), donate_argnums=())
    dt = _chained_time(run, hsteps, big)
    hbm = big.nbytes / dt / 1e9
    return {"vpu_f32_tflops": vpu, "mxu_bf16_tflops": mxu, "hbm_read_gbs": hbm}


# ---------------------------------------------------------------------------
# Part 2: stage decomposition by consumption set
# ---------------------------------------------------------------------------

def _fin(x):
    return jnp.sum(jnp.where(jnp.isfinite(x), x, 0.0))


def full_consume(b):
    f32 = jnp.float32
    return (_fin(b.depth) + jnp.sum(b.rgb.astype(f32))
            + jnp.sum(b.instance).astype(f32) + jnp.sum(b.heatmaps)
            + _fin(b.kpt_uv) + jnp.sum(b.kpt_visible).astype(f32)
            + jnp.sum(b.kpt_in_image).astype(f32)
            + _fin(b.center) + _fin(b.size) + _fin(b.euler_deg)
            + jnp.sum(b.bbox2d).astype(f32) + _fin(b.camera_pose7)
            + jnp.sum(b.inst_pixel_count).astype(f32)
            + jnp.sum(b.pointcloud_count).astype(f32))


def _consumers(fine: bool = False):
    f32 = jnp.float32
    c_depth = lambda b: _fin(b.depth) + jnp.sum(b.pointcloud_count).astype(f32)
    c_inst = lambda b: (c_depth(b) + jnp.sum(b.instance).astype(f32)
                        + jnp.sum(b.inst_pixel_count).astype(f32)
                        + jnp.sum(b.bbox2d).astype(f32))
    c_uv = lambda b: (c_inst(b) + _fin(b.kpt_uv)
                      + jnp.sum(b.kpt_in_image).astype(f32)
                      + _fin(b.camera_pose7))
    c_vis = lambda b: c_uv(b) + jnp.sum(b.kpt_visible).astype(f32)
    c_pose = lambda b: (c_vis(b) + _fin(b.center) + _fin(b.size)
                        + _fin(b.euler_deg))
    c_kpt = lambda b: c_pose(b) + jnp.sum(b.heatmaps)
    rows = [("depth", c_depth, True), ("+instance/bbox2d", c_inst, True)]
    if fine:
        # Sub-split of the keypoint stage: projection, occlusion-ray
        # visibility, pose labels (the SVD), heatmap rasterization.
        rows += [("+kpt_uv (projection)", c_uv, True),
                 ("+kpt_visible (occlusion rays)", c_vis, True),
                 ("+center/size/euler (SVD)", c_pose, True)]
    rows += [("+kpts/heatmaps", c_kpt, True),
             ("+rgb flat (no tex/AO)", full_consume, False),
             ("+rgb textured (full)", full_consume, True)]
    return rows


def build_run(batch, steps, consume, textures=True, vmap_chunk=8,
              rgb_ablate=frozenset()):
    cfg = Config(pipeline=PipelineConfig(render_width=512, render_height=512,
                                         batch_size=batch))
    pipe = pipeline_mod.Pipeline(
        cfg, use_pallas_heatmaps=jax.default_backend() == "tpu",
        vmap_chunk=vmap_chunk, procedural_textures=textures,
        rgb_ablate=rgb_ablate)
    gen = pipe.make_generate_fn(ladder=False)

    def step(carry, _):
        acc = carry
        seed = jax.random.fold_in(jax.random.PRNGKey(0), acc.astype(jnp.int32))
        b = gen(seed, jnp.arange(batch))
        return acc + consume(b) * 1e-12, None

    return jax.jit(lambda a: jax.lax.scan(step, a, None, length=steps)[0]), pipe


# ---------------------------------------------------------------------------
# Part 3: jaxpr op counts for the stage functions
# ---------------------------------------------------------------------------

def stage_op_counts(pipe):
    """Counts per frame for: depth sweep alone, labels w/o rgb, full render
    flat, full render textured."""
    roster, caster, intr = pipe.roster, pipe.caster, pipe.intr
    cfg = pipe.cfg
    from constructionsceneposeestimation_tpu.sample import (
        lighting as lighting_mod, placement)
    from constructionsceneposeestimation_tpu.scene import world as world_mod
    from constructionsceneposeestimation_tpu.utils import prng

    key = jax.random.PRNGKey(0)
    pose, _ = placement.randomize_scene(key, roster, cfg.scene,
                                        cfg.randomization,
                                        articulate_crane=True)
    world = world_mod.build_world(roster, pose)
    lit = lighting_mod.sample_lighting(key, cfg.lighting)
    cam = jnp.asarray([14.0, 2.0, 3.0], jnp.float32)
    tgt = jnp.asarray([0.0, 0.0, 1.5], jnp.float32)

    def sweep_only(world, cam, tgt):
        M = cam_mod.look_at_matrix(cam, tgt)
        origin, dirs = cam_mod.pixel_rays(intr, cam, M)
        return caster.fast(world, origin, dirs.reshape(-1, 3))

    counts = {}
    counts["pixel sweep"] = flops_mod.count_ops(sweep_only, world, cam, tgt)
    render = functools.partial(annotate.render_frame, roster, caster)
    counts["labels, no rgb"] = flops_mod.count_ops(
        lambda w, c, t: render(w, c, t, intr, lighting=lit, shade_rgb=False),
        world, cam, tgt)
    counts["render flat"] = flops_mod.count_ops(
        lambda w, c, t: render(w, c, t, intr, lighting=lit, shade_rgb=True,
                               procedural_textures=False), world, cam, tgt)
    counts["render textured"] = flops_mod.count_ops(
        lambda w, c, t: render(w, c, t, intr, lighting=lit, shade_rgb=True,
                               procedural_textures=True), world, cam, tgt)
    counts["scene sample + world"] = flops_mod.count_ops(
        lambda k: world_mod.build_world(roster, placement.randomize_scene(
            k, roster, cfg.scene, cfg.randomization,
            articulate_crane=True)[0]), key)
    return counts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--skip-peaks", action="store_true")
    ap.add_argument("--skip-timing", action="store_true")
    ap.add_argument("--fine", action="store_true",
                    help="sub-split the keypoint stage (uv / occlusion / "
                         "SVD / rasterizer)")
    ap.add_argument("--rgb-fine", action="store_true",
                    help="ablate RGB sub-stages one at a time (normals / "
                         "local / patterns / ao / barrier / hash / gamma) "
                         "and print each cost as a delta vs the full render")
    args = ap.parse_args()

    if args.rgb_fine:
        run, _ = build_run(args.batch, args.steps, full_consume)
        base = _chained_time(run, args.steps)
        print(f"## RGB sub-stage ablation (batch {args.batch}, full render "
              f"= {base * 1e3:.1f} ms/batch, {args.batch / base:.0f} f/s)")
        print("| ablated | ms/batch | f/s | stage cost (Δms) |")
        print("|---|---|---|---|")
        for tok in ("normals", "local", "patterns", "ao", "barrier",
                    "hash", "gamma"):
            run, _ = build_run(args.batch, args.steps, full_consume,
                               rgb_ablate=frozenset({tok}))
            dt = _chained_time(run, args.steps)
            print(f"| -{tok} | {dt * 1e3:.1f} | {args.batch / dt:.0f} "
                  f"| {(base - dt) * 1e3:+.1f} |", flush=True)
        return

    peaks = None
    if not args.skip_peaks:
        peaks = measure_peaks()
        print("## Empirical peaks (this chip, through the tunnel)")
        print(f"- f32 VPU lane-ops: {peaks['vpu_f32_tflops']:.2f} Top/s")
        print(f"- bf16 MXU matmul: {peaks['mxu_bf16_tflops']:.1f} TFLOP/s")
        print(f"- HBM read: {peaks['hbm_read_gbs']:.0f} GB/s")

    # Jaxpr op counts (backend-independent; cheap).
    _, pipe = build_run(args.batch, 1, full_consume, textures=True)
    counts = stage_op_counts(pipe)
    print("\n## Per-frame op counts (jaxpr tally, 512x512)")
    print("| stage fn | VPU Gop | MXU GFLOP | transc Gop | gather el | notes |")
    print("|---|---|---|---|---|---|")
    for name, c in counts.items():
        print(f"| {name} | {c['vpu'] / 1e9:.2f} | {c['mxu'] / 1e9:.3f} "
              f"| {c['transcendental_ops'] / 1e9:.3f} "
              f"| {c['gather_elems'] / 1e6:.2f} M | {'; '.join(c['notes'])} |")

    if args.skip_timing:
        return
    print(f"\n## Stage decomposition (batch {args.batch}, vmap_chunk 8, "
          "512x512; deltas vs previous row)")
    print("| consumed | ms/batch | f/s | Δms |")
    print("|---|---|---|---|")
    prev = None
    times = {}
    for name, consume, tex in _consumers(fine=args.fine):
        run, _ = build_run(args.batch, args.steps, consume, textures=tex)
        dt = _chained_time(run, args.steps)
        times[name] = dt
        dms = "" if prev is None else f"{(dt - prev) * 1e3:+.1f}"
        print(f"| {name} | {dt * 1e3:.1f} | {args.batch / dt:.0f} | {dms} |",
              flush=True)
        prev = dt

    if peaks is not None:
        sweep = counts["pixel sweep"]
        t_sweep = times["depth"] / args.batch
        util = sweep["vpu"] / 1e12 / peaks["vpu_f32_tflops"] / t_sweep
        print(f"\nDepth sweep: {sweep['vpu'] / 1e9:.2f} G lane-ops in "
              f"{t_sweep * 1e3:.3f} ms/frame -> "
              f"{sweep['vpu'] / t_sweep / 1e12:.2f} Top/s = "
              f"{util * 100:.0f}% of measured VPU peak; algorithm ceiling "
              f"at 100% = {1.0 / (sweep['vpu'] / 1e12 / peaks['vpu_f32_tflops']):.0f} f/s.")


if __name__ == "__main__":
    main()
