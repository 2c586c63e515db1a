"""Command-line interface.

  cspe-tpu generate --out DIR --frames N [--batch B] [--seed S] [--ladder]
      Batched dataset generation writing the reference's exact on-disk layout
      (the TPU replacement for running generate_construction_data.py inside
      Isaac Sim's script editor, reference lines 2098-2101).
  cspe-tpu train --steps N [--batch B]
      On-device datagen -> heatmap-regression training (BASELINE config 5).
  cspe-tpu bench
      The headline datagen benchmark (same as bench.py).
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def cmd_generate(args) -> None:
    from .config import Config, PipelineConfig
    from .io import dataset_writer, resume
    from .parallel import pipeline as pipeline_mod

    cfg = Config(pipeline=PipelineConfig(
        render_width=args.size, render_height=args.size,
        batch_size=args.batch, max_iterations=args.frames, seed=args.seed,
    ))
    pipe = pipeline_mod.Pipeline(
        cfg, use_pallas_heatmaps=jax.default_backend() == "tpu")
    gen = jax.jit(pipe.make_generate_fn(ladder=args.ladder))
    writer = dataset_writer.DatasetWriter(cfg, root=args.out, echo_log=args.verbose)
    seed = jax.random.PRNGKey(args.seed)

    pending = resume.pending_frames(args.out, args.frames)
    print(f"generating {len(pending)}/{args.frames} frames "
          f"(resume skipped {args.frames - len(pending)})")
    t0 = time.time()
    done = 0
    for i in range(0, len(pending), args.batch):
        chunk = pending[i:i + args.batch]
        # Static batch shape: pad the tail chunk with repeats (rewritten files
        # are bit-identical thanks to per-frame determinism).
        ids = (chunk + [chunk[-1]] * (args.batch - len(chunk)))[: args.batch]
        batch = gen(seed, jnp.asarray(ids))
        writer.write_batch(batch, pipe.roster)
        done += len(chunk)
        if args.verbose or (i // args.batch) % 10 == 0:
            fps = done / max(time.time() - t0, 1e-9)
            print(f"  {done}/{len(pending)} frames ({fps:.1f} fps incl. writes)")
    report = writer.finish()
    print(report)


def cmd_train(args) -> None:
    from .config import Config, PipelineConfig, TrainConfig
    from .models import pose_net
    from .parallel import pipeline as pipeline_mod
    from .train import loop as train_loop

    cfg = Config(
        pipeline=PipelineConfig(render_width=args.size, render_height=args.size),
        train=TrainConfig(batch_size=args.batch, steps=args.steps),
    )
    model = pose_net.make_model(lite=args.lite)
    pipe = pipeline_mod.Pipeline(cfg)
    step, mesh, place = train_loop.make_sharded_train_step(cfg, model, pipe)
    state = place(train_loop.create_train_state(cfg, model, jax.random.PRNGKey(args.seed)))
    seed = jax.random.PRNGKey(args.seed + 1)
    t0 = time.time()
    for s in range(args.steps):
        fids = jnp.arange(s * args.batch, (s + 1) * args.batch)
        state, metrics = step(state, seed, fids)
        if s % max(args.steps // 20, 1) == 0 or s == args.steps - 1:
            print(f"step {s}: loss={float(metrics['loss']):.5f} "
                  f"({(s + 1) * args.batch / (time.time() - t0):.1f} img/s)")


def cmd_bench(args) -> None:
    import bench  # repo-root bench.py when run from checkout
    bench.main()


def main() -> None:
    p = argparse.ArgumentParser(prog="cspe-tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("generate", help="batched dataset generation")
    g.add_argument("--out", default="dataset_construction_world2_v3")
    g.add_argument("--frames", type=int, default=41)
    g.add_argument("--batch", type=int, default=8)
    g.add_argument("--size", type=int, default=512)
    g.add_argument("--seed", type=int, default=0)
    g.add_argument("--ladder", action="store_true",
                   help="use the reference's 41-viewpoint systematic ladder")
    g.add_argument("--verbose", action="store_true")
    g.set_defaults(fn=cmd_generate)

    t = sub.add_parser("train", help="heatmap-regression training")
    t.add_argument("--steps", type=int, default=100)
    t.add_argument("--batch", type=int, default=8)
    t.add_argument("--size", type=int, default=256)
    t.add_argument("--seed", type=int, default=0)
    t.add_argument("--lite", action="store_true")
    t.set_defaults(fn=cmd_train)

    b = sub.add_parser("bench", help="headline benchmark")
    b.set_defaults(fn=cmd_bench)

    args = p.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
