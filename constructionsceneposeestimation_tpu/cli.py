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
    from .config import Config, PipelineConfig, SceneConfig
    from .io import dataset_writer, packed, resume
    from .parallel import pipeline as pipeline_mod

    cfg = Config(
        scene=SceneConfig(n_dumpers=getattr(args, "n_dumpers", 1),
                          n_humans=getattr(args, "n_humans", 1)),
        pipeline=PipelineConfig(
            render_width=args.width or args.size,
            render_height=args.height or args.size,
            batch_size=args.batch, max_iterations=args.frames, seed=args.seed,
        ))
    # hifi renders frames unvmapped (chunk 1): the mesh sweep's instance
    # cull is a while_loop whose trip count vmap would max over the batch.
    pipe = pipeline_mod.Pipeline(
        cfg, use_pallas_heatmaps=jax.default_backend() == "tpu",
        use_rgb_kernel=jax.default_backend() == "tpu",
        use_sweep_kernel=jax.default_backend() == "tpu",
        vmap_chunk=1 if getattr(args, "hifi", False) else 8,
        hifi_mesh=getattr(args, "hifi", False),
        image_textures=getattr(args, "image_textures", False))
    want_hms = args.format == "packed" and args.heatmaps
    if getattr(args, "sequence_len", 0):
        gen = jax.jit(pipe.make_sequence_fn(args.sequence_len,
                                            include_heatmaps=want_hms))
    else:
        gen = jax.jit(pipe.make_generate_fn(ladder=args.ladder,
                                            include_heatmaps=want_hms))
    seed = jax.random.PRNGKey(args.seed)

    # Pending ids batched into CONTIGUOUS runs: the pipeline's scene-cadence
    # dedup anchors its group window at the batch's first id, so a batch with
    # interior holes (possible after a partial resume) would silently render
    # frames with the wrong scene.
    chunks = resume.pending_chunks(args.out, args.frames, args.batch)
    n_pending = sum(len(c) for c in chunks)
    print(f"generating {n_pending}/{args.frames} frames "
          f"(resume skipped {args.frames - n_pending}, format={args.format})")
    writer = None
    if args.format == "reference":
        writer = dataset_writer.DatasetWriter(cfg, root=args.out, echo_log=args.verbose)
    else:
        packed.save_manifest(args.out, pipe.roster, cfg)
    t0 = time.time()
    done = 0

    def flush(batch, chunk):
        if writer is not None:
            writer.write_batch(batch, pipe.roster)
        else:
            import os
            packed.save_shard(
                os.path.join(args.out, f"shard_{chunk[0]:06d}.npz"), batch,
                pipe.roster)
            resume.record_completed(args.out, [int(f) for f in chunk])

    # Double buffering: jax dispatch is async, so enqueueing chunk i+1 BEFORE
    # forcing chunk i's host transfer+writes overlaps device rendering with
    # host I/O (the reference renders and writes strictly serially).
    inflight = None
    for ci, chunk in enumerate(chunks):
        # Static batch shape: pad short chunks with repeats of the last id
        # (same id -> same scene group; rewritten files are bit-identical
        # thanks to per-frame determinism).
        ids = (chunk + [chunk[-1]] * (args.batch - len(chunk)))[: args.batch]
        batch = gen(seed, jnp.asarray(ids))
        if inflight is not None:
            flush(*inflight)
            done += len(inflight[1])
            if args.verbose or ci % 10 == 0:
                fps = done / max(time.time() - t0, 1e-9)
                print(f"  {done}/{n_pending} frames ({fps:.1f} fps incl. writes)")
        inflight = (batch, chunk)
    if inflight is not None:
        flush(*inflight)
        done += len(inflight[1])
    if writer is not None:
        print(writer.finish())
    else:
        print(f"done: {done} frames in {time.time() - t0:.1f}s "
              f"({done / max(time.time() - t0, 1e-9):.1f} fps incl. writes)")


def _run_training(args):
    """Shared train driver: build model+pipeline, optionally restore a
    checkpoint, run scanned steps, optionally save. Returns
    (cfg, model, pipe, state)."""
    from .config import Config, PipelineConfig, TrainConfig
    from .models import pose_net
    from .parallel import pipeline as pipeline_mod
    from .train import loop as train_loop

    cfg = Config(
        pipeline=PipelineConfig(render_width=args.size, render_height=args.size),
        train=TrainConfig(batch_size=args.batch, steps=max(args.steps, 1),
                          loss=args.loss,
                          camera_mix=getattr(args, "camera_mix", 0.0)),
    )
    model = pose_net.make_model(lite=args.lite)
    pipe = pipeline_mod.Pipeline(
        cfg, use_pallas_heatmaps=jax.default_backend() == "tpu",
        use_rgb_kernel=jax.default_backend() == "tpu",
        use_sweep_kernel=jax.default_backend() == "tpu", vmap_chunk=8)
    state = train_loop.create_train_state(cfg, model, jax.random.PRNGKey(args.seed))
    mgr = None
    if getattr(args, "ckpt_dir", None):
        from .train import checkpoint
        mgr = checkpoint.CheckpointManager(
            args.ckpt_dir, save_every=getattr(args, "save_every", 0))
        if mgr.latest_step() is not None:
            state = mgr.restore(state)
            print(f"restored checkpoint at step {int(state.step)}")
    done = trained_from = int(state.step)
    if done < args.steps and getattr(args, "data_dir", None):
        step_fn = jax.jit(train_loop.make_data_train_step(cfg, model),
                          donate_argnums=(0,))
        state, done = _offline_train(
            args, state, mgr, done,
            fields=("rgb", "heatmaps"),
            run_one=lambda st, seed, b: step_fn(
                st, seed, jnp.asarray(b["rgb"]),
                jnp.asarray(b["heatmaps"], jnp.float32)))
    elif done < args.steps:
        inner = max(1, min(args.inner, args.steps))
        run = jax.jit(train_loop.make_scanned_train_fn(cfg, model, pipe, inner),
                      donate_argnums=(0,))
        seed = jax.random.PRNGKey(args.seed + 1)
        t0 = time.time()
        trained0 = done
        while done < args.steps:
            state, metrics = run(state, seed, jnp.int32(done * args.batch))
            done += inner
            print(f"step {done}: loss={float(metrics['loss']):.5f} "
                  f"({(done - trained0) * args.batch / (time.time() - t0):.1f} img/s avg)")
            if mgr is not None and mgr.maybe_save(state):
                print(f"checkpointed step {int(state.step)}")
    if done > trained_from and mgr is not None:
        mgr.maybe_save(state, force=True)
        print(f"saved checkpoint at step {int(state.step)} -> {args.ckpt_dir}")
    if mgr is not None:
        mgr.close()
    return cfg, model, pipe, state


def _offline_train(args, state, mgr, done, fields, run_one, roster=None):
    """Shared host loop for --data-dir training: stream reader batches into a
    jitted per-batch step until --steps. Returns (state, done)."""
    from .io import reader

    ds = reader.ShardDataset(args.data_dir)
    missing = [f for f in fields if f not in ds.fields]
    if missing:
        raise SystemExit(
            f"shards under {args.data_dir} lack fields {missing} — write them "
            f"with `cspe-tpu generate --format packed"
            + (" --heatmaps" if "heatmaps" in missing else "") + "`")
    ds_hw = ds.field_shape("rgb")[1:3]
    if ds_hw != (args.size, args.size):
        raise SystemExit(
            f"dataset frames are {ds_hw[0]}x{ds_hw[1]} but --size is "
            f"{args.size} — pass --size {ds_hw[0]} to train on this dataset")
    if roster is not None:
        # The shards' instance axis must match the training roster, or the
        # per-instance targets (crane slices, class ids) silently misalign.
        want = list(roster.inst_class_names)
        have = (ds.manifest or {}).get("inst_class_names")
        if have is None and "bbox2d" in ds.fields:
            n = ds.field_shape("bbox2d")[1]
            have = want if n == len(want) else [f"<{n} instances>"]
        if have is not None and list(have) != want:
            raise SystemExit(
                f"dataset instance layout ({len(have)} instances) does not "
                f"match the training scene ({len(want)}: check --n-dumpers/"
                f"--n-humans) — regenerate with matching `generate "
                f"--n-dumpers/--n-humans` flags")
    for flag in ("hifi_mix", "camera_mix"):
        if getattr(args, flag, 0):
            raise SystemExit(
                f"--{flag.replace('_', '-')} configures the on-device "
                f"generator and has no effect with --data-dir — drop one of "
                f"the two flags (the dataset's geometry/cameras are fixed at "
                f"generate time)")
    steps_per_epoch = len(ds) // args.batch
    if steps_per_epoch == 0:
        raise SystemExit(
            f"dataset has {len(ds)} frames < --batch {args.batch}: "
            f"generate more frames or lower --batch")
    need = args.steps - done
    # batches() drops each epoch's remainder, so size epochs by the FLOOR
    # steps-per-epoch (an undercount here silently ends training early).
    epochs = -(-need // steps_per_epoch) + 1
    seed = jax.random.PRNGKey(args.seed + 1)
    t0, trained0 = time.time(), done
    for b in ds.batches(args.batch, fields=list(fields), seed=args.seed,
                        epochs=epochs):
        if done >= args.steps:
            break
        state, metrics = run_one(state, seed, b)
        done += 1
        if done % 50 == 0 or done == args.steps:
            print(f"step {done}: loss={float(metrics['loss']):.5f} "
                  f"({(done - trained0) * args.batch / (time.time() - t0):.1f}"
                  f" img/s avg, offline shards)")
        if mgr is not None and mgr.maybe_save(state):
            print(f"checkpointed step {int(state.step)}")
    return state, done


def cmd_train(args) -> None:
    _run_training(args)


def cmd_train_eval(args) -> None:
    """Train (or restore), then evaluate PCK + equipment ADD with the trained
    model (BASELINE configs 3+4+5 in one command)."""
    from .eval import pipeline as eval_pipeline
    from .models import pose_net

    cfg, model, pipe, state = _run_training(args)

    # Held-out eval: different seed stream. --eval-ladder uses the reference's
    # close-range systematic viewpoints (4-12 m) instead of the far DR sampler
    # (15-30 m) — PnP conditioning is range-dependent.
    gen = jax.jit(pipe.make_generate_fn(ladder=args.eval_ladder))
    eval_seed = jax.random.PRNGKey(args.seed + 1000)
    batch = gen(eval_seed, jnp.arange(args.eval_frames))
    from .ops import preprocess
    keys = jax.vmap(lambda i: jax.random.fold_in(eval_seed, i))(jnp.arange(args.eval_frames))
    images = jax.vmap(lambda k, rgb: preprocess.preprocess_frame(
        k, rgb, args.size, args.size, augment=False))(keys, batch.rgb)
    # Focal loss trains logits: decode paths must see sigmoid(output).
    hm_pred = pose_net.output_to_heatmaps(
        pose_net.forward(model, state.params, images), cfg.train.loss)
    stride = cfg.pipeline.heatmap_stride

    floor = eval_pipeline.evaluate_decode(batch, pipe.roster, stride)
    pred_batch = batch._replace(heatmaps=hm_pred)
    pck = eval_pipeline.evaluate_decode(pred_batch, pipe.roster, stride)
    print(f"decode-floor PCK@0.5: {float(floor['pck']):.3f}  "
          f"(n={int(floor['n_keypoints'])})")
    print(f"model PCK@0.5:        {float(pck['pck']):.3f}  "
          f"mean matched err {float(pck['mean_px_error_matched']):.2f} px")
    # Instance-resolved decode (peaks routed to owners via bbox2d): the floor
    # that matters for multi-instance PnP, stricter than nearest-peak PCK.
    afloor = eval_pipeline.evaluate_decode_associated(batch, pipe.roster, stride)
    apck = eval_pipeline.evaluate_decode_associated(pred_batch, pipe.roster, stride)
    print(f"assoc decode floor:   {float(afloor['pck']):.3f}  "
          f"model assoc PCK@0.5: {float(apck['pck']):.3f} "
          f"(recall {float(apck['recall']):.3f})")
    # Human (BASELINE config 3): 17-kpt COCO PCK on the worker's own
    # channels, soft-argmax and DARK (reference worker handling:
    # generate_construction_data.py:1158-1200).
    from .scene import assets as assets_mod
    for tag, dark in (("DARK", True), ("soft-argmax", False)):
        hfloor = eval_pipeline.evaluate_human_pck(
            batch, pipe.roster, stride, use_dark=dark)
        hpck = eval_pipeline.evaluate_human_pck(
            batch, pipe.roster, stride, heatmaps=hm_pred, use_dark=dark)
        print(f"human PCK@0.5 ({tag}):  floor {float(hfloor['pck']):.3f}  "
              f"model {float(hpck['pck']):.3f} "
              f"(n={int(hpck['n_keypoints'])}, "
              f"err {float(hpck['mean_px_error']):.2f} px)")
        if dark:
            per = hpck["pck_per_kpt"]
            worst = sorted(
                zip(assets_mod.COCO_KEYPOINT_NAMES,
                    [float(v) for v in per[:17]]), key=lambda x: x[1])[:4]
            print("  weakest joints: "
                  + " ".join(f"{n}={v:.2f}" for n, v in worst))
    # Dumper-channel diagnostics: what the model actually scores its corners.
    sl = pose_net.class_channel_slices()["dumper"]
    d_scores = jnp.max(hm_pred[:, sl[0]:sl[1]], axis=(-1, -2))
    print(f"dumper channel scores: mean {float(d_scores.mean()):.3f} "
          f"max {float(d_scores.max()):.3f} "
          f">=0.3: {float((d_scores >= 0.3).mean()):.2f} "
          f">=0.15: {float((d_scores >= 0.15).mean()):.2f}")
    # Ground-prior solve (README headline path): upright-on-ground x/y/yaw
    # with pi-mirror refinement — full 6-DoF PnP at 15-30 m is
    # rotation-ambiguous under weak perspective (ops/pnp.solve_ground_pose).
    add_gt = eval_pipeline.evaluate_equipment_6dof(
        batch, pipe.roster, pipe.intr, "dumper", stride, use_gt_keypoints=True,
        ground_prior=True)
    add = eval_pipeline.evaluate_equipment_6dof(
        batch, pipe.roster, pipe.intr, "dumper", stride, heatmaps=hm_pred,
        score_threshold=args.pnp_threshold, ground_prior=True)
    print(f"dumper ADD (GT kpts):    mean {float(add_gt['add_mean']):.3f} m, "
          f"ADD-0.1d {float(add_gt['add_0_1d']):.3f} "
          f"(accepted {int(add_gt['n_accepted'])}/{int(add_gt['n_valid'])})")
    print(f"dumper ADD (model kpts): mean {float(add['add_mean']):.3f} m, "
          f"ADD-0.1d {float(add['add_0_1d']):.3f} "
          f"(accepted {int(add['n_accepted'])}/{int(add['n_valid'])}, "
          f"rmse {float(add['rmse']):.4f})")
    # Crane: FK-constrained joint solve over all 4 articulated parts
    # (BASELINE config 4 is "crane/dumper"; reference part poses at
    # generate_construction_data.py:1234-1279, 1930-1975).
    for tag, kw in (("GT kpts", dict(use_gt_keypoints=True)),
                    ("model kpts", dict(heatmaps=hm_pred,
                                        score_threshold=args.pnp_threshold))):
        cr = eval_pipeline.evaluate_crane_6dof(
            batch, pipe.roster, pipe.intr, stride, **kw)
        parts = " ".join(
            f"{p.replace('crane', '')}={float(cr[f'add_0_1d_{p}']):.2f}"
            for p in ("cranebase", "cranecolumn", "craneboom", "cranetelescopic"))
        print(f"crane ADD ({tag}):  mean {float(cr['add_mean']):.3f} m, "
              f"ADD-0.1d {float(cr['add_0_1d']):.3f} [{parts}] "
              f"(accepted {int(cr['n_accepted'])}/{int(cr['n_valid'])})")


def cmd_train_crop(args) -> None:
    """Second-stage (detect-then-crop) keypoint training + 6DoF eval for one
    equipment class — the top-down pose path (ops/crop.py,
    train/crop_loop.py). Stage 1's single-shot precision is object-size
    limited at DR range; the crop stage regresses keypoints at ROI scale."""
    from .config import Config, PipelineConfig, TrainConfig
    from .eval import pipeline as eval_pipeline
    from .parallel import pipeline as pipeline_mod
    from .train import crop_loop

    from .config import SceneConfig
    cfg = Config(
        scene=SceneConfig(n_dumpers=getattr(args, "n_dumpers", 1)),
        pipeline=PipelineConfig(render_width=args.size, render_height=args.size),
        train=TrainConfig(batch_size=args.batch, steps=max(args.steps, 1),
                          loss=args.loss,
                          camera_mix=getattr(args, "camera_mix", 0.0)),
    )
    pipe = pipeline_mod.Pipeline(
        cfg, use_pallas_heatmaps=jax.default_backend() == "tpu",
        use_rgb_kernel=jax.default_backend() == "tpu",
        use_sweep_kernel=jax.default_backend() == "tpu", vmap_chunk=8)
    model = crop_loop.make_crop_model(args.cls, lite=args.lite,
                                      roster=pipe.roster,
                                      output_stride=getattr(args, "stride", 4))
    state = crop_loop.create_crop_train_state(
        cfg, model, jax.random.PRNGKey(args.seed), args.crop)
    mgr = None
    if args.ckpt_dir:
        from .train import checkpoint
        mgr = checkpoint.CheckpointManager(
            args.ckpt_dir, save_every=getattr(args, "save_every", 0))
        if mgr.latest_step() is not None:
            state = mgr.restore(state)
            print(f"restored checkpoint at step {int(state.step)}")
    done = int(state.step)
    if done < args.steps:
        inner = max(1, min(args.inner, args.steps))
        run = jax.jit(crop_loop.make_scanned_crop_train_fn(
            cfg, model, pipe, inner, args.cls, args.crop,
            per_part=getattr(args, "per_part", False)), donate_argnums=(0,))
        seed = jax.random.PRNGKey(args.seed + 1)
        t0 = time.time()
        t0_done = done
        while done < args.steps:
            state, metrics = run(state, seed, jnp.int32(done * args.batch))
            done += inner
            print(f"step {done}: loss={float(metrics['loss']):.5f} "
                  f"vis={float(metrics['n_visible']):.0f}/{args.batch} "
                  f"({(done - t0_done) * args.batch / (time.time() - t0):.1f} img/s avg)")
            if mgr is not None and mgr.maybe_save(state):
                print(f"checkpointed step {int(state.step)}")
        if mgr is not None:
            mgr.maybe_save(state, force=True)
            print(f"saved checkpoint at step {int(state.step)} -> {args.ckpt_dir}")
    if mgr is not None:
        mgr.close()

    gen = jax.jit(pipe.make_generate_fn(ladder=args.eval_ladder))
    eval_seed = jax.random.PRNGKey(args.seed + 1000)
    batch = gen(eval_seed, jnp.arange(args.eval_frames))
    if args.cls == "crane":
        out = eval_pipeline.evaluate_crop_crane_6dof(
            batch, pipe.roster, pipe.intr, model, state.params, args.crop,
            score_threshold=args.pnp_threshold, loss=args.loss,
            per_part=getattr(args, "per_part", False))
        parts = " ".join(
            f"{p.replace('crane', '')}={float(out[f'add_0_1d_{p}']):.2f}"
            for p in ("cranebase", "cranecolumn", "craneboom",
                      "cranetelescopic"))
        print(f"crane crop-stage 6DoF: ADD mean {float(out['add_mean']):.3f} m, "
              f"ADD-0.1d {float(out['add_0_1d']):.3f} [{parts}] "
              f"(accepted {int(out['n_accepted'])}/{int(out['n_valid'])}, "
              f"detectable {int(out['n_detectable'])}/{args.eval_frames})")
        errs = " ".join(
            f"{p.replace('crane', '')}={float(out[f't_err_{p}']):.2f}m/"
            f"{float(out[f'rot_err_deg_{p}']):.1f}deg"
            for p in ("cranebase", "cranecolumn", "craneboom",
                      "cranetelescopic"))
        print(f"  per-part err split (t/rot): [{errs}]")
    else:
        out = eval_pipeline.evaluate_crop_6dof(
            batch, pipe.roster, pipe.intr, model, state.params, args.cls,
            args.crop, score_threshold=args.pnp_threshold, loss=args.loss)
        print(f"{args.cls} crop-stage 6DoF: ADD mean {float(out['add_mean']):.3f} m, "
              f"ADD-0.1d {float(out['add_0_1d']):.3f} "
              f"(accepted {int(out['n_accepted'])}/{int(out['n_valid'])}, "
              f"detectable {int(out['n_detectable'])}/{args.eval_frames}, "
              f"rmse {float(out['rmse']):.4f})")


def cmd_train_detect(args) -> None:
    """CenterNet detector training + P/R eval; with --crop-ckpt, runs the
    FULL two-stage deployment path: detector boxes (not labels) -> crop net
    -> ground-prior solve -> dumper ADD."""
    from .config import Config, PipelineConfig, TrainConfig
    from .eval import pipeline as eval_pipeline
    from .parallel import pipeline as pipeline_mod
    from .train import detect_loop

    from .config import SceneConfig
    cfg = Config(
        scene=SceneConfig(n_dumpers=getattr(args, "n_dumpers", 1),
                          n_humans=getattr(args, "n_humans", 1)),
        pipeline=PipelineConfig(render_width=args.size, render_height=args.size),
        train=TrainConfig(batch_size=args.batch, steps=max(args.steps, 1),
                          loss="focal",
                          camera_mix=getattr(args, "camera_mix", 0.0)),
    )
    pipe = pipeline_mod.Pipeline(
        cfg, use_pallas_heatmaps=jax.default_backend() == "tpu",
        use_rgb_kernel=jax.default_backend() == "tpu",
        use_sweep_kernel=jax.default_backend() == "tpu", vmap_chunk=8)
    model = detect_loop.make_detect_model(
        lite=args.lite, output_stride=getattr(args, "det_stride", 4))
    from .train import loop as train_loop
    state = train_loop.create_train_state(cfg, model, jax.random.PRNGKey(args.seed))
    mgr = None
    if args.ckpt_dir:
        from .train import checkpoint
        mgr = checkpoint.CheckpointManager(
            args.ckpt_dir, save_every=getattr(args, "save_every", 0))
        if mgr.latest_step() is not None:
            state = mgr.restore(state)
            print(f"restored checkpoint at step {int(state.step)}")
    done = trained_from = int(state.step)
    if done < args.steps and getattr(args, "data_dir", None):
        step_fn = jax.jit(detect_loop.make_data_detect_train_step(
            cfg, model, pipe.roster), donate_argnums=(0,))
        state, done = _offline_train(
            args, state, mgr, done,
            fields=("rgb", "bbox2d", "inst_visible"),
            run_one=lambda st, seed, b: step_fn(
                st, seed, jnp.asarray(b["rgb"]),
                jnp.asarray(b["bbox2d"]), jnp.asarray(b["inst_visible"])),
            roster=pipe.roster)
        if mgr is not None and done > trained_from:
            mgr.maybe_save(state, force=True)
            print(f"saved checkpoint at step {int(state.step)} -> {args.ckpt_dir}")
    elif done < args.steps:
        inner = max(1, min(args.inner, args.steps))
        hifi_pipe = None
        hifi_every = getattr(args, "hifi_mix", 0)
        if hifi_every:
            # Mixed-geometry stream: every k-th batch renders the baked CAD
            # meshes (unvmapped — see render/meshcast.py on vmap vs the cull).
            hifi_pipe = pipeline_mod.Pipeline(
                cfg, use_pallas_heatmaps=jax.default_backend() == "tpu",
                use_rgb_kernel=jax.default_backend() == "tpu",
                use_sweep_kernel=jax.default_backend() == "tpu",
                vmap_chunk=1, hifi_mesh=True,
                image_textures=getattr(args, "image_textures", False))
        run = jax.jit(detect_loop.make_scanned_detect_train_fn(
            cfg, model, pipe, inner, hifi_pipe=hifi_pipe, hifi_every=hifi_every),
                      donate_argnums=(0,))
        seed = jax.random.PRNGKey(args.seed + 1)
        t0 = time.time()
        t0_done = done
        while done < args.steps:
            state, metrics = run(state, seed, jnp.int32(done * args.batch))
            done += inner
            print(f"step {done}: loss={float(metrics['loss']):.5f} "
                  f"({(done - t0_done) * args.batch / (time.time() - t0):.1f} img/s avg)")
            if mgr is not None and mgr.maybe_save(state):
                print(f"checkpointed step {int(state.step)}")
        if mgr is not None:
            mgr.maybe_save(state, force=True)
            print(f"saved checkpoint at step {int(state.step)} -> {args.ckpt_dir}")
    if mgr is not None:
        mgr.close()

    eval_pipe = pipe
    if getattr(args, "hifi_eval", False):
        # Sim-to-sim transfer: models are trained on analytic proxies; the
        # eval frames render the baked CAD meshes (render/meshcast.py).
        eval_pipe = pipeline_mod.Pipeline(
            cfg, use_pallas_heatmaps=jax.default_backend() == "tpu",
            use_rgb_kernel=jax.default_backend() == "tpu",
            use_sweep_kernel=jax.default_backend() == "tpu",
            vmap_chunk=1, hifi_mesh=True,
            image_textures=getattr(args, "image_textures", False))
        print("eval frames: hifi CAD-mesh renders (proxy-trained models)")
    gen = jax.jit(eval_pipe.make_generate_fn(ladder=args.eval_ladder))
    eval_seed = jax.random.PRNGKey(args.seed + 1000)
    batch = gen(eval_seed, jnp.arange(args.eval_frames))
    det = eval_pipeline.evaluate_detector(
        batch, pipe.roster, model, state.params,
        analysis=getattr(args, "det_analysis", False))
    per_cls = " ".join(
        f"{c}={float(det[f'precision_{c}']):.2f}/{float(det[f'recall_{c}']):.2f}"
        for c in ("dumper", "crane", "human", "trafficcone"))
    from .ops import detect as detect_ops
    parts_pr = " ".join(
        f"{c.replace('crane', '')}={float(det[f'precision_{c}']):.2f}/"
        f"{float(det[f'recall_{c}']):.2f}"
        for c in detect_ops.CRANE_PART_CLASSES)
    print(f"detector P/R @IoU0.5: {float(det['precision']):.3f}/"
          f"{float(det['recall']):.3f}  [{per_cls}]")
    print(f"  crane parts P/R: [{parts_pr}]  mAP@0.5 {float(det['map']):.3f}")
    if getattr(args, "det_analysis", False):
        for c in detect_ops.DET_CLASSES:
            ms, mc, ml = (float(det[f"miss_{k}_{c}"])
                          for k in ("score", "cls", "loc"))
            if ms + mc + ml > 1e-6:
                print(f"  miss split {c}: score {ms:.2f} cls {mc:.2f} "
                      f"loc {ml:.2f}  (recall {float(det[f'recall_{c}']):.2f})")

    if args.crop_ckpt:
        from .train import checkpoint, crop_loop
        crop_model = crop_loop.make_crop_model("dumper", roster=pipe.roster)
        crop_state = crop_loop.create_crop_train_state(
            cfg, crop_model, jax.random.PRNGKey(0), args.crop)
        cmgr = checkpoint.CheckpointManager(args.crop_ckpt, save_every=0)
        crop_state = cmgr.restore(crop_state)
        cmgr.close()
        out = eval_pipeline.evaluate_crop_6dof(
            batch, pipe.roster, pipe.intr, crop_model, crop_state.params,
            "dumper", args.crop, boxes=det["dumper_boxes"])
        print(f"FULL two-stage dumper 6DoF (detector boxes): "
              f"ADD mean {float(out['add_mean']):.3f} m, "
              f"ADD-0.1d {float(out['add_0_1d']):.3f} "
              f"(accepted {int(out['n_accepted'])}/{int(out['n_valid'])})")
        if getattr(args, "n_dumpers", 1) > 1:
            from .ops import detect as det_ops
            di = det_ops.DET_CLASSES.index("dumper")
            mout = eval_pipeline.evaluate_crop_6dof_multi(
                batch, pipe.roster, pipe.intr, crop_model, crop_state.params,
                "dumper", args.crop,
                boxes=det["boxes"][:, di], box_scores=det["scores"][:, di])
            print(f"FULL two-stage multi-dumper 6DoF (detector boxes, "
                  f"{args.n_dumpers} instances): "
                  f"ADD mean {float(mout['add_mean']):.3f} m, "
                  f"ADD-0.1d {float(mout['add_0_1d']):.3f} "
                  f"(accepted {int(mout['n_accepted'])}/"
                  f"{int(mout['n_detectable'])} detectable)")

    if getattr(args, "crane_crop_ckpt", None):
        from .train import checkpoint, crop_loop
        crane_crop = getattr(args, "crane_crop", None) or args.crop
        crane_model = crop_loop.make_crop_model(
            "crane", roster=pipe.roster,
            output_stride=getattr(args, "crane_stride", 4))
        crane_state = crop_loop.create_crop_train_state(
            cfg, crane_model, jax.random.PRNGKey(0), crane_crop)
        cmgr = checkpoint.CheckpointManager(args.crane_crop_ckpt, save_every=0)
        crane_state = cmgr.restore(crane_state)
        cmgr.close()
        pb, ps = eval_pipeline.best_part_boxes(det["boxes"], det["scores"])
        cout = eval_pipeline.evaluate_crop_crane_6dof(
            batch, pipe.roster, pipe.intr, crane_model, crane_state.params,
            crane_crop, per_part=True, part_boxes=pb, part_scores=ps)
        parts = " ".join(
            f"{p.replace('crane', '')}={float(cout[f'add_0_1d_{p}']):.2f}"
            for p in ("cranebase", "cranecolumn", "craneboom",
                      "cranetelescopic"))
        print(f"FULL two-stage crane 6DoF (detector part boxes): "
              f"ADD mean {float(cout['add_mean']):.3f} m, "
              f"ADD-0.1d {float(cout['add_0_1d']):.3f} [{parts}] "
              f"(accepted {int(cout['n_accepted'])}/{int(cout['n_valid'])})")


def cmd_infer(args) -> None:
    """Serving path: detector -> ROI crops -> keypoints -> ground-prior solve,
    on freshly generated frames (or any (B,H,W,3) uint8 stream), emitting one
    record per frame to ``--out`` as JSON lines. No labels are consumed
    anywhere — this is the deployment inference loop.

    Every above-threshold detection of every class is emitted. Dumper
    detections each get their own crop + ground-prior 6DoF solve
    (multi-instance); with ``--crane-crop-ckpt`` the four detected crane part
    boxes feed per-part crops and the FK-constrained joint solve
    (ops/pnp.solve_crane_pose), emitting per-part poses. Other classes
    (human/cone/tree/fence) are emitted as plain detections."""
    import json as json_mod

    from .config import Config, PipelineConfig
    from .core import rotation
    from .eval import pipeline as eval_pipeline
    from .models import pose_net
    from .ops import crop as crop_ops, decode as decode_ops, detect as det_ops
    from .ops import pnp as pnp_ops, preprocess
    from .parallel import pipeline as pipeline_mod
    from .scene import assets
    from .train import checkpoint, crop_loop, detect_loop, loop as train_loop

    cfg = Config(pipeline=PipelineConfig(render_width=args.size,
                                         render_height=args.size))
    # hifi renders frames unvmapped (chunk 1): the mesh sweep's instance
    # cull is a while_loop whose trip count vmap would max over the batch.
    pipe = pipeline_mod.Pipeline(
        cfg, use_pallas_heatmaps=jax.default_backend() == "tpu",
        use_rgb_kernel=jax.default_backend() == "tpu",
        use_sweep_kernel=jax.default_backend() == "tpu",
        vmap_chunk=1 if getattr(args, "hifi", False) else 8,
        hifi_mesh=getattr(args, "hifi", False),
        image_textures=getattr(args, "image_textures", False))

    det_model = detect_loop.make_detect_model(
        output_stride=getattr(args, "det_stride", 4))
    det_state = train_loop.create_train_state(cfg, det_model, jax.random.PRNGKey(0))
    m = checkpoint.CheckpointManager(args.det_ckpt, save_every=0)
    det_state = m.restore(det_state); m.close()
    crop_model = crop_loop.make_crop_model("dumper", roster=pipe.roster)
    crop_state = crop_loop.create_crop_train_state(
        cfg, crop_model, jax.random.PRNGKey(0), args.crop)
    m = checkpoint.CheckpointManager(args.crop_ckpt, save_every=0)
    crop_state = m.restore(crop_state); m.close()
    crane_model = crane_params = None
    crane_crop = getattr(args, "crane_crop", None) or args.crop
    if args.crane_crop_ckpt:
        crane_model = crop_loop.make_crop_model(
            "crane", roster=pipe.roster,
            output_stride=getattr(args, "crane_stride", 4))
        crane_state = crop_loop.create_crop_train_state(
            cfg, crane_model, jax.random.PRNGKey(0), crane_crop)
        m = checkpoint.CheckpointManager(args.crane_crop_ckpt, save_every=0)
        crane_state = m.restore(crane_state); m.close()
        crane_params = crane_state.params

    tpl = assets.all_templates()["dumper"]
    model_pts = jnp.asarray(tpl.keypoints)
    intr = pipe.intr
    max_det = args.max_det

    def infer(rgb, camera_pose7):
        """(B, H, W, 3) uint8 + camera extrinsics -> all detections + poses."""
        imgs = jax.vmap(lambda r: preprocess.normalize(
            r.astype(jnp.float32) / 255.0))(rgb)
        pred = pose_net.forward(det_model, det_state.params, imgs)
        stride = getattr(det_model, "output_stride", 4)
        boxes, scores = jax.vmap(lambda p: det_ops.decode_detections(
            p, float(stride), max_det))(pred)  # (B, C, D, 4), (B, C, D)
        R_wp = rotation.matrix_from_quat_xyzw(camera_pose7[..., 3:])
        cam = camera_pose7[..., :3]
        B = rgb.shape[0]

        # Dumper: every detection slot gets its own crop + ground solve.
        di = det_ops.DET_CLASSES.index("dumper")
        dboxes = boxes[:, di]  # (B, D, 4)
        cu, cv, half = crop_ops.square_roi(dboxes)  # (B, D)
        crops = jax.vmap(lambda r, cs, vs, hs: jax.vmap(
            lambda c1, v1, h1: preprocess.normalize(crop_ops.crop_resize(
                r.astype(jnp.float32) / 255.0, c1, v1, h1, args.crop))
        )(cs, vs, hs))(rgb, cu, cv, half)  # (B, D, c, c, 3)
        hm = pose_net.output_to_heatmaps(
            pose_net.forward(crop_model, crop_state.params,
                             crops.reshape((B * max_det,) + crops.shape[2:])),
            "focal")
        cstride = getattr(crop_model, "output_stride", 4)
        uv_c, sc = decode_ops.dark_decode(hm)
        K = uv_c.shape[1]
        uv_c = uv_c.reshape(B, max_det, K, 2)
        sc = sc.reshape(B, max_det, K)
        uv = crop_ops.crop_to_uv(uv_c * cstride, cu[..., None], cv[..., None],
                                 half[..., None], args.crop)
        w = jnp.where(sc >= 0.15, sc, 0.0)
        x = pnp_ops.normalize_pixels(uv, intr.fx, intr.fy, intr.cx, intr.cy)
        Xb = jnp.broadcast_to(model_pts, (max_det,) + model_pts.shape)
        dres = jax.vmap(lambda xx, ww, Rw, cp: jax.vmap(
            lambda X, xi, wi: pnp_ops.solve_ground_pose(X, xi, wi, Rw, cp)
        )(Xb, xx, ww))(x, w, R_wp, cam)  # fields (B, D, ...)

        out = {"boxes": boxes, "scores": scores,
               "dumper_R": dres.R, "dumper_t": dres.t,
               "dumper_rmse": dres.rmse, "dumper_valid": dres.valid}

        # Crane: detected part boxes -> per-part crops -> FK joint solve.
        if crane_params is not None:
            pb, ps = eval_pipeline.best_part_boxes(boxes, scores)
            part_vis = ps >= args.det_threshold
            cuv, csc, cw = eval_pipeline.crane_part_keypoints(
                rgb, pb, part_vis, pipe.roster, crane_model, crane_params,
                crop_size=crane_crop)
            s0, Kp = crop_loop.crane_channels(pipe.roster)
            kpts_local = jnp.asarray(pipe.roster.inst_kpts[s0:s0 + 4, :Kp])
            cx = pnp_ops.normalize_pixels(cuv, intr.fx, intr.fy,
                                          intr.cx, intr.cy)
            cres = jax.vmap(lambda xx, ww, Rw, cp: pnp_ops.solve_crane_pose(
                kpts_local, xx, ww, Rw, cp))(cx, cw, R_wp, cam)
            out.update({"crane_part_boxes": pb, "crane_part_scores": ps,
                        "crane_R": cres.R, "crane_t": cres.t,
                        "crane_rmse": cres.rmse, "crane_valid": cres.valid})
        return out

    if getattr(args, "sequence_len", 0):
        gen = jax.jit(pipe.make_sequence_fn(args.sequence_len))
    else:
        gen = jax.jit(pipe.make_generate_fn(ladder=args.ladder))
    infer_j = jax.jit(infer)
    seed = jax.random.PRNGKey(args.seed)
    px2n = 1.0 / float(intr.fx)
    pose_classes = {"dumper"}
    part_names = ("cranebase", "cranecolumn", "craneboom", "cranetelescopic")
    tracker = None
    if getattr(args, "track", False):
        from .eval import tracking
        tracker = tracking.Tracker(smooth=getattr(args, "smooth", 0.5))
    seq_len = getattr(args, "sequence_len", 0)
    n_out = n_det = 0
    with open(args.out, "w") as f:
        for lo in range(0, args.frames, args.batch):
            ids = jnp.arange(lo, lo + args.batch)
            batch = gen(seed, ids)
            o = jax.tree_util.tree_map(
                np.asarray, infer_j(batch.rgb, batch.camera_pose7))
            cam7 = np.asarray(batch.camera_pose7)
            # The final batch is padded to the static batch shape; emit only
            # records for real frame ids (< --frames).
            for i in range(min(args.frames - lo, args.batch)):
                dets = []
                for ci, cname in enumerate(det_ops.DET_CLASSES):
                    if cname in det_ops.CRANE_PART_CLASSES or cname == "crane":
                        continue  # crane handled as one articulated record
                    for d in range(o["scores"].shape[2]):
                        s = float(o["scores"][i, ci, d])
                        if s < args.det_threshold:
                            continue
                        rec = {"class": cname, "score": s,
                               "bbox2d": o["boxes"][i, ci, d].tolist()}
                        if cname in pose_classes:
                            ok = (bool(o["dumper_valid"][i, d])
                                  and float(o["dumper_rmse"][i, d]) <= 8.0 * px2n)
                            rec.update({
                                "pose_accepted": ok,
                                "R_cam": o["dumper_R"][i, d].tolist(),
                                "t_cam": o["dumper_t"][i, d].tolist(),
                                "reproj_rmse_px":
                                    float(o["dumper_rmse"][i, d]) / px2n,
                            })
                        dets.append(rec)
                if "crane_valid" in o and bool(
                        (o["crane_part_scores"][i]
                         >= args.det_threshold).any()):
                    ok = (bool(o["crane_valid"][i])
                          and float(o["crane_rmse"][i]) <= 8.0 * px2n)
                    dets.append({
                        "class": "crane", "pose_accepted": ok,
                        "reproj_rmse_px": float(o["crane_rmse"][i]) / px2n,
                        "parts": [{
                            "name": part_names[pi],
                            "score": float(o["crane_part_scores"][i, pi]),
                            "bbox2d": o["crane_part_boxes"][i, pi].tolist(),
                            "R_cam": o["crane_R"][i, pi].tolist(),
                            "t_cam": o["crane_t"][i, pi].tolist(),
                        } for pi in range(4)],
                    })
                pose7 = [float(v) for v in cam7[i]]
                if tracker is not None:
                    if seq_len and int(ids[i]) % seq_len == 0:
                        tracker.reset()  # clips are independent
                    tracker.update(dets, pose7)
                n_det += len(dets)
                f.write(json_mod.dumps(
                    {"frame_id": int(ids[i]),
                     "camera_pose7": pose7,
                     "detections": dets}) + "\n")
                n_out += 1
    print(f"wrote {n_out} frame records ({n_det} detections) -> {args.out}")


def cmd_seq_eval(args) -> None:
    """Temporal quality of deployment outputs on sequence-mode clips: run
    ``cspe-tpu infer --sequence-len N`` first, then score its JSONL — mean
    inter-frame world-frame pose delta of tracked objects, rotation delta,
    and detection identity stability (eval/sequence_metrics.py)."""
    from .eval import sequence_metrics as seq_metrics

    records = seq_metrics.load_records(args.poses)
    out = seq_metrics.sequence_metrics(records, args.sequence_len,
                                       fps=args.fps)
    print(f"sequence eval ({int(out['n_clips'])} clips x "
          f"{args.sequence_len} frames, {int(out['n_frames'])} frames):")
    import math
    disp = ("" if math.isnan(out.get("id_stability_std", float("nan")))
            else f" +- {out['id_stability_std']:.3f} across clips "
                 f"(worst clip {out['id_stability_min_clip']:.3f})")
    print(f"  id stability:       {out['id_stability']:.3f}{disp} "
          f"(adjacent-frame detection matches)")
    print(f"  pose track rate:    {out['pose_track_rate']:.3f} "
          f"(accepted poses matched to the next frame)")
    print(f"  mean |dt| world:    {out['mean_t_delta_m']:.3f} m/frame "
          f"(p95 {out['p95_t_delta_m']:.3f})")
    print(f"  mean |dR| world:    {out['mean_r_delta_deg']:.2f} deg/frame")
    if "id_switch_rate" in out:
        print(f"  id switch rate:     {out['id_switch_rate']:.3f} "
              f"(IoU-matched pairs whose --track ids differ)")
    if "mean_speed_mps" in out:
        print(f"  implied speed:      {out['mean_speed_mps']:.2f} m/s @ "
              f"{args.fps} fps")


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
    g.add_argument("--width", type=int, default=None,
                   help="override width (e.g. 1280 for the reference's 1280x720)")
    g.add_argument("--height", type=int, default=None)
    g.add_argument("--seed", type=int, default=0)
    g.add_argument("--ladder", action="store_true",
                   help="use the reference's 41-viewpoint systematic ladder")
    g.add_argument("--format", choices=["reference", "packed"], default="reference",
                   help="reference: exact drop-in text/PNG tree; packed: npz shards")
    g.add_argument("--heatmaps", action="store_true",
                   help="include f16 heatmap targets in packed shards")
    g.add_argument("--sequence-len", type=int, default=0,
                   help="N>0: temporally-coherent N-frame clips (crane/worker "
                        "animation + camera flight) instead of i.i.d. frames")
    g.add_argument("--hifi", action="store_true",
                   help="render cone/fence/tree with baked CAD triangle "
                        "templates (render/meshcast.py) instead of analytic "
                        "proxies — mesh-faithful silhouettes, slower")
    g.add_argument("--image-textures", action="store_true",
                   help="sample the reference's real texture images (bark, "
                        "leaf, garment fabrics) via low-rank MXU factors "
                        "(render/textures.py) on top of the procedural DR")
    g.add_argument("--n-dumpers", type=int, default=1,
                   help="dumpers per scene (match the trainer's --n-dumpers "
                        "when writing --format packed training data)")
    g.add_argument("--n-humans", type=int, default=1,
                   help="workers per scene (match the trainer's --n-humans)")
    g.add_argument("--verbose", action="store_true")
    g.set_defaults(fn=cmd_generate)

    t = sub.add_parser("train", help="heatmap-regression training")
    t.add_argument("--steps", type=int, default=100)
    t.add_argument("--batch", type=int, default=8)
    t.add_argument("--size", type=int, default=256)
    t.add_argument("--seed", type=int, default=0)
    t.add_argument("--lite", action="store_true")
    t.add_argument("--loss", choices=["mse", "focal"], default="focal",
                   help="heatmap loss (focal = the README headline config)")
    t.add_argument("--camera-mix", type=float, default=0.0,
                    help="P(close-range ladder view) per train frame")
    t.add_argument("--data-dir", default=None,
                   help="train from packed npz shards (io/reader) instead "
                        "of the on-device generator — the consumer side of "
                        "`generate --format packed`")
    t.add_argument("--inner", type=int, default=10,
                   help="train steps per device dispatch (lax.scan)")
    t.add_argument("--ckpt-dir", default=None,
                   help="orbax checkpoint dir (restore if present, save at end)")
    t.add_argument("--save-every", type=int, default=0,
                    help="also checkpoint every N steps mid-run (0 = only "
                         "at the end) — crash/tunnel-wedge resilience")
    t.set_defaults(fn=cmd_train)

    te = sub.add_parser("train-eval", help="train then PCK/ADD evaluation")
    te.add_argument("--steps", type=int, default=1000)
    te.add_argument("--batch", type=int, default=32)
    te.add_argument("--size", type=int, default=256)
    te.add_argument("--seed", type=int, default=0)
    te.add_argument("--lite", action="store_true")
    te.add_argument("--loss", choices=["mse", "focal"], default="focal",
                    help="heatmap loss (focal = the README headline config)")
    te.add_argument("--camera-mix", type=float, default=0.0,
                    help="P(close-range ladder view) per train frame")
    te.add_argument("--data-dir", default=None,
                   help="train from packed npz shards (io/reader) instead "
                        "of the on-device generator — the consumer side of "
                        "`generate --format packed`")
    te.add_argument("--inner", type=int, default=50)
    te.add_argument("--eval-frames", type=int, default=16)
    te.add_argument("--pnp-threshold", type=float, default=0.15)
    te.add_argument("--ckpt-dir", default=None)
    te.add_argument("--eval-ladder", action="store_true",
                    help="evaluate on the close-range reference viewpoint ladder")
    te.add_argument("--save-every", type=int, default=0,
                    help="also checkpoint every N steps mid-run (0 = only "
                         "at the end) — crash/tunnel-wedge resilience")
    te.set_defaults(fn=cmd_train_eval)

    tc = sub.add_parser("train-crop",
                        help="two-stage (detect-then-crop) equipment training")
    tc.add_argument("--steps", type=int, default=8000)
    tc.add_argument("--batch", type=int, default=32)
    tc.add_argument("--size", type=int, default=512,
                    help="full-image render size the ROIs are cut from")
    tc.add_argument("--crop", type=int, default=128)
    tc.add_argument("--cls", default="dumper")
    tc.add_argument("--seed", type=int, default=0)
    tc.add_argument("--lite", action="store_true")
    tc.add_argument("--loss", choices=["mse", "focal"], default="focal")
    tc.add_argument("--inner", type=int, default=50)
    tc.add_argument("--eval-frames", type=int, default=64)
    tc.add_argument("--pnp-threshold", type=float, default=0.15)
    tc.add_argument("--ckpt-dir", default=None)
    tc.add_argument("--eval-ladder", action="store_true")
    tc.add_argument("--camera-mix", type=float, default=0.0,
                    help="P(close-range ladder view) per train frame")
    tc.add_argument("--stride", type=int, default=4, choices=[2, 4],
                    help="crop-net output stride (2 = double heatmap res)")
    tc.add_argument("--per-part", action="store_true",
                    help="crane only: one ROI per part (4 crops/frame) "
                         "instead of the machine union box")
    tc.add_argument("--n-dumpers", type=int, default=1,
                    help="train/eval scenes with N dumpers (multi-instance)")
    tc.add_argument("--save-every", type=int, default=0,
                    help="also checkpoint every N steps mid-run (0 = only "
                         "at the end) — crash/tunnel-wedge resilience")
    tc.set_defaults(fn=cmd_train_crop)

    td = sub.add_parser("train-detect",
                        help="CenterNet detector training + two-stage eval")
    td.add_argument("--steps", type=int, default=8000)
    td.add_argument("--batch", type=int, default=32)
    td.add_argument("--size", type=int, default=512)
    td.add_argument("--crop", type=int, default=128)
    td.add_argument("--seed", type=int, default=0)
    td.add_argument("--lite", action="store_true")
    td.add_argument("--inner", type=int, default=50)
    td.add_argument("--eval-frames", type=int, default=64)
    td.add_argument("--ckpt-dir", default=None)
    td.add_argument("--save-every", type=int, default=0,
                    help="also checkpoint every N steps mid-run (0 = only "
                         "at the end) — crash/tunnel-wedge resilience")
    td.add_argument("--crop-ckpt", default=None,
                    help="crop-stage checkpoint: run the full detector->crop"
                         "->PnP path")
    td.add_argument("--crane-crop-ckpt", default=None,
                    help="per-part crane crop checkpoint: report the full "
                         "detector-part-boxes -> FK-solve crane path")
    td.add_argument("--det-stride", type=int, default=4, choices=[2, 4],
                    help="detector output stride: 2 doubles map resolution "
                         "for small classes (human/cone) at ~2x head cost")
    td.add_argument("--crane-stride", type=int, default=4, choices=[2, 4],
                    help="output stride the crane crop ckpt was trained at")
    td.add_argument("--crane-crop", type=int, default=None,
                    help="crop size the crane crop ckpt was trained at "
                         "(default: --crop)")
    td.add_argument("--n-humans", type=int, default=1,
                    help="workers per training/eval scene (more positives "
                         "for the small-class detector head)")
    td.add_argument("--n-dumpers", type=int, default=1,
                    help="train/eval scenes with N dumpers; with --crop-ckpt "
                         "also reports the multi-instance two-stage path")
    td.add_argument("--data-dir", default=None,
                   help="train from packed npz shards (io/reader) instead "
                        "of the on-device generator — the consumer side of "
                        "`generate --format packed`")
    td.add_argument("--eval-ladder", action="store_true")
    td.add_argument("--camera-mix", type=float, default=0.0)
    td.add_argument("--hifi-mix", type=int, default=0,
                    help="render every k-th training batch with the hifi "
                         "CAD-mesh sweep (0 = proxies only) — mixed-geometry "
                         "training for sim-to-sim transfer")
    td.add_argument("--image-textures", action="store_true",
                    help="hifi-mix/hifi-eval frames also sample the "
                         "reference's real texture images "
                         "(render/textures.py)")
    td.add_argument("--hifi-eval", action="store_true",
                    help="evaluate on hifi CAD-mesh renders (sim-to-sim "
                         "transfer gap for proxy-trained models)")
    td.add_argument("--det-analysis", action="store_true",
                    help="oracle-IoU miss diagnosis per class: split missed "
                         "GTs into score / classification / localization "
                         "misses (eval/pipeline.evaluate_detector)")
    td.set_defaults(fn=cmd_train_detect)

    inf = sub.add_parser("infer", help="deployment inference: detector -> "
                                       "crop -> 6DoF pose JSON lines")
    inf.add_argument("--det-ckpt", required=True)
    inf.add_argument("--det-stride", type=int, default=4, choices=[2, 4],
                     help="must match the det-ckpt's training stride")
    inf.add_argument("--crop-ckpt", required=True)
    inf.add_argument("--crane-crop-ckpt", default=None,
                     help="per-part crane crop checkpoint: adds articulated "
                          "crane records (FK joint solve) to the output")
    inf.add_argument("--out", default="poses.jsonl")
    inf.add_argument("--frames", type=int, default=32)
    inf.add_argument("--batch", type=int, default=16)
    inf.add_argument("--size", type=int, default=512)
    inf.add_argument("--crop", type=int, default=128)
    inf.add_argument("--seed", type=int, default=0)
    inf.add_argument("--ladder", action="store_true")
    inf.add_argument("--det-threshold", type=float, default=0.3)
    inf.add_argument("--max-det", type=int, default=4,
                     help="detection slots per class (each dumper slot pays "
                          "a crop+solve)")
    inf.add_argument("--sequence-len", type=int, default=0,
                     help="run on temporally-coherent clips of this length "
                          "(pairs with seq-eval)")
    inf.add_argument("--crane-stride", type=int, default=4, choices=[2, 4],
                     help="output stride the crane crop ckpt was trained at")
    inf.add_argument("--crane-crop", type=int, default=None,
                     help="crop size the crane crop ckpt was trained at "
                          "(default: --crop)")
    inf.add_argument("--track", action="store_true",
                     help="assign track_ids across frames (greedy same-class "
                          "IoU) and EMA-smooth accepted poses in the world "
                          "frame (eval/tracking.py); tracks reset per clip")
    inf.add_argument("--smooth", type=float, default=0.5,
                     help="EMA keep-fraction for --track pose smoothing "
                          "(0 = ids only, raw poses)")
    inf.add_argument("--hifi", action="store_true",
                     help="run the detector on hifi CAD-mesh renders (sim-to-"
                          "sim transfer: models are trained on proxies)")

    se = sub.add_parser("seq-eval", help="temporal metrics over infer JSONL "
                                         "from sequence-mode clips")
    se.add_argument("--poses", required=True, help="infer --out JSONL path")
    se.add_argument("--sequence-len", type=int, default=30)
    se.add_argument("--fps", type=float, default=None,
                    help="clip frame rate for implied-speed reporting")
    se.set_defaults(fn=cmd_seq_eval)
    inf.set_defaults(fn=cmd_infer)

    b = sub.add_parser("bench", help="headline benchmark")
    b.set_defaults(fn=cmd_bench)

    args = p.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
