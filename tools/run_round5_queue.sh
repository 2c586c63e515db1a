#!/bin/bash
# Round-5 training queue — retrains EVERY deployed checkpoint from scratch
# (VERDICT round 4, weak 1: artifacts/ is git-ignored and was wiped between
# sessions; nothing survived). All logs + final eval metrics land under the
# TRACKED results/ dir so the rows stay verifiable after the environment
# dies (only git persists here).
#
# Ordering: shortest prerequisite first, then the two-rounds-overdue bars:
#   1. dumper crop 12k            (needed by detector two-stage eval + seq-eval)
#   2. crane per-part crop-192 16k (VERDICT ask 2: rotation-dominated misses;
#                                   192px crops -> 96^2 heatmaps, 1.5x finer)
#   3. detector 16k @512 hifi-mix4 (+ oracle-IoU split + hifi transfer eval)
#   4. detector 768^2 finetune +4k (VERDICT ask 1: human P/R bar 0.7/0.7 —
#                                   misses are 0.41 localization, scale-limited)
#   5. stage-1 32k @512           (VERDICT ask 1: single-shot dumper DR bar 0.6)
#   6. infer 20 clips x 30 + seq-eval (VERDICT ask 1: >=20-clip dispersion row)
#
# Every trainer checkpoints periodically and resumes from latest on restart,
# so a timeout loses at most --save-every steps and a restore+eval rerun of
# the same command recovers the row in minutes.
set -x
cd /root/repo
R=results/logs
mkdir -p $R artifacts

# 0. PREFLIGHT: tiny-step versions of every queue command, real eval shapes.
#    Catches arg/restore/shape crashes in the first minutes instead of hours
#    in, and warms the jit compilation cache for the real runs (training
#    batch shapes are identical). Aborts the queue on any failure.
set -e
timeout 2700 python -m constructionsceneposeestimation_tpu.cli train-crop \
  --steps 20 --inner 10 --ckpt-dir /tmp/pf_crop \
  > $R/preflight_crop.log 2>&1
timeout 2700 python -m constructionsceneposeestimation_tpu.cli train-crop \
  --cls crane --per-part --stride 2 --steps 20 --inner 10 --crop 192 \
  --ckpt-dir /tmp/pf_crane192 \
  > $R/preflight_crane.log 2>&1
timeout 3600 python -m constructionsceneposeestimation_tpu.cli train-detect \
  --steps 20 --inner 10 --det-stride 2 --n-dumpers 2 --n-humans 3 \
  --hifi-mix 4 --ckpt-dir /tmp/pf_det \
  --crop-ckpt /tmp/pf_crop \
  --crane-crop-ckpt /tmp/pf_crane192 --crane-stride 2 --crane-crop 192 \
  --det-analysis --hifi-eval \
  > $R/preflight_detect.log 2>&1
cp -r /tmp/pf_det /tmp/pf_det768   # 512-ckpt restore at 768 (queue item 4)
timeout 3600 python -m constructionsceneposeestimation_tpu.cli train-detect \
  --steps 30 --inner 10 --size 768 --det-stride 2 --n-dumpers 2 \
  --n-humans 3 --hifi-mix 4 --ckpt-dir /tmp/pf_det768 \
  --crop-ckpt /tmp/pf_crop \
  --crane-crop-ckpt /tmp/pf_crane192 --crane-stride 2 --crane-crop 192 \
  --det-analysis \
  > $R/preflight_detect768.log 2>&1
timeout 2700 python -m constructionsceneposeestimation_tpu.cli train-eval \
  --steps 20 --inner 10 --size 512 --camera-mix 0.3 --ckpt-dir /tmp/pf_stage1 \
  > $R/preflight_stage1.log 2>&1
timeout 2700 python -m constructionsceneposeestimation_tpu.cli infer \
  --det-ckpt /tmp/pf_det --det-stride 2 \
  --crop-ckpt /tmp/pf_crop \
  --crane-crop-ckpt /tmp/pf_crane192 --crane-stride 2 --crane-crop 192 \
  --sequence-len 30 --frames 30 --track --out /tmp/pf_clips.jsonl \
  > $R/preflight_infer.log 2>&1
timeout 600 python -m constructionsceneposeestimation_tpu.cli seq-eval \
  --poses /tmp/pf_clips.jsonl --sequence-len 30 \
  > $R/preflight_seqeval.log 2>&1
set +e
echo PREFLIGHT_OK

# 1. Dumper ROI crop stage (RESULTS_MANIFEST row command).
timeout 4500 python -m constructionsceneposeestimation_tpu.cli train-crop \
  --steps 12000 --save-every 3000 \
  --ckpt-dir /root/repo/artifacts/ck_crop \
  > $R/crop_dumper.log 2>&1

# 2. Crane per-part crop stage at --crop 192 (render stays 512). 12k steps
#    (wall-clock budget: the whole from-scratch queue must land inside one
#    round — a finished 12k row with committed evidence beats a timed-out
#    16k; the trainer restores from latest, so a later +4k finetune is one
#    command).
timeout 11000 python -m constructionsceneposeestimation_tpu.cli train-crop \
  --cls crane --per-part --stride 2 --steps 12000 --crop 192 \
  --save-every 2000 \
  --ckpt-dir /root/repo/artifacts/ck_crane_c192 \
  > $R/crop_crane_c192.log 2>&1

# 3. Detector, round-4 headline config (refreshes the stale README rows with
#    a live checkpoint) + miss analysis + hifi transfer + two-stage evals
#    against the crop ckpts from items 1-2.
timeout 9600 python -m constructionsceneposeestimation_tpu.cli train-detect \
  --steps 12000 --det-stride 2 --n-dumpers 2 --n-humans 3 --hifi-mix 4 \
  --save-every 2000 \
  --ckpt-dir /root/repo/artifacts/ck_det \
  --crop-ckpt /root/repo/artifacts/ck_crop \
  --crane-crop-ckpt /root/repo/artifacts/ck_crane_c192 --crane-stride 2 --crane-crop 192 \
  --det-analysis --hifi-eval \
  > $R/detect.log 2>&1

# 4. 768^2 finetune of the 512-trained detector (pure conv FCN: params
#    restore as-is). Humans at 15-30 m are ~5x20 px at 512 -> IoU-0.5 is
#    scale-limited; 768 is the diagnosed lever for the P/R 0.7/0.7 bar.
cp -r /root/repo/artifacts/ck_det /root/repo/artifacts/ck_det768
timeout 7200 python -m constructionsceneposeestimation_tpu.cli train-detect \
  --steps 15000 --size 768 --det-stride 2 --n-dumpers 2 --n-humans 3 \
  --hifi-mix 4 --save-every 1000 \
  --ckpt-dir /root/repo/artifacts/ck_det768 \
  --crop-ckpt /root/repo/artifacts/ck_crop \
  --crane-crop-ckpt /root/repo/artifacts/ck_crane_c192 --crane-stride 2 --crane-crop 192 \
  --det-analysis \
  > $R/detect768.log 2>&1

# 5. Temporal metrics at 20 clips x 30 frames (round-4 row was 4 clips
#    quoted to 3 digits; dispersion machinery landed in eval/sequence_metrics).
#    Runs BEFORE stage-1: cheaper and a named VERDICT ask; stage-1 is the
#    least-certain bar and is sacrificial if the round clock runs out.
timeout 3600 python -m constructionsceneposeestimation_tpu.cli infer \
  --det-ckpt /root/repo/artifacts/ck_det --det-stride 2 \
  --crop-ckpt /root/repo/artifacts/ck_crop \
  --crane-crop-ckpt /root/repo/artifacts/ck_crane_c192 --crane-stride 2 --crane-crop 192 \
  --sequence-len 30 --frames 600 --track \
  --out /root/repo/results/clips_r5.jsonl \
  > $R/infer_clips_r5.log 2>&1
timeout 1800 python -m constructionsceneposeestimation_tpu.cli seq-eval \
  --poses /root/repo/results/clips_r5.jsonl --sequence-len 30 \
  > $R/seqeval_r5.log 2>&1

# 6. Stage-1 single-shot capacity run: 24k -> 32k (dumper DR bar 0.6).
timeout 10800 python -m constructionsceneposeestimation_tpu.cli train-eval \
  --steps 32000 --size 512 --camera-mix 0.3 --save-every 4000 \
  --ckpt-dir /root/repo/artifacts/ck_stage1 \
  > $R/stage1.log 2>&1

echo QUEUE5_DONE
