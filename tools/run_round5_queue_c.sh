#!/bin/bash
# Round-5 queue, part C — final wall-clock-fitted plan (round ends 06:55).
#
# Part A's preflight did its job: it caught the Mosaic sublane-alignment
# bug in the Pallas heatmap kernel at the 768^2 shape (fixed + pinned by a
# standalone real-TPU compile check at the exact failing shape, see
# results/logs/check_hm768.log, and by tests/test_ops.py). Part C skips
# further preflight — the remaining compile-risk surface was already
# compiled green in part A (crop/crane/detect@512 preflights) — and sizes
# every item so the chain lands before the round-end bench:
#
#   1. dumper crop 12k        (~35 min; prerequisite of all two-stage evals)
#   2. crane crop-192 12k     (~2.4 h; VERDICT ask-2 bar >=0.85)
#   3. detector 10k @512      (~1.6 h; fresh rows + live ckpt for item 4)
#   4. detector 768 finetune +2k (~55 min; VERDICT ask-1 human bar 0.7/0.7)
#   5. (only if the clock allows) 10-clip infer + seq-eval
#
# Cut from the round (documented in ROADMAP): stage-1 32k (least-certain
# bar) and the full 20-clip seq-eval — the 4.9 h of chip that remain
# cannot hold them; their commands stay in run_round5_queue.sh.
set -x
cd /root/repo
R=results/logs
mkdir -p $R artifacts

# 1. Dumper ROI crop stage.
timeout 4500 python -m constructionsceneposeestimation_tpu.cli train-crop \
  --steps 12000 --save-every 3000 \
  --ckpt-dir /root/repo/artifacts/ck_crop \
  > $R/crop_dumper.log 2>&1

# 2. Crane per-part crop stage at --crop 192 (render stays 512).
timeout 10000 python -m constructionsceneposeestimation_tpu.cli train-crop \
  --cls crane --per-part --stride 2 --steps 12000 --crop 192 \
  --save-every 2000 \
  --ckpt-dir /root/repo/artifacts/ck_crane_c192 \
  > $R/crop_crane_c192.log 2>&1

# 3. Detector + miss analysis + hifi transfer + two-stage evals.
timeout 7800 python -m constructionsceneposeestimation_tpu.cli train-detect \
  --steps 10000 --det-stride 2 --n-dumpers 2 --n-humans 3 --hifi-mix 4 \
  --save-every 2000 \
  --ckpt-dir /root/repo/artifacts/ck_det \
  --crop-ckpt /root/repo/artifacts/ck_crop \
  --crane-crop-ckpt /root/repo/artifacts/ck_crane_c192 --crane-stride 2 --crane-crop 192 \
  --det-analysis --hifi-eval \
  > $R/detect.log 2>&1

# 4. 768^2 finetune of the 512 detector (+2k steps; params restore as-is,
#    pure conv FCN). Standard eval only — the det-analysis split at 768
#    costs ~10 min of extra compiles the clock does not have.
cp -r /root/repo/artifacts/ck_det /root/repo/artifacts/ck_det768
timeout 4800 python -m constructionsceneposeestimation_tpu.cli train-detect \
  --steps 12000 --size 768 --det-stride 2 --n-dumpers 2 --n-humans 3 \
  --hifi-mix 4 --save-every 500 \
  --ckpt-dir /root/repo/artifacts/ck_det768 \
  --crop-ckpt /root/repo/artifacts/ck_crop \
  --crane-crop-ckpt /root/repo/artifacts/ck_crane_c192 --crane-stride 2 --crane-crop 192 \
  > $R/detect768.log 2>&1

# 5. Opportunistic: 10-clip temporal eval (watchdogged externally; the
#    round-end bench owns the chip from ~06:45).
timeout 2400 python -m constructionsceneposeestimation_tpu.cli infer \
  --det-ckpt /root/repo/artifacts/ck_det --det-stride 2 \
  --crop-ckpt /root/repo/artifacts/ck_crop \
  --crane-crop-ckpt /root/repo/artifacts/ck_crane_c192 --crane-stride 2 --crane-crop 192 \
  --sequence-len 30 --frames 300 --track \
  --out /root/repo/results/clips_r5.jsonl \
  > $R/infer_clips_r5.log 2>&1
timeout 1200 python -m constructionsceneposeestimation_tpu.cli seq-eval \
  --poses /root/repo/results/clips_r5.jsonl --sequence-len 30 \
  > $R/seqeval_r5.log 2>&1

echo QUEUE5C_DONE
