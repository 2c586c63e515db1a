#!/bin/bash
# Round-4 training queue (asks 4/5/6 + manifest repro): sequential, all
# checkpoints under artifacts/ (persists across sessions; RESULTS_MANIFEST.md).
set -x
cd /root/repo
mkdir -p artifacts/logs
R=artifacts/logs

# 1. Dumper crop stage (feeds two-stage rows + infer).
timeout 3600 python -m constructionsceneposeestimation_tpu.cli train-crop \
  --steps 12000 --ckpt-dir /root/repo/artifacts/ck_crop \
  > $R/crop_dumper.log 2>&1

# 2. Crane per-part crop stage with the NEW aspect-matched rect ROIs
#    (ask 5) + longer schedule 16k -> 20k.
timeout 5400 python -m constructionsceneposeestimation_tpu.cli train-crop \
  --cls crane --per-part --stride 2 --steps 20000 \
  --ckpt-dir /root/repo/artifacts/ck_crane \
  > $R/crop_crane.log 2>&1

# 3. Detector (round-3 headline config) + two-stage eval + oracle-IoU miss
#    split (ask 4 diagnosis).
timeout 5400 python -m constructionsceneposeestimation_tpu.cli train-detect \
  --steps 16000 --det-stride 2 --n-dumpers 2 --n-humans 3 --hifi-mix 4 \
  --ckpt-dir /root/repo/artifacts/ck_det \
  --crop-ckpt /root/repo/artifacts/ck_crop \
  --crane-crop-ckpt /root/repo/artifacts/ck_crane \
  --det-analysis --hifi-eval \
  > $R/detect.log 2>&1

# 4. Stage-1 (single-shot) headline config, capacity bump for ask 6:
#    24k -> 32k steps at 512^2.
timeout 7200 python -m constructionsceneposeestimation_tpu.cli train-eval \
  --steps 32000 --size 512 --camera-mix 0.3 \
  --ckpt-dir /root/repo/artifacts/ck_stage1 \
  > $R/stage1.log 2>&1

echo ALL_DONE
