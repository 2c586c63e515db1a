#!/bin/bash
# Round-5 queue, part B — resume after the preflight caught a real bug:
# the Pallas heatmap kernel's dynamic row window was not sublane-aligned,
# a Mosaic compile error at the 768^2 heatmap shape (ops/heatmap.py fix).
# Preflight items crop / crane192 / detect@512 already PASSED in part A
# (results/logs/preflight_{crop,crane,detect}.log); this part re-runs the
# 768 preflight against the fix, finishes the remaining preflights, then
# runs the real items (same as part A items 1-6).
set -x
cd /root/repo
R=results/logs
mkdir -p $R artifacts

set -e
timeout 3600 python -m constructionsceneposeestimation_tpu.cli train-detect \
  --steps 30 --inner 10 --size 768 --det-stride 2 --n-dumpers 2 \
  --n-humans 3 --hifi-mix 4 --ckpt-dir /tmp/pf_det768 \
  --crop-ckpt /tmp/pf_crop \
  --crane-crop-ckpt /tmp/pf_crane192 --crane-stride 2 --crane-crop 192 \
  --det-analysis \
  > $R/preflight_detect768.log 2>&1
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
echo PREFLIGHT_B_OK

# 1. Dumper ROI crop stage (RESULTS_MANIFEST row command).
timeout 4500 python -m constructionsceneposeestimation_tpu.cli train-crop \
  --steps 12000 --save-every 3000 \
  --ckpt-dir /root/repo/artifacts/ck_crop \
  > $R/crop_dumper.log 2>&1

# 2. Crane per-part crop stage at --crop 192 (render stays 512).
timeout 11000 python -m constructionsceneposeestimation_tpu.cli train-crop \
  --cls crane --per-part --stride 2 --steps 12000 --crop 192 \
  --save-every 2000 \
  --ckpt-dir /root/repo/artifacts/ck_crane_c192 \
  > $R/crop_crane_c192.log 2>&1

# 3. Detector + miss analysis + hifi transfer + two-stage evals.
timeout 9600 python -m constructionsceneposeestimation_tpu.cli train-detect \
  --steps 12000 --det-stride 2 --n-dumpers 2 --n-humans 3 --hifi-mix 4 \
  --save-every 2000 \
  --ckpt-dir /root/repo/artifacts/ck_det \
  --crop-ckpt /root/repo/artifacts/ck_crop \
  --crane-crop-ckpt /root/repo/artifacts/ck_crane_c192 --crane-stride 2 --crane-crop 192 \
  --det-analysis --hifi-eval \
  > $R/detect.log 2>&1

# 4. 768^2 finetune of the 512-trained detector (human P/R bar 0.7/0.7).
cp -r /root/repo/artifacts/ck_det /root/repo/artifacts/ck_det768
timeout 7200 python -m constructionsceneposeestimation_tpu.cli train-detect \
  --steps 15000 --size 768 --det-stride 2 --n-dumpers 2 --n-humans 3 \
  --hifi-mix 4 --save-every 1000 \
  --ckpt-dir /root/repo/artifacts/ck_det768 \
  --crop-ckpt /root/repo/artifacts/ck_crop \
  --crane-crop-ckpt /root/repo/artifacts/ck_crane_c192 --crane-stride 2 --crane-crop 192 \
  --det-analysis \
  > $R/detect768.log 2>&1

# 5. Temporal metrics at 20 clips x 30 frames.
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

# 6. Stage-1 single-shot capacity run (sacrificial at round end).
timeout 10800 python -m constructionsceneposeestimation_tpu.cli train-eval \
  --steps 32000 --size 512 --camera-mix 0.3 --save-every 4000 \
  --ckpt-dir /root/repo/artifacts/ck_stage1 \
  > $R/stage1.log 2>&1

echo QUEUE5B_DONE
