#!/bin/bash
# Round-4 queue 3: corrected relaunch of the remaining trainings.
#
# Fixes vs queue 1: the detector run was pacing to ~3h against a 90-min
# timeout with --save-every unset (default 0 = final-save only), so the
# timeout would have discarded everything. Every long run now checkpoints
# periodically (trainers resume from latest on restart) and the timeouts
# match measured pace. Also picks up the composite hifi sweeper (ba4ad7b),
# which the original detector process predated.
set -x
cd /root/repo
R=artifacts/logs

# 0. Per-part translation/rotation error split on the finished 512 crane
#    ckpt (eval-only: restores step 20000, skips training). Diagnoses
#    whether column/telescopic misses are t- or R-dominated (ask 5).
timeout 2700 python -m constructionsceneposeestimation_tpu.cli train-crop \
  --cls crane --per-part --stride 2 --steps 20000 \
  --ckpt-dir /root/repo/artifacts/ck_crane \
  > $R/crane_errsplit.log 2>&1

# 1. Detector (round-3 headline config) + two-stage eval + oracle-IoU miss
#    split (VERDICT ask 4) + hifi transfer eval. ~2-3h.
timeout 12600 python -m constructionsceneposeestimation_tpu.cli train-detect \
  --steps 16000 --det-stride 2 --n-dumpers 2 --n-humans 3 --hifi-mix 4 \
  --save-every 2000 \
  --ckpt-dir /root/repo/artifacts/ck_det \
  --crop-ckpt /root/repo/artifacts/ck_crop \
  --crane-crop-ckpt /root/repo/artifacts/ck_crane \
  --det-analysis --hifi-eval \
  > $R/detect.log 2>&1

# 2. Stage-1 (single-shot) capacity bump for ask 6: 24k -> 32k at 512^2.
timeout 10800 python -m constructionsceneposeestimation_tpu.cli train-eval \
  --steps 32000 --size 512 --camera-mix 0.3 --save-every 4000 \
  --ckpt-dir /root/repo/artifacts/ck_stage1 \
  > $R/stage1.log 2>&1

# 3. Crane crop at 768^2 render (ask 5 lever: each crop pixel covers 1.5x
#    less world -> tighter column/telescopic localization).
timeout 10800 python -m constructionsceneposeestimation_tpu.cli train-crop \
  --cls crane --per-part --stride 2 --steps 20000 --size 768 \
  --save-every 4000 \
  --ckpt-dir /root/repo/artifacts/ck_crane768 \
  > $R/crop_crane768.log 2>&1

echo QUEUE3_DONE
