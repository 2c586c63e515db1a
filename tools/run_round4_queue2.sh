#!/bin/bash
# Round-4 queue 2: diagnosis + resolution experiments (after queue 1).
set -x
cd /root/repo
R=artifacts/logs

# 1. Re-eval the 512 crane crop ckpt with the new per-part t/rot error
#    split (restores ck_crane; steps already done -> eval only).
timeout 1800 python -m constructionsceneposeestimation_tpu.cli train-crop \
  --cls crane --per-part --stride 2 --steps 20000 \
  --ckpt-dir /root/repo/artifacts/ck_crane \
  > $R/crane_errsplit.log 2>&1

# 2. Crane crop at 768^2 render (closer to the reference's native 1280x720;
#    each crop pixel covers 1.5x less world -> tighter (x, y)).
timeout 7200 python -m constructionsceneposeestimation_tpu.cli train-crop \
  --cls crane --per-part --stride 2 --steps 20000 --size 768 \
  --ckpt-dir /root/repo/artifacts/ck_crane768 \
  > $R/crop_crane768.log 2>&1

echo QUEUE2_DONE
