#!/bin/bash
# Round-4 TPU stage 2e: EMA-averaged width-32 students (VERDICT r3 item 2's
# "weight-averaged final epochs" lever) — same r3 recipe as the stage-2b
# seed spread but with --ema 0.999 (per-step Polyak averaging inside the
# fused step; eval + _best use the averaged weights).  3 seeds to measure
# whether EMA kills the bf16 rerun spread and where the mean gap lands.
set -uo pipefail
cd /root/repo
D=/tmp/demo

for S in 0 1 2; do
  CK=$D/m_w32_ema_s$S
  python -m mrisr_tpu.cli distill --teacher unet --data $D/corpus32 \
    --epochs 40 --batch-size 32 --features 32 \
    --distill-alpha 1.0 --distill-lambda-ssim 0.3 --ema 0.999 \
    --patience 100 --teacher-dir $D/models --checkpoint-dir $CK \
    --results-dir $CK --backend device --scan-epochs --train-seed $S
  python -m mrisr_tpu.cli eval --model unet_distilled --features 32 \
    --data $D/store --checkpoint-dir $CK --results-dir $CK
done
echo "=== stage 2e done ==="
