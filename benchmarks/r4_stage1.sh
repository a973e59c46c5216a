#!/bin/bash
# Round-4 TPU stage 1: rebuild the demo stores + teacher checkpoints
# (the /tmp working tree does not survive rounds), then run the flagship
# step-distillation ladder (VERDICT r3 item 1).
set -euo pipefail
cd /root/repo
D=/tmp/demo
mkdir -p $D

echo "=== synth stores ==="
[ -d $D/store ]    || python -m mrisr_tpu.cli synth $D/store
[ -d $D/corpus32 ] || python -m mrisr_tpu.cli synth $D/corpus32 --patients 32 --seed 1000

echo "=== train fastddpm teacher (48 ep, batch 16, bf16) ==="
if [ ! -d $D/models/fastddpm_best ]; then
  python -m mrisr_tpu.cli train --preset fastddpm --data $D/store \
    --epochs 48 --batch-size 16 --bf16 --patience 100 \
    --checkpoint-dir $D/models --results-dir $D/results \
    --backend device --scan-epochs
fi

echo "=== train unet teacher (6 ep, batch 32) ==="
if [ ! -d $D/models/unet_best ]; then
  python -m mrisr_tpu.cli train --preset unet --data $D/store \
    --epochs 6 --batch-size 32 \
    --checkpoint-dir $D/models --results-dir $D/results \
    --backend device --scan-epochs
fi

echo "=== step-distill fastddpm T=10 -> 5 -> 3 ==="
python -m mrisr_tpu.cli distill-steps --teacher fastddpm --data $D/store \
  --rounds 2 --factor 2 --epochs 30 --lr 2e-4 --batch-size 16 --bf16 \
  --checkpoint-dir $D/models --results-dir $D/results --backend device

echo "=== stage 1 done ==="
