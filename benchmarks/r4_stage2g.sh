#!/bin/bash
# Round-4 TPU stage 2g: pruned-init students (serve/prune.py) — the
# strongest candidate recipe for a certified <=0.002 gap at >5k slices/s:
# teacher-pruned init + EMA, 3 seeds at width 32, plus one width-40 run.
set -uo pipefail
cd /root/repo
D=/tmp/demo

prune_one () {  # $1=features $2=ckpt_dir $3... extra
  local F=$1; local CK=$2; shift 2
  python -m mrisr_tpu.cli distill --teacher unet --data $D/corpus32 \
    --epochs 40 --batch-size 32 --features $F \
    --distill-alpha 1.0 --distill-lambda-ssim 0.3 --bf16 \
    --init-from-teacher --ema 0.999 --lr-schedule cosine --patience 100 \
    --teacher-dir $D/models --checkpoint-dir $CK --results-dir $CK \
    --backend device --scan-epochs "$@"
  python -m mrisr_tpu.cli eval --model unet_distilled --features $F \
    --data $D/store --checkpoint-dir $CK --results-dir $CK
}

for S in 0 1 2; do
  prune_one 32 $D/m_w32_prune_s$S --train-seed $S
done
prune_one 40 $D/m_w40_prune --train-seed 0

# serving-accuracy rows for the new students
for CK in m_w32_prune_s0 m_w32_prune_s1 m_w32_prune_s2 m_w40_prune; do
  F=32; [ "$CK" = m_w40_prune ] && F=40
  python benchmarks/int8_accuracy.py --data $D/store --models $D/$CK \
    --model unet_distilled --features $F --variants bf16,int8_fused_shared \
    --out $D/results/int8_acc_$CK.json | tail -n 5
done
echo "=== stage 2g done ==="
