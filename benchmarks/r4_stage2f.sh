#!/bin/bash
# Round-4 TPU stage 2f: serving-numerics rows for the width Pareto.
# 1) int8_fused serving accuracy of each student trained in stage 2b/2e
#    (the Pareto's serving column: students are DEPLOYED int8_fused).
# 2) one student distilled against the int8_fused TEACHER outputs
#    (--teacher-quant, the "match serving numerics" lever) + its eval.
set -uo pipefail
cd /root/repo
D=/tmp/demo
R=/tmp/demo/results
mkdir -p $R

# the r4 teacher (stage 1 retrain) was never evaluated; every student gap
# in the Pareto is measured against THIS eval, on the same device/dtype
# path as the student evals
python -m mrisr_tpu.cli eval --model unet --data $D/store \
  --checkpoint-dir $D/models --results-dir $R
python benchmarks/int8_accuracy.py --data $D/store --models $D/models \
  --out $R/int8_acc_teacher.json | tail -n 30

for CK in m_w32_s0 m_w32_s1 m_w32_s2 m_w40 m_w48 m_w32_ema_s0 m_w32_ema_s1 m_w32_ema_s2; do
  F=32
  case $CK in m_w40) F=40;; m_w48) F=48;; esac
  [ -d $D/$CK ] || { echo "skip $CK (absent)"; continue; }
  python benchmarks/int8_accuracy.py --data $D/store --models $D/$CK \
    --model unet_distilled --features $F \
    --out $R/int8_acc_$CK.json | tail -n 30
done

echo "=== teacher-quant distill (w32, seed 0) ==="
CK=$D/m_w32_tq
python -m mrisr_tpu.cli distill --teacher unet --data $D/corpus32 \
  --epochs 40 --batch-size 32 --features 32 \
  --distill-alpha 1.0 --distill-lambda-ssim 0.3 --bf16 --train-seed 0 \
  --teacher-quant int8_fused --patience 100 \
  --teacher-dir $D/models --checkpoint-dir $CK --results-dir $CK \
  --backend device --scan-epochs
python -m mrisr_tpu.cli eval --model unet_distilled --features 32 \
  --data $D/store --checkpoint-dir $CK --results-dir $CK
python benchmarks/int8_accuracy.py --data $D/store --models $CK \
  --model unet_distilled --features 32 --out $R/int8_acc_m_w32_tq.json | tail -n 30
echo "=== stage 2f done ==="
