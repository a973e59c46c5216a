#!/bin/bash
# Round-4 TPU stage 2b: the 5k-claim cleanup (VERDICT r3 item 2) —
# width-40/48 students, width-32 seed spread (bf16) + fp32 determinism
# probe, throughput sweeps.  Teacher = /tmp/demo/models/unet_best (stage 1).
set -uo pipefail
cd /root/repo
D=/tmp/demo
R=$D/results

distill_one () {  # $1=features $2=ckpt_dir $3=extra flags...
  local F=$1; local CK=$2; shift 2
  python -m mrisr_tpu.cli distill --teacher unet --data $D/corpus32 \
    --epochs 40 --batch-size 32 --features $F \
    --distill-alpha 1.0 --distill-lambda-ssim 0.3 --patience 100 \
    --teacher-dir $D/models --checkpoint-dir $CK --results-dir $CK \
    --backend device --scan-epochs "$@"
  python -m mrisr_tpu.cli eval --model unet_distilled --features $F \
    --data $D/store --checkpoint-dir $CK --results-dir $CK
}

echo "=== width-32 seed spread (bf16, r3 recipe) ==="
for S in 0 1 2; do
  distill_one 32 $D/m_w32_s$S --bf16 --train-seed $S
done

echo "=== width-32 fp32 determinism probe (2 identical runs) ==="
distill_one 32 $D/m_w32_f32a --train-seed 0
distill_one 32 $D/m_w32_f32b --train-seed 0

echo "=== width-40 / width-48 students (bf16, seed 0) ==="
distill_one 40 $D/m_w40 --bf16 --train-seed 0
distill_one 48 $D/m_w48 --bf16 --train-seed 0

echo "=== stage 2b done ==="
