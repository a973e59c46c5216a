#!/bin/bash
# Round-4 TPU stage 2a: step-distilled sampler THROUGHPUT ladder + the
# fastddpm_steps5 serving bundle (VERDICT r3 item 1).
set -uo pipefail
cd /root/repo
D=/tmp/demo
OUT=$D/results/stepdistill_throughput.jsonl
: > $OUT

echo "=== sampling throughput ladder (batch 128) ==="
for Q in none int8_deep; do
  for N in 10 5 3; do
    python benchmarks/diffusion_sampling.py --batch-sizes 128 \
      --quant $Q --num-steps $N | tee -a $OUT
  done
done
# T=10 ancestral baselines (the r3-recorded serving numbers, re-anchored)
python benchmarks/diffusion_sampling.py --batch-sizes 128 | tee -a $OUT
python benchmarks/diffusion_sampling.py --batch-sizes 128 --quant int8_deep | tee -a $OUT

echo "=== fastddpm_steps5 int8_deep accuracy (same keys, DDIM-grid) ==="
python benchmarks/diffusion_int8_accuracy.py --data $D/store \
  --models $D/models --model fastddpm_steps5 \
  --out $D/results/steps5_int8_accuracy.json

echo "=== fastddpm_steps5 serving bundle (int8_deep) ==="
python -m mrisr_tpu.cli export-serving --model fastddpm_steps5 \
  --data $D/store --quant int8_deep --calib-batches 2 \
  --checkpoint-dir $D/models --out $D/bundle_fastddpm_steps5
python - <<'EOF'
import sys; sys.path.insert(0, "/root/repo")
import numpy as np
from mrisr_tpu.serve import engine_from_bundle
with engine_from_bundle("/tmp/demo/bundle_fastddpm_steps5", batch_size=16) as eng:
    y = eng.predict(np.zeros((256, 256, 2), np.float32))
    assert y.shape == (256, 256, 1), y.shape
    print("steps5 bundle engine OK", float(np.abs(y).mean()))
EOF
echo "=== stage 2a done ==="
