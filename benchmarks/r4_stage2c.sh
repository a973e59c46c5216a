#!/bin/bash
# Round-4 TPU stage 2c: retrain the fastddpm_simple anchor on the
# [-1, 1]-mapped store (VERDICT r3 item 5) and refresh its results_demo
# artifacts.  The preset now sets value_range='zscore_minmax11', so the
# M10 sampler's per-step clamp(-1, 1) no longer caps the anchor at the
# floor.
set -uo pipefail
cd /root/repo
D=/tmp/demo

python -m mrisr_tpu.cli train --preset fastddpm_simple --data $D/store \
  --epochs 40 --batch-size 16 --bf16 --patience 100 \
  --checkpoint-dir $D/models --results-dir results_demo \
  --backend device --scan-epochs
python -m mrisr_tpu.cli eval --model fastddpm_simple --data $D/store \
  --checkpoint-dir $D/models --results-dir results_demo
echo "=== stage 2c done ==="
