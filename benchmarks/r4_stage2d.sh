#!/bin/bash
# Round-4 TPU stage 2d: width-40/48 student THROUGHPUT sweep (VERDICT r3
# item 2) — find where >5k slices/s breaks on the width axis.  Throughput
# is data-independent (bench.py uses random weights), so this runs without
# waiting for the stage-2b students to train.  w32 peaked at batch 384
# (>=448 OOM); the wider students have bigger activations, so sweep down.
set -uo pipefail
cd /root/repo
OUT=/tmp/demo/results/width_throughput.jsonl
: > $OUT

for F in 40 48; do
  for B in 192 256 320 384; do
    python bench.py --features $F --batch-size $B --quant int8_fused \
      | tee -a $OUT
  done
  # one bf16 anchor per width at the mid batch
  python bench.py --features $F --batch-size 256 --quant none | tee -a $OUT
done

# re-anchor w32 at its r3 peak batch under the current code, so the whole
# Pareto throughput column is measured in one session
python bench.py --features 32 --batch-size 384 --quant int8_fused | tee -a $OUT
echo "=== stage 2d done ==="
