#!/bin/bash
# Reordered tail of the r5 campaign (same durable-artifact guards, so it
# composes with benchmarks/r5_campaign.sh): with ~37 min/unit measured on
# this tunnel, the full r5 order cannot finish in one session.  Priority
# per VERDICT r4: (1) the 3-seed certification trio + assembled Pareto,
# (6) the step-distillation ladder incl. the steps3 int8 artifact, then
# the width-throughput sweep that re-anchors the serving headline, then
# the EMA trio / width rungs as if-time breadth.
set -uo pipefail
cd /root/repo
# pull in D/R/P, say, commit_unit and every unit fn (everything above the
# campaign's own execution order)
source <(awk '/=== r5 campaign start ===/{exit} !/^#!/{print}' benchmarks/r5_campaign.sh)

# Trimmed sweep: the headline w32 row plus one batch point per wider rung
# (the full 5-point sweep costs ~30 min of tunnel compiles; these three
# anchor the Pareto's throughput column).
unit_width_throughput () {
  if [ -f $P/results/width_throughput.jsonl ]; then say "skip width throughput (done)"; return; fi
  : > $R/width_throughput.jsonl
  say "width throughput sweep (trimmed)"
  for SPEC in "32 384" "40 256" "48 192"; do
    set -- $SPEC
    python bench.py --features $1 --batch-size $2 --quant int8_fused \
      | tee -a $R/width_throughput.jsonl || say "WARN bench w$1 b$2 failed"
  done
  cp $R/width_throughput.jsonl $P/results/
  commit_unit "Pareto campaign: width int8_fused throughput anchors (w32/40/48)"
}

say "=== r5 tail start ==="
student m_w32_s1 32 yes --light-checkpoints --bf16 --train-seed 1
student m_w32_s2 32 yes --light-checkpoints --bf16 --train-seed 2
unit_assemble
unit_width_throughput
unit_assemble
unit_step_ladder
student m_w32_ema_s0 32 yes --light-checkpoints --bf16 --ema 0.999 --train-seed 0
student m_w32_ema_s1 32 yes --light-checkpoints --bf16 --ema 0.999 --train-seed 1
student m_w32_ema_s2 32 yes --light-checkpoints --bf16 --ema 0.999 --train-seed 2
unit_assemble
student m_w40 40 yes --light-checkpoints --bf16 --train-seed 0
student m_w48 48 yes --light-checkpoints --bf16 --train-seed 0
unit_assemble
say "=== r5 tail done ==="
