#!/bin/bash
# Round-5 resume queue: the p4 eval sweep of the hard-corpus convergence run
# died on a transient tunnel error ("response body closed before all bytes
# were read") AFTER SCST trained green, and the original r5_after_converge.sh
# then raced ablation_scoreboard against the missing convergence_report.json
# (whose absence makes the scoreboard fall back to max_seq_len 20). This
# script runs the corrected order, SEQUENTIALLY, >=45 s between TPU clients:
#   1. converge --from_phase 4  (eval sweep + drift + report JSON; 2 tries)
#   2. drift_anatomy            (CPU, reads the pred dumps)
#   3. ablation_scoreboard      (reads report JSON -> evaluates at L74)
#   4. fused-vs-XLA XE train A/B at HEAD (VERDICT #4)
#   5. software-pipelined attention inner-loop A/B (VERDICT #8)
#   6. final bench.py scoreboard
#
#   nohup bash scripts/r5_resume_queue.sh > /tmp/r5_queue.log 2>&1 &
set -ux
cd "$(dirname "$0")/.."

sleep 45
for try in 1 2; do
  if python scripts/converge_synthetic.py --hard --from_phase 4 \
      > /tmp/converge_hard_p4.log 2>&1; then break; fi
  sleep 90   # transient tunnel errors need a cool-down
done

python scripts/drift_anatomy.py > /tmp/drift_anatomy.log 2>&1 || true
sleep 45

python scripts/ablation_scoreboard.py \
  --data /tmp/converge_hard_data --saves /tmp/converge_hard_saves \
  --resume --out artifacts/ablation_r05 > /tmp/ablation_r05.log 2>&1 || true
sleep 45

python scripts/bench_train.py 32 8 1 xla > /tmp/bench_train_xla.log 2>&1 || true
sleep 45
python scripts/bench_train.py 32 8 1 fused > /tmp/bench_train_fused.log 2>&1 || true
sleep 45

BENCH_ATTN_ROWS=perhead python scripts/bench_backbone.py 32 fused \
  > /tmp/bench_bb_perhead.log 2>&1 || true
sleep 45
BENCH_ATTN_ROWS=pipelined python scripts/bench_backbone.py 32 fused \
  > /tmp/bench_bb_pipelined.log 2>&1 || true
sleep 45

python bench.py > /tmp/bench_final.log 2>&1 || true

echo DONE > /tmp/r5_queue_done
