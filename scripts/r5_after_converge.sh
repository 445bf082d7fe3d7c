#!/bin/bash
# Round-5 post-convergence TPU queue: waits for the hard-corpus convergence
# driver (scripts/converge_synthetic.py --hard) to exit, then runs the
# remaining round-5 measurements SEQUENTIALLY with >=45 s gaps between TPU
# client processes (back-to-back starts against the axon tunnel hit
# 'TPU backend error (Internal)'; see converge_synthetic.run()).
#
#   nohup bash scripts/r5_after_converge.sh > /tmp/r5_queue.log 2>&1 &
#
# Each step tolerates failure (|| true) so later steps still produce
# artifacts; inspect the per-step logs afterwards.
set -ux
cd "$(dirname "$0")/.."

if [ -f /tmp/converge_hard.pid ]; then
  while kill -0 "$(cat /tmp/converge_hard.pid)" 2>/dev/null; do sleep 60; done
fi
sleep 45

# tie anatomy over the drift dumps (CPU; reads /tmp/converge_hard_saves)
python scripts/drift_anatomy.py > /tmp/drift_anatomy.log 2>&1 || true

# ablation scoreboard from the trained hard-corpus checkpoints (VERDICT #1)
python scripts/ablation_scoreboard.py \
  --data /tmp/converge_hard_data --saves /tmp/converge_hard_saves \
  --out artifacts/ablation_r05 > /tmp/ablation_r05.log 2>&1 || true
sleep 45

# fused-vs-XLA XE train A/B at HEAD, b32 remat (VERDICT #4)
python scripts/bench_train.py 32 8 1 xla > /tmp/bench_train_xla.log 2>&1 || true
sleep 45
python scripts/bench_train.py 32 8 1 fused > /tmp/bench_train_fused.log 2>&1 || true
sleep 45

# software-pipelined attention inner loop A/B (VERDICT #8)
BENCH_ATTN_ROWS=perhead python scripts/bench_backbone.py 32 fused \
  > /tmp/bench_bb_perhead.log 2>&1 || true
sleep 45
BENCH_ATTN_ROWS=pipelined python scripts/bench_backbone.py 32 fused \
  > /tmp/bench_bb_pipelined.log 2>&1 || true
sleep 45

# final driver scoreboard at HEAD
python bench.py > /tmp/bench_final.log 2>&1 || true

echo DONE > /tmp/r5_queue_done
