#!/bin/bash
# Round-5 follow-up TPU job: the shape-robustness fresh-compile fuzz sweep
# (VERDICT r4 item 7's runtime half; the static picker sweep already runs in
# the CPU suite). Waits for the main measurement queue (r5_after_converge.sh)
# to finish so only one TPU client talks to the tunnel at a time.
#
#   nohup bash scripts/r5_fuzz_after_queue.sh > /tmp/r5_fuzz_queue.log 2>&1 &
set -ux
cd "$(dirname "$0")/.."

while [ ! -f /tmp/r5_queue_done ]; do sleep 60; done
sleep 45

python scripts/compile_audit.py --fuzz 10 775540 > /tmp/compile_fuzz.log 2>&1 || true

echo DONE > /tmp/r5_fuzz_done
